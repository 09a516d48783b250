#!/usr/bin/env python3
"""Demo CLI: track objects in a video (file or image folder).

Counterpart of ``/root/reference/demos/demo.py:10-47`` with the same
flags, plus ``--model-file`` (this environment cannot download the
reference's demo model zips).

Usage:
  python demos/demo.py --demo-video clip.mp4 --track-class person \
      --model-file model.pth --dump-video True --output-path out/
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from siammot_tpu.utils.platform import ensure_requested_platform  # noqa: E402
ensure_requested_platform()

from demos.demo_inference import DemoInference  # noqa: E402
from demos.utils.vis_generator import VisGenerator  # noqa: E402
from demos.utils.vis_writer import VisWriter  # noqa: E402
from demos.video_iterator import build_video_iterator  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description="SiamMOT-TPU demo")
    parser.add_argument("--demo-video", required=True,
                        help="video file or image folder")
    parser.add_argument("--track-class", default="person",
                        choices=("person", "person_vehicle"))
    parser.add_argument("--model-file", default=None,
                        help="reference .pth or Orbax checkpoint")
    parser.add_argument("--config-file", default=None,
                        help="override the bundled per-class config "
                             "(e.g. to match a custom checkpoint's "
                             "training resolution)")
    parser.add_argument("--dump-video", type=lambda s: s.lower() == "true",
                        default=True)
    parser.add_argument("--vis-resolution", type=int, default=None,
                        help="output frame height")
    parser.add_argument("--output-path", default="demo_out")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s: %(message)s")

    frames = build_video_iterator(args.demo_video)
    vis_generator = VisGenerator(vis_height=args.vis_resolution)
    vis_writer = VisWriter(dump_video=args.dump_video,
                           out_path=args.output_path,
                           file_name=os.path.basename(args.demo_video),
                           fps=getattr(frames, "fps", 30.0))

    tracker = DemoInference(track_class=args.track_class,
                            model_path=args.model_file,
                            vis_generator=vis_generator,
                            vis_writer=vis_writer,
                            config_file=args.config_file)

    n_tracks = set()
    for frame_id, (xywh, ids, labels, scores) in \
            tracker.process_frame_sequence(iter(frames)):
        n_tracks.update(int(i) for i in ids if i >= 0)
    vis_writer.close()
    logging.info("done: %d frames, %d tracks, output under %s",
                 getattr(frames, "frame_count", -1), len(n_tracks),
                 args.output_path)


if __name__ == "__main__":
    main()
