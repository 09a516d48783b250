#!/usr/bin/env python3
"""Same-session A/B of the multistream engine's scheduling levers.

Round-4 landed two multistream optimizations with zero wall-clock
evidence (VERDICT r4 item 7):

  * length-aware wave packing (``pack_waves`` sorts videos longest-first
    so a wave's masked-lane waste shrinks) — toggle ``SIAMMOT_MS_PACK``;
  * one-frame upload pipelining (host->device transfer of frame t+1
    rides the tunnel while the device steps frame t) — toggle
    ``SIAMMOT_MS_PIPELINE``.

This builds a length-skewed wave set by symlinking truncated copies of
the synthetic test videos (lane-step waste only exists when lengths
differ), then times ``do_inference_multistream`` under each toggle in
ONE process (same chip session, same compiled step via the persistent
cache).  Outputs are timing-only; per-video results are asserted
identical across configs (the toggles must not change math).

Usage:
  python tools/ab_multistream.py [--root /tmp/SYNMOT_HARD] \
      [--lengths 150,120,90,75,60,45,30,20] [--n-streams 4]
"""

import argparse
import glob
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def build_truncated(root, lengths, work):
    """Symlink the first L frames of the source test videos (cycled)
    into work/vid<i>/img1; returns DataSamples of those lengths."""
    from siammot_tpu.data.motion_dataset import DataSample

    src = sorted(glob.glob(os.path.join(root, "test", "*", "img1")))
    assert src, f"no test videos under {root}"
    import cv2
    shutil.rmtree(work, ignore_errors=True)
    samples = []
    for i, length in enumerate(lengths):
        sdir = src[i % len(src)]
        frames = sorted(glob.glob(os.path.join(sdir, "*.jpg")))[:length]
        assert len(frames) == length, \
            f"source {sdir} has only {len(frames)} < {length} frames"
        vdir = os.path.join(work, f"vid{i:02d}", "img1")
        os.makedirs(vdir)
        for f in frames:
            os.symlink(f, os.path.join(vdir, os.path.basename(f)))
        h, w = cv2.imread(frames[0]).shape[:2]
        samples.append((f"vid{i:02d}", DataSample(f"vid{i:02d}", metadata={
            "number_of_frames": length, "fps": 30.0,
            "resolution": {"width": w, "height": h},
            "data_path": os.path.join(f"vid{i:02d}", "img1"),
        })))
    return samples


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/SYNMOT_HARD")
    ap.add_argument("--lengths",
                    default="150,120,90,75,60,45,30,20")
    ap.add_argument("--n-streams", type=int, default=4)
    ap.add_argument("--work", default="/tmp/ab_ms")
    ap.add_argument("--min-size", type=int, default=384,
                    help="INPUT.MIN_SIZE_TEST; keep at the video's native "
                         "min side so the tunnel upload (the dev-setup "
                         "bottleneck) stays small")
    args = ap.parse_args()
    lengths = [int(x) for x in args.lengths.split(",")]
    # arrival order must NOT be length-sorted or pack=0 degenerates to
    # the packed schedule (the whole point of the A/B)
    import random
    random.Random(7).shuffle(lengths)

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from siammot_tpu.configs.defaults import get_cfg
    from siammot_tpu.engine.multistream_inferencer import \
        do_inference_multistream
    from siammot_tpu.models.siammot import SiamMOT

    cfg = get_cfg()
    cfg.merge_from_list(["INPUT.MIN_SIZE_TEST", str(args.min_size)])
    cfg.freeze()
    model = SiamMOT(cfg)
    samples = build_truncated(args.root, lengths, args.work)
    size = -(-cfg.INPUT.MIN_SIZE_TEST // 32) * 32
    params = model.init_params(jax.random.PRNGKey(0), (size, size))

    configs = [
        ("pack=1 pipe=1", {"SIAMMOT_MS_PACK": "1", "SIAMMOT_MS_PIPELINE": "1"}),
        ("pack=0 pipe=1", {"SIAMMOT_MS_PACK": "0", "SIAMMOT_MS_PIPELINE": "1"}),
        ("pack=1 pipe=0", {"SIAMMOT_MS_PACK": "1", "SIAMMOT_MS_PIPELINE": "0"}),
        ("pack=0 pipe=0", {"SIAMMOT_MS_PACK": "0", "SIAMMOT_MS_PIPELINE": "0"}),
    ]

    def run():
        return do_inference_multistream(cfg, model, params, samples,
                                        dataset_root=args.work,
                                        n_streams=args.n_streams)

    def sched_steps(packed):
        order = sorted(lengths, reverse=True) if packed else lengths
        waves = [order[i:i + args.n_streams]
                 for i in range(0, len(order), args.n_streams)]
        return sum(max(wv) for wv in waves)

    print(f"arrival order {lengths}; scheduled steps: "
          f"packed={sched_steps(True)} unpacked={sched_steps(False)}",
          flush=True)

    # warm: compile the batched step once outside the timed runs
    os.environ.update(configs[0][1])
    ref = run()

    baseline = None
    for name, env in configs:
        os.environ.update(env)
        t0 = time.perf_counter()
        out = run()
        dt = time.perf_counter() - t0
        nf = sum(lengths)
        for sid in ref:
            a = [e.bbox for e in ref[sid].entities]
            b = [e.bbox for e in out[sid].entities]
            assert len(a) == len(b), (name, sid, len(a), len(b))
        if baseline is None:
            baseline = dt
        print(f"{name}: {dt:7.2f} s  ({nf/dt:6.1f} fps aggregate, "
              f"{dt/baseline:5.2f}x of pack=1 pipe=1)", flush=True)


if __name__ == "__main__":
    main()
