"""Composed demo pipeline end-to-end (reference ``demos/demo.py:23-47``).

Drives the ACTUAL CLI main path — build_video_iterator → DemoInference →
VisGenerator → VisWriter — on a synthesized input, asserting the output
video exists, has the right frame count/size, and that track overlays
were actually drawn.  Includes a rotation-metadata case (the reference
probes the container rotate tag and counter-rotates frames upright,
``video_iterator.py:79-86``).
"""

import os
import sys

import cv2
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from siammot_tpu.configs.defaults import get_cfg


def _tiny_config(tmp_path):
    """Small demo config: fast CPU compile, and thresholds low enough that
    random-weight detections start tracks (so overlays are drawn)."""
    cfg = get_cfg()
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 96
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 16
    cfg.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 16
    cfg.TPU.MAX_TRACKS = 4
    cfg.MODEL.TRACK_HEAD.START_TRACK_THRESH = 0.01
    cfg.MODEL.TRACK_HEAD.TRACK_THRESH = 0.005
    path = tmp_path / "demo_tiny.yaml"
    path.write_text(cfg.dump())
    return str(path)


def _frames(n, h, w, seed=0):
    rng = np.random.RandomState(seed)
    base = (rng.rand(h, w, 3) * 120).astype(np.uint8)
    out = []
    for t in range(n):
        f = base.copy()
        x = 10 + 3 * t
        f[20:44, x:x + 18] = (220, 40, 40)
        out.append(f)
    return out


def _run_demo(argv):
    import demos.demo as demo_main
    old = sys.argv
    sys.argv = ["demo.py"] + argv
    try:
        demo_main.main()
    finally:
        sys.argv = old


def test_demo_image_folder_end_to_end(tmp_path):
    vid = tmp_path / "clip"
    vid.mkdir()
    frames = _frames(6, 64, 96)
    for i, f in enumerate(frames):
        cv2.imwrite(str(vid / f"{i:04d}.jpg"), f[:, :, ::-1])
    out_dir = tmp_path / "out"

    _run_demo(["--demo-video", str(vid), "--track-class", "person",
               "--config-file", _tiny_config(tmp_path),
               "--dump-video", "True", "--output-path", str(out_dir)])

    out_mp4 = out_dir / "clip.mp4"
    assert out_mp4.exists(), list(out_dir.iterdir())
    cap = cv2.VideoCapture(str(out_mp4))
    assert cap.isOpened()
    n, drawn = 0, False
    while True:
        ok, got = cap.read()
        if not ok:
            break
        # overlays change pixels vs the (recompressed) input frame
        src = frames[n]
        if np.abs(got.astype(int)[..., ::-1] - src.astype(int)).max() > 60:
            drawn = True
        assert got.shape == (64, 96, 3)
        n += 1
    cap.release()
    assert n == 6
    assert drawn, "no track overlays were drawn on any frame"


def test_demo_video_with_rotation_metadata(tmp_path, monkeypatch):
    """A 90-degree-tagged portrait video must be counter-rotated upright
    before tracking and the output written in upright orientation.  cv2's
    VideoWriter cannot author display-matrix tags, so the container probe
    is monkeypatched — the full rotation DATA path (apply_rotation inside
    the iterator, demo loop, writer) runs for real."""
    import demos.video_iterator as vi

    mp4 = tmp_path / "portrait.mp4"
    wr = cv2.VideoWriter(str(mp4), cv2.VideoWriter_fourcc(*"mp4v"), 10.0,
                         (64, 96))  # portrait: w=64, h=96
    for f in _frames(5, 96, 64, seed=3):
        wr.write(f[:, :, ::-1])
    wr.release()

    assert vi.check_rotation(str(mp4)) == 0  # no tag authored
    monkeypatch.setattr(vi, "check_rotation", lambda path: 90)

    it = vi.build_video_iterator(str(mp4))
    first = next(iter(it))[1]
    assert first.shape == (64, 96, 3), "frame not counter-rotated upright"

    out_dir = tmp_path / "out_rot"
    _run_demo(["--demo-video", str(mp4), "--track-class", "person",
               "--config-file", _tiny_config(tmp_path),
               "--dump-video", "True", "--output-path", str(out_dir)])
    out_mp4 = out_dir / "portrait.mp4"
    assert out_mp4.exists()
    cap = cv2.VideoCapture(str(out_mp4))
    ok, got = cap.read()
    n = 1
    while cap.read()[0]:
        n += 1
    cap.release()
    assert ok and got.shape == (64, 96, 3)   # upright landscape output
    assert n == 5
