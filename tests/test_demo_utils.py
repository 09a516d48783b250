"""Demo pipeline utilities: vis generator, writer, video iterator."""

import pytest
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from demos.utils.vis_generator import VisGenerator  # noqa: E402
from demos.utils.vis_writer import VisWriter  # noqa: E402
from demos.video_iterator import build_video_iterator  # noqa: E402


def test_vis_generator_draws_tracks_only():
    gen = VisGenerator()
    frame = np.zeros((100, 160, 3), np.uint8)
    boxes = np.array([[10, 10, 50, 60], [80, 20, 120, 70]], np.float32)
    ids = np.array([3, -1])     # second row is a raw detection: not drawn
    labels = np.array([1, 1])
    out = gen.frame_vis_generator(frame.copy(), boxes, ids, labels)
    assert out.shape == frame.shape
    assert out[10:60, 10:50].sum() > 0          # track drawn
    assert out[35:60, 85:115].sum() == 0        # detection interior untouched


def test_vis_generator_rescales():
    gen = VisGenerator(vis_height=50)
    frame = np.zeros((100, 160, 3), np.uint8)
    out = gen.frame_vis_generator(frame, np.zeros((0, 4), np.float32),
                                  np.zeros(0, int), np.zeros(0, int))
    assert out.shape[0] == 50 and out.shape[1] == 80


def test_vis_writer_frames_and_video(tmp_path):
    w = VisWriter(dump_video=False, out_path=str(tmp_path), file_name="clip")
    w.dump_artifacts(np.zeros((40, 60, 3), np.uint8), 0)
    w.dump_artifacts(np.zeros((40, 60, 3), np.uint8), 1)
    assert len(os.listdir(tmp_path / "clip_frames")) == 2

    wv = VisWriter(dump_video=True, out_path=str(tmp_path), file_name="c.mp4")
    for i in range(3):
        wv.dump_artifacts(np.zeros((40, 60, 3), np.uint8), i)
    wv.close()
    assert os.path.getsize(tmp_path / "c.mp4") > 0


def test_video_iterator_folder(tmp_path):
    for i in range(3):
        cv2.imwrite(str(tmp_path / f"{i:03d}.jpg"),
                    np.full((20, 30, 3), 50 * i, np.uint8))
    it = build_video_iterator(str(tmp_path))
    assert it.frame_count == 3
    frames = list(it)
    assert frames[0][0] == 0 and frames[2][0] == 2
    assert frames[1][1].shape == (20, 30, 3)


def test_video_iterator_file(tmp_path):
    path = str(tmp_path / "v.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (32, 24))
    for i in range(4):
        vw.write(np.full((24, 32, 3), 60 * i, np.uint8))
    vw.release()
    it = build_video_iterator(path)
    frames = list(it)
    assert len(frames) == 4
    assert frames[0][1].shape == (24, 32, 3)


@pytest.mark.slow
def test_demo_inference_restores_orbax_checkpoint(tmp_path):
    """Regression: pointing --model-file at a single Orbax checkpoint dir
    (run_dir/model_NNN) silently fell back to random weights (the loader
    scanned *inside* it for model_* children)."""
    import jax
    import yaml

    from demos.demo_inference import DemoInference
    from siammot_tpu.configs.defaults import get_cfg
    from siammot_tpu.models.siammot import SiamMOT
    from siammot_tpu.utils.checkpoint import Checkpointer

    cfg_file = tmp_path / "tiny.yaml"
    overrides = {"INPUT": {"MIN_SIZE_TEST": 64, "MAX_SIZE_TEST": 96},
                 "TPU": {"MAX_TRACKS": 4}}
    cfg_file.write_text(yaml.safe_dump(overrides))

    cfg = get_cfg()
    cfg.merge_from_file(str(cfg_file))
    cfg.freeze()
    model = SiamMOT(cfg)
    params = model.init_params(jax.random.PRNGKey(1), (64, 64))

    run_dir = tmp_path / "run"
    Checkpointer(str(run_dir)).save(3, params, opt_state=None)

    for target in (str(run_dir / "model_0000003"), str(run_dir)):
        demo = DemoInference(model_path=target, config_file=str(cfg_file))
        a = jax.tree.leaves(params)
        b = jax.tree.leaves(demo.params)
        assert all(np.array_equal(np.asarray(x), np.asarray(y))
                   for x, y in zip(a, b)), target

    try:
        DemoInference(model_path=str(tmp_path / "nope"),
                      config_file=str(cfg_file))
        raise AssertionError("missing checkpoint must raise")
    except FileNotFoundError:
        pass


def test_rotation_probe_and_application(tmp_path):
    """Rotation semantics of the reference probe (video_iterator.py:79-86):
    a container rotate tag of R degrees counter-rotates each frame with
    np.rot90(k=(-(R//90)) % 4); absent metadata means no rotation."""
    from demos.video_iterator import (Cv2VideoIterator, apply_rotation,
                                      check_rotation)

    # plain mp4: no rotation metadata -> probe returns 0
    path = str(tmp_path / "v.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (32, 24))
    marker = np.zeros((24, 32, 3), np.uint8)
    marker[0, 0] = 255  # top-left beacon
    for _ in range(2):
        vw.write(marker)
    vw.release()
    assert check_rotation(path) == 0

    # the counter-rotation map, checked against np.rot90 ground truth
    frame = np.arange(24 * 32 * 3, dtype=np.uint8).reshape(24, 32, 3)
    assert np.array_equal(apply_rotation(frame, 0), frame)
    for rot in (90, 180, 270):
        out = apply_rotation(frame, rot)
        expect = np.rot90(frame, k=(-(rot // 90)) % 4)
        assert np.array_equal(out, expect), rot
        assert out.shape[:2] == ((32, 24) if rot in (90, 270) else (24, 32))

    # an iterator over a tagged video honors the probe (probe monkeypatched:
    # cv2.VideoWriter cannot author display-matrix metadata)
    import demos.video_iterator as vi
    orig = vi.check_rotation
    vi.check_rotation = lambda p: 90
    try:
        it = Cv2VideoIterator(path)
        _, f0 = next(iter(it))
        assert f0.shape[:2] == (32, 24)  # portrait after counter-rotation
    finally:
        vi.check_rotation = orig
