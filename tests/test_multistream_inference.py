"""Multi-video batched inference == sequential per-video inference."""

import pytest as _pytest

pytestmark = _pytest.mark.slow

import os

import cv2
import jax
import numpy as np

from siammot_tpu.configs.defaults import get_cfg
from siammot_tpu.data.motion_dataset import DataSample
from siammot_tpu.engine.inferencer import do_inference
from siammot_tpu.engine.multistream_inferencer import \
    do_inference_multistream
from siammot_tpu.models.siammot import SiamMOT


def _video(tmp_path, name, n_frames, seed):
    d = tmp_path / name
    d.mkdir()
    rng = np.random.RandomState(seed)
    for i in range(n_frames):
        cv2.imwrite(str(d / f"{i:04d}.jpg"),
                    rng.randint(0, 255, (64, 96, 3), np.uint8))
    return DataSample(name, metadata=dict(
        fps=10.0, number_of_frames=n_frames, data_path=str(d),
        resolution={"width": 96, "height": 64}))


def test_multistream_matches_sequential(tmp_path):
    cfg = get_cfg()
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 96
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 16
    cfg.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 16
    cfg.TPU.MAX_TRACKS = 4
    # bitwise stream-bookkeeping check: bf16 heads make vmapped-vs-
    # sequential conv batching differ at ~1e-2 px, which is not what this
    # test is about
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.freeze()
    model = SiamMOT(cfg)
    params = model.init_params(jax.random.PRNGKey(0), (64, 96))

    samples = [("va", _video(tmp_path, "va", 3, 1)),
               ("vb", _video(tmp_path, "vb", 5, 2)),
               ("vc", _video(tmp_path, "vc", 4, 3))]

    multi = do_inference_multistream(cfg, model, params, samples,
                                     n_streams=2)
    assert set(multi) == {"va", "vb", "vc"}

    for sid, sample in samples:
        seq = do_inference(cfg, model, params, sample)
        a = sorted(((e.blob["frame_idx"], e.id, tuple(np.round(e.bbox, 2)))
                    for e in seq.entities))
        b = sorted(((e.blob["frame_idx"], e.id, tuple(np.round(e.bbox, 2)))
                    for e in multi[sid].entities))
        assert a == b, sid
