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


def _small_cfg():
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
    # random-weight box heads score everything ~0.5 (2-class softmax of
    # near-zero logits), which can never clear the production 0.6 start
    # threshold — lower the solver gates so tracks actually form and the
    # stream-identity checks exercise id bookkeeping, not empty outputs
    cfg.MODEL.TRACK_HEAD.START_TRACK_THRESH = 0.45
    cfg.MODEL.TRACK_HEAD.TRACK_THRESH = 0.3
    cfg.MODEL.TRACK_HEAD.RESUME_TRACK_THRESH = 0.3
    return cfg


def _entity_key(e):
    return (e.blob["frame_idx"], e.id, tuple(np.round(e.bbox, 2)))


def test_multistream_matches_sequential(tmp_path):
    cfg = _small_cfg()
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
        a = sorted(_entity_key(e) for e in seq.entities)
        b = sorted(_entity_key(e) for e in multi[sid].entities)
        assert a == b, sid


def _public_detections(sample, seed):
    """Fake per-frame public detections (MOT17 given-detection mode)."""
    from siammot_tpu.data.motion_dataset import AnnoEntity

    rng = np.random.RandomState(seed)
    pub = DataSample(sample.id, metadata=dict(sample.metadata))
    for f in range(len(sample)):
        for _ in range(2):
            e = AnnoEntity(time=f * 1000.0 / sample.fps, id=-1)
            x, y = rng.uniform(4, 40), rng.uniform(4, 20)
            e.bbox = [x, y, rng.uniform(10, 30), rng.uniform(10, 30)]
            e.confidence = float(rng.uniform(0.5, 1.0))
            e.labels = {"person": e.confidence}
            e.blob["frame_idx"] = f
            pub.add_entity(e)
    return pub


def test_multistream_given_detections_matches_sequential(tmp_path):
    cfg = _small_cfg()
    cfg.INFERENCE.USE_GIVEN_DETECTIONS = True
    cfg.freeze()
    model = SiamMOT(cfg)
    params = model.init_params(jax.random.PRNGKey(0), (64, 96))

    samples = [("va", _video(tmp_path, "va", 4, 1)),
               ("vb", _video(tmp_path, "vb", 3, 2)),
               ("vc", _video(tmp_path, "vc", 5, 3))]
    pubs = {sid: _public_detections(s, 10 + i)
            for i, (sid, s) in enumerate(samples)}

    multi = do_inference_multistream(cfg, model, params, samples,
                                     n_streams=2, given_detections=pubs)
    for sid, sample in samples:
        seq = do_inference(cfg, model, params, sample,
                           given_detection=pubs[sid])
        a = sorted(_entity_key(e) for e in seq.entities)
        b = sorted(_entity_key(e) for e in multi[sid].entities)
        assert a == b, sid
    # given detections actually flowed: some tracks must exist
    assert any(e.id >= 0 for r in multi.values() for e in r.entities)


def test_dataset_inference_n_streams_matches_sequential(tmp_path):
    """The CLI-visible path: DatasetInference(n_streams=2) produces the
    same per-video caches and CLEAR-MOT input as the sequential engine."""
    from siammot_tpu.engine.inferencer import DatasetInference

    cfg = _small_cfg()
    cfg.freeze()
    model = SiamMOT(cfg)
    params = model.init_params(jax.random.PRNGKey(0), (64, 96))

    samples = [("va", _video(tmp_path, "va", 4, 1)),
               ("vb", _video(tmp_path, "vb", 3, 2)),
               ("vc", _video(tmp_path, "vc", 5, 3))]
    gt = {sid: _public_detections(s, 20 + i)
          for i, (sid, s) in enumerate(samples)}

    # ground truth so eval_clears_mot has something to chew on
    for sid, s in samples:
        for e in gt[sid].entities:
            e.id = abs(e.id)
            s.add_entity(e)

    out_seq = tmp_path / "seq"
    out_ms = tmp_path / "ms"
    out_seq.mkdir()
    out_ms.mkdir()
    DatasetInference(cfg, model, params, samples, str(out_seq))()
    DatasetInference(cfg, model, params, samples, str(out_ms),
                     n_streams=2)()

    for sid, _ in samples:
        a = DataSample.load(str(out_seq / f"{sid}.json"))
        b = DataSample.load(str(out_ms / f"{sid}.json"))
        ka = sorted(_entity_key(e) for e in a.entities)
        kb = sorted(_entity_key(e) for e in b.entities)
        assert ka == kb, sid

