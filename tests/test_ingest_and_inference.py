"""End-to-end: MOT ingestion -> dataset load -> DatasetInference -> eval.

Covers the reference flows ``data/ingestion/ingest_mot.py`` +
``tools/test_net.py`` on a tiny synthetic sequence with a random-weight
model (box outputs are meaningless; the plumbing — per-video caching,
track post-filter, CLEAR-MOT accumulation — is what is under test).
"""

import os

import cv2
import jax
import numpy as np
import pytest

from siammot_tpu.configs.defaults import get_cfg
from siammot_tpu.data.ingestion.ingest_mot import ingest_mot
from siammot_tpu.data.motion_dataset import MotionDataset
from siammot_tpu.engine.inferencer import DatasetInference
from siammot_tpu.models.siammot import SiamMOT


def _make_mot_root(tmp_path, n_frames=4, w=96, h=64):
    seq = tmp_path / "train" / "SYN-01"
    img = seq / "img1"
    img.mkdir(parents=True)
    (seq / "gt").mkdir()
    (tmp_path / "test").mkdir()
    with open(seq / "seqinfo.ini", "w") as f:
        f.write(f"[Sequence]\nname=SYN-01\nimDir=img1\nframeRate=10\n"
                f"seqLength={n_frames}\nimWidth={w}\nimHeight={h}\n"
                f"imExt=.jpg\n")
    rng = np.random.RandomState(0)
    for i in range(n_frames):
        arr = rng.randint(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(str(img / f"{i + 1:06d}.jpg"), arr)
    rows = []
    for i in range(n_frames):
        rows.append(f"{i + 1},1,{10 + 2 * i},12,20,30,1,1,1.0")
        rows.append(f"{i + 1},2,{50 + i},20,18,28,1,1,0.9")
    (seq / "gt" / "gt.txt").write_text("\n".join(rows))
    return str(tmp_path)


def test_ingest_mot(tmp_path):
    root = _make_mot_root(tmp_path)
    ingest_mot(root)
    ds = MotionDataset("anno.json", root_path=root)
    assert len(ds) == 1
    split = ds.get_split("train")
    assert len(split) == 1
    sid, sample = split[0]
    assert sid == "SYN-01"
    assert sample.width == 96 and sample.height == 64
    assert len(sample.get_entities_for_frame_num(0)) == 2
    e = sample.get_entities_for_frame_num(1)[0]
    assert e.bbox[0] == 12 and "person" in e.labels


@pytest.mark.slow
def test_dataset_inference_end_to_end(tmp_path):
    root = _make_mot_root(tmp_path)
    ingest_mot(root)
    ds = MotionDataset("anno.json", root_path=root)

    cfg = get_cfg()
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 96
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 16
    cfg.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 16
    cfg.TPU.MAX_TRACKS = 4
    cfg.freeze()
    model = SiamMOT(cfg)
    params = model.init_params(jax.random.PRNGKey(0), (64, 96))

    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)
    inference = DatasetInference(cfg, model, params, ds.get_split("train"),
                                 out_dir, dataset_root=root)
    accs, summary = inference()
    # per-video JSON cache written (doubles as the regression harness)
    assert os.path.exists(os.path.join(out_dir, "SYN-01.json"))
    assert "mota" in summary.lower() or "MOTA" in summary
    # idempotent second run hits the cache
    inference2 = DatasetInference(cfg, model, params, ds.get_split("train"),
                                  out_dir, dataset_root=root)
    accs2, summary2 = inference2()
    assert summary2 == summary


def test_ingest_mot15_without_seqinfo(tmp_path):
    """MOT15-style sequences ship no seqinfo.ini: fps defaults to 30 and
    num_frames/resolution are probed from the images (reference
    ingest_mot.py:137-146)."""
    seq = tmp_path / "train" / "ADL-Rundle-6"
    img = seq / "img1"
    img.mkdir(parents=True)
    (seq / "gt").mkdir()
    (tmp_path / "test").mkdir()
    n_frames, w, h = 3, 80, 48
    for i in range(n_frames):
        cv2.imwrite(str(img / f"{i + 1:06d}.jpg"),
                    np.full((h, w, 3), 100, np.uint8))
    rows = [f"{i + 1},1,5,6,20,30,1,1,1.0" for i in range(n_frames)]
    (seq / "gt" / "gt.txt").write_text("\n".join(rows))

    ingest_mot(str(tmp_path))
    ds = MotionDataset("anno.json", root_path=str(tmp_path))
    sid, sample = ds.get_split("train")[0]
    assert sid == "ADL-Rundle-6"
    assert sample.width == w and sample.height == h
    assert sample.metadata["fps"] == 30.0
    assert sample.metadata["number_of_frames"] == n_frames
    # entity time uses the probed fps
    e = sample.get_entities_for_frame_num(1)[0]
    assert abs(e.time - 1000.0 / 30.0) < 1e-6
