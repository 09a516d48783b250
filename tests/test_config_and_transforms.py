"""Config node semantics, eval transform geometry, misc utils."""

import numpy as np
import pytest

from siammot_tpu.configs.defaults import get_cfg
from siammot_tpu.configs.node import CfgNode
from siammot_tpu.data.transforms import EvalTransform, resize_dims
from siammot_tpu.utils.model_name import get_model_name


def test_cfg_merge_and_freeze(tmp_path):
    cfg = get_cfg()
    p = tmp_path / "o.yaml"
    p.write_text("INPUT:\n  MIN_SIZE_TRAIN: (640, 800)\n  AMODAL: True\n"
                 "MODEL:\n  TRACK_HEAD:\n    SEARCH_REGION: 3.0\n")
    cfg.merge_from_file(str(p))
    assert cfg.INPUT.MIN_SIZE_TRAIN == (640, 800)
    assert cfg.INPUT.AMODAL is True
    assert cfg.MODEL.TRACK_HEAD.SEARCH_REGION == 3.0
    # untouched keys survive the merge
    assert cfg.MODEL.TRACK_HEAD.POOLER_RESOLUTION == 15

    cfg.merge_from_list(["SOLVER.BASE_LR", "0.01", "DATASETS.TRAIN",
                         "('MOT17',)"])
    assert cfg.SOLVER.BASE_LR == 0.01
    assert cfg.DATASETS.TRAIN == ("MOT17",)

    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.SOLVER.BASE_LR = 1.0
    clone = cfg.clone()
    clone.defrost()
    clone.SOLVER.BASE_LR = 2.0
    assert cfg.SOLVER.BASE_LR == 0.01


def test_resize_dims_maskrcnn_semantics():
    # short side -> min unless long side would exceed max
    assert resize_dims(1280, 720, 800, 1333) == (1333, 750)
    assert resize_dims(640, 480, 800, 1333) == (1066, 800)
    assert resize_dims(100, 100, 100, 200) == (100, 100)


def test_eval_transform_normalizes_and_pads():
    cfg = get_cfg()
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 96
    tr = EvalTransform(cfg)
    frame = np.full((50, 70, 3), 128, np.uint8)
    x, (w, h) = tr(frame)
    assert x.shape[0] == 1 and x.shape[3] == 3
    assert x.shape[1] % 32 == 0 and x.shape[2] % 32 == 0
    # device-normalize default: raw uint8 through to the device
    assert x.dtype == np.uint8 and int(x[0, 0, 0, 0]) == 128

    cfg2 = get_cfg()
    cfg2.INPUT.MIN_SIZE_TEST = 64
    cfg2.INPUT.MAX_SIZE_TEST = 96
    cfg2.TPU.DEVICE_NORMALIZE = False
    x, _ = EvalTransform(cfg2)(frame)
    # 128/255 normalized by imagenet stats (host mode)
    expect = (128 / 255.0 - 0.485) / 0.229
    assert abs(float(x[0, 0, 0, 0]) - expect) < 1e-5


def test_model_name():
    cfg = get_cfg()
    cfg.DATASETS.TRAIN = ("MOT17",)
    assert get_model_name(cfg, "v1") == "DLA34_box_EMM_MOT17_v1"


def test_all_shipped_configs_merge():
    """Every yaml under configs/ and demos/configs merges into the
    defaults, freezes, and names a buildable backbone."""
    import os

    from siammot_tpu.models.dla import DLA_VARIANTS
    from siammot_tpu.models.resnet import RESNET_VARIANTS

    root = os.path.join(os.path.dirname(__file__), "..")
    found = []
    for sub in ("configs", os.path.join("demos", "configs")):
        for dirpath, _, files in os.walk(os.path.join(root, sub)):
            found += [os.path.join(dirpath, f) for f in files
                      if f.endswith(".yaml")]
    assert len(found) >= 6
    for path in found:
        cfg = get_cfg()
        cfg.merge_from_file(path)
        cfg.freeze()
        body = cfg.MODEL.BACKBONE.CONV_BODY
        assert body in DLA_VARIANTS or body in RESNET_VARIANTS, path


def test_dla_stage_out_channels_validated():
    """MODEL.DLA.DLA_STAGE*_OUT_CHANNELS must match the variant's stage
    widths (they feed the FPN laterals in the reference,
    backbone_ext.py:18-30); a wrong override fails loudly instead of
    silently no-oping."""
    from siammot_tpu.models.siammot import SiamMOT

    cfg = get_cfg()
    cfg.MODEL.DLA.DLA_STAGE3_OUT_CHANNELS = 999
    cfg.freeze()
    with pytest.raises(ValueError, match="DLA_STAGE"):
        SiamMOT(cfg)

    # the defaults match DLA-34 and construct fine
    cfg2 = get_cfg()
    cfg2.freeze()
    SiamMOT(cfg2)
