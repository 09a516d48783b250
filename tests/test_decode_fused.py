"""Fused upsample+decode vs the reference-shaped unfused pipeline."""

import jax.numpy as jnp
import numpy as np
import pytest

from siammot_tpu.configs.defaults import get_cfg
from siammot_tpu.models.emm import (EMMConfig, decode_response,
                                    decode_response_fused,
                                    response_locations)
from siammot_tpu.ops.upsample import upsample_bicubic


@pytest.mark.parametrize("use_centerness", [True, False])
def test_fused_decode_matches_unfused(rng, use_centerness):
    cfg = get_cfg()
    cfg.MODEL.TRACK_HEAD.EMM.USE_CENTERNESS = use_centerness
    ecfg = EMMConfig.from_cfg(cfg)
    k, s = 5, ecfg.response_size          # 16
    up = 16

    cls_l = jnp.asarray(rng.randn(k, s, s, 2).astype(np.float32))
    ctr_l = jnp.asarray(rng.randn(k, s, s, 1).astype(np.float32))
    reg_l = jnp.asarray(np.abs(rng.randn(k, s, s, 4)).astype(np.float32) * 20)

    boxes = []
    for _ in range(k):
        x1, y1 = rng.uniform(0, 200, 2)
        w, h = rng.uniform(30, 120, 2)
        boxes.append([x1, y1, x1 + w, y1 + h])
    tmpl = jnp.asarray(np.array(boxes, np.float32))
    sr = (tmpl + ecfg.pad_pixels)
    ext = (sr[:, 2:] - sr[:, :2]) / 2.0
    sr = jnp.concatenate([sr[:, :2] - ext, sr[:, 2:] + ext], axis=1)

    # unfused (the shape of the reference pipeline)
    cls_u = upsample_bicubic(cls_l, up)
    ctr_u = upsample_bicubic(ctr_l, up)
    reg_u = upsample_bicubic(reg_l, up)
    loc = response_locations(sr, ecfg.sr_size, ecfg.resolution,
                             ecfg.pad_pixels, up)
    ref_boxes, ref_scores = decode_response(cls_u, ctr_u, reg_u, loc, tmpl,
                                            ecfg)

    out_boxes, out_scores = decode_response_fused(cls_l, ctr_l, reg_l, sr,
                                                  tmpl, ecfg, up)
    np.testing.assert_allclose(np.asarray(out_boxes), np.asarray(ref_boxes),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out_scores),
                               np.asarray(ref_scores), rtol=1e-4, atol=1e-5)
