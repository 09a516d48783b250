"""EMM end-to-end coherence: train the head on a synthetic correlation
task and verify the inference decode recovers the target box.

This closes the loop between the training target assignment
(``emm_targets`` at upscale 1) and the inference decode
(``decode_response_fused`` at upscale 16): if their coordinate systems
disagreed, the head could minimize the loss yet decode garbage.
"""

import pytest as _pytest

pytestmark = _pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from siammot_tpu.configs.defaults import get_cfg
from siammot_tpu.models.emm import (EMMConfig, EMMHead,
                                    decode_response_fused, emm_loss,
                                    make_search_region, pool_search_region,
                                    pool_template, response_locations)

C = 128


@pytest.fixture(scope="module")
def task():
    """Two frames; a distinctive pattern at box A in frame 0 appears at a
    shifted box B in frame 1."""
    rng = np.random.RandomState(0)
    feat0 = rng.randn(1, 32, 48, C).astype(np.float32) * 0.1
    feat1 = rng.randn(1, 32, 48, C).astype(np.float32) * 0.1
    pattern = rng.randn(6, 6, C).astype(np.float32)

    # image-space boxes (stride 4): A at (40, 24)-(64, 48); B shifted
    # +8, +4 px — within EMM's trackable range (SR - T)/2 = half a
    # template extent at SEARCH_REGION=2
    feat0[0, 6:12, 10:16] += pattern
    feat1[0, 7:13, 12:18] += pattern
    box_a = np.array([[40., 24., 63., 47.]], np.float32)
    box_b = np.array([[48., 28., 71., 51.]], np.float32)
    feats = [jnp.asarray(np.concatenate([feat0, feat1]))]
    return feats, jnp.asarray(box_a), jnp.asarray(box_b)


def test_emm_trains_and_decodes(task):
    feats, box_a, box_b = task
    cfg = get_cfg()
    cfg.MODEL.TRACK_HEAD.POOLER_SCALES = (0.25,)
    cfg.freeze()
    ecfg = EMMConfig.from_cfg(cfg)

    head = EMMHead(C, use_pallas=False)
    img0 = jnp.zeros((1,), jnp.int32)
    img1 = jnp.ones((1,), jnp.int32)

    sr = make_search_region(box_a, ecfg)
    template = pool_template(feats, box_a, img0, ecfg)
    sr_feats = pool_search_region(feats, box_a, sr, img1, ecfg)
    locations = response_locations(sr, ecfg.sr_size, ecfg.resolution,
                                   ecfg.pad_pixels, 1)
    valid = jnp.ones((1,), bool)

    params = head.init(jax.random.PRNGKey(0), sr_feats, template)
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            cls_l, ctr_l, reg_l = head.apply(p, sr_feats, template)
            losses = emm_loss(cls_l, ctr_l, reg_l, locations, box_b, valid,
                              ecfg)
            return sum(losses.values()), losses
        (total, losses), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, total

    total0 = None
    for i in range(300):
        params, opt, total = step(params, opt)
        if total0 is None:
            total0 = float(total)
    assert float(total) < 0.5 * total0, (total0, float(total))

    # inference decode at x16 recovers the shifted box
    cls_l, ctr_l, reg_l = head.apply(params, sr_feats, template)
    out_box, score = decode_response_fused(cls_l, ctr_l, reg_l, sr, box_a,
                                           ecfg, 16)
    out = np.asarray(out_box[0])
    tgt = np.asarray(box_b[0])
    center_err = np.abs((out[:2] + out[2:]) / 2 - (tgt[:2] + tgt[2:]) / 2)
    assert center_err.max() < 6.0, (out, tgt)
    assert float(score[0]) > 0.6
