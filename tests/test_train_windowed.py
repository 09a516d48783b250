"""Windowed-pooling training path vs the exact gather pooler.

``TPU.TRAIN_POOLER_WINDOWED`` swaps all three training pool sites (box
head, EMM template, EMM search region) onto the windowed-separable
formulation (Pallas on TPU, XLA elsewhere).  For ROIs whose sample span
fits the static windows the two are the same math, so losses AND
parameter gradients must match.
"""

import pytest as _pytest

pytestmark = _pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from siammot_tpu.configs.defaults import get_cfg
from siammot_tpu.core.structures import Boxes
from siammot_tpu.models.siammot import SiamMOT


def _cfg(windowed: bool):
    cfg = get_cfg()
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOP_N_TRAIN = 32
    cfg.MODEL.RPN.FPN_POST_NMS_TOP_N_TRAIN = 32
    cfg.MODEL.ROI_BOX_HEAD.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.TRACK_HEAD.PROPOSAL_PER_IMAGE = 8
    cfg.TPU.MAX_GT = 4
    cfg.TPU.TRAIN_POOLER_WINDOWED = windowed
    cfg.freeze()
    return cfg


def _gt(b, g=4):
    rng = np.random.RandomState(3)
    boxes = np.zeros((b, g, 4), np.float32)
    boxes[..., 0] = rng.uniform(8, 60, (b, g))
    boxes[..., 1] = rng.uniform(8, 40, (b, g))
    boxes[..., 2] = boxes[..., 0] + rng.uniform(12, 40, (b, g))
    boxes[..., 3] = boxes[..., 1] + rng.uniform(12, 40, (b, g))
    ids = np.tile(np.arange(g, dtype=np.int32)[None], (b, 1))
    ids += (np.arange(b, dtype=np.int32) // 2 * g)[:, None]
    return Boxes(boxes=jnp.asarray(boxes),
                 scores=jnp.ones((b, g)),
                 ids=jnp.asarray(ids),
                 labels=jnp.ones((b, g), jnp.int32),
                 valid=jnp.ones((b, g), bool))


def test_windowed_training_matches_gather():
    h, w, b = 96, 128, 2
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    gt = _gt(b)

    outs = []
    for windowed in (False, True):
        cfg = _cfg(windowed)
        model = SiamMOT(cfg)
        params = model.init_params(jax.random.PRNGKey(0), (h, w))

        def total(p):
            losses = model.forward_train(p, jax.random.PRNGKey(7), images,
                                         gt, image_size=(w, h))
            return sum(jax.tree.leaves(losses)), losses

        (val, losses), grads = jax.value_and_grad(total, has_aux=True)(params)
        outs.append((float(val), losses, grads))

    val_g, losses_g, grads_g = outs[0]
    val_w, losses_w, grads_w = outs[1]
    assert np.isfinite(val_g) and np.isfinite(val_w)
    np.testing.assert_allclose(val_w, val_g, rtol=2e-3)
    for k in losses_g:
        np.testing.assert_allclose(np.asarray(losses_w[k]),
                                   np.asarray(losses_g[k]), rtol=5e-3,
                                   atol=1e-4, err_msg=k)
    leaves_g = jax.tree.leaves(grads_g)
    leaves_w = jax.tree.leaves(grads_w)
    # gradients agree in direction and scale
    num = sum(float(jnp.vdot(a, b)) for a, b in zip(leaves_g, leaves_w))
    den = np.sqrt(sum(float(jnp.vdot(a, a)) for a in leaves_g)
                  * sum(float(jnp.vdot(b, b)) for b in leaves_w))
    assert num / max(den, 1e-12) > 0.999
