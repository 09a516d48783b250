"""Gradient accumulation (SOLVER.ACCUMULATION_STEPS).

The reference trains its headline models at 16 clips per global batch
over 8 GPUs (``/root/reference/configs/dla/DLA_34_FPN_EMM_MOT17.yaml``);
on fewer chips the same batch runs as N sequential microbatches with
averaged gradients and ONE optimizer/LR step per batch
(``parallel/mesh.build_train_step(accum_steps=N)``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from siammot_tpu.core.structures import Boxes
from siammot_tpu.models.siammot import SiamMOT
from siammot_tpu.parallel.mesh import (build_train_step, make_mesh,
                                       make_optimizer)


def _setup():
    import sys
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from __graft_entry__ import _small_cfg

    cfg = _small_cfg()
    cfg.freeze()
    model = SiamMOT(cfg)
    h, w = 96, 128
    params = model.init_params(jax.random.PRNGKey(0), (h, w))
    tx = make_optimizer(cfg, params)
    return cfg, model, params, tx, (h, w)


def _batch(b, h, w, g=4, seed=0):
    rng = np.random.RandomState(seed)
    images = rng.rand(b, h, w, 3).astype(np.float32)
    boxes = np.zeros((b, g, 4), np.float32)
    boxes[..., 0] = rng.uniform(0, w - 40, (b, g))
    boxes[..., 1] = rng.uniform(0, h - 40, (b, g))
    boxes[..., 2] = boxes[..., 0] + rng.uniform(8, 40, (b, g))
    boxes[..., 3] = boxes[..., 1] + rng.uniform(8, 40, (b, g))
    ids = np.tile(np.arange(g, dtype=np.int32)[None], (b, 1))
    ids += (np.arange(b, dtype=np.int32) // 2 * g)[:, None]
    gt = Boxes(boxes=jnp.asarray(boxes),
               scores=jnp.ones((b, g), jnp.float32),
               ids=jnp.asarray(ids),
               labels=jnp.ones((b, g), jnp.int32),
               valid=jnp.ones((b, g), bool))
    sizes = np.tile(np.asarray([[w, h]], np.int32), (b, 1))
    return images, gt, sizes


@pytest.mark.slow
def test_accum_matches_explicit_microbatch_average():
    """accum=2 over an 8-image batch == the hand-computed average of the
    two 4-image microbatch updates (same per-micro rng fold), applied as
    one optimizer step.

    Slow: compiles an unjitted value_and_grad chain plus the scanned
    train step on the CPU backend (~10 min on one core).
    """
    cfg, model, params, tx, (h, w) = _setup()
    mesh = make_mesh(1)
    images, gt, sizes = _batch(8, h, w)
    rng = jax.random.PRNGKey(17)

    # hand-roll FIRST (the jitted step donates its params buffer): grads
    # of each 4-image microbatch with fold_in(rng', i), where
    # rng' = fold_in(rng, axis_index=0) matches the device fold
    dev_rng = jax.random.fold_in(rng, 0)

    def loss_fn(p, mb_rng, imgs, g_, s_):
        losses = model.forward_train(p, mb_rng, imgs, g_, frame_sizes=s_)
        return sum(losses.values()), losses

    grads_sum = None
    totals = []
    for i in range(2):
        sl = slice(4 * i, 4 * (i + 1))
        mb_gt = jax.tree.map(lambda x: x[sl], gt)
        (t, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, jax.random.fold_in(dev_rng, i), images[sl], mb_gt,
            sizes[sl])
        totals.append(float(t))
        grads_sum = g if grads_sum is None else jax.tree.map(
            jnp.add, grads_sum, g)
    grads = jax.tree.map(lambda x: x / 2, grads_sum)

    import optax
    updates, _ = tx.update(grads, tx.init(params), params)
    p_ref = optax.apply_updates(params, updates)

    step2 = build_train_step(model, tx, mesh, accum_steps=2)
    p2, o2, m2 = step2(jax.tree.map(jnp.array, params), tx.init(params),
                       images, gt, sizes, rng)

    np.testing.assert_allclose(float(m2["loss"]), np.mean(totals),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)


@pytest.mark.slow
def test_accum_one_optimizer_step_per_batch():
    """The LR schedule / momentum must advance once per global batch, not
    once per microbatch.  Slow: cold accum=4 scan compile on CPU."""
    cfg, model, params, tx, (h, w) = _setup()
    mesh = make_mesh(1)
    images, gt, sizes = _batch(8, h, w)
    step = build_train_step(model, tx, mesh, accum_steps=4)
    opt_state = tx.init(params)
    p, o, m = step(jax.device_put(params), opt_state, images, gt, sizes,
                   jax.random.PRNGKey(3))
    assert np.isfinite(float(m["loss"]))
    counts = [int(x) for x in jax.tree.leaves(o)
              if hasattr(x, "dtype") and np.issubdtype(x.dtype, np.integer)
              and np.ndim(x) == 0]
    assert all(c == 1 for c in counts), counts


def test_accum_rejects_pair_splitting():
    cfg, model, params, tx, (h, w) = _setup()
    mesh = make_mesh(1)
    with pytest.raises(AssertionError):
        images, gt, sizes = _batch(6, h, w)
        build_train_step(model, tx, mesh, accum_steps=4)(
            jax.device_put(params), tx.init(params), images, gt, sizes,
            jax.random.PRNGKey(0))