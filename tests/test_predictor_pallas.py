"""Masked Pallas EMM-predictor kernel vs the XLA module path.

The kernel replaces the full conv-tower/GN/head stack per live slot;
the refactored explicit-param modules (`_Conv3x3`, `_GroupNorm`) must
also stay drop-in equal to the `nn.Conv`/`nn.GroupNorm` formulation they
replaced (checkpoint compatibility).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from siammot_tpu.models.emm import EMMPredictor
from siammot_tpu.ops.pallas.predictor import emm_predictor_pallas


def _init(rng, k=5, s=16, c=128):
    x = jnp.asarray(rng.randn(k, s, s, c).astype(np.float32))
    model = EMMPredictor(channels=c)
    variables = model.init(jax.random.PRNGKey(3), x)
    # non-trivial weights everywhere (init biases are zeros)
    variables = jax.tree.map(
        lambda a: a + jnp.asarray(
            rng.randn(*a.shape).astype(a.dtype) * 0.05), variables)
    return x, model, variables


def test_refactored_modules_match_flax_reference(rng):
    """Explicit-param conv/GN == nn.Conv + nn.GroupNorm stack (same param
    tree keys, same numerics)."""
    x, model, variables = _init(rng)
    c = x.shape[-1]
    p = variables["params"]
    assert set(p.keys()) == {"cls_tower_conv", "cls_tower_gn",
                             "reg_tower_conv", "reg_tower_gn",
                             "cls", "center", "reg"}
    assert p["cls_tower_conv"]["kernel"].shape == (3, 3, c, c)
    assert p["cls_tower_gn"]["scale"].shape == (c,)

    def flax_ref(x):
        def conv(w, b, t):
            y = jax.lax.conv_general_dilated(
                t, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + b

        gn = nn.GroupNorm(num_groups=32, epsilon=1e-5)
        cls_x = conv(p["cls_tower_conv"]["kernel"],
                     p["cls_tower_conv"]["bias"], x)
        cls_x = nn.relu(gn.apply({"params": p["cls_tower_gn"]}, cls_x))
        reg_x = conv(p["reg_tower_conv"]["kernel"],
                     p["reg_tower_conv"]["bias"], x)
        reg_x = nn.relu(gn.apply({"params": p["reg_tower_gn"]}, reg_x))
        return (conv(p["cls"]["kernel"], p["cls"]["bias"], cls_x),
                conv(p["center"]["kernel"], p["center"]["bias"], cls_x),
                nn.relu(conv(p["reg"]["kernel"], p["reg"]["bias"], reg_x)))

    got = model.apply(variables, x)
    want = flax_ref(x)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_pallas_predictor_matches_module(rng, dtype):
    x, model, variables = _init(rng)
    k = x.shape[0]
    valid = jnp.asarray([True, False, True, True, False])

    xd = x.astype(dtype)
    vd = jax.tree.map(lambda a: a.astype(dtype), variables)
    want = model.apply(vd, xd)
    got = emm_predictor_pallas(xd, valid, vd["params"], interpret=True)

    tol = dict(rtol=1e-4, atol=1e-4) if dtype == jnp.float32 else \
        dict(rtol=0.08, atol=0.08)
    v = np.asarray(valid)
    for g, w in zip(got, want):
        assert g.dtype == jnp.float32
        g, w = np.asarray(g), np.asarray(w, np.float32)
        np.testing.assert_allclose(g[v], w[v], **tol)
        assert not np.any(g[~v]), "dead slots must emit zeros"
        assert np.all(np.isfinite(g))


def test_pallas_predictor_all_dead(rng):
    x, model, variables = _init(rng, k=3)
    valid = jnp.zeros((3,), bool)
    got = emm_predictor_pallas(x, valid, variables["params"],
                               interpret=True)
    for g in got:
        assert not np.any(np.asarray(g))


@pytest.mark.slow
def test_masked_kernels_under_vmap(rng):
    """Multistream inference vmaps the frame step over streams; the
    masked kernels' pallas batching rules must produce per-stream
    results identical to a python loop."""
    from siammot_tpu.ops.pallas.xcorr import xcorr_depthwise_pallas

    n, k, c = 3, 4, 128
    x = jnp.asarray(rng.randn(n, k, 8, 8, c).astype(np.float32))
    model = EMMPredictor(channels=c)
    variables = model.init(jax.random.PRNGKey(0), x[0])
    valid = jnp.asarray(rng.rand(n, k) < 0.5)

    vm = jax.vmap(lambda xi, vi: emm_predictor_pallas(
        xi, vi, variables["params"], interpret=True), in_axes=(0, 0))
    got = vm(x, valid)
    for i in range(n):
        want = emm_predictor_pallas(x[i], valid[i], variables["params"],
                                    interpret=True)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g[i]), np.asarray(w),
                                       rtol=1e-5, atol=1e-5)

    s = jnp.asarray(rng.randn(n, k, 12, 12, c).astype(np.float32))
    t = jnp.asarray(rng.randn(n, k, 5, 5, c).astype(np.float32))
    vx = jax.vmap(lambda si, ti, vi: xcorr_depthwise_pallas(
        si, ti, vi, interpret=True), in_axes=(0, 0, 0))
    got = vx(s, t, valid)
    for i in range(n):
        want = xcorr_depthwise_pallas(s[i], t[i], valid[i], interpret=True)
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_blocked_predictor_matches_per_slot(rng):
    """Slot-block kernel == per-slot kernel: mixed-valid block, all-dead
    block, and the dead-lane-inside-live-block zero convention."""
    from siammot_tpu.ops.pallas.predictor import \
        emm_predictor_pallas_blocked
    x, model, variables = _init(rng, k=8)
    # block 0: lanes 0,2,3 live; block 1: all dead
    valid = jnp.asarray([True, False, True, True,
                         False, False, False, False])
    want = emm_predictor_pallas(x, valid, variables["params"],
                                interpret=True)
    got = emm_predictor_pallas_blocked(x, valid, variables["params"],
                                       block=4, interpret=True)
    v = np.asarray(valid)
    for g, w in zip(got, want):
        g, w = np.asarray(g), np.asarray(w)
        np.testing.assert_allclose(g[v], w[v], rtol=1e-4, atol=1e-4)
        assert not np.any(g[~v]), "dead lanes must emit zeros"
