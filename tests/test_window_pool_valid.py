"""Valid-mask (dead-slot skipping) window pooling.

Fixed-capacity track slots are mostly empty in practice; the compacted
Pallas path sorts live ROIs to a prefix, skips DMA+matmuls for the dead
tail and scatters outputs back through an out-block index map.  Dead
rows must pool to exact zeros on every backend, live rows must match the
unmasked pooler bit-for-bit, and the backward must match autodiff of the
masked forward.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

import siammot_tpu.ops.pallas.window_pool as wp
from siammot_tpu.ops.roi_align import map_rois_to_levels
from siammot_tpu.ops.roi_align_windowed import (roi_align_windowed,
                                                stack_levels)

SCALES = (0.25, 0.125, 0.0625, 0.03125)


def _interp_patch():
    orig = wp.window_pool_pallas

    def interp(table, origins, wy, wx, window, channel_block=128,
               interpret=False, out_blocks=None, n_valid=None):
        return orig(table, origins, wy, wx, window, channel_block,
                    True, out_blocks, n_valid)
    return interp


def _setup(rng, n=8):
    feats = [jnp.asarray(rng.randn(1, 64 // 2 ** i, 96 // 2 ** i, 128)
                         .astype(np.float32)) for i in range(4)]
    x1 = rng.uniform(0, 300, n)
    y1 = rng.uniform(0, 200, n)
    rois = jnp.asarray(np.stack([x1, y1, x1 + rng.uniform(20, 80, n),
                                 y1 + rng.uniform(20, 80, n)], -1)
                       .astype(np.float32))
    levels = map_rois_to_levels(rois, 2, 5)
    table, offsets, heights, widths = stack_levels(feats)
    scales = jnp.asarray(np.array(SCALES, np.float32))[levels]
    return (table, jnp.asarray(offsets), jnp.asarray(heights),
            jnp.asarray(widths), rois, levels, scales)


@pytest.mark.slow
def test_valid_mask_fwd_parity(rng):
    table, offsets, heights, widths, rois, levels, scales = _setup(rng)
    n = rois.shape[0]
    valid = jnp.asarray(rng.rand(n) > 0.5)
    args = (table, offsets, heights, widths, rois, levels, scales)

    full = roi_align_windowed(*args, 7, 2, window=48, backend="xla")
    masked_xla = roi_align_windowed(*args, 7, 2, window=48, backend="xla",
                                    valid=valid)
    orig = wp.window_pool_pallas
    try:
        wp.window_pool_pallas = _interp_patch()
        masked_pl = roi_align_windowed(*args, 7, 2, window=48,
                                       backend="pallas", valid=valid)
    finally:
        wp.window_pool_pallas = orig

    v = np.asarray(valid)
    # live rows match the unmasked pooler exactly
    np.testing.assert_allclose(np.asarray(masked_xla)[v],
                               np.asarray(full)[v], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(masked_pl)[v],
                               np.asarray(full)[v], rtol=1e-4, atol=1e-4)
    # dead rows are exact zeros on both backends
    assert np.all(np.asarray(masked_xla)[~v] == 0)
    assert np.all(np.asarray(masked_pl)[~v] == 0)


def test_valid_mask_all_dead(rng):
    table, offsets, heights, widths, rois, levels, scales = _setup(rng, n=4)
    valid = jnp.zeros((4,), bool)
    orig = wp.window_pool_pallas
    try:
        wp.window_pool_pallas = _interp_patch()
        out = roi_align_windowed(table, offsets, heights, widths, rois,
                                 levels, scales, 7, 2, window=48,
                                 backend="pallas", valid=valid)
    finally:
        wp.window_pool_pallas = orig
    assert np.all(np.asarray(out) == 0)


def test_valid_mask_nan_dead_rows(rng):
    """Dead slots may hold NaN boxes (cleared state); outputs stay finite."""
    table, offsets, heights, widths, rois, levels, scales = _setup(rng)
    n = rois.shape[0]
    valid = jnp.asarray([True] * 4 + [False] * (n - 4))
    rois = rois.at[4:].set(jnp.nan)
    for backend in ("xla",):
        out = roi_align_windowed(table, offsets, heights, widths, rois,
                                 levels, scales, 7, 2, window=48,
                                 backend=backend, valid=valid)
        assert np.all(np.isfinite(np.asarray(out)))
        assert np.all(np.asarray(out)[4:] == 0)


@pytest.mark.slow
def test_valid_mask_backward(rng):
    """Compacted Pallas bwd vs autodiff of the masked XLA forward."""
    from siammot_tpu.ops.pallas.window_pool import window_pool

    n, s, win, c = 6, 10, 16, 128
    rows, wmax = 48, 32
    table = rng.randn(rows, wmax, c).astype(np.float32)
    origins = np.stack([rng.randint(0, rows - win, n),
                        8 * rng.randint(0, (wmax - win) // 8 + 1, n)],
                       -1).astype(np.int32)
    wy = rng.rand(n, s, win).astype(np.float32)
    wx = rng.rand(n, s, win).astype(np.float32)
    g = rng.randn(n, s, s, c).astype(np.float32)
    valid = np.array([True, False, True, True, False, True])

    perm = np.argsort(~valid, kind="stable").astype(np.int32)
    n_valid = int(valid.sum())

    def xla_fwd(t):
        def one(o, a, b):
            winb = jax.lax.dynamic_slice(t, (o[0], o[1], 0), (win, win, c))
            tmp = jnp.einsum("sh,hwc->swc", a, winb)
            return jnp.einsum("tw,swc->stc", b, tmp)
        out = jax.vmap(one)(jnp.asarray(origins), jnp.asarray(wy),
                            jnp.asarray(wx))
        out = jnp.where(jnp.asarray(valid)[:, None, None, None], out, 0.0)
        return jnp.sum(out * g)

    def pallas_fwd(t):
        out = window_pool(t, jnp.asarray(origins[perm]),
                          jnp.asarray(wy[perm]), jnp.asarray(wx[perm]),
                          win, 128, True, jnp.asarray(perm),
                          jnp.int32(n_valid))
        return jnp.sum(out * g)

    t = jnp.asarray(table)
    np.testing.assert_allclose(float(pallas_fwd(t)), float(xla_fwd(t)),
                               rtol=1e-4)
    got = jax.grad(pallas_fwd)(t)
    want = jax.grad(xla_fwd)(t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
