"""Pallas fused window pool (interpret mode) vs the XLA formulation."""

import pytest
import jax.numpy as jnp
import numpy as np

from siammot_tpu.ops.roi_align_windowed import (_axis_weights,
                                                roi_align_windowed,
                                                stack_levels)
from siammot_tpu.ops.pallas.window_pool import window_pool_pallas
from siammot_tpu.ops.roi_align import map_rois_to_levels

SCALES = (0.25, 0.125, 0.0625, 0.03125)


def test_window_pool_pallas_matches_xla(rng):
    feats = [jnp.asarray(rng.randn(1, 64 // 2 ** i, 96 // 2 ** i, 128)
                         .astype(np.float32)) for i in range(4)]
    n = 6
    x1 = rng.uniform(0, 300, n)
    y1 = rng.uniform(0, 200, n)
    rois = jnp.asarray(np.stack([x1, y1, x1 + rng.uniform(20, 80, n),
                                 y1 + rng.uniform(20, 80, n)], -1)
                       .astype(np.float32))
    levels = map_rois_to_levels(rois, 2, 5)
    img_idx = jnp.zeros((n,), jnp.int32)
    table, offsets, heights, widths = stack_levels(feats)
    scales = jnp.asarray(np.array(SCALES, np.float32))[levels]

    args = (table, jnp.asarray(offsets), jnp.asarray(heights),
            jnp.asarray(widths), rois, img_idx * 4 + levels, scales)
    ref = roi_align_windowed(*args, 7, 2, window=48, backend="xla")

    # drive the pallas path in interpret mode through the same prologue
    orig = window_pool_pallas
    try:
        def interp(table, origins, wy, wx, window, channel_block=128,
                   interpret=False, out_blocks=None, n_valid=None):
            return orig(table, origins, wy, wx, window, channel_block,
                        True, out_blocks, n_valid)
        import siammot_tpu.ops.pallas.window_pool as wp
        wp_orig = wp.window_pool_pallas
        wp.window_pool_pallas = interp
        out = roi_align_windowed(*args, 7, 2, window=48, backend="pallas")
    finally:
        wp.window_pool_pallas = wp_orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_smem_gate_routes_large_roi_counts_to_xla(rng):
    """N > 1024 must NOT reach the Pallas kernel: its [N, 4] s32
    scalar-prefetch table pads to 128 SMEM lanes (512 B/ROI) and
    overflows v5e's 1 MB SMEM at N = 2048 (measured compile failure on a
    batch-16/accum-4 train step).  The dispatch falls back to the XLA
    windowed path instead of failing compile."""
    feats = [jnp.asarray(rng.randn(1, 64 // 2 ** i, 96 // 2 ** i, 128)
                         .astype(np.float32)) for i in range(4)]
    n = 1100
    x1 = rng.uniform(0, 300, n)
    y1 = rng.uniform(0, 200, n)
    rois = jnp.asarray(np.stack([x1, y1, x1 + rng.uniform(20, 80, n),
                                 y1 + rng.uniform(20, 80, n)], -1)
                       .astype(np.float32))
    levels = map_rois_to_levels(rois, 2, 5)
    img_idx = jnp.zeros((n,), jnp.int32)
    table, offsets, heights, widths = stack_levels(feats)
    scales = jnp.asarray(np.array(SCALES, np.float32))[levels]
    args = (table, jnp.asarray(offsets), jnp.asarray(heights),
            jnp.asarray(widths), rois, img_idx * 4 + levels, scales)

    ref = roi_align_windowed(*args, 7, 2, window=48, backend="xla")

    import siammot_tpu.ops.pallas.window_pool as wp

    def boom(*a, **k):
        raise AssertionError("pallas kernel reached with N > 1024")

    wp_orig = wp.window_pool_pallas
    try:
        wp.window_pool_pallas = boom
        out = roi_align_windowed(*args, 7, 2, window=48, backend="pallas")
    finally:
        wp.window_pool_pallas = wp_orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def test_window_pool_backward_matches_autodiff(rng):
    """Pallas scatter backward vs jax.grad of the XLA einsum forward."""
    import jax

    from siammot_tpu.ops.pallas.window_pool import window_pool

    n, s, win, c = 5, 14, 16, 128
    rows, wmax = 48, 32
    table = rng.randn(rows, wmax, c).astype(np.float32)
    # overlapping windows exercise the sequential read-modify-write
    origins = np.stack([rng.randint(0, rows - win, n),
                        8 * rng.randint(0, (wmax - win) // 8 + 1, n)],
                       -1).astype(np.int32)
    wy = rng.rand(n, s, win).astype(np.float32)
    wx = rng.rand(n, s, win).astype(np.float32)
    g = rng.randn(n, s, s, c).astype(np.float32)

    def xla_fwd(t):
        def one(o, a, b):
            winb = jax.lax.dynamic_slice(t, (o[0], o[1], 0), (win, win, c))
            tmp = jnp.einsum("sh,hwc->swc", a, winb)
            return jnp.einsum("tw,swc->stc", b, tmp)
        out = jax.vmap(one)(jnp.asarray(origins), jnp.asarray(wy),
                            jnp.asarray(wx))
        return jnp.sum(out * g)

    want = jax.grad(xla_fwd)(jnp.asarray(table))

    def pallas_fwd(t):
        out = window_pool(t, jnp.asarray(origins), jnp.asarray(wy),
                          jnp.asarray(wx), win, 128, True)
        return jnp.sum(out * g)

    fwd_val = pallas_fwd(jnp.asarray(table))
    np.testing.assert_allclose(float(fwd_val), float(xla_fwd(jnp.asarray(table))),
                               rtol=1e-4)
    got = jax.grad(pallas_fwd)(jnp.asarray(table))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_window_pool_striped_f32_sr_shapes(rng):
    """The striped kernels at the f32 SR-pool production shape (window
    128, hb 32 — the un-striped formulation OOM'd scoped VMEM on chip):
    fwd + bwd vs autodiff of the XLA einsum forward."""
    import jax

    from siammot_tpu.ops.pallas.window_pool import (_stripe_rows,
                                                    window_pool)

    assert _stripe_rows(128) == 32
    assert _stripe_rows(48) == 24
    assert _stripe_rows(60) == 60      # odd window: single stripe

    n, s, win, c = 2, 12, 128, 128
    rows, wmax = 160, 160
    table = rng.randn(rows, wmax, c).astype(np.float32)
    origins = np.stack([rng.randint(0, rows - win, n),
                        8 * rng.randint(0, (wmax - win) // 8 + 1, n)],
                       -1).astype(np.int32)
    wy = rng.rand(n, s, win).astype(np.float32)
    wx = rng.rand(n, s, win).astype(np.float32)
    g = rng.randn(n, s, s, c).astype(np.float32)

    def xla_fwd(t):
        def one(o, a, b):
            winb = jax.lax.dynamic_slice(t, (o[0], o[1], 0), (win, win, c))
            tmp = jnp.einsum("sh,hwc->swc", a, winb)
            return jnp.einsum("tw,swc->stc", b, tmp)
        out = jax.vmap(one)(jnp.asarray(origins), jnp.asarray(wy),
                            jnp.asarray(wx))
        return jnp.sum(out * g)

    def pallas_fwd(t):
        out = window_pool(t, jnp.asarray(origins), jnp.asarray(wy),
                          jnp.asarray(wx), win, 128, True)
        return jnp.sum(out * g)

    t = jnp.asarray(table)
    np.testing.assert_allclose(float(pallas_fwd(t)), float(xla_fwd(t)),
                               rtol=1e-4)
    got = jax.grad(pallas_fwd)(t)
    want = jax.grad(xla_fwd)(t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-3)
