"""Pallas fused window pool (interpret mode) vs the XLA formulation."""

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
    import functools
    import siammot_tpu.ops.roi_align_windowed as raw
    orig = window_pool_pallas
    try:
        raw_pallas = functools.partial(orig, interpret=True)
        import siammot_tpu.ops.pallas.window_pool as wp
        wp_orig = wp.window_pool_pallas
        wp.window_pool_pallas = raw_pallas
        out = roi_align_windowed(*args, 7, 2, window=48, backend="pallas")
    finally:
        wp.window_pool_pallas = wp_orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)
