"""Bicubic upsampling as dense interpolation matmuls.

The reference upsamples the EMM response maps x16 with
``F.interpolate(mode='bicubic')`` before decoding
(``EMM/track_core.py:69-71``) — the single most memory-hungry inference op.
Bicubic interpolation is linear in its input, so on TPU we express it as two
small dense matmuls ``W_h @ X @ W_w^T`` that run on the MXU instead of a
gather-heavy resampling kernel.  The interpolation matrices reproduce
PyTorch's ``upsample_bicubic2d`` exactly: half-pixel source mapping
(``align_corners=False``), Keys cubic kernel with a = -0.75, and
index clamping at the borders.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_weights(t: float, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution weights for taps at offsets [-1, 0, 1, 2]."""
    def w1(x):  # |x| <= 1
        return ((a + 2) * x - (a + 3)) * x * x + 1

    def w2(x):  # 1 < |x| < 2
        return (((x - 5) * x + 8) * x - 4) * a

    return np.array([w2(t + 1.0), w1(t), w1(1.0 - t), w2(2.0 - t)], np.float64)


@lru_cache(maxsize=None)
def bicubic_matrix(in_size: int, scale: int) -> np.ndarray:
    """[out, in] dense interpolation matrix, out = in * scale."""
    out_size = in_size * scale
    mat = np.zeros((out_size, in_size), np.float64)
    for o in range(out_size):
        src = (o + 0.5) / scale - 0.5
        base = int(np.floor(src))
        t = src - base
        wts = _cubic_weights(t)
        for k in range(4):
            idx = min(max(base - 1 + k, 0), in_size - 1)
            mat[o, idx] += wts[k]
    return mat.astype(np.float32)


def upsample_bicubic(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Bicubic x``scale`` upsample of [..., H, W, C] (NHWC)."""
    h, w = x.shape[-3], x.shape[-2]
    wy = jnp.asarray(bicubic_matrix(h, scale))
    wx = jnp.asarray(bicubic_matrix(w, scale))
    dt = x.dtype
    x = x.astype(jnp.float32)
    # full f32 MXU precision: the decode argmax is sensitive to the
    # default bf16 matmul rounding
    hi = jax.lax.Precision.HIGHEST
    x = jnp.einsum("oh,...hwc->...owc", wy, x, precision=hi)
    x = jnp.einsum("pw,...hwc->...hpc", wx, x, precision=hi)
    return x.astype(dt)
