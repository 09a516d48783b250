"""xcorr + bicubic upsample parity vs torch oracles."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from siammot_tpu.ops.xcorr import xcorr_depthwise
from siammot_tpu.ops.upsample import upsample_bicubic


def torch_xcorr_depthwise(x, kernel):
    """reference EMM/xcorr.py:37-46 (NCHW)."""
    batch, channel = kernel.shape[:2]
    x = x.reshape(1, batch * channel, x.shape[2], x.shape[3])
    kernel = kernel.reshape(batch * channel, 1, kernel.shape[2], kernel.shape[3])
    out = F.conv2d(x, kernel, groups=batch * channel)
    return out.reshape(batch, channel, out.shape[2], out.shape[3])


def test_xcorr_matches_reference(rng):
    b, c = 6, 16
    sr = rng.randn(b, c, 30, 30).astype(np.float32)
    tmpl = rng.randn(b, c, 15, 15).astype(np.float32)
    want = torch_xcorr_depthwise(torch.from_numpy(sr),
                                 torch.from_numpy(tmpl)).numpy()
    got = np.asarray(xcorr_depthwise(jnp.asarray(sr.transpose(0, 2, 3, 1)),
                                     jnp.asarray(tmpl.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=1e-3, atol=1e-3)


def test_bicubic_matches_torch(rng):
    b, c, h, w = 3, 7, 16, 16
    x = rng.randn(b, c, h, w).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), scale_factor=16,
                         mode="bicubic", align_corners=False).numpy()
    got = np.asarray(upsample_bicubic(
        jnp.asarray(x.transpose(0, 2, 3, 1)), 16))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=1e-3, atol=1e-4)


def test_bicubic_small_scale(rng):
    x = rng.randn(1, 1, 5, 9).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), scale_factor=4,
                         mode="bicubic", align_corners=False).numpy()
    got = np.asarray(upsample_bicubic(jnp.asarray(x.transpose(0, 2, 3, 1)), 4))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=1e-3, atol=1e-4)


def test_grouped_topk_matches_flat(rng):
    import jax
    from siammot_tpu.models.rpn import _grouped_topk

    n, k = 57_000, 1000
    scores = rng.randn(n).astype(np.float32)
    # inject ties, including across group boundaries
    scores[5000:5040] = scores[40_000:40_040] = 1.5
    scores = jnp.asarray(scores)
    fv, fi = jax.lax.top_k(scores, k)
    gv, gi = _grouped_topk(scores, k, group_size=8000)
    np.testing.assert_array_equal(np.asarray(fv), np.asarray(gv))
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(gi))

    # small-n passthrough
    gv2, gi2 = _grouped_topk(scores[:500], 100, group_size=8000)
    fv2, fi2 = jax.lax.top_k(scores[:500], 100)
    np.testing.assert_array_equal(np.asarray(fv2), np.asarray(fv2))
    np.testing.assert_array_equal(np.asarray(gi2), np.asarray(fi2))
