"""Depthwise cross-correlation parity against the reference's exact
formulation — a groups=B*C torch conv2d (EMM/xcorr.py:37-46)."""

import numpy as np
import pytest

from siammot_tpu.ops.xcorr import xcorr_depthwise

torch = pytest.importorskip("torch")


def test_matches_torch_grouped_conv(rng):
    import jax.numpy as jnp
    b, c, hs, ht = 3, 16, 30, 15
    search = rng.randn(b, hs, hs, c).astype(np.float32)
    template = rng.randn(b, ht, ht, c).astype(np.float32)

    out = np.asarray(xcorr_depthwise(jnp.asarray(search),
                                     jnp.asarray(template)))

    # reference: x.view(1, B*C, H, W) conv2d with kernel.view(B*C, 1, h, w),
    # groups = B*C
    xt = torch.from_numpy(np.transpose(search, (0, 3, 1, 2)))
    kt = torch.from_numpy(np.transpose(template, (0, 3, 1, 2)))
    x = xt.reshape(1, b * c, hs, hs)
    k = kt.reshape(b * c, 1, ht, ht)
    ref = torch.nn.functional.conv2d(x, k, groups=b * c)
    ref = ref.reshape(b, c, hs - ht + 1, hs - ht + 1)
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-3)
