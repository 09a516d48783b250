"""Bicubic upsample parity against PyTorch's upsample_bicubic2d — the
reference decodes EMM responses through F.interpolate(mode='bicubic')
(track_core.py:69-71), so this is a direct box-level-parity dependency."""

import numpy as np
import pytest

from siammot_tpu.ops.upsample import upsample_bicubic

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("size,scale", [(16, 16), (16, 4), (7, 8)])
def test_matches_torch_bicubic(rng, size, scale):
    import jax.numpy as jnp
    x = rng.randn(3, size, size, 5).astype(np.float32)
    out = np.asarray(upsample_bicubic(jnp.asarray(x), scale))

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    ref = torch.nn.functional.interpolate(
        xt, scale_factor=scale, mode="bicubic", align_corners=False)
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
