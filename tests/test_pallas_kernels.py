"""Pallas kernels (interpret mode on CPU) vs pure-XLA references."""

import jax.numpy as jnp
import numpy as np

from siammot_tpu.ops.xcorr import xcorr_depthwise
from siammot_tpu.ops.pallas.xcorr import xcorr_depthwise_pallas


def test_xcorr_pallas_matches_xla(rng):
    b, c = 3, 128
    search = jnp.asarray(rng.randn(b, 30, 30, c).astype(np.float32))
    template = jnp.asarray(rng.randn(b, 15, 15, c).astype(np.float32))
    ref = xcorr_depthwise(search, template)
    out = xcorr_depthwise_pallas(search, template, interpret=True)
    assert out.shape == (b, 16, 16, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-4)


def test_xcorr_pallas_odd_sizes(rng):
    search = jnp.asarray(rng.randn(2, 35, 35, 128).astype(np.float32))
    template = jnp.asarray(rng.randn(2, 7, 7, 128).astype(np.float32))
    ref = xcorr_depthwise(search, template)
    out = xcorr_depthwise_pallas(search, template, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-4)


def test_xcorr_pallas_masked_skips_dead_slots(rng):
    """Masked kernel == unmasked on live slots, zeros on dead ones —
    bitwise, since dead slots' inputs are zeroed like the poolers do."""
    import jax.numpy as jnp
    import numpy as np

    b, hs, ws, ht, wt, c = 6, 12, 12, 5, 5, 128
    search = rng.randn(b, hs, ws, c).astype(np.float32)
    template = rng.randn(b, ht, wt, c).astype(np.float32)
    valid = np.array([True, False, True, False, False, True])
    search[~valid] = 0.0
    template[~valid] = 0.0

    ref = xcorr_depthwise_pallas(jnp.asarray(search), jnp.asarray(template),
                                 interpret=True)
    out = xcorr_depthwise_pallas(jnp.asarray(search), jnp.asarray(template),
                                 jnp.asarray(valid), interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert not np.any(np.asarray(out)[~valid])
