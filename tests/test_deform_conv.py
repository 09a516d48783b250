"""Deformable conv: zero offsets == regular conv; integer offsets shift."""

import jax
import jax.numpy as jnp
import numpy as np

from siammot_tpu.ops.deform_conv import DeformConv, deform_conv2d


def _conv_ref(x, kernel, stride=1, dilation=1):
    pad = dilation * (kernel.shape[0] - 1) // 2
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_zero_offsets_match_conv(rng):
    x = jnp.asarray(rng.randn(2, 9, 11, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32))
    for stride in (1, 2):
        ho = -(-9 // stride)
        wo = -(-11 // stride)
        off = jnp.zeros((2, ho, wo, 18), jnp.float32)
        out = deform_conv2d(x, off, k, stride=stride)
        ref = _conv_ref(x, k, stride=stride)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_integer_offset_shifts_sampling(rng):
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 4, 4).astype(np.float32))
    # shifting every tap by (0, +1) equals convolving the x-shifted image
    off = jnp.zeros((1, 8, 8, 18), jnp.float32)
    off = off.at[..., 1::2].set(1.0)
    out = deform_conv2d(x, off, k)
    x_shift = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:, :]
    ref = _conv_ref(x_shift, k)
    # interior matches exactly; both horizontal boundaries differ (the
    # shifted-image reference loses real pixels to padding that shifted
    # *sampling* still reads), so compare away from them
    np.testing.assert_allclose(np.asarray(out)[:, :, 1:6],
                               np.asarray(ref)[:, :, 1:6], rtol=1e-4,
                               atol=1e-4)


def test_deform_conv_module(rng):
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    m = DeformConv(features=6)
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (1, 8, 8, 6)
    # offset conv is zero-initialized -> acts as a plain conv at init
    k = params["params"]["kernel"]
    ref = _conv_ref(x, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)
