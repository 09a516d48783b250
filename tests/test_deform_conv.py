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


def test_patch_impl_matches_gather4(rng):
    """Exactness ladder: the single-patch-gather fast path is bitwise-
    equivalent in f32 to the 4-corner reference formulation, including
    far-out-of-bounds samples and image-edge corners."""
    for (hh, ww, cc, co, stride, dil, scale) in [
            (9, 11, 8, 16, 1, 1, 3.0),     # generic + oob tails
            (8, 8, 4, 4, 2, 1, 1.5),       # stride 2
            (10, 7, 4, 8, 1, 2, 2.0),      # dilation 2
            (6, 6, 4, 4, 1, 1, 50.0),      # everything far oob
    ]:
        ho = -(-hh // stride)
        wo = -(-ww // stride)
        x = jnp.asarray(rng.randn(2, hh, ww, cc).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, cc, co).astype(np.float32))
        off = jnp.asarray(
            (rng.randn(2, ho, wo, 18) * scale).astype(np.float32))
        a = deform_conv2d(x, off, k, stride=stride, dilation=dil,
                          impl="gather4")
        b = deform_conv2d(x, off, k, stride=stride, dilation=dil,
                          impl="patch")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_patch_impl_gradients_match(rng):
    """Both formulations backprop identically (training with DCN)."""
    x = jnp.asarray(rng.randn(1, 7, 9, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 4, 4).astype(np.float32))
    off = jnp.asarray((rng.randn(1, 7, 9, 18) * 2.0).astype(np.float32))

    def loss(impl, x, off, k):
        return jnp.sum(deform_conv2d(x, off, k, impl=impl) ** 2)

    for argnum in (0, 1, 2):
        ga = jax.grad(lambda *a: loss("gather4", *a), argnums=argnum)(
            x, off, k)
        gb = jax.grad(lambda *a: loss("patch", *a), argnums=argnum)(
            x, off, k)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-4, atol=1e-4)


def test_shiftwin_impl_matches_gather4(rng):
    """Shift-window ladder rung: gather-free static-shift sampling equals
    the 4-corner reference (a) on the fast path (offsets within the
    window), (b) through the lax.cond fallback (offsets outside it), and
    (c) at image borders where zero padding must reproduce the oob
    zero-weight convention."""
    for (hh, ww, cc, co, stride, dil, scale, r) in [
            (9, 11, 8, 16, 1, 1, 1.4, 2),   # fast path, generic
            (8, 8, 4, 4, 2, 1, 1.4, 2),     # fast path, stride 2
            (10, 7, 4, 8, 1, 2, 1.4, 2),    # fast path, dilation 2
            (9, 11, 8, 16, 1, 1, 6.0, 2),   # fallback (oob window)
            (6, 6, 4, 4, 1, 1, 0.9, 1),     # r=1 tight window, borders
    ]:
        ho = -(-hh // stride)
        wo = -(-ww // stride)
        x = jnp.asarray(rng.randn(2, hh, ww, cc).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, cc, co).astype(np.float32))
        off = jnp.asarray(
            (rng.randn(2, ho, wo, 18) * scale).astype(np.float32))
        a = deform_conv2d(x, off, k, stride=stride, dilation=dil,
                          impl="gather4")
        b = jax.jit(lambda x, off, k: deform_conv2d(
            x, off, k, stride=stride, dilation=dil, impl="shiftwin",
            shift_r=r))(x, off, k)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_shiftwin_gradients_match(rng):
    """Fast path backprop equals the reference formulation's."""
    x = jnp.asarray(rng.randn(1, 7, 9, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 4, 4).astype(np.float32))
    off = jnp.asarray((rng.randn(1, 7, 9, 18) * 1.2).astype(np.float32))

    def loss(impl, x, off, k):
        return jnp.sum(deform_conv2d(x, off, k, impl=impl) ** 2)

    for argnum in (0, 1, 2):
        ga = jax.grad(lambda *a: loss("gather4", *a), argnums=argnum)(
            x, off, k)
        gb = jax.grad(lambda *a: loss("shiftwin", *a), argnums=argnum)(
            x, off, k)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-4, atol=1e-4)


def test_pallas_impl_matches_gather4(rng):
    """Pallas tile-resident kernel (interpret mode off-TPU) equals the
    4-corner reference on the fast path, through the lax.cond fallback
    for out-of-window offsets, and at image borders (zero padding must
    reproduce the oob zero-weight convention)."""
    for (hh, ww, cc, co, scale) in [
            (9, 11, 8, 16, 1.4),    # fast path incl. borders, odd sizes
            (16, 8, 4, 4, 0.9),     # multiple row blocks
            (9, 11, 8, 16, 6.0),    # fallback (offsets outside window)
    ]:
        x = jnp.asarray(rng.randn(2, hh, ww, cc).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, cc, co).astype(np.float32))
        off = jnp.asarray(
            (rng.randn(2, hh, ww, 18) * scale).astype(np.float32))
        a = deform_conv2d(x, off, k, impl="gather4")
        b = jax.jit(lambda x, off, k: deform_conv2d(
            x, off, k, impl="pallas"))(x, off, k)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_pallas_kernel_fast_path_directly(rng):
    """Call the kernel WITHOUT the lax.cond guard, with offsets bounded
    inside the shift window, so the tile-resident fast path itself is
    verified.  (randn offsets at the sizes above exceed the window with
    near-certainty, so the guarded test mostly exercises the fallback —
    this one cannot: |offset| <= 1.5 < R.)  Regression for the .start()-
    less DMA that returned uninitialized VMEM and faulted the chip."""
    from siammot_tpu.ops.pallas.deform import deform_conv_pallas

    for (hh, ww, cc, co) in [(9, 11, 8, 16), (23, 40, 16, 16)]:
        x = jnp.asarray(rng.randn(2, hh, ww, cc).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, cc, co).astype(np.float32))
        off = jnp.asarray(rng.uniform(
            -1.5, 1.5, (2, hh, ww, 18)).astype(np.float32))
        a = deform_conv2d(x, off, k, impl="gather4")
        b = deform_conv_pallas(x, off, k)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
        # zero offsets == plain 3x3 convolution, the strongest oracle
        z = jnp.zeros_like(off)
        a0 = deform_conv2d(x, z, k, impl="gather4")
        b0 = deform_conv_pallas(x, z, k)
        np.testing.assert_allclose(np.asarray(a0), np.asarray(b0),
                                   rtol=1e-4, atol=1e-4)


def test_pallas_gradients_match(rng):
    """impl='pallas' backward routes through the exact patch formulation
    (custom_vjp), so training through it equals the reference."""
    x = jnp.asarray(rng.randn(1, 7, 9, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 4, 4).astype(np.float32))
    off = jnp.asarray((rng.randn(1, 7, 9, 18) * 1.2).astype(np.float32))

    def loss(impl, x, off, k):
        return jnp.sum(deform_conv2d(x, off, k, impl=impl) ** 2)

    for argnum in (0, 1, 2):
        ga = jax.grad(lambda *a: loss("gather4", *a), argnums=argnum)(
            x, off, k)
        gb = jax.grad(lambda *a: loss("pallas", *a), argnums=argnum)(
            x, off, k)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-4, atol=1e-4)
