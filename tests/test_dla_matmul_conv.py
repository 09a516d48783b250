"""Exactness ladder for the deep-stage matmul conv formulation
(models/dla.py conv3x3_matmul / MatmulConv / TPU.CONV_MATMUL_STAGES)."""

import jax
import jax.numpy as jnp
import numpy as np

from siammot_tpu.models.dla import (DLA, DLA_VARIANTS, MatmulConv, build_dla,
                                    conv3x3_matmul)


def _conv_ref(x, kernel, stride=1, dilation=1):
    pad = dilation
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_conv3x3_matmul_matches_xla_conv(rng):
    for (h, w, ci, co, stride, dil) in [
            (9, 11, 8, 16, 1, 1),
            (9, 11, 8, 16, 2, 1),      # odd dims, stride 2
            (8, 10, 4, 4, 2, 1),
            (7, 7, 4, 8, 1, 2),        # dilation
    ]:
        x = jnp.asarray(rng.randn(2, h, w, ci).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32))
        ref = _conv_ref(x, k, stride, dil)
        for impl in ("im2col", "9tap"):
            out = conv3x3_matmul(x, k, stride, dil, impl)
            assert out.shape == ref.shape, (impl, stride, dil)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=f"{impl} s{stride} d{dil}")


def test_matmul_conv_param_compatible(rng):
    """MatmulConv's param tree is interchangeable with nn.Conv's."""
    import flax.linen as nn

    x = jnp.asarray(rng.randn(1, 10, 12, 8).astype(np.float32))
    m = MatmulConv(16, stride=2)
    params = m.init(jax.random.PRNGKey(0), x)
    assert params["params"]["kernel"].shape == (3, 3, 8, 16)
    ref_m = nn.Conv(16, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False)
    ref = ref_m.apply(params, x)   # same params, plain conv
    out = m.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_dla_matmul_stages_same_outputs(rng):
    """Whole-backbone ladder: matmul_stages=(3, 4, 5) produces the same
    feature maps as the plain formulation from identical params."""
    plain = build_dla("DLA-MINI-FPN")
    fast = build_dla("DLA-MINI-FPN", matmul_stages=(3, 4, 5))
    x = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32))
    params = plain.init(jax.random.PRNGKey(1), x)
    a = plain.apply(params, x)
    b = fast.apply(params, x)     # identical param tree by construction
    for i, (fa, fb) in enumerate(zip(a, b)):
        np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"level {i}")


def test_resnet_matmul_stages_same_outputs(rng):
    """ResNet ladder: matmul_stages (DLA numbering 2..5) leaves the
    feature maps unchanged from identical params."""
    from siammot_tpu.models.resnet import build_resnet

    plain = build_resnet("R-50-FPN")
    fast = build_resnet("R-50-FPN", matmul_stages=(4, 5))
    x = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32))
    params = plain.init(jax.random.PRNGKey(2), x)
    a = plain.apply(params, x)
    b = fast.apply(params, x)
    for i, (fa, fb) in enumerate(zip(a, b)):
        np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"level {i}")
