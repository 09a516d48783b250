"""Custom VJP of the dispatched depthwise xcorr vs autodiff of the
pure-XLA implementation."""

import jax
import jax.numpy as jnp
import numpy as np

from siammot_tpu.ops.xcorr import xcorr_depthwise, xcorr_depthwise_auto


def test_xcorr_vjp_matches_autodiff(rng):
    search = jnp.asarray(rng.randn(2, 12, 12, 8).astype(np.float32))
    template = jnp.asarray(rng.randn(2, 5, 5, 8).astype(np.float32))
    cot = jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32))

    def loss_ref(s, t):
        return jnp.sum(xcorr_depthwise(s, t) * cot)

    def loss_custom(s, t):
        return jnp.sum(xcorr_depthwise_auto(s, t) * cot)

    gs_ref, gt_ref = jax.grad(loss_ref, argnums=(0, 1))(search, template)
    gs, gt = jax.grad(loss_custom, argnums=(0, 1))(search, template)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gs_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(gt_ref),
                               rtol=1e-4, atol=1e-4)
