#!/usr/bin/env python3
"""On-chip parity checks for the masked-xcorr and Pallas-decode fast paths
(verification script, not a test)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from siammot_tpu.ops.pallas.xcorr import xcorr_depthwise_pallas

    rng = np.random.RandomState(0)
    b, hs, ws, ht, wt, c = 128, 30, 30, 15, 15, 128
    search = rng.randn(b, hs, ws, c).astype(np.float32)
    template = rng.randn(b, ht, wt, c).astype(np.float32)
    valid = rng.rand(b) < 0.3
    search[~valid] = 0.0
    template[~valid] = 0.0
    s, t, v = jnp.asarray(search), jnp.asarray(template), jnp.asarray(valid)

    ref = np.asarray(xcorr_depthwise_pallas(s, t))
    out = np.asarray(xcorr_depthwise_pallas(s, t, v))
    np.testing.assert_array_equal(out, ref)
    assert not np.any(out[~valid])
    print(f"masked xcorr on-chip parity OK ({int(valid.sum())}/{b} live)")

    # ---- masked predictor kernel vs the XLA module path (bf16)
    import jax
    from siammot_tpu.models.emm import EMMPredictor
    from siammot_tpu.ops.pallas.predictor import emm_predictor_pallas

    k, ss = b, hs - ht + 1
    x = jnp.asarray(rng.randn(k, ss, ss, c).astype(np.float32))
    model = EMMPredictor(channels=c, use_pallas=False)
    variables = model.init(jax.random.PRNGKey(0), x)
    variables = jax.tree.map(
        lambda a: (a + jnp.asarray(rng.randn(*a.shape).astype(a.dtype)
                                   * 0.05)).astype(jnp.bfloat16), variables)
    xb = x.astype(jnp.bfloat16)
    want = jax.jit(lambda v, t: model.apply(v, t))(variables, xb)
    got = emm_predictor_pallas(xb, v, variables["params"])
    vm = np.asarray(v)
    for g, w in zip(got, want):
        g, w = np.asarray(g), np.asarray(w, np.float32)
        np.testing.assert_allclose(g[vm], w[vm], rtol=0.08, atol=0.08)
        assert not np.any(g[~vm])
    print("masked predictor on-chip parity OK")

    # ---- masked + striped decode vs the whole-map kernel
    from siammot_tpu.models.emm import _hann_window
    from siammot_tpu.ops.pallas.decode import emm_decode_pallas
    from siammot_tpu.ops.upsample import bicubic_matrix

    s_lo, up = 16, 16
    x4 = jnp.asarray(rng.randn(k, 4, s_lo, s_lo).astype(np.float32))
    wh = jnp.asarray(np.abs(rng.randn(k, 2)).astype(np.float32) * 60 + 20)
    u = jnp.asarray(bicubic_matrix(s_lo, up), jnp.float32)
    win = jnp.asarray(_hann_window(s_lo * up)).reshape(s_lo * up, s_lo * up)
    dref = emm_decode_pallas(x4, wh, u, win, sigma=0.4, use_centerness=True,
                             up_scale=up)
    dmask = emm_decode_pallas(x4, wh, u, win, v, sigma=0.4,
                              use_centerness=True, up_scale=up)
    dstr = emm_decode_pallas(x4, wh, u, win, sigma=0.4, use_centerness=True,
                             up_scale=up, stripe=64)
    np.testing.assert_array_equal(np.asarray(dmask[0])[vm],
                                  np.asarray(dref[0])[vm])
    assert not np.any(np.asarray(dmask[1])[~vm])
    np.testing.assert_array_equal(np.asarray(dstr[0]), np.asarray(dref[0]))
    np.testing.assert_allclose(np.asarray(dstr[1]), np.asarray(dref[1]),
                               rtol=1e-6, atol=1e-7)
    print("masked + striped decode on-chip parity OK")


if __name__ == "__main__":
    main()
