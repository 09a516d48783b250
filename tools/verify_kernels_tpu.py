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


if __name__ == "__main__":
    main()
