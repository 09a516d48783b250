#!/usr/bin/env python3
"""On-chip loop-amplified timing of the depthwise xcorr formulations at
production EMM shapes ([K=128, 30, 30, 128] search x [K, 15, 15, 128]
template -> [K, 16, 16, 128] response).

The roofline's "emm xcorr+predict" stage measures 1.155 ms with an
EMPTY tracker while the isolated predictor costs ~0.03 ms there
(tools/profile_predictor_pallas.py) — this tool splits out the xcorr
kernel's occupancy curve so the stage's fixed overhead has a name.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    t0 = time.perf_counter()
    xw = jnp.ones((128, 128))
    _ = float(jnp.sum(xw @ xw))
    print(f"chip alive ({time.perf_counter() - t0:.1f}s)")

    from siammot_tpu.ops.xcorr import xcorr_depthwise
    from siammot_tpu.ops.pallas.xcorr import xcorr_depthwise_pallas

    rng = np.random.RandomState(0)
    k, hs, ht, c = 128, 30, 15, 128
    search = jnp.asarray(rng.randn(k, hs, hs, c).astype(np.float32)
                         ).astype(jnp.bfloat16)
    template = jnp.asarray(rng.randn(k, ht, ht, c).astype(np.float32)
                           ).astype(jnp.bfloat16)

    def looped(fn, n):
        def step(carry, _):
            r = fn(search + carry.astype(search.dtype), template)
            return jnp.sum(r.astype(jnp.float32)) * jnp.float32(1e-9), None

        @jax.jit
        def f():
            out, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
            return out
        return f

    def timeit(fn):
        times = []
        for n in (2, 10):
            f = looped(fn, n)
            _ = float(f())
            t0 = time.perf_counter()
            for _ in range(8):
                v = f()
            _ = float(v)
            times.append((time.perf_counter() - t0) / 8 * 1000)
        return (times[1] - times[0]) / 8

    print(f"xla shift-MAC (K={k}):   "
          f"{timeit(lambda s, t: xcorr_depthwise(s, t)):7.3f} ms")
    for live in (128, 32, 8, 0):
        valid = jnp.arange(k) < live
        ms = timeit(lambda s, t: xcorr_depthwise_pallas(s, t, valid))
        print(f"pallas masked {live:3d}/128:  {ms:7.3f} ms")


if __name__ == "__main__":
    main()
