#!/usr/bin/env python3
"""On-chip loop-amplified timing: masked Pallas predictor vs XLA module,
at several occupancies (the kernel's win is skipping dead slots)."""

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

    from siammot_tpu.models.emm import EMMPredictor
    from siammot_tpu.ops.pallas.predictor import emm_predictor_pallas

    rng = np.random.RandomState(0)
    k, s, c = 128, 16, 128
    x = jnp.asarray(rng.randn(k, s, s, c).astype(np.float32)
                    ).astype(jnp.bfloat16)
    model = EMMPredictor(channels=c, use_pallas=False)
    variables = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16),
        model.init(jax.random.PRNGKey(0), x))

    def looped(fn, n):
        def step(carry, _):
            cls_l, ctr_l, reg_l = fn(x + carry.astype(x.dtype))
            tot = (jnp.sum(cls_l.astype(jnp.float32))
                   + jnp.sum(ctr_l.astype(jnp.float32))
                   + jnp.sum(reg_l.astype(jnp.float32)))
            return tot * jnp.float32(1e-9), None

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

    from siammot_tpu.ops.pallas.predictor import emm_predictor_pallas_blocked

    print(f"xla module (K={k}):      {timeit(lambda t: model.apply(variables, t)):7.3f} ms")
    for live in (128, 32, 8):
        valid = jnp.arange(k) < live
        ms = timeit(lambda t: emm_predictor_pallas(t, valid,
                                                   variables["params"]))
        print(f"pallas masked {live:3d}/128:  {ms:7.3f} ms")
    # slot-block batching (SIAMMOT_PREDICTOR_BLOCK): B slots per program
    # -> Bx larger tap matmuls; block 8 is the VMEM-gate ceiling in emm.py
    for blk in (4, 8):
        for live in (128, 32, 8):
            valid = jnp.arange(k) < live
            ms = timeit(lambda t: emm_predictor_pallas_blocked(
                t, valid, variables["params"], block=blk))
            print(f"pallas block{blk} {live:3d}/128: {ms:7.3f} ms")


if __name__ == "__main__":
    main()
