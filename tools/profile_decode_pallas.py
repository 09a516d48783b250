#!/usr/bin/env python3
"""On-chip parity + loop-amplified timing: Pallas decode vs XLA fused decode."""

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
    # poll the chip first (cheap matmul)
    t0 = time.perf_counter()
    x = jnp.ones((128, 128))
    _ = float(jnp.sum(x @ x))
    print(f"chip alive ({time.perf_counter() - t0:.1f}s)")

    from siammot_tpu.configs.defaults import get_cfg
    from siammot_tpu.models.emm import EMMConfig, decode_response_fused

    cfg = get_cfg()
    ecfg = EMMConfig.from_cfg(cfg)
    k, s, up = cfg.TPU.MAX_TRACKS, ecfg.response_size, 16
    rng = np.random.RandomState(0)
    cls_l = jnp.asarray(rng.randn(k, s, s, 2).astype(np.float32))
    ctr_l = jnp.asarray(rng.randn(k, s, s, 1).astype(np.float32))
    reg_l = jnp.asarray(np.abs(rng.randn(k, s, s, 4)).astype(np.float32) * 20)
    b = []
    for _ in range(k):
        x1, y1 = rng.uniform(0, 900, 2)
        w, h = rng.uniform(30, 120, 2)
        b.append([x1, y1, x1 + w, y1 + h])
    tmpl = jnp.asarray(np.array(b, np.float32))
    sr = tmpl + ecfg.pad_pixels
    ext = (sr[:, 2:] - sr[:, :2]) / 2.0
    sr = jnp.concatenate([sr[:, :2] - ext, sr[:, 2:] + ext], axis=1)

    def run(use_pallas):
        f = jax.jit(lambda a, c, r, srb, t: decode_response_fused(
            a, c, r, srb, t, ecfg, up, use_pallas=use_pallas))
        out = f(cls_l, ctr_l, reg_l, sr, tmpl)
        return np.asarray(out[0]), np.asarray(out[1]), f

    bx, sx, _ = run(False)
    bp, sp, _ = run(True)
    np.testing.assert_allclose(bp, bx, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(sp, sx, rtol=1e-4, atol=1e-5)
    print(f"on-chip parity OK (max box diff "
          f"{np.abs(bp - bx).max():.2e}, score diff "
          f"{np.abs(sp - sx).max():.2e})")

    # loop-amplified timing
    def looped(use_pallas, n):
        def step(carry, _):
            out, score = decode_response_fused(
                cls_l + carry, ctr_l, reg_l, sr, tmpl, ecfg, up,
                use_pallas=use_pallas)
            return jnp.sum(score) * 1e-9, None

        @jax.jit
        def f():
            s, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
            return s
        return f

    for name, up_ in (("xla ", False), ("pallas", True)):
        times = []
        for n in (2, 8):
            f = looped(up_, n)
            _ = float(f())
            t0 = time.perf_counter()
            for _ in range(8):
                v = f()
            _ = float(v)
            times.append((time.perf_counter() - t0) / 8 * 1000)
        print(f"decode {name}: {(times[1] - times[0]) / 6:7.3f} ms/iter "
              f"(K={k})")


if __name__ == "__main__":
    main()
