#!/usr/bin/env python3
"""Micro-bench of 3x3-conv formulations at EMM-predictor shapes.

The predictor runs 3x3 convs over [K, 16, 16, 128] responses (K = track
slots).  Small per-sample spatial extents tile poorly; candidates:

  a) plain batched conv (current)
  b) strip conv: stack samples vertically with 1-row zero borders and run
     ONE batch-1 VALID conv over the [K*18, 18, C] strip (junction rows
     discarded) — exact
  c) 9-tap matmul: sum of shifted [K*256, C] @ [C, C] matmuls — exact

Run on the real chip; verify numerics vs (a) too.
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


def timeit(fn, *args, iters=50):
    out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1000.0


def conv_plain(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_strip(x, w):
    k, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))       # [K,18,18,C]
    strip = xp.reshape(1, k * (h + 2), wd + 2, c)
    strip = jnp.pad(strip, ((0, 0), (0, 2), (0, 0), (0, 0)))
    out = jax.lax.conv_general_dilated(
        strip, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))          # [1,K*18,16,C]
    return out.reshape(k, h + 2, wd, -1)[:, :h]


def conv_9tap(x, w):
    k, h, wd, c = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((k, h, wd, co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (k, h, wd, c))
            acc += jax.lax.dot_general(
                tap.reshape(-1, c), w[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).reshape(k, h, wd, co)
    return acc


def main():
    rng = np.random.RandomState(0)
    for k in (64, 128):
        x = jnp.asarray(rng.randn(k, 16, 16, 128).astype(np.float32)
                        ).astype(jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, 128, 128).astype(np.float32) * 0.05
                        ).astype(jnp.bfloat16)
        a = jax.jit(conv_plain)
        b = jax.jit(conv_strip)
        c = jax.jit(conv_9tap)
        ra, rb, rc = a(x, w), b(x, w), c(x, w)
        err_b = float(jnp.max(jnp.abs(ra.astype(jnp.float32)
                                      - rb.astype(jnp.float32))))
        err_c = float(jnp.max(jnp.abs(ra.astype(jnp.float32)
                                      - rc.astype(jnp.float32))))
        print(f"K={k}  plain {timeit(a, x, w):7.3f} ms   "
              f"strip {timeit(b, x, w):7.3f} ms (err {err_b:.2e})   "
              f"9tap {timeit(c, x, w):7.3f} ms (err {err_c:.2e})")


if __name__ == "__main__":
    main()
