#!/usr/bin/env python3
"""Micro-bench of 3x3-conv formulations at DLA deep-stage shapes.

CLAUDE.md lists "backbone deep stages (~2.7 ms at ~18% MXU)" as a known
lever.  At 736x1280 the deep stages run 3x3 convs over tiny spatial
extents ([1, 46, 80, 256] level4, [1, 23, 40, 512] level5) where the XLA
conv can tile the MXU poorly.  Candidates (all exact):

  a) plain conv_general_dilated (current)
  b) 9-tap matmul: sum of shifted [H*W, C] @ [C, Co] MXU matmuls
     (the formulation that won for the EMM predictor)
  c) im2col: one [H*W, 9C] @ [9C, Co] matmul over stacked taps

plus the stride-2 variants that open each stage.  Run on the real chip.
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


def timeit(fn, *args, iters=100):
    out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1000.0


def conv_plain(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_9tap(x, w, stride=1):
    b, h, wd, c = x.shape
    co = w.shape[-1]
    # conv output extent (pad 1, kernel 3): floor((h-1)/stride)+1 — matches
    # XLA for odd dims too (h//stride only agrees when h % stride == 0)
    ho, wo = (h - 1) // stride + 1, (wd - 1) // stride + 1
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((b * ho * wo, co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = jax.lax.slice(
                xp, (0, dy, dx, 0),
                (b, dy + (ho - 1) * stride + 1,
                 dx + (wo - 1) * stride + 1, c),
                (1, stride, stride, 1))
            acc = acc + jax.lax.dot_general(
                tap.reshape(-1, c), w[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return acc.reshape(b, ho, wo, co).astype(x.dtype)


def conv_im2col(x, w, stride=1):
    b, h, wd, c = x.shape
    co = w.shape[-1]
    ho, wo = (h - 1) // stride + 1, (wd - 1) // stride + 1
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = []
    for dy in range(3):
        for dx in range(3):
            taps.append(jax.lax.slice(
                xp, (0, dy, dx, 0),
                (b, dy + (ho - 1) * stride + 1,
                 dx + (wo - 1) * stride + 1, c),
                (1, stride, stride, 1)).reshape(-1, c))
    patches = jnp.concatenate(taps, axis=-1)            # [B*Ho*Wo, 9C]
    out = jax.lax.dot_general(
        patches, w.reshape(9 * c, co),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return out.reshape(b, ho, wo, co).astype(x.dtype)


SHAPES = [
    # (name, H, W, Cin, Cout, stride)
    ("level4 s1  46x80x256 ", 46, 80, 256, 256, 1),
    ("level4 s2  92x160x128", 92, 160, 128, 256, 2),
    ("level5 s1  23x40x512 ", 23, 40, 512, 512, 1),
    ("level5 s2  46x80x256c", 46, 80, 256, 512, 2),
    ("level3 s1  92x160x128", 92, 160, 128, 128, 1),
]


def main():
    rng = np.random.RandomState(0)
    for name, h, w, ci, co, s in SHAPES:
        x = jnp.asarray(rng.randn(1, h, w, ci).astype(np.float32)
                        ).astype(jnp.bfloat16)
        k = jnp.asarray((rng.randn(3, 3, ci, co) * 0.05).astype(np.float32)
                        ).astype(jnp.bfloat16)
        import functools
        a = jax.jit(functools.partial(conv_plain, stride=s))
        b = jax.jit(functools.partial(conv_9tap, stride=s))
        c = jax.jit(functools.partial(conv_im2col, stride=s))
        ra, rb, rc = a(x, k), b(x, k), c(x, k)
        err_b = float(jnp.max(jnp.abs(ra.astype(jnp.float32)
                                      - rb.astype(jnp.float32))))
        err_c = float(jnp.max(jnp.abs(ra.astype(jnp.float32)
                                      - rc.astype(jnp.float32))))
        gflop = (((h - 1) // s + 1) * ((w - 1) // s + 1)
                 * 9 * ci * co * 2 / 1e9)
        ta, tb, tc = timeit(a, x, k), timeit(b, x, k), timeit(c, x, k)
        print(f"{name}  plain {ta:7.3f} ms ({gflop/ta:6.1f} TF/s)   "
              f"9tap {tb:7.3f} ({gflop/tb:6.1f}, err {err_b:.1e})   "
              f"im2col {tc:7.3f} ({gflop/tc:6.1f}, err {err_c:.1e})")


if __name__ == "__main__":
    main()
