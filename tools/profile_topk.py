#!/usr/bin/env python3
"""Micro-bench of exact top-k strategies for RPN proposal selection.

The P2 level at 720p has 176k anchor scores and the reference semantics
need the exact top-1000 (ties broken by lower anchor index, like
torch.topk).  Candidate strategies:

  a) single jax.lax.top_k over the flat array (current)
  b) grouped two-stage: per-group top-k (batched) then merge top-k —
     exact including tie order because groups are contiguous slices
  c) jax.lax.approx_max_k with aggregate_to_topk (TPU PartialReduce)
     — approximate, listed only to see the speed-of-light

Timings use the scalarized-sync pattern (tunnel-safe).
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
    _ = float(jax.tree.leaves(out)[0].sum().astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].sum().astype(jnp.float32))
    return (time.perf_counter() - t0) / iters * 1000.0


def grouped_topk(scores, k, groups):
    n = scores.shape[0]
    m = -(-n // groups)
    pad = groups * m - n
    s = jnp.concatenate([scores, jnp.full((pad,), -jnp.inf, scores.dtype)])
    s = s.reshape(groups, m)
    kk = min(k, m)
    gv, gi = jax.lax.top_k(s, kk)                    # [G, k]
    base = (jnp.arange(groups, dtype=jnp.int32) * m)[:, None]
    cand_v = gv.reshape(-1)
    cand_i = (gi + base).reshape(-1)
    v, j = jax.lax.top_k(cand_v, k)
    return v, cand_i[j]


def main():
    n, k = 176_640, 1000
    x = jnp.asarray(np.random.randn(n).astype(np.float32))

    flat = jax.jit(lambda s: jax.lax.top_k(s, k))
    print(f"flat top_k          {timeit(flat, x):7.3f} ms")

    for g in (2, 4, 8, 16, 32):
        fn = jax.jit(lambda s, g=g: grouped_topk(s, k, g))
        print(f"grouped g={g:<3d}       {timeit(fn, x):7.3f} ms")

    ap = jax.jit(lambda s: jax.lax.approx_max_k(s, k, recall_target=0.99,
                                                aggregate_to_topk=True))
    print(f"approx_max_k        {timeit(ap, x):7.3f} ms")

    # the real pipeline also gathers deltas/anchors at the top-k indices;
    # include a gather to see if it matters
    deltas = jnp.asarray(np.random.randn(n, 4).astype(np.float32))

    def with_gather(s, d):
        v, i = jax.lax.top_k(s, k)
        return v, d[i]
    print(f"flat + gather       {timeit(jax.jit(with_gather), x, deltas):7.3f} ms")


if __name__ == "__main__":
    main()
