#!/usr/bin/env python3
"""Micro-profile of RPN proposal selection internals on the chip."""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(fn, *args, iters=30):
    jf = jax.jit(lambda *a: jax.tree.map(
        lambda t: jnp.sum(t.astype(jnp.float32)), fn(*a)))
    v = jax.tree.leaves(jf(*args))[0]
    _ = float(v)
    t0 = time.perf_counter()
    for _ in range(iters):
        v = jax.tree.leaves(jf(*args))[0]
    _ = float(v)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    from siammot_tpu.core.nms import nms_mask
    rng = np.random.RandomState(0)

    # level-0 top-k at bench shape
    scores0 = jnp.asarray(rng.rand(184 * 320 * 3).astype(np.float32))
    print(f"top_k(176k->1000)   "
          f"{timed(lambda s: jax.lax.top_k(s, 1000), scores0):7.2f} ms")
    scoresall = jnp.asarray(rng.rand(234000).astype(np.float32))
    print(f"top_k(234k->1000)   "
          f"{timed(lambda s: jax.lax.top_k(s, 1000), scoresall):7.2f} ms")
    print(f"sigmoid(234k)       "
          f"{timed(jax.nn.sigmoid, scoresall):7.2f} ms")

    # batched 5-level NMS at bench shape
    def rand_boxes(n):
        x1 = rng.uniform(0, 1200, n)
        y1 = rng.uniform(0, 700, n)
        return np.stack([x1, y1, x1 + rng.uniform(10, 120, n),
                         y1 + rng.uniform(10, 120, n)], -1).astype(np.float32)

    b = jnp.asarray(np.stack([rand_boxes(1000) for _ in range(5)]))
    s = jnp.asarray(rng.rand(5, 1000).astype(np.float32))
    v = jnp.ones((5, 1000), bool)
    nms = jax.vmap(partial(nms_mask, iou_threshold=0.7, max_out=300))
    print(f"batched NMS 5x1000  {timed(nms, b, s, v):7.2f} ms")

    # full cross-level top-k
    allsc = jnp.asarray(rng.rand(5000).astype(np.float32))
    print(f"top_k(5000->300)    "
          f"{timed(lambda x: jax.lax.top_k(x, 300), allsc):7.2f} ms")


if __name__ == "__main__":
    main()
