"""Pinned micro-anchor for cross-session bench normalization.

The tunneled chip's absolute speed varies between sessions (the SAME
code measured 90.5 vs 56.4 FPS on different days — CLAUDE.md perf
table), so a raw FPS delta across rounds partially measures the
tunnel's mood.  This module times two pinned, code-independent
programs — a bf16 1024^3 matmul chain and an RPN-shaped 3x3 conv —
whose cost never changes with framework work; benches embed the result
as ``anchor_ms`` so any two sessions' numbers can be normalized.

Both programs loop on-device via ``lax.fori_loop`` so one dispatch
amortizes the tunnel's ~2.5-4 ms round-trip floor, and sync is a
scalar fetch (block_until_ready is unreliable on axon).
"""

from __future__ import annotations

import time


def measure_anchor(n_loop: int = 50, repeats: int = 3) -> dict:
    """Returns {"anchor_matmul_ms", "anchor_conv_ms"} — per-iteration
    device time of the pinned programs (best of ``repeats``)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def matmul_chain(x):
        def body(_, acc):
            return jnp.tanh(acc @ x)
        return jax.lax.fori_loop(0, n_loop, body, x).sum()

    @jax.jit
    def conv_chain(x, k):
        dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        def body(_, acc):
            y = jax.lax.conv_general_dilated(acc, k, (1, 1), "SAME",
                                             dimension_numbers=dn)
            return jnp.tanh(y)
        return jax.lax.fori_loop(0, n_loop, body, x).sum()

    x_mm = jnp.ones((1024, 1024), jnp.bfloat16)
    x_cv = jnp.ones((1, 184, 320, 128), jnp.bfloat16)
    k_cv = jnp.full((3, 3, 128, 128), 0.01, jnp.bfloat16)

    out = {}
    for name, fn, args in (("anchor_matmul_ms", matmul_chain, (x_mm,)),
                           ("anchor_conv_ms", conv_chain, (x_cv, k_cv))):
        _ = float(fn(*args))  # compile + warm
        best = float("inf")
        for _r in range(repeats):
            t0 = time.perf_counter()
            _ = float(fn(*args))  # scalar fetch = sync
            best = min(best, (time.perf_counter() - t0) / n_loop)
        out[name] = round(best * 1000.0, 4)
    return out


if __name__ == "__main__":
    import json

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    print(json.dumps(measure_anchor()))
