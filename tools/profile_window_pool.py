#!/usr/bin/env python3
"""Loop-amplified device timing of the Pallas window-pool forward at the
EMM SR-pool shape (the biggest single head cost at full track capacity).

Times the kernel alone (the XLA weights prologue is measured separately
by profile_device's srpool stage; kernel ~1.5 ms of that stage's ~3.2 ms
at full capacity).  No while loops anywhere, so the chained-scan slope
is trustworthy.

NOTE: a plain rank-3 dot_general reformulation of the stripe compute
(one [S,hb]x[hb,(w c)] matmul + batched pass 2, no transposes) was tried
and measured only ~4% faster — and Mosaic MIS-LOWERS the plain rank-3
form inside this kernel (0.45 rel err on chip; interpret-mode exact), so
the batched formulation stays.
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

import siammot_tpu.ops.pallas.window_pool as wp


def main():
    variants = sys.argv[1:] or ["batched"]

    # SR-pool shape at 720p, full K=128 capacity, bf16 table
    n, ss, sr, c, window = 128, 30, 2, 128, 128
    s = ss * sr
    rows, wmax = 345, 320
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(rows, wmax, c).astype(np.float32)
                        ).astype(jnp.bfloat16)
    origins = jnp.asarray(np.stack(
        [rng.randint(0, rows - window, n),
         8 * rng.randint(0, (wmax - window) // 8 + 1, n)], -1)
        .astype(np.int32))
    wy = jnp.asarray(rng.rand(n, s, window).astype(np.float32))
    wx = jnp.asarray(rng.rand(n, s, window).astype(np.float32))

    def loop_time(make, n_lo=2, n_hi=8, reps=8):
        out = []
        for k in (n_lo, n_hi):
            f = make(k)
            _ = float(f())
            t0 = time.perf_counter()
            for _ in range(reps):
                r = f()
            _ = float(r)
            out.append((time.perf_counter() - t0) / reps * 1000.0)
        return (out[1] - out[0]) / (n_hi - n_lo), out[0]

    ref = None
    for v in variants:

        def mk(k):
            def step(carry, _):
                o = wp.window_pool_pallas(table, origins, wy + carry, wx,
                                          window)
                return jnp.sum(o) * 1e-20, None

            @jax.jit
            def run():
                sc, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=k)
                return sc
            return run

        try:
            per, base = loop_time(mk)
            print(f"{v:10s} {per:7.3f} ms/iter   (call floor {base:5.2f})")
            out = jax.jit(lambda: wp.window_pool_pallas(
                table, origins, wy, wx, window))()
            if ref is None:
                ref = np.asarray(out)
            else:
                err = np.max(np.abs(np.asarray(out) - ref)
                             / (np.abs(ref) + 1.0))
                print(f"{'':10s} max rel err vs first variant: {err:.2e}")
        except Exception as e:
            print(f"{v:10s} FAILED: {type(e).__name__}: {str(e)[:300]}")




def prologue_breakdown():
    """Time the full SR pool site (prologue + kernel + bin-average) and
    the prologue alone (kernel stubbed to zeros) at step shapes."""
    import siammot_tpu.ops.roi_align_windowed as raw
    from siammot_tpu.configs.defaults import get_cfg
    from siammot_tpu.models.siammot import SiamMOT
    from siammot_tpu.models.emm import pool_search_region, make_search_region
    from siammot_tpu.models.box_head import pool_levels
    from siammot_tpu.ops.roi_align_windowed import pack_levels

    cfg = get_cfg()
    cfg.freeze()
    model = SiamMOT(cfg)
    h, w = 736, 1280
    params = model.init_params(jax.random.PRNGKey(0), (h, w))
    params = model.cast_params(params)
    net = model.net
    image = jnp.asarray(np.random.RandomState(0)
                        .rand(1, h, w, 3).astype(np.float32))
    feats = jax.jit(lambda p, x: net.apply(p, x, method=net.features))(
        params, image)
    pack = jax.jit(lambda f: pack_levels(f[:4], net.box_scales))(feats)
    k = model.max_tracks
    rng = np.random.RandomState(1)
    x1 = rng.uniform(0, 1000, k); y1 = rng.uniform(0, 500, k)
    boxes = jnp.asarray(np.stack(
        [x1, y1, x1 + rng.uniform(30, 200, k),
         y1 + rng.uniform(30, 200, k)], -1).astype(np.float32))
    sr = jax.jit(lambda b: make_search_region(b, model.ecfg))(boxes)

    def loop_time(make, n_lo=2, n_hi=8, reps=8):
        out = []
        for kk in (n_lo, n_hi):
            f = make(kk)
            _ = float(f())
            t0 = time.perf_counter()
            for _ in range(reps):
                r = f()
            _ = float(r)
            out.append((time.perf_counter() - t0) / reps * 1000.0)
        return (out[1] - out[0]) / (n_hi - n_lo), out[0]

    def mk_site(stub=False):
        def mk(n):
            def step(carry, _):
                pk = jax.tree.map(
                    lambda l: l + carry.astype(l.dtype) if l.dtype in
                    (jnp.float32, jnp.bfloat16) else l, pack)
                o = pool_search_region(None, boxes, sr,
                                       jnp.zeros((k,), jnp.int32),
                                       model.ecfg, pack=pk,
                                       window=model.window_sr)
                return jnp.sum(o) * 1e-20, None

            @jax.jit
            def run():
                sc, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
                return sc
            return run
        return mk

    per, base = loop_time(mk_site(False))
    print(f"{'sr site full':18s} {per:7.3f} ms/iter   (call floor {base:5.2f})")


if __name__ == "__main__":
    main()
    prologue_breakdown()
