#!/usr/bin/env python3
"""Per-stage roofline: measured ms vs the stage's compute/memory bound.

For each sub-stage of the inference step this lowers the stage jit,
reads XLA's cost analysis (flops, bytes accessed), and compares the
measured time against the speed-of-light bound on a v5e chip:

    bound_ms = max(flops / PEAK_FLOPS, bytes / PEAK_BW)

A stage within ~1.3x of its bound is spent; a stage far above it names
the next lever (VERDICT r3 item 1's "prove the ceiling" deliverable).

On the chip this measures times itself; `--times k=v,...` (ms) can
override/supply timings measured elsewhere (e.g. from
tools/profile_step.py, whose isolated jits carry a 2.5-4 ms dispatch
floor each — pass FULL-step-attributed numbers for honest ratios).

v5e peaks: 197 TFLOP/s bf16 / 394 TOPS int8, ~819 GB/s HBM.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PEAK_FLOPS = 197e12          # bf16 MXU
PEAK_BW = 819e9              # HBM


def analyze(jfn, *args):
    c = jfn.lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):   # older jax returns [dict]
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(
        ca.get("bytes accessed", 0.0))


def timeit(jfn, *args, iters=30):
    out = jfn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--times", default="",
                    help="comma list stage=ms overriding measurement")
    ap.add_argument("--no-measure", action="store_true",
                    help="cost-analysis only (CPU-safe)")
    args = ap.parse_args()
    overrides = dict(kv.split("=") for kv in args.times.split(",") if kv)

    from siammot_tpu.configs.defaults import get_cfg
    from siammot_tpu.models.siammot import SiamMOT

    cfg = get_cfg()
    cfg.freeze()
    model = SiamMOT(cfg)
    h, w = 736, 1280
    params = model.init_params(jax.random.PRNGKey(0), (h, w))
    net = model.net
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))

    stages = {}
    feats_fn = jax.jit(lambda p, x: net.apply(p, x, method=net.features))
    feats = feats_fn(params, image)
    stages["backbone+fpn"] = (feats_fn, (params, image))

    rpn_fn = jax.jit(lambda p, f: net.apply(p, f, method=net.rpn_maps))
    _ = rpn_fn(params, feats)
    stages["rpn maps"] = (rpn_fn, (params, feats))

    k = model.max_tracks
    state = model.empty_state()
    from siammot_tpu.ops.roi_align_windowed import pack_levels
    pack_fn = jax.jit(lambda f: pack_levels(f[:4], net.box_scales))
    pack = pack_fn(feats)
    from siammot_tpu.models.emm import pool_search_region
    pool_fn = jax.jit(lambda pk, b, sr: pool_search_region(
        None, b, sr, jnp.zeros((k,), jnp.int32), model.ecfg, pack=pk,
        window=model.window_sr))
    sr_feats = pool_fn(pack, state.boxes, state.sr)
    emm_fn = jax.jit(lambda p, s, t: net.apply(p, s, t,
                                               method=net.emm_predict))
    _ = emm_fn(params, sr_feats, state.template)
    stages["emm xcorr+predict"] = (emm_fn, (params, sr_feats,
                                            state.template))

    print(f"{'stage':20s} {'ms':>8s} {'GFLOP':>8s} {'TF/s':>7s} "
          f"{'%MXU':>6s} {'GB':>7s} {'GB/s':>7s} {'%HBM':>6s} "
          f"{'bound':>8s} {'x-over':>7s}")
    for name, (jfn, a) in stages.items():
        flops, bts = analyze(jfn, *a)
        if name in overrides:
            ms = float(overrides[name])
        elif args.no_measure:
            ms = float("nan")
        else:
            ms = timeit(jfn, *a)
        bound_ms = max(flops / PEAK_FLOPS, bts / PEAK_BW) * 1e3
        print(f"{name:20s} {ms:8.3f} {flops/1e9:8.1f} "
              f"{flops/ms/1e9 if ms else 0:7.1f} "
              f"{flops/ms/1e9/(PEAK_FLOPS/1e12)*100 if ms else 0:5.1f}% "
              f"{bts/1e9:7.3f} {bts/ms/1e6 if ms else 0:7.1f} "
              f"{bts/ms/1e6/(PEAK_BW/1e9)*100 if ms else 0:5.1f}% "
              f"{bound_ms:8.3f} {ms/bound_ms if bound_ms else 0:7.2f}")


if __name__ == "__main__":
    main()
