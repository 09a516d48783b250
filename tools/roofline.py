#!/usr/bin/env python3
"""Full-step roofline: measured ms vs each stage's compute/memory bound.

For EVERY sub-stage of the inference step (the shared decomposition in
``tools/stage_defs.py`` — normalize, param cast, backbone+fpn, rpn maps,
proposal select+NMS, pack, box head, EMM pool/xcorr+predict/decode,
solver, template pool) this lowers the stage jit, reads XLA's cost
analysis (flops, bytes accessed), and compares the measured time against
the speed-of-light bound on a v5e chip:

    bound_ms = max(flops / PEAK_FLOPS, bytes / PEAK_BW)

A stage within ~1.3x of its bound is spent; a stage far above it names
the next lever (VERDICT r3/r4 item 1's "prove the ceiling" deliverable).

Timing uses the amplified-scan trick from ``tools/profile_amplified.py``
(xN inside ONE jit so the tunnel's per-dispatch floor divides out);
``--times k=v,...`` (ms) can still override/supply timings measured
elsewhere.  Caveats printed with the table: the XLA cost model counts
algorithmic bytes (no fusion credit), so %HBM can exceed what the chip
actually moves; while_loop stages (NMS dynamic epilogue) serialize under
the amplification scan.

v5e peaks: 197 TFLOP/s bf16 / 394 TOPS int8, ~819 GB/s HBM.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PEAK_FLOPS = 197e12          # bf16 MXU
PEAK_BW = 819e9              # HBM


def analyze(fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):   # older jax returns [dict]
        ca = ca[0]
    ca = ca or {}
    return float(ca.get("flops", 0.0)), float(
        ca.get("bytes accessed", 0.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--times", default="",
                    help="comma list stage=ms overriding measurement")
    ap.add_argument("--no-measure", action="store_true",
                    help="cost-analysis only (CPU-safe)")
    ap.add_argument("--occupancy", type=int, default=38,
                    help="live track slots (bench-realistic default 38; "
                         "0 = empty tracker)")
    args = ap.parse_args()
    overrides = dict(kv.split("=") for kv in args.times.split(",") if kv)

    from siammot_tpu.configs.defaults import get_cfg
    from siammot_tpu.models.siammot import SiamMOT
    from stage_defs import build_stages
    from profile_amplified import amp_time

    cfg = get_cfg()
    cfg.freeze()
    model = SiamMOT(cfg)
    h, w = 736, 1280
    params = model.init_params(jax.random.PRNGKey(0), (h, w))

    stages, extras = build_stages(model, params, h, w,
                                  occupancy=args.occupancy)

    print(f"occupancy {args.occupancy}/{model.max_tracks}")
    print(f"{'stage':22s} {'ms':>8s} {'GFLOP':>8s} {'TF/s':>7s} "
          f"{'%MXU':>6s} {'GB':>7s} {'GB/s':>7s} {'%HBM':>6s} "
          f"{'bound':>8s} {'x-over':>7s}")
    tot_ms = tot_bound = 0.0
    for name, fn, a, perturb in stages:
        flops, bts = analyze(fn, *a)
        if name in overrides:
            ms = float(overrides[name])
        elif args.no_measure:
            ms = float("nan")
        else:
            ms = amp_time(fn, *a, perturb=perturb)
        bound_ms = max(flops / PEAK_FLOPS, bts / PEAK_BW) * 1e3
        if ms == ms:
            tot_ms += ms
            tot_bound += bound_ms
        print(f"{name:22s} {ms:8.3f} {flops/1e9:8.1f} "
              f"{flops/ms/1e9 if ms else 0:7.1f} "
              f"{flops/ms/1e9/(PEAK_FLOPS/1e12)*100 if ms else 0:5.1f}% "
              f"{bts/1e9:7.3f} {bts/ms/1e6 if ms else 0:7.1f} "
              f"{bts/ms/1e6/(PEAK_BW/1e9)*100 if ms else 0:5.1f}% "
              f"{bound_ms:8.3f} {ms/bound_ms if bound_ms else 0:7.2f}",
              flush=True)
    if tot_ms:
        print(f"{'SUM of stages':22s} {tot_ms:8.3f}"
              f"{'':51s} {tot_bound:8.3f} {tot_ms/tot_bound:7.2f}")

    if not args.no_measure:
        image_u8, state = extras["image_u8"], extras["state"]
        step = model.jit_step(image_size=(w, h))
        out, st = step(params, image_u8, state)
        _ = int(st.frame_idx)
        t0 = time.perf_counter()
        for _ in range(30):
            out, st = step(params, image_u8, st)
        _ = int(st.frame_idx)
        dt = (time.perf_counter() - t0) / 30 * 1000
        print(f"{'FULL STEP':22s} {dt:8.3f} ms  ({1000.0/dt:.1f} FPS)")


if __name__ == "__main__":
    main()
