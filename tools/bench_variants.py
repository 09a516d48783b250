#!/usr/bin/env python3
"""Deep-variant zoo bench: single-stream 720p FPS/chip per conv body.

The reference publishes trained detector inits for DLA-34/102/169 and
ResNet-50/101 (+=DCN variants) (``/root/reference/readme/model_zoo.md:
51-59``) but benches only DLA-34.  This times the FULL jitted SiamMOT
frame step (RPN mode, empty tracker) for each body on the real chip and
verifies the torch import/export converter roundtrips every variant's
parameter inventory.

Weights are random (FPS does not depend on values); the anchor_ms fields
normalize against cross-session tunnel variance.

Usage: python tools/bench_variants.py [BODY ...]
       default: DLA-34-FPN DLA-102-FPN DLA-169-FPN DLA-102-DCN-FPN R-50-FPN
       (DCN rides Bottleneck stages only — reference DlaBasic swallows
       with_dcn, so a DLA-34-DCN would silently bench plain DLA-34)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

H, W = 720, 1280
HP = -(-H // 32) * 32

# stage-channel config per body (cfg validation requires agreement)
DLA_CH = {
    "DLA-34-FPN": (64, 128, 256, 512),
    "DLA-102-FPN": (128, 256, 512, 1024),
    "DLA-169-FPN": (128, 256, 512, 1024),
}


def make_cfg(body: str):
    from siammot_tpu.configs.defaults import get_cfg

    cfg = get_cfg()
    dcn = body.endswith("-DCN-FPN")
    base = body.replace("-DCN-FPN", "-FPN") if dcn else body
    cfg.MODEL.BACKBONE.CONV_BODY = base
    if base.startswith("DLA"):
        s2, s3, s4, s5 = DLA_CH[base]
        cfg.MODEL.DLA.DLA_STAGE2_OUT_CHANNELS = s2
        cfg.MODEL.DLA.DLA_STAGE3_OUT_CHANNELS = s3
        cfg.MODEL.DLA.DLA_STAGE4_OUT_CHANNELS = s4
        cfg.MODEL.DLA.DLA_STAGE5_OUT_CHANNELS = s5
        if dcn:
            # reference dla_dcn configs: DCN on the deep stages
            cfg.MODEL.DLA.STAGE_WITH_DCN = (False, False, False, True,
                                            True, True)
        # S2D stem folding is parameter-compatible only with the standard
        # 7x7 stride-1 stem of DLA; keep it on (production default)
    else:
        if dcn:
            cfg.MODEL.RESNETS.STAGE_WITH_DCN = (False, True, True, True)
        cfg.TPU.S2D_STEM = False
    opts = os.environ.get("SIAMMOT_BENCH_OPTS", "").split()
    if opts:
        cfg.merge_from_list(opts)
    cfg.freeze()
    return cfg


def bench_body(body: str, n_iters: int = 30):
    import jax
    import jax.numpy as jnp

    from siammot_tpu.models.siammot import SiamMOT
    from siammot_tpu.utils.checkpoint import (export_torch_checkpoint,
                                              import_torch_checkpoint)

    cfg = make_cfg(body)
    model = SiamMOT(cfg)
    params = model.init_params(jax.random.PRNGKey(0), (HP, W))

    # converter inventory roundtrip (the zoo promise: reference inits are
    # importable for every body)
    sd = export_torch_checkpoint(params)
    back, leftovers = import_torch_checkpoint(sd, params)
    assert not leftovers, sorted(leftovers)[:5]
    n_tensors = len(sd)

    rng = np.random.RandomState(0)
    frame = jnp.asarray((rng.rand(1, HP, W, 3) * 255).astype(np.uint8))
    state = model.empty_state()

    step = jax.jit(lambda p, f, s: model.forward_inference(
        p, f, s, image_size=(W, H)))
    t0 = time.perf_counter()
    out, state = step(params, frame, state)
    _ = int(np.asarray(state.frame_idx))
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(n_iters):
        out, state = step(params, frame, state)
    _ = int(np.asarray(state.frame_idx))
    dt = (time.perf_counter() - t0) / n_iters
    return dict(body=body, fps=round(1.0 / dt, 2),
                ms_per_frame=round(dt * 1000, 2),
                compile_s=round(compile_s, 1), n_tensors=n_tensors)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench_anchor import measure_anchor
    anchor = measure_anchor()

    bodies = sys.argv[1:] or ["DLA-34-FPN", "DLA-102-FPN", "DLA-169-FPN",
                              "DLA-102-DCN-FPN", "R-50-FPN"]
    for body in bodies:
        r = bench_body(body)
        print(json.dumps({**r, "unit": "frames/s",
                          "vs_baseline": round(r["fps"] / 17.0, 3),
                          **anchor}), flush=True)


if __name__ == "__main__":
    main()
