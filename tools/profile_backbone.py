#!/usr/bin/env python3
"""Backbone-internal timing on the real chip: cumulative prefixes of the
DLA body (stem, level2..level5) plus FPN, at bench shapes.  Prefix deltas
give per-stage costs without trusting sub-ms isolated timings over the
tunnel.  Developer tool, not library surface."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(jfn, *args, iters=30):
    s = float(jfn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        s = jfn(*args)
    _ = float(s)
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    import flax.linen as nn
    from siammot_tpu.configs.defaults import get_cfg
    from siammot_tpu.models.siammot import SiamMOT
    from siammot_tpu.models import dla as dla_mod

    cfg = get_cfg()
    cfg.freeze()
    model = SiamMOT(cfg)
    h, w = 736, 1280
    params = model.init_params(jax.random.PRNGKey(0), (h, w))
    params = model.cast_params(params)
    net = model.net
    image = jnp.zeros((1, h, w, 3), jnp.float32)  # bench ships f32 frames

    # Rebuild the DLA body standalone so we can cut it at stage k
    body = dla_mod.build_dla(cfg.MODEL.BACKBONE.CONV_BODY,
                             stage_with_dcn=cfg.MODEL.DLA.STAGE_WITH_DCN,
                             s2d_stem=cfg.TPU.S2D_STEM)
    body_params = {"params": params["params"]["body"]}

    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32

    def norm(x):
        return x.astype(dtype)

    @jax.jit
    def full_feats(p, x):
        f = net.apply(p, x, method=net.features)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in f)

    print(f"features (norm+body+fpn)  {timeit(full_feats, params, image):7.2f} ms")

    # cumulative: run body but sum only the first k pyramid outputs; XLA
    # dead-code-eliminates the untouched deeper stages
    def prefix(k):
        @jax.jit
        def fn(p, x):
            outs = body.apply(p, norm(x))
            return sum(jnp.sum(o.astype(jnp.float32)) for o in outs[:k])
        return fn

    names = ["norm+stem+level2 (s4)", "+level3 (s8)", "+level4 (s16)",
             "+level5 (s32)"]
    prev = 0.0
    for k, name in enumerate(names, start=1):
        t = timeit(prefix(k), body_params, image)
        print(f"{name:26s} {t:7.2f} ms   (delta {t - prev:6.2f})")
        prev = t


if __name__ == "__main__":
    main()
