#!/usr/bin/env python3
"""Floor-free stage breakdown of the inference step on the real chip.

``tools/profile_step.py`` times each stage in its own jit, so every
number carries the tunnel's per-dispatch floor (~0.4-4 ms) and sub-ms
stages are unreadable.  This amplifies each stage xN inside ONE jit
(lax.scan whose carry perturbs the inputs, defeating CSE — the
``profile_rpn.py`` trick) so the floor divides out, then checks that the
amplified stage times actually add up to the measured full step.

Caveat: while_loop-bearing stages (NMS dynamic epilogue) serialize under
scan and report inflated times; run with SIAMMOT_NMS_EPILOGUE=0 to see
the fori-only cost.
"""

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

N_AMP = 10


def amp_time(fn, *args, perturb=None, n=N_AMP, reps=3):
    """Amplified timing: run fn xN inside one jit, per-iteration cost.

    ``perturb`` lists the arg indices whose leaves get the carry added
    (defeating CSE).  Perturbing a 20M-param tree costs ~3 ms/iter by
    itself, so param args must NOT be in the list; pass
    ``perturb="first-leaf:<i>"`` to nudge just one leaf of arg i when
    nothing else varies (e.g. a params-only stage).
    """
    first_leaf_of = None
    if isinstance(perturb, str) and perturb.startswith("first-leaf:"):
        first_leaf_of = int(perturb.split(":")[1])
        perturb = ()
    elif perturb is None:
        perturb = tuple(range(len(args)))

    def nudge(x, c):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x + c.astype(x.dtype)
        if jnp.issubdtype(x.dtype, jnp.integer) or x.dtype == jnp.uint8:
            return x + c.astype(jnp.int32).astype(x.dtype)  # wraparound ok
        return x

    @jax.jit
    def run(eps, args):
        def body(c, _):
            a = list(args)
            for i in perturb:
                a[i] = jax.tree.map(lambda x: nudge(x, c), a[i])
            if first_leaf_of is not None:
                leaves, td = jax.tree.flatten(a[first_leaf_of])
                leaves[0] = leaves[0] + c.astype(leaves[0].dtype)
                a[first_leaf_of] = jax.tree.unflatten(td, leaves)
            out = fn(*a)
            s = sum(jnp.sum(l.astype(jnp.float32))
                    for l in jax.tree.leaves(out)
                    if hasattr(l, "astype"))
            return (s * 1e-30).astype(jnp.float32), None

        c, _ = jax.lax.scan(body, eps, None, length=n)
        return c

    eps = jnp.float32(0.0)
    _ = float(run(eps, args))
    best = float("inf")
    for _i in range(reps):
        t0 = time.perf_counter()
        _ = float(run(eps, args))
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1000.0


def main():
    from siammot_tpu.configs.defaults import get_cfg
    from siammot_tpu.models.siammot import SiamMOT, UPSCALE
    from siammot_tpu.models.emm import (decode_response_fused,
                                        pool_search_region, pool_template)
    from siammot_tpu.ops.roi_align_windowed import pack_levels
    from siammot_tpu.models.rpn import select_proposals
    from siammot_tpu.models.box_head import pool_levels
    from siammot_tpu.core.structures import Boxes, concat_boxes
    from siammot_tpu.models.track_solver import solve

    cfg = get_cfg()
    cfg.freeze()
    model = SiamMOT(cfg)
    h, w = 736, 1280
    params = model.init_params(jax.random.PRNGKey(0), (h, w))
    k = model.max_tracks
    net, ecfg, scfg = model.net, model.ecfg, model.scfg

    image_u8 = jnp.asarray((np.random.rand(1, h, w, 3) * 255).astype(np.uint8))
    image = jnp.asarray(np.random.rand(1, h, w, 3).astype(np.float32))

    rows = []

    def stage(name, fn, *args, perturb=None, n=N_AMP):
        t = amp_time(fn, *args, perturb=perturb, n=n)
        rows.append((name, t))
        print(f"{name:26s} {t:8.3f} ms", flush=True)
        return fn(*args)

    from siammot_tpu.models.siammot import normalize_images
    stage("normalize u8",
          lambda x: normalize_images(x, net.pixel_mean, net.pixel_std,
                                     net.to_bgr255), image_u8)

    stage("cast params -> bf16", lambda p: model.cast_params(p), params,
          perturb="first-leaf:0")

    feats = stage("backbone+fpn",
                  lambda p, x: net.apply(p, x, method=net.features), params,
                  image, perturb=(1,))

    logits, deltas = stage(
        "rpn maps", lambda p, f: net.apply(p, f, method=net.rpn_maps),
        params, feats, perturb=(1,))

    anchors = model.anchors_for((h, w))
    pb, ps, pv = stage(
        "proposal select+nms",
        lambda l, d: select_proposals(l, d, anchors, (w, h), model.rcfg_test),
        logits, deltas)

    pack = stage("pack levels",
                 lambda f: pack_levels(f[:4], model.net.box_scales), feats)

    rois = jnp.concatenate([pb[0], jnp.zeros((k, 4))], axis=0)
    levels = pool_levels(rois, 4)
    stage("box head (pool+mlp)",
          lambda p, f, r, lv, pk: net.apply(p, f, r[None], lv[None], pk,
                                            method=net.box_predict),
          params, feats, rois, levels, pack, perturb=(2,))

    state = model.empty_state()
    sr_feats = stage(
        "emm SR pool",
        lambda pk, b, sr: pool_search_region(
            None, b, sr, jnp.zeros((k,), jnp.int32), ecfg, pack=pk,
            window=model.window_sr),
        pack, state.boxes, state.sr, perturb=(1, 2))

    cls_l, ctr_l, reg_l = stage(
        "emm xcorr+predict",
        lambda p, s, t: net.apply(p, s, t, method=net.emm_predict),
        params, sr_feats, state.template, perturb=(1, 2))

    stage("fused decode",
          lambda cl_, ct_, rg_, sr, b: decode_response_fused(
              cl_, ct_, rg_, sr, b, ecfg, UPSCALE),
          cls_l, ctr_l, reg_l, state.sr, state.boxes)

    dets = Boxes.empty(100)
    tracks = Boxes(boxes=jnp.zeros((k, 4)), scores=jnp.zeros((k,)),
                   ids=state.ids, labels=state.labels,
                   valid=jnp.zeros((k,), bool))
    allrows = concat_boxes(dets, tracks)
    stage("solver", partial(solve, scfg=scfg), state, allrows)

    stage("template pool",
          lambda pk, b: pool_template(None, b, jnp.zeros((k,), jnp.int32),
                                      ecfg, pack=pk,
                                      window=model.window_template),
          pack, state.boxes, perturb=(1,))

    total = sum(t for _, t in rows)
    print(f"{'SUM of stages':26s} {total:8.3f} ms")

    step = model.jit_step(image_size=(w, h))
    out, st = step(params, image_u8, state)
    _ = int(st.frame_idx)
    t0 = time.perf_counter()
    for _ in range(30):
        out, st = step(params, image_u8, st)
    _ = int(st.frame_idx)
    dt = (time.perf_counter() - t0) / 30 * 1000
    print(f"{'FULL STEP':26s} {dt:8.3f} ms  ({1000.0/dt:.1f} FPS)")


if __name__ == "__main__":
    main()
