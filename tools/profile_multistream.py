#!/usr/bin/env python3
"""Per-stage profile of the S-stream batched step (VERDICT r3 weak #2).

The 1->16 stream saturation curve flattens at ~1.93x aggregate
(CLAUDE.md session-6: 87.7 -> 169.2 FPS) and nothing measured *which*
stage stops scaling.  This vmaps each sub-stage of
``SiamMOT.forward_inference`` over S streams (the exact
``build_multistream_step`` decomposition) and times it at S in
{1, 4, 8, 16}: a stage whose time grows ~linearly in S is already
compute-bound (batching buys nothing); a stage with flat time is where
the batching win lives; anything superlinear is the plateau's cause.

Usage: python tools/profile_multistream.py [S ...]
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


def scalarized(fn):
    def inner(*args, **kw):
        out = fn(*args, **kw)
        arrs = [l for l in jax.tree.leaves(out) if hasattr(l, "astype")]
        return sum(jnp.sum(l.astype(jnp.float32)) for l in arrs), out
    jfn = jax.jit(inner)

    def run(*args, **kw):
        return jfn(*args, **kw)[1]

    def timer(*args, iters=int(os.environ.get("PMS_ITERS", 20)), **kw):
        _ = float(jfn(*args, **kw)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            s = jfn(*args, **kw)[0]
        _ = float(s)
        return (time.perf_counter() - t0) / iters * 1000.0

    run.timed = timer
    return run


def main():
    from siammot_tpu.configs.defaults import get_cfg
    from siammot_tpu.models.siammot import SiamMOT, UPSCALE
    from siammot_tpu.models.emm import (decode_response_fused,
                                        pool_search_region, pool_template)
    from siammot_tpu.ops.roi_align_windowed import pack_levels
    from siammot_tpu.models.rpn import select_proposals
    from siammot_tpu.models.box_head import pool_levels
    from siammot_tpu.models.track_solver import solve
    from siammot_tpu.core.structures import Boxes, concat_boxes
    from siammot_tpu.parallel.multistream import (build_multistream_step,
                                                  empty_states)

    streams = [int(a) for a in sys.argv[1:]] or [1, 4, 8, 16]
    cfg = get_cfg()
    cfg.freeze()
    model = SiamMOT(cfg)
    h = int(os.environ.get("PMS_H", 736))
    w = int(os.environ.get("PMS_W", 1280))
    params = model.init_params(jax.random.PRNGKey(0), (h, w))
    k = model.max_tracks
    net, ecfg, scfg = model.net, model.ecfg, model.scfg

    rng = np.random.RandomState(0)
    results = {}
    for S in streams:
        images = jnp.asarray(rng.rand(S, h, w, 3).astype(np.float32))

        rows = {}
        feats_fn = scalarized(lambda p, x: net.apply(p, x,
                                                     method=net.features))
        feats = feats_fn(params, images)
        rows["backbone+fpn"] = feats_fn.timed(params, images)

        rpn_fn = scalarized(lambda p, f: net.apply(p, f,
                                                   method=net.rpn_maps))
        logits, deltas = rpn_fn(params, feats)
        rows["rpn maps"] = rpn_fn.timed(params, feats)

        anchors = model.anchors_for((h, w))
        sel_fn = scalarized(lambda l, d: select_proposals(
            l, d, anchors, (w, h), model.rcfg_test))
        pb, ps, pv = sel_fn(logits, deltas)
        rows["proposal select"] = sel_fn.timed(logits, deltas)

        # per-stream pack (mirrors forward_inference: each vmapped stream
        # packs its own batch-1 feature pyramid)
        def pack1(f1):
            return pack_levels(jax.tree.map(lambda a: a[None], f1[:4]),
                               model.net.box_scales)

        pack_fn = scalarized(lambda f: jax.vmap(pack1)(f))
        pack = pack_fn(feats)
        rows["pack levels"] = pack_fn.timed(feats)

        rois = jnp.concatenate([pb, jnp.zeros((S, k, 4))], axis=1)
        levels = jax.vmap(lambda r: pool_levels(r, 4))(rois)
        box_fn = scalarized(lambda p, f, r, lv, pk: jax.vmap(
            lambda f1, r1, lv1, pk1: net.apply(
                p, jax.tree.map(lambda a: a[None], f1), r1[None], lv1[None],
                pk1, method=net.box_predict))(f, r, lv, pk))
        _ = box_fn(params, feats, rois, levels, pack)
        rows["box head"] = box_fn.timed(params, feats, rois, levels, pack)

        states = empty_states(model, S)

        def emm_pool(pk, boxes, sr):
            return jax.vmap(lambda pk1, b1, s1: pool_search_region(
                None, b1, s1, jnp.zeros((k,), jnp.int32), ecfg, pack=pk1,
                window=model.window_sr))(pk, boxes, sr)
        pool_fn = scalarized(emm_pool)
        sr_feats = pool_fn(pack, states.boxes, states.sr)
        rows["emm SR pool"] = pool_fn.timed(pack, states.boxes, states.sr)

        emm_fn = scalarized(lambda p, s, t: jax.vmap(
            lambda s1, t1: net.apply(p, s1, t1, method=net.emm_predict)
        )(s, t))
        cls_l, ctr_l, reg_l = emm_fn(params, sr_feats, states.template)
        rows["emm xcorr+predict"] = emm_fn.timed(params, sr_feats,
                                                 states.template)

        ud_fn = scalarized(lambda cl_, ct_, rg_, sr, boxes: jax.vmap(
            lambda a, b, c, d, e: decode_response_fused(
                a, b, c, d, e, ecfg, UPSCALE))(cl_, ct_, rg_, sr, boxes))
        _ = ud_fn(cls_l, ctr_l, reg_l, states.sr, states.boxes)
        rows["fused decode"] = ud_fn.timed(cls_l, ctr_l, reg_l, states.sr,
                                           states.boxes)

        dets = Boxes.empty(100)
        tracks1 = Boxes(boxes=jnp.zeros((k, 4)), scores=jnp.zeros((k,)),
                        ids=jnp.zeros((k,), jnp.int32),
                        labels=jnp.zeros((k,), jnp.int32),
                        valid=jnp.zeros((k,), bool))
        rows1 = concat_boxes(dets, tracks1)
        rows_s = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (S,) + x.shape), rows1)
        solve_fn = scalarized(lambda st, rw: jax.vmap(
            partial(solve, scfg=scfg))(st, rw))
        _ = solve_fn(states, rows_s)
        rows["solver"] = solve_fn.timed(states, rows_s)

        tmpl_fn = scalarized(lambda pk, b: jax.vmap(
            lambda pk1, b1: pool_template(
                None, b1, jnp.zeros((k,), jnp.int32), ecfg, pack=pk1,
                window=model.window_template))(pk, b))
        _ = tmpl_fn(pack, states.boxes)
        rows["template pool"] = tmpl_fn.timed(pack, states.boxes)

        # full batched step (the production path)
        step = build_multistream_step(model, image_size=(w, h),
                                      donate_state=False)
        frames = jnp.asarray(
            (rng.rand(S, 1, h, w, 3) * 255).astype(np.uint8))
        out, st = step(params, frames, states)
        _ = int(np.asarray(st.frame_idx)[0])
        t0 = time.perf_counter()
        for _ in range(20):
            out, st = step(params, frames, st)
        _ = int(np.asarray(st.frame_idx)[0])
        rows["FULL STEP"] = (time.perf_counter() - t0) / 20 * 1000.0

        results[S] = rows
        print(f"S={S:3d}  " + "  ".join(
            f"{k2}={v:.2f}ms" for k2, v in rows.items()), flush=True)

    # scaling table vs S=1
    base = results[streams[0]]
    print(f"\nstage scaling (time_S / time_{streams[0]}; ideal flat=1.0, "
          f"compute-bound={streams[-1] // streams[0]}.0):")
    for k2 in base:
        line = [f"{k2:18s}"]
        for S in streams:
            line.append(f"S{S}: {results[S][k2] / max(base[k2], 1e-9):5.2f}x"
                        f" ({results[S][k2]:7.2f}ms)")
        print("  ".join(line))
    full = {S: results[S]["FULL STEP"] for S in streams}
    print("\naggregate FPS:", {S: round(S * 1000.0 / v, 1)
                               for S, v in full.items()})


if __name__ == "__main__":
    main()
