#!/usr/bin/env python3
"""Loop-amplified device timing over the tunneled chip.

Per-call dispatch to the tunneled axon chip costs ~4.4 ms (a fully
dead jit "times" at that floor), so single-call stage timings are
meaningless below ~5 ms.  This tool runs each stage N times INSIDE one
jit — iterations chained by a scalar data dependence so XLA cannot
parallelize or DCE them — and reports the slope between two loop counts:
pure device time per iteration, dispatch excluded.

Usage: python tools/profile_device.py [stage ...]
Stages: stem level2 body features rpn select box emm decode solver step
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


def loop_time(make_fn, n_lo=2, n_hi=8, reps=8):
    """make_fn(n) -> jitted callable returning a scalar; times reps calls
    at two loop counts and returns (per-iter ms, r0 ms at n_lo)."""
    out = []
    for n in (n_lo, n_hi):
        f = make_fn(n)
        _ = float(f())          # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            s = f()
        _ = float(s)
        out.append((time.perf_counter() - t0) / reps * 1000.0)
    return (out[1] - out[0]) / (n_hi - n_lo), out[0]


def chained(body, init_x, n):
    """Run body n times, each iteration's input perturbed by the previous
    scalar output — a real serial chain."""
    def step(carry, _):
        s = body(init_x, carry)
        return s, None

    @jax.jit
    def run():
        s, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
        return s
    return run


def main():
    from siammot_tpu.configs.defaults import get_cfg
    from siammot_tpu.models.siammot import SiamMOT
    from siammot_tpu.models import dla as dla_mod

    which = set(sys.argv[1:]) or {"stem", "level2", "body", "features"}

    cfg = get_cfg()
    cfg.freeze()
    model = SiamMOT(cfg)
    h, w = 736, 1280
    params = model.init_params(jax.random.PRNGKey(0), (h, w))
    params = model.cast_params(params)
    net = model.net
    image = jnp.asarray(np.random.RandomState(0)
                        .rand(1, h, w, 3).astype(np.float32))

    body = dla_mod.build_dla(cfg.MODEL.BACKBONE.CONV_BODY,
                             stage_with_dcn=cfg.MODEL.DLA.STAGE_WITH_DCN,
                             s2d_stem=cfg.TPU.S2D_STEM)
    bp = {"params": params["params"]["body"]}
    dt = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32

    def report(name, make):
        per, base = loop_time(make)
        print(f"{name:24s} {per:7.3f} ms/iter   (call floor {base:5.2f})")

    if "stem" in which:
        stem = dla_mod.S2DStem(16, 32) if cfg.TPU.S2D_STEM else None
        sp = {"params": params["params"]["body"]["stem"]}

        def mk(n):
            def one(x, s):
                y = stem.apply(sp, (x + s).astype(dt))
                return jnp.sum(y.astype(jnp.float32))
            return chained(one, image, n)
        report("stem (->s2 x1)", mk)

    if "level2" in which or "body" in which:
        def mk_k(k):
            def mk(n):
                def one(x, s):
                    outs = body.apply(bp, (x + s).astype(dt))
                    return sum(jnp.sum(o.astype(jnp.float32))
                               for o in outs[:k])
                return chained(one, image, n)
            return mk
        if "level2" in which:
            report("body through level2", mk_k(1))
        if "body" in which:
            report("body full", mk_k(4))

    if "features" in which:
        def mk(n):
            def one(x, s):
                f = net.apply(params, x + s, method=net.features)
                return sum(jnp.sum(l.astype(jnp.float32)) for l in f)
            return chained(one, image, n)
        report("features (body+fpn)", mk)

    head_stages = {"rpn", "select", "selnonms", "selfori", "topk", "nms", "tail", "pack", "box",
                   "srpool", "emm", "decode", "solver", "template", "step"}
    if which & head_stages:
        from functools import partial
        from siammot_tpu.models.siammot import UPSCALE
        from siammot_tpu.models.emm import (decode_response_fused,
                                            pool_search_region, pool_template)
        from siammot_tpu.ops.roi_align_windowed import pack_levels
        from siammot_tpu.models.rpn import select_proposals
        from siammot_tpu.models.box_head import pool_levels
        from siammot_tpu.core.structures import Boxes, concat_boxes
        from siammot_tpu.models.track_solver import solve

        k = model.max_tracks
        ecfg, hcfg, scfg = model.ecfg, model.hcfg, model.scfg
        feats = jax.jit(lambda p, x: net.apply(p, x, method=net.features))(
            params, image)
        logits, deltas = jax.jit(
            lambda p, f: net.apply(p, f, method=net.rpn_maps))(params, feats)
        anchors = model.anchors_for((h, w))
        pack = jax.jit(lambda f: pack_levels(f[:4], net.box_scales))(feats)
        pb, ps, pv = jax.jit(lambda l, d: select_proposals(
            l, d, anchors, (w, h), model.rcfg_test))(logits, deltas)
        rois = jnp.concatenate([pb[0], jnp.zeros((k, 4))], axis=0)
        levels = pool_levels(rois, 4)
        state = model.empty_state()

        def sum32(t):
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree.leaves(t)
                       if hasattr(l, "astype"))

        if "rpn" in which:
            def mk(n):
                def one(f, s):
                    f = [l + s.astype(l.dtype) for l in f]
                    return sum32(net.apply(params, f, method=net.rpn_maps))
                return chained(one, feats, n)
            report("rpn maps", mk)

        if "select" in which:
            def mk(n):
                def one(ld, s):
                    l2 = [l + s.astype(l.dtype) for l in ld[0]]
                    return sum32(select_proposals(l2, ld[1], anchors, (w, h),
                                                  model.rcfg_test))
                return chained(one, (logits, deltas), n)
            report("proposal select+nms", mk)

        if "tail" in which:
            kf = min(model.rcfg_test.fpn_post_nms_top_n, 5000)
            sc5k = jnp.asarray(np.random.RandomState(1)
                               .rand(1, 5000).astype(np.float32))

            def mk(n):
                def one(sc, s):
                    masked = sc + s
                    top, idx = jax.lax.top_k(masked, kf)
                    return jnp.sum(top) + jnp.sum(idx.astype(jnp.float32))
                return chained(one, sc5k, n)
            report("  select: final top_k", mk)

            def mk(n):
                def one(sc, s):
                    masked = sc + s
                    order = jnp.argsort(-masked, axis=-1, stable=True)
                    idx = order[..., :kf]
                    top = jnp.take_along_axis(masked, idx, axis=-1)
                    return jnp.sum(top) + jnp.sum(idx.astype(jnp.float32))
                return chained(one, sc5k, n)
            report("  select: sort variant", mk)

        if "selfori" in which:
            import siammot_tpu.core.nms as nms_core
            sv = (nms_core.FORI_ROUNDS, nms_core.DYNAMIC_EPILOGUE)
            for rounds in (16, 32, 64):
                try:
                    nms_core.FORI_ROUNDS = rounds
                    nms_core.DYNAMIC_EPILOGUE = False

                    def mk(n):
                        def one(ld, s):
                            l2 = [l + s.astype(l.dtype) for l in ld[0]]
                            return sum32(select_proposals(
                                l2, ld[1], anchors, (w, h), model.rcfg_test))
                        return chained(one, (logits, deltas), n)
                    report(f"  select fori-only {rounds}", mk)
                finally:
                    nms_core.FORI_ROUNDS, nms_core.DYNAMIC_EPILOGUE = sv

        if "selnonms" in which:
            import siammot_tpu.models.rpn as rpn_mod
            saved = rpn_mod.nms_mask
            try:
                rpn_mod.nms_mask = \
                    lambda boxes, scores, valid, iou_threshold, max_out: valid

                def mk(n):
                    def one(ld, s):
                        l2 = [l + s.astype(l.dtype) for l in ld[0]]
                        return sum32(select_proposals(
                            l2, ld[1], anchors, (w, h), model.rcfg_test))
                    return chained(one, (logits, deltas), n)
                report("  select minus nms", mk)
            finally:
                rpn_mod.nms_mask = saved

        if "topk" in which or "nms" in which:
            from siammot_tpu.models.rpn import _topk_level
            from siammot_tpu.core.nms import nms_mask

            def run_topk(lgs, dls):
                outs = []
                for lg, dl, anch in zip(lgs, dls, anchors):
                    n_, h_, w_, a_ = lg.shape
                    fn = jax.vmap(partial(_topk_level, image_size=(w, h),
                                          rcfg=model.rcfg_test,
                                          k=model.rcfg_test.pre_nms_top_n),
                                  in_axes=(0, 0, None))
                    outs.append(fn(lg.reshape(n_, -1),
                                   dl.reshape(n_, -1, 4), anch))
                return outs

            if "topk" in which:
                def mk(n):
                    def one(ld, s):
                        l2 = [l + s.astype(l.dtype) for l in ld[0]]
                        return sum32(run_topk(l2, ld[1]))
                    return chained(one, (logits, deltas), n)
                report("  select: topk+decode", mk)

            if "nms" in which:
                outs = jax.jit(lambda: run_topk(logits, deltas))()
                sb = jnp.stack([o[0] for o in outs]).reshape(
                    -1, model.rcfg_test.pre_nms_top_n, 4)
                ss = jnp.stack([o[1] for o in outs]).reshape(sb.shape[:2])
                sk = jnp.stack([o[2] for o in outs]).reshape(sb.shape[:2])

                def mk(n):
                    def one(b, s):
                        nmsf = jax.vmap(partial(
                            nms_mask,
                            iou_threshold=model.rcfg_test.nms_thresh,
                            max_out=model.rcfg_test.post_nms_top_n))
                        return jnp.sum(nmsf(b + s, ss, sk)
                                       .astype(jnp.float32))
                    return chained(one, sb, n)
                report("  select: batched nms", mk)

        if "pack" in which:
            def mk(n):
                def one(f, s):
                    f = [l + s.astype(l.dtype) for l in f[:4]]
                    return sum32(pack_levels(f, net.box_scales))
                return chained(one, feats, n)
            report("pack levels", mk)

        if "box" in which:
            def mk(n):
                def one(pk, s):
                    pk2 = jax.tree.map(
                        lambda l: l + s.astype(l.dtype) if l.dtype in
                        (jnp.float32, jnp.bfloat16) else l, pk)
                    return sum32(net.apply(params, feats, rois[None],
                                           levels[None], pk2,
                                           method=net.box_predict))
                return chained(one, pack, n)
            report("box head (pool+mlp)", mk)

        if "srpool" in which:
            def mk(n):
                def one(pk, s):
                    pk2 = jax.tree.map(
                        lambda l: l + s.astype(l.dtype) if l.dtype in
                        (jnp.float32, jnp.bfloat16) else l, pk)
                    return sum32(pool_search_region(
                        None, state.boxes, state.sr,
                        jnp.zeros((k,), jnp.int32), ecfg, pack=pk2,
                        window=model.window_sr))
                return chained(one, pack, n)
            report("emm SR pool", mk)

        if "emm" in which or "decode" in which:
            sr_feats = jax.jit(lambda pk: pool_search_region(
                None, state.boxes, state.sr, jnp.zeros((k,), jnp.int32),
                ecfg, pack=pk, window=model.window_sr))(pack)
            if "emm" in which:
                def mk(n):
                    def one(sf, s):
                        sf = sf + s.astype(sf.dtype)
                        return sum32(net.apply(params, sf, state.template,
                                               method=net.emm_predict))
                    return chained(one, sr_feats, n)
                report("emm xcorr+predict", mk)
            if "decode" in which:
                cls_l, ctr_l, reg_l = jax.jit(
                    lambda sf: net.apply(params, sf, state.template,
                                         method=net.emm_predict))(sr_feats)
                def mk(n):
                    def one(c, s):
                        c2 = c + s.astype(c.dtype)
                        return sum32(decode_response_fused(
                            c2, ctr_l, reg_l, state.sr, state.boxes, ecfg,
                            UPSCALE))
                    return chained(one, cls_l, n)
                report("fused decode", mk)

        if "solver" in which:
            dets = Boxes.empty(100)
            tracks = Boxes(boxes=jnp.zeros((k, 4)), scores=jnp.zeros((k,)),
                           ids=state.ids, labels=state.labels,
                           valid=jnp.zeros((k,), bool))
            rows = concat_boxes(dets, tracks)
            def mk(n):
                def one(r, s):
                    r2 = r.replace(scores=r.scores + s)
                    return sum32(solve(state, r2, scfg=scfg))
                return chained(one, rows, n)
            report("solver", mk)

        if "template" in which:
            def mk(n):
                def one(pk, s):
                    pk2 = jax.tree.map(
                        lambda l: l + s.astype(l.dtype) if l.dtype in
                        (jnp.float32, jnp.bfloat16) else l, pk)
                    return sum32(pool_template(
                        None, state.boxes, jnp.zeros((k,), jnp.int32), ecfg,
                        pack=pk2, window=model.window_template))
                return chained(one, pack, n)
            report("template pool", mk)

        if "step" in which:
            def mk(n):
                def one(x, s):
                    out, st = model.forward_inference(
                        params, x + s, state, image_size=(w, h))
                    return sum32(st.boxes) + sum32(out)
                return chained(one, image, n)
            report("FULL STEP", mk)


if __name__ == "__main__":
    main()
