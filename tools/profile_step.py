#!/usr/bin/env python3
"""Stage-level timing of the per-frame inference step on the real chip.

Times each sub-stage of ``SiamMOT.forward_inference`` in isolation (its
own jit, warm) at the bench shapes so perf work can target the real
bottleneck.  Not part of the library surface — a developer tool.
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
    """Jit fn but return only a f32 scalar so the sync fetch is 4 bytes
    (the tunneled axon platform makes full-array fetches look like compute
    time)."""
    def inner(*args, **kw):
        out = fn(*args, **kw)
        arrs = [l for l in jax.tree.leaves(out) if hasattr(l, "astype")]
        return sum(jnp.sum(l.astype(jnp.float32)) for l in arrs), out
    jfn = jax.jit(inner)

    def run(*args, **kw):
        return jfn(*args, **kw)[1]

    def timer(*args, iters=20, **kw):
        _ = float(jfn(*args, **kw)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            s = jfn(*args, **kw)[0]
        _ = float(s)
        return (time.perf_counter() - t0) / iters * 1000.0

    run.timed = timer
    return run


def timed(fn, *args, iters=20, **kw):
    return fn.timed(*args, iters=iters, **kw)


def main():
    from siammot_tpu.configs.defaults import get_cfg
    from siammot_tpu.models.siammot import SiamMOT, UPSCALE
    from siammot_tpu.models.emm import (decode_response_fused,
                                        make_search_region,
                                        pool_search_region, pool_template)
    from siammot_tpu.ops.roi_align_windowed import pack_levels
    from siammot_tpu.models.rpn import select_proposals
    from siammot_tpu.models.box_head import pool_levels, postprocess
    from siammot_tpu.core.structures import Boxes, concat_boxes
    from siammot_tpu.models.track_solver import solve
    from siammot_tpu.ops.upsample import upsample_bicubic

    cfg = get_cfg()
    cfg.freeze()
    model = SiamMOT(cfg)
    h, w = 736, 1280
    params = model.init_params(jax.random.PRNGKey(0), (h, w))
    k = model.max_tracks
    net, ecfg, hcfg, scfg = model.net, model.ecfg, model.hcfg, model.scfg

    image = jnp.asarray(np.random.rand(1, h, w, 3).astype(np.float32))

    feats_fn = scalarized(lambda p, x: net.apply(p, x, method=net.features))
    feats = feats_fn(params, image)
    print(f"backbone+fpn        {timed(feats_fn, params, image):8.2f} ms")

    rpn_fn = scalarized(lambda p, f: net.apply(p, f, method=net.rpn_maps))
    logits, deltas = rpn_fn(params, feats)
    print(f"rpn maps            {timed(rpn_fn, params, feats):8.2f} ms")

    anchors = model.anchors_for((h, w))
    sel_fn = scalarized(lambda l, d: select_proposals(l, d, anchors, (w, h),
                                                   model.rcfg_test))
    pb, ps, pv = sel_fn(logits, deltas)
    print(f"proposal select+nms {timed(sel_fn, logits, deltas):8.2f} ms")

    pack_fn = scalarized(lambda f: pack_levels(f[:4], model.net.box_scales))
    pack = pack_fn(feats)
    print(f"pack levels         {timed(pack_fn, feats):8.2f} ms")

    n_prop = pb.shape[1]
    rois = jnp.concatenate([pb[0], jnp.zeros((k, 4))], axis=0)
    levels = pool_levels(rois, 4)
    box_fn = scalarized(lambda p, f, r, lv, pk: net.apply(
        p, f, r[None], lv[None], pk, method=net.box_predict))
    cl, bd = box_fn(params, feats, rois, levels, pack)
    print(f"box head (pool+mlp) {timed(box_fn, params, feats, rois, levels, pack):8.2f} ms")

    state = model.empty_state()
    feats1 = [f[0][None] for f in feats]

    def emm_pool(pk, boxes, sr):
        return pool_search_region(None, boxes, sr,
                                  jnp.zeros((k,), jnp.int32), ecfg,
                                  pack=pk, window=model.window_sr)
    pool_fn = scalarized(emm_pool)
    sr_feats = pool_fn(pack, state.boxes, state.sr)
    print(f"emm SR pool         {timed(pool_fn, pack, state.boxes, state.sr):8.2f} ms")

    emm_fn = scalarized(lambda p, s, t: net.apply(p, s, t,
                                               method=net.emm_predict))
    cls_l, ctr_l, reg_l = emm_fn(params, sr_feats, state.template)
    print(f"emm xcorr+predict   {timed(emm_fn, params, sr_feats, state.template):8.2f} ms")

    ud_fn = scalarized(lambda cl_, ct_, rg_, sr, boxes: decode_response_fused(
        cl_, ct_, rg_, sr, boxes, ecfg, UPSCALE))
    tb, tc = ud_fn(cls_l, ctr_l, reg_l, state.sr, state.boxes)
    print(f"fused decode        {timed(ud_fn, cls_l, ctr_l, reg_l, state.sr, state.boxes):8.2f} ms")

    dets = Boxes.empty(100)
    tracks = Boxes(boxes=jnp.zeros((k, 4)), scores=jnp.zeros((k,)),
                   ids=state.ids, labels=state.labels,
                   valid=jnp.zeros((k,), bool))
    rows = concat_boxes(dets, tracks)
    solve_fn = scalarized(partial(solve, scfg=scfg))
    out = solve_fn(state, rows)
    print(f"solver              {timed(solve_fn, state, rows):8.2f} ms")

    tmpl_fn = scalarized(lambda pk, b: pool_template(
        None, b, jnp.zeros((k,), jnp.int32), ecfg, pack=pk,
        window=model.window_template))
    tm = tmpl_fn(pack, state.boxes)
    print(f"template pool       {timed(tmpl_fn, pack, state.boxes):8.2f} ms")

    step = model.jit_step(image_size=(w, h))
    out, st = step(params, image, state)
    _ = int(st.frame_idx)
    t0 = time.perf_counter()
    for _ in range(30):
        out, st = step(params, image, st)
    _ = int(st.frame_idx)
    dt = (time.perf_counter() - t0) / 30 * 1000
    print(f"FULL STEP           {dt:8.2f} ms  ({1000.0/dt:.1f} FPS)")


if __name__ == "__main__":
    main()
