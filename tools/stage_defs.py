#!/usr/bin/env python3
"""Shared full-step stage decomposition for the profiling tools.

One source of truth for the per-stage breakdown of
``SiamMOT.forward_inference`` at bench shapes (720p), used by
``tools/profile_amplified.py`` (floor-free amplified timing) and
``tools/roofline.py`` (measured ms vs compute/memory bound).  Each stage
is a (name, fn, args, perturb) tuple; ``perturb`` follows
``profile_amplified.amp_time`` semantics (arg indices to nudge with the
scan carry so CSE can't fold the amplified iterations).
"""

import jax
import jax.numpy as jnp
import numpy as np


def build_stages(model, params, h=736, w=1280, occupancy=0):
    """Return (stages, extras): the full inference-step stage list.

    ``stages`` is an ordered list of (name, fn, args, perturb); feeding
    each fn its args reproduces the dataflow of one frame step (each
    stage's outputs seed the next stage's inputs, computed eagerly
    here), INCLUDING the occupancy masking the real step applies (the
    masked Pallas kernels skip dead slots; measuring the unmasked
    formulation would overstate the EMM/pool stages).  ``occupancy``
    sets how many of the K track slots are live (bench under trained
    load runs ~38/128).  ``extras`` carries the step inputs (image_u8,
    image, state) for the caller's FULL-STEP measurement.
    """
    from functools import partial

    from siammot_tpu.models.siammot import UPSCALE, normalize_images
    from siammot_tpu.models.emm import (decode_response_fused,
                                        make_search_region,
                                        pool_search_region, pool_template)
    from siammot_tpu.ops.roi_align_windowed import pack_levels
    from siammot_tpu.models.rpn import select_proposals
    from siammot_tpu.models.box_head import pool_levels, postprocess
    from siammot_tpu.core.structures import Boxes, concat_boxes
    from siammot_tpu.models.track_solver import solve

    k = model.max_tracks
    net, ecfg, scfg = model.net, model.ecfg, model.scfg
    rng = np.random.RandomState(0)
    image_u8 = jnp.asarray((rng.rand(1, h, w, 3) * 255).astype(np.uint8))
    image = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))

    stages = []

    def stage(name, fn, *args, perturb=None):
        stages.append((name, fn, args, perturb))
        return fn(*args)

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

    state = model.empty_state()
    if occupancy:
        # realistic load: first `occupancy` slots live, boxes scattered
        # over the frame at track-ish sizes, search regions derived the
        # way the step derives them (make_search_region)
        occ = min(occupancy, k)
        bx = np.zeros((k, 4), np.float32)
        bx[:, 0] = rng.uniform(0, w - 120, k)
        bx[:, 1] = rng.uniform(0, h - 200, k)
        bx[:, 2] = bx[:, 0] + rng.uniform(30, 120, k)
        bx[:, 3] = bx[:, 1] + rng.uniform(60, 200, k)
        live = jnp.arange(k) < occ
        tmpl = jnp.asarray(
            rng.rand(*np.asarray(state.template.shape)).astype(np.float32),
        ).astype(state.template.dtype)
        state = state.replace(
            boxes=jnp.asarray(bx), active=live,
            ids=jnp.where(live, jnp.arange(k), -1).astype(jnp.int32),
            template=jnp.where(live[:, None, None, None], tmpl,
                               state.template))
        state = state.replace(sr=make_search_region(state.boxes, ecfg))
    occupied = state.occupied
    # mirror forward_inference: masked kernels see the occupancy mask
    occ_k = occupied if model.masked_kernels else None

    sr_feats = stage(
        "emm SR pool",
        lambda pk, b, sr, v: pool_search_region(
            None, b, sr, jnp.zeros((k,), jnp.int32), ecfg, pack=pk,
            window=model.window_sr, valid=v),
        pack, state.boxes, state.sr, occupied, perturb=(1, 2))

    cls_l, ctr_l, reg_l = stage(
        "emm xcorr+predict",
        lambda p, s, t, v: net.apply(p, s, t, v, method=net.emm_predict),
        params, sr_feats, state.template, occ_k, perturb=(1, 2))

    tboxes, tconf = stage(
        "fused decode",
        lambda cl_, ct_, rg_, sr, b, v: decode_response_fused(
            cl_, ct_, rg_, sr, b, ecfg, UPSCALE,
            use_pallas=net.use_pallas and model.decode_pallas, valid=v),
        cls_l, ctr_l, reg_l, state.sr, state.boxes, occ_k)

    # shared box-head pass over proposals + propagated tracks, exactly
    # as the step concatenates them
    rois = jnp.concatenate([pb[0], tboxes], axis=0)
    all_valid = jnp.concatenate([pv[0], occupied], axis=0)
    levels = pool_levels(rois, 4)
    cl, bd = stage(
        "box head (pool+mlp)",
        lambda p, f, r, lv, pk, v: net.apply(p, f, r[None], lv[None], pk,
                                             v[None],
                                             method=net.box_predict),
        params, feats, rois, levels, pack, all_valid, perturb=(2,))
    cl, bd = cl[0], bd[0]
    n_prop = pb.shape[1]

    prop = Boxes(boxes=pb[0], scores=ps[0],
                 ids=jnp.full((n_prop,), -1, jnp.int32),
                 labels=jnp.zeros((n_prop,), jnp.int32), valid=pv[0])
    detections = stage(
        "postprocess dets",
        lambda c, b2, pr: postprocess(c, b2, pr, (w, h), model.hcfg),
        cl[:n_prop], bd[:n_prop], prop)

    def refine(t_cl, t_bd, tb, tc, labels, valid):
        # _refine_tracks (models/siammot.py forward_inference)
        from siammot_tpu.core import boxes as box_ops
        t_prob = jax.nn.softmax(t_cl, axis=-1)
        lab = jnp.clip(labels, 0, model.num_classes - 1)
        app = jnp.take_along_axis(t_prob, lab[:, None], axis=1)[:, 0]
        dec = box_ops.decode(t_bd, tb, model.hcfg.reg_weights).reshape(
            k, model.num_classes, 4)
        rb = jnp.take_along_axis(
            dec, lab[:, None, None].repeat(4, -1), axis=1)[:, 0]
        rs = (app + tc) / 2.0 + 1.0
        return Boxes(boxes=rb, scores=rs, ids=state.ids, labels=labels,
                     valid=valid)

    tracks = stage("track refine", refine, cl[n_prop:], bd[n_prop:],
                   tboxes, tconf, state.labels, occupied)

    allrows = concat_boxes(detections, tracks)
    out, row_is_active, upd = stage(
        "solver", lambda st, rws: solve(st, rws, scfg), state, allrows)

    def compact(o, active):
        pri = jnp.where(active, o.scores, -jnp.inf)
        _, top = jax.lax.top_k(pri, k)
        act = jax.tree.map(lambda x: x[top], o)
        return act.replace(valid=active[top])

    act = stage("state compact (top-k)", compact, out, row_is_active)

    fresh_template = stage(
        "template pool",
        lambda pk, b, v: pool_template(None, b, jnp.zeros((k,), jnp.int32),
                                       ecfg, pack=pk,
                                       window=model.window_template,
                                       valid=v),
        pack, act.boxes, act.valid, perturb=(1,))

    def rebuild(st, a, tmpl2, u):
        from siammot_tpu.models.track_state import rebuild_state
        fresh_sr = make_search_region(a.boxes, ecfg)
        return rebuild_state(
            st.replace(active=u["active_after"],
                       last_active=u["last_active"],
                       ids=jnp.where(u["expired"], -1, st.ids)),
            a, a.valid, tmpl2, fresh_sr, u["keep_dormant"], u["next_id"],
            st.frame_idx)

    stage("state rebuild", rebuild, state, act, fresh_template, upd)

    extras = dict(image_u8=image_u8, image=image, state=state)
    return stages, extras
