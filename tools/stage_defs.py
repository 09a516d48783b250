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

import jax.numpy as jnp
import numpy as np


def build_stages(model, params, h=736, w=1280):
    """Return (stages, extras): the full inference-step stage list.

    ``stages`` is an ordered list of (name, fn, args, perturb); feeding
    each fn its args reproduces the dataflow of one frame step (each
    stage's outputs seed the next stage's inputs, computed eagerly
    here).  ``extras`` carries the step inputs (image_u8, image, state)
    for the caller's FULL-STEP measurement.
    """
    from functools import partial

    from siammot_tpu.models.siammot import UPSCALE, normalize_images
    from siammot_tpu.models.emm import (decode_response_fused,
                                        pool_search_region, pool_template)
    from siammot_tpu.ops.roi_align_windowed import pack_levels
    from siammot_tpu.models.rpn import select_proposals
    from siammot_tpu.models.box_head import pool_levels
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

    extras = dict(image_u8=image_u8, image=image, state=state)
    return stages, extras
