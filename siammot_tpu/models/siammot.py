"""SiamMOT meta-architecture.

TPU-native equivalent of the reference top module + combined ROI heads
(``/root/reference/siammot/modelling/rcnn.py:15-73``,
``roi_heads.py:11-102``): DLA-FPN backbone -> RPN -> box head -> EMM track
head -> track solver, with the inter-frame ``track_memory`` replaced by an
on-device ``TrackState`` so the whole per-frame step is ONE jitted
function `(params, image, state) -> (detections, state')` — scannable over
frames with zero host round-trips.

Efficiency note vs the reference: detections and propagated-track
refinement share a single box-head pass (the reference runs the head twice,
``roi_heads.py:24-41`` then ``_refine_tracks`` at ``roi_heads.py:60-84``;
the MLP is row-independent so batching the two is exact).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core import boxes as box_ops
from ..core.structures import Boxes, concat_boxes
from .box_head import (BoxHead, BoxHeadConfig, box_head_loss, postprocess,
                       pool_levels, subsample_proposals)
from .emm_sampler import sample_track_pairs
from .emm import emm_loss
from .rpn import rpn_loss
from .dla import build_dla
from .emm import (EMMConfig, EMMHead, decode_response_fused,
                  make_search_region, pool_search_region, pool_template,
                  response_locations)
from .fpn import FPN
from .rpn import RPNConfig, RPNHead, base_anchors, grid_anchors, select_proposals
from .track_solver import SolverConfig, solve
from .track_state import TrackState, rebuild_state

UPSCALE = 16  # reference upsamples response maps x16 (track_core.py:69-71)


def normalize_images(images, pixel_mean, pixel_std, to_bgr255=False,
                     frame_sizes=None):
    """Device-side pixel normalization of raw uint8 frames.

    Exactly the host ``Normalize`` transform's f32 math ((x/255 - mean) /
    std, or BGR*255 mode), run on device so the host->HBM transfer is
    uint8 (4x smaller — the tunneled-chip train loop is transfer-bound).
    ``frame_sizes`` [B, 2] (w, h) re-zeroes each frame's padded border
    AFTER normalization, matching the reference's pad-after-normalize
    (maskrcnn ``to_image_list``): without it the pad would be black
    (-mean/std) instead of 0.  Pass None when the input has no padding or
    came pre-normalized (f32 passthrough).
    """
    if images.dtype != jnp.uint8:
        return images
    x = images.astype(jnp.float32)
    if to_bgr255:
        x = x[..., ::-1]
    else:
        x = x / 255.0
    mean = jnp.asarray(pixel_mean, jnp.float32)
    std = jnp.asarray(pixel_std, jnp.float32)
    x = (x - mean) / std
    if frame_sizes is not None:
        h, w = x.shape[1:3]
        xs = jax.lax.broadcasted_iota(jnp.int32, (1, h, w, 1), 2)
        ys = jax.lax.broadcasted_iota(jnp.int32, (1, h, w, 1), 1)
        mask = (xs < frame_sizes[:, None, None, 0:1]) & \
            (ys < frame_sizes[:, None, None, 1:2])
        x = jnp.where(mask, x, 0.0)
    return x


class SiamMOTNet(nn.Module):
    """Parameter container; staged apply methods drive each sub-network."""

    conv_body: str
    fpn_channels: int
    num_anchors: int
    box_resolution: int
    box_scales: tuple
    box_sampling: int
    mlp_dim: int
    num_classes: int
    compute_dtype: str = "float32"
    use_pallas: bool = True
    stage_with_dcn: tuple = (False,) * 6
    s2d_stem: bool = False
    matmul_stages: tuple = ()
    # ResNet bodies only (CONV_BODY "R-*"); ignored for DLA
    resnet_opts: tuple = ()
    # pixel normalization for uint8 inputs (device-side: the host ships
    # raw uint8 frames — 4x less host->HBM traffic — and the normalize
    # fuses into the stem conv).  float32 inputs are assumed normalized.
    pixel_mean: tuple = (0.0, 0.0, 0.0)
    pixel_std: tuple = (1.0, 1.0, 1.0)
    to_bgr255: bool = False

    def setup(self):
        if self.conv_body.startswith("R-"):
            from .resnet import build_resnet
            self.body = build_resnet(self.conv_body,
                                     matmul_stages=self.matmul_stages,
                                     **dict(self.resnet_opts))
        else:
            self.body = build_dla(self.conv_body, self.stage_with_dcn,
                                  self.s2d_stem, self.matmul_stages)
        self.fpn = FPN(self.fpn_channels)
        self.rpn = RPNHead(self.num_anchors)
        self.box = BoxHead(self.box_resolution, self.box_scales,
                           self.box_sampling, self.mlp_dim, self.num_classes,
                           compute_dtype=self.compute_dtype)
        self.emm = EMMHead(self.fpn_channels, use_pallas=self.use_pallas)

    def features(self, images):
        dt = jnp.dtype(self.compute_dtype)
        if images.dtype == jnp.uint8:
            images = normalize_images(images, self.pixel_mean,
                                      self.pixel_std, self.to_bgr255)
        feats = self.fpn(self.body(images.astype(dt)))
        return [f.astype(jnp.float32) for f in feats]

    def rpn_maps(self, feats):
        # head computes in the trunk dtype, outputs in f32 (apex-O1 style:
        # convs in half precision, downstream select/loss math in f32)
        dt = jnp.dtype(self.compute_dtype)
        logits, deltas = self.rpn([f.astype(dt) for f in feats])
        return ([l.astype(jnp.float32) for l in logits],
                [d.astype(jnp.float32) for d in deltas])

    def box_predict(self, feats, rois, levels, pack=None, valid=None):
        cl, bd = self.box(feats, rois, levels, pack, valid)
        return cl.astype(jnp.float32), bd.astype(jnp.float32)

    def emm_predict(self, sr_feats, templates, valid=None):
        dt = jnp.dtype(self.compute_dtype)
        cls_l, ctr_l, reg_l = self.emm(sr_feats.astype(dt),
                                       templates.astype(dt), valid)
        return (cls_l.astype(jnp.float32), ctr_l.astype(jnp.float32),
                reg_l.astype(jnp.float32))

    def __call__(self, images, rois, levels, sr_feats, templates):
        """Init-only path touching every submodule."""
        f = self.features(images)
        lg, dl = self.rpn_maps(f)
        cl, bd = self.box_predict(f, rois, levels)
        emm_out = self.emm_predict(sr_feats, templates)
        return f, lg, dl, cl, bd, emm_out


class SiamMOT:
    """Builder + pure-function forward passes (the public model API).

    Mirrors ``build_siammot(cfg)`` (reference ``rcnn.py:71``); state
    handling replaces ``flush_memory`` / ``reset_siammot_status``
    (``rcnn.py:34-39``) with explicit TrackState values.
    """

    def __init__(self, cfg):
        self.cfg = cfg
        is_resnet = cfg.MODEL.BACKBONE.CONV_BODY.startswith("R-")
        self.channels = (cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS if is_resnet
                         else cfg.MODEL.DLA.BACKBONE_OUT_CHANNELS)
        if not is_resnet:
            # In the reference, MODEL.DLA.DLA_STAGE{2..5}_OUT_CHANNELS feed
            # the FPN lateral in_channels (backbone_ext.py:18-30) and MUST
            # equal the variant's actual stage widths — a wrong override
            # crashes torch with a conv shape mismatch.  Flax laterals
            # infer input widths, so a wrong override would silently no-op
            # here; fail loudly instead.
            from .dla import DLA_VARIANTS
            variant = DLA_VARIANTS.get(cfg.MODEL.BACKBONE.CONV_BODY)
            if variant is not None:
                expect = tuple(variant["channels"][2:6])
                got = tuple(getattr(cfg.MODEL.DLA,
                                    f"DLA_STAGE{i}_OUT_CHANNELS")
                            for i in (2, 3, 4, 5))
                if got != expect:
                    raise ValueError(
                        f"MODEL.DLA.DLA_STAGE*_OUT_CHANNELS {got} do not "
                        f"match {cfg.MODEL.BACKBONE.CONV_BODY}'s stage "
                        f"widths {expect}; these keys describe the "
                        "variant's fixed stage outputs and cannot retune "
                        "it (reference backbone_ext.py:18-30)")
        self.num_classes = cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES
        self.ecfg = EMMConfig.from_cfg(cfg)
        self.hcfg = BoxHeadConfig.from_cfg(cfg)
        self.scfg = SolverConfig.from_cfg(cfg)
        self.rcfg_train = RPNConfig.from_cfg(cfg, is_train=True)
        self.rcfg_test = RPNConfig.from_cfg(cfg, is_train=False)
        self.max_tracks = cfg.TPU.MAX_TRACKS
        self.tracktor = cfg.MODEL.TRACK_HEAD.TRACKTOR
        # validate the pluggable motion model (reference registry lookup,
        # track_head.py:113-126); only EMM ships, as in the reference
        from ..utils.registry import SIAMESE_TRACKER, TRACKER_SAMPLER
        SIAMESE_TRACKER.get(cfg.MODEL.TRACK_HEAD.MODEL)
        TRACKER_SAMPLER.get(cfg.MODEL.TRACK_HEAD.MODEL)
        # kernels pending on-chip Mosaic validation (configs/defaults.py)
        self.decode_pallas = cfg.TPU.DECODE_PALLAS
        self.masked_kernels = cfg.TPU.MASKED_TRACK_KERNELS
        self.windowed = cfg.TPU.POOLER_WINDOWED
        self.train_windowed = cfg.TPU.TRAIN_POOLER_WINDOWED
        self.window_box = cfg.TPU.WINDOW_BOX
        self.window_template = cfg.TPU.WINDOW_TEMPLATE
        self.window_sr = cfg.TPU.WINDOW_SR

        self.net = SiamMOTNet(
            conv_body=cfg.MODEL.BACKBONE.CONV_BODY,
            fpn_channels=self.channels,
            num_anchors=len(cfg.MODEL.RPN.ASPECT_RATIOS),
            box_resolution=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
            box_scales=tuple(cfg.MODEL.ROI_BOX_HEAD.POOLER_SCALES),
            box_sampling=cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO,
            mlp_dim=cfg.MODEL.ROI_BOX_HEAD.MLP_HEAD_DIM,
            num_classes=self.num_classes,
            compute_dtype=cfg.TPU.COMPUTE_DTYPE,
            use_pallas=cfg.TPU.USE_PALLAS,
            stage_with_dcn=tuple(cfg.MODEL.DLA.STAGE_WITH_DCN),
            s2d_stem=cfg.TPU.S2D_STEM,
            matmul_stages=tuple(cfg.TPU.CONV_MATMUL_STAGES),
            resnet_opts=tuple(sorted({
                "stage_with_dcn": tuple(cfg.MODEL.RESNETS.STAGE_WITH_DCN),
                "num_groups": cfg.MODEL.RESNETS.NUM_GROUPS,
                "width_per_group": cfg.MODEL.RESNETS.WIDTH_PER_GROUP,
                "stride_in_1x1": cfg.MODEL.RESNETS.STRIDE_IN_1X1,
                "stem_channels": cfg.MODEL.RESNETS.STEM_OUT_CHANNELS,
                "res2_out_channels": cfg.MODEL.RESNETS.RES2_OUT_CHANNELS,
            }.items())) if is_resnet else (),
            pixel_mean=tuple(cfg.INPUT.PIXEL_MEAN),
            pixel_std=tuple(cfg.INPUT.PIXEL_STD),
            to_bgr255=bool(cfg.INPUT.TO_BGR255),
        )

        self._cell_anchors = [
            base_anchors(s, sz, tuple(cfg.MODEL.RPN.ASPECT_RATIOS))
            for s, sz in zip(cfg.MODEL.RPN.ANCHOR_STRIDE,
                             cfg.MODEL.RPN.ANCHOR_SIZES)
        ]

    def jit_step(self, image_size=None, donate_state=True):
        """Jitted per-frame inference step with a static original size."""
        fn = partial(self.forward_inference, image_size=image_size)
        return jax.jit(fn, donate_argnums=(2,) if donate_state else ())

    # -- construction -------------------------------------------------------

    def init_params(self, rng, image_hw):
        h, w = image_hw
        images = jnp.zeros((1, h, w, 3), jnp.float32)
        rois = jnp.zeros((1, 4, 4), jnp.float32)
        levels = jnp.zeros((1, 4), jnp.int32)
        t = self.ecfg.resolution
        sr = self.ecfg.sr_size
        sr_feats = jnp.zeros((2, sr, sr, self.channels), jnp.float32)
        templates = jnp.zeros((2, t, t, self.channels), jnp.float32)
        return self.net.init(rng, images, rois, levels, sr_feats, templates)

    def empty_state(self) -> TrackState:
        return TrackState.empty(self.max_tracks, self.ecfg.resolution,
                                self.channels)

    def cast_params(self, params):
        """Cast float params to the compute dtype for the step body.

        Master weights stay f32 (init/checkpoint/optimizer); the cast is
        inside the jitted step, so training gradients flow back to the
        f32 tree through the cast (apex-AMP-O1 analogue: convs/matmuls in
        half precision, losses and box math in f32).  Without this, flax
        type promotion silently runs every conv in f32 (bf16 activations
        x f32 params -> f32).
        """
        dt = jnp.dtype(self.cfg.TPU.COMPUTE_DTYPE)
        if dt == jnp.float32:
            return params
        return jax.tree.map(
            lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, params)

    def anchors_for(self, image_hw):
        """Per-level anchor arrays for a given padded input size."""
        h, w = image_hw
        out = []
        for stride, cell in zip(self.cfg.MODEL.RPN.ANCHOR_STRIDE,
                                self._cell_anchors):
            fh, fw = -(-h // stride), -(-w // stride)
            out.append(jnp.asarray(grid_anchors((fh, fw), stride, cell)))
        return out

    # -- inference step -----------------------------------------------------

    def forward_inference(self, params, images: jnp.ndarray,
                          state: TrackState,
                          given: Optional[Boxes] = None,
                          image_size: Optional[tuple] = None):
        """One frame: detect + propagate + solve + update memory.

        Args:
          images: [1, H, W, 3] normalized input frame, zero-padded to the
            32-divisible compile shape (reference ``to_image_list``).
          given: optional public detections (MOT17 mode) replacing RPN
            proposals (``roi_heads.py:24-33``).
          image_size: static (w, h) of the un-padded content, used for
            box clipping (maskrcnn keeps original sizes on the BoxList
            while the tensor is padded).  Defaults to the padded shape.

        Returns (out: Boxes over all candidate rows, state': TrackState).
        """
        net, ecfg, hcfg, scfg = self.net, self.ecfg, self.hcfg, self.scfg
        h, w = images.shape[1:3]
        image_size = image_size or (w, h)
        k = self.max_tracks
        params = self.cast_params(params)
        # uint8 input: normalize on device, re-zeroing the pad beyond the
        # static image_size (f32 input passes through untouched)
        images = normalize_images(
            images, net.pixel_mean, net.pixel_std, net.to_bgr255,
            frame_sizes=jnp.asarray([image_size], jnp.int32))

        feats = net.apply(params, images, method=net.features)
        feats1 = [f[0] for f in feats]

        # one stacked level table shared by every pooler this frame
        pack = None
        if self.windowed:
            from ..ops.roi_align_windowed import pack_levels
            pack = pack_levels(feats[:len(self.net.box_scales)],
                               self.net.box_scales,
                               dtype=jnp.dtype(self.cfg.TPU.POOLER_DTYPE))

        # ---- proposals
        if given is None:
            logits, deltas = net.apply(params, feats, method=net.rpn_maps)
            pb, ps, pv = select_proposals(
                logits, deltas, self.anchors_for((h, w)), image_size,
                self.rcfg_test)
            prop = Boxes(boxes=pb[0], scores=ps[0],
                         ids=jnp.full((pb.shape[1],), -1, jnp.int32),
                         labels=jnp.zeros((pb.shape[1],), jnp.int32),
                         valid=pv[0])
        else:
            prop = given

        # ---- track propagation (EMM) over K padded slots
        occupied = state.occupied
        batched_feats = [f[None] for f in feats1]
        # dead capacity slots skip their pooling work entirely (valid=)
        sr_feats = pool_search_region(batched_feats, state.boxes, state.sr,
                                      jnp.zeros((k,), jnp.int32), ecfg,
                                      pack=pack, window=self.window_sr,
                                      valid=occupied)
        occ_k = occupied if self.masked_kernels else None
        cls_l, ctr_l, reg_l = net.apply(params, sr_feats, state.template,
                                        occ_k, method=net.emm_predict)
        tboxes, tconf = decode_response_fused(
            cls_l, ctr_l, reg_l, state.sr, state.boxes, ecfg, UPSCALE,
            use_pallas=net.use_pallas and self.decode_pallas, valid=occ_k)
        tvalid = occupied
        if not ecfg.amodal:
            tboxes = box_ops.clip_to_image(tboxes, image_size)
            tvalid = tvalid & box_ops.nonempty_mask(tboxes)

        # ---- shared box-head pass: proposals + track refinement
        all_rois = jnp.concatenate([prop.boxes, tboxes], axis=0)
        all_valid = jnp.concatenate([prop.valid, tvalid], axis=0)
        levels = pool_levels(all_rois, len(self.net.box_scales))
        cl, bd = net.apply(params, feats, all_rois[None], levels[None],
                           pack, all_valid[None], method=net.box_predict)
        cl, bd = cl[0], bd[0]
        n_prop = prop.capacity

        detections = postprocess(cl[:n_prop], bd[:n_prop], prop, image_size,
                                 hcfg)

        # track refinement (_refine_tracks, roi_heads.py:60-84)
        t_cl, t_bd = cl[n_prop:], bd[n_prop:]
        t_prob = jax.nn.softmax(t_cl, axis=-1)
        lab = jnp.clip(state.labels, 0, self.num_classes - 1)
        app_score = jnp.take_along_axis(t_prob, lab[:, None], axis=1)[:, 0]
        dec = box_ops.decode(t_bd, tboxes, hcfg.reg_weights).reshape(
            k, self.num_classes, 4)
        rboxes = jnp.take_along_axis(
            dec, lab[:, None, None].repeat(4, -1), axis=1)[:, 0]
        if not hcfg.amodal:
            rboxes = box_ops.clip_to_image(rboxes, image_size)
        if self.tracktor:
            rscores = app_score + 1.0
        else:
            rscores = (app_score + tconf) / 2.0 + 1.0
        tracks = Boxes(boxes=rboxes, scores=rscores, ids=state.ids,
                       labels=state.labels, valid=tvalid)

        # ---- solver
        rows = concat_boxes(detections, tracks)
        out, row_is_active, upd = solve(state, rows, scfg)

        # ---- next-frame memory: compact actives to K, extract caches
        pri = jnp.where(row_is_active, out.scores, -jnp.inf)
        _, top = jax.lax.top_k(pri, k)
        act = jax.tree.map(lambda x: x[top], out)
        act = act.replace(valid=row_is_active[top])

        fresh_template = pool_template(batched_feats, act.boxes,
                                       jnp.zeros((k,), jnp.int32), ecfg,
                                       pack=pack,
                                       window=self.window_template,
                                       valid=act.valid)
        fresh_sr = make_search_region(act.boxes, ecfg)

        new_state = rebuild_state(
            state.replace(active=upd["active_after"],
                          last_active=upd["last_active"],
                          ids=jnp.where(upd["expired"], -1, state.ids)),
            act, act.valid, fresh_template, fresh_sr,
            upd["keep_dormant"], upd["next_id"], state.frame_idx)
        return out, new_state

    # -- training step ------------------------------------------------------

    def forward_train(self, params, rng, images: jnp.ndarray, gt: Boxes,
                      image_size: Optional[tuple] = None,
                      frame_sizes: Optional[jnp.ndarray] = None):
        """Training forward pass -> loss dict.

        Args:
          images: [B, H, W, 3]; frames arranged in clip pairs
            (0<->1, 2<->3, ...) — the reference's ``swap_pairs`` /
            ``shuffle_feature`` pairing (``track_utils.py:24-60``) becomes
            an index flip ``i ^ 1``.
          gt: batched padded Boxes, fields [B, G(, 4)], with batch-unique
            instance ids in ``ids``.
          frame_sizes: [B, 2] int32 (w, h) valid extents for uint8 inputs
            (device-side normalization re-zeroes each frame's pad).

        Returns dict of the 7 reference losses
        (rpn objectness/box, box cls/reg, track cls/motion/center).
        """
        net, ecfg, hcfg = self.net, self.ecfg, self.hcfg
        b, h, w = images.shape[:3]
        assert b % 2 == 0, "training batch must be frame pairs"
        params = self.cast_params(params)
        image_size = image_size or (w, h)
        images = normalize_images(images, net.pixel_mean, net.pixel_std,
                                  net.to_bgr255, frame_sizes=frame_sizes)
        anchors = self.anchors_for((h, w))
        rcfg = self.rcfg_train
        t = self.cfg.MODEL.TRACK_HEAD

        if self.cfg.TPU.REMAT:
            # recompute backbone activations in the backward pass instead
            # of storing them (the dominant training-memory term)
            feats = jax.checkpoint(
                lambda p, im: net.apply(p, im, method=net.features))(
                    params, images)
        else:
            feats = net.apply(params, images, method=net.features)
        logits, deltas = net.apply(params, feats, method=net.rpn_maps)

        # ---- RPN loss (vmapped over images, then averaged)
        rngs = jax.random.split(rng, 3 * b)
        rpn_fn = jax.vmap(
            lambda r, li, di, gti: rpn_loss(r, li, di, anchors, gti,
                                            image_size, rcfg),
            in_axes=(0, 0, 0, 0))
        rpn_losses = jax.tree.map(
            jnp.mean, rpn_fn(rngs[:b], logits, deltas, gt))

        # ---- proposals + append gt (maskrcnn add_gt_proposals)
        # proposals are data, not a differentiable function of the RPN
        # (the reference builds them in the no-grad inference post-proc);
        # without this, pooling would leak gradients into RPN deltas
        # through the ROI coordinates
        pb, ps, pv = jax.lax.stop_gradient(
            select_proposals(logits, deltas, anchors, image_size, rcfg))
        g_cap = gt.boxes.shape[1]
        m = pb.shape[1] + g_cap
        props = Boxes(
            boxes=jnp.concatenate([pb, gt.boxes], axis=1),       # [B, K+G, 4]
            scores=jnp.concatenate(
                [ps, jnp.ones((b, g_cap), ps.dtype)], axis=1),
            ids=jnp.full((b, m), -1, jnp.int32),
            labels=jnp.zeros((b, m), jnp.int32),
            valid=jnp.concatenate([pv, gt.valid], axis=1))

        # optional windowed/Pallas pooling for training (the Pallas
        # window pool has a scatter backward; float32 table keeps the
        # sequential gradient accumulation well-conditioned).  Default is
        # the exact gather pooler — see PARITY.md on window coverage.
        pack = None
        if self.train_windowed:
            from ..ops.roi_align_windowed import pack_levels
            pack = pack_levels(feats[:len(self.net.box_scales)],
                               self.net.box_scales, dtype=jnp.float32)

        # ---- box head: balanced subsample -> pooled MLP -> loss
        n_samp = hcfg.batch_per_image
        sub_fn = jax.vmap(
            lambda r, p, g: subsample_proposals(r, p, g, hcfg, n_samp))
        sampled, labels, regs = sub_fn(rngs[b:2 * b], props, gt)
        rois = sampled.boxes                                      # [B, S, 4]
        levels = pool_levels(rois, len(self.net.box_scales))
        cl, bd = net.apply(params, feats, rois, levels, pack,
                           method=net.box_predict)
        box_losses = box_head_loss(
            cl.reshape(-1, self.num_classes),
            bd.reshape(-1, self.num_classes * 4),
            labels.reshape(-1), regs.reshape(-1, 4),
            sampled.valid.reshape(-1))

        # ---- track head: sample pairs, pool template/SR, EMM loss
        n_track = t.PROPOSAL_PER_IMAGE
        pair_perm = jnp.arange(b) ^ 1
        gt_pair = jax.tree.map(lambda x: x[pair_perm], gt)
        samp_fn = jax.vmap(
            lambda r, p, gti, gtp: sample_track_pairs(
                r, p, p.scores, gti, gtp, n_track, t.EMM.POS_RATIO,
                t.EMM.HN_RATIO, t.FG_IOU_THRESHOLD, t.BG_IOU_THRESHOLD))
        tr = samp_fn(rngs[2 * b:3 * b], props, gt, gt_pair)
        src = tr["src_boxes"].reshape(-1, 4)                      # [B*T, 4]
        pair_boxes = tr["pair_boxes"].reshape(-1, 4)
        tar = tr["tar_boxes"].reshape(-1, 4)
        valid = tr["valid"].reshape(-1)
        img_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n_track)
        pair_idx = img_idx ^ 1

        sr_boxes = make_search_region(pair_boxes, ecfg)
        templates = pool_template(feats, src, img_idx, ecfg, pack=pack,
                                  window=self.window_template)
        # SR crops pool from the *paired* frame (shuffle_feature semantics),
        # level still chosen by the template box
        sr_feats = pool_search_region(feats, src, sr_boxes, pair_idx, ecfg,
                                      pack=pack, window=self.window_sr)
        cls_l, ctr_l, reg_l = net.apply(params, sr_feats, templates,
                                        method=net.emm_predict)
        locations = response_locations(sr_boxes, ecfg.sr_size,
                                       ecfg.resolution, ecfg.pad_pixels, 1)
        track_losses = emm_loss(cls_l, ctr_l, reg_l, locations, tar,
                                valid, ecfg)

        return {**rpn_losses, **box_losses, **track_losses}
