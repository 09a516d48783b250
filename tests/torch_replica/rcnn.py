"""Torch replica of the reference SiamMOT inference graph.

Re-derives, in one place, the composed forward the reference builds from
maskrcnn-benchmark + siammot modules:

  * FPN with the bilinear resize-to-lateral patch + P6 max-pool
    (`operator_patch/fpn_patch.py`, `backbone_ext.py`);
  * RPN head + Detectron anchors + amodal-patched proposal selection
    (`operator_patch/rpn_patch.py:16-61`, maskrcnn RPNPostProcessor);
  * FPN2MLP box head + track-aware PostProcessor
    (`box_head/inference.py:46-191`);
  * EMM track branch: SRPooler on padded features, depthwise x-corr,
    conv towers, x16 bicubic decode with scale/Hann penalties
    (`track_head/EMM/track_core.py:68-135`, `sr_pool.py`, `track_utils.py`);
  * track refinement + TrackSolver + TrackPool
    (`roi_heads.py:22-84`, `track_solver.py`, `track_utils.py:141-247`).

Weights load from ``export_torch_checkpoint`` output with strict=True.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn

from .dla import DLA34
from .layers import (BoxCoder, LevelMapper, clip_to_image, nms, roi_align)


# --------------------------------------------------------------------- FPN

class FPN(nn.Module):
    def __init__(self, in_list=(64, 128, 256, 512), out=128):
        super().__init__()
        for i, cin in enumerate(in_list, 1):
            self.add_module(f"fpn_inner{i}", nn.Conv2d(cin, out, 1))
            self.add_module(f"fpn_layer{i}", nn.Conv2d(out, out, 3, padding=1))

    def forward(self, xs):
        inner = self.fpn_inner4(xs[3])
        outs = [self.fpn_layer4(inner)]
        for i in (3, 2, 1):
            lateral = getattr(self, f"fpn_inner{i}")(xs[i - 1])
            top = F.interpolate(inner, size=lateral.shape[-2:],
                                mode="bilinear", align_corners=False)
            inner = lateral + top
            outs.insert(0, getattr(self, f"fpn_layer{i}")(inner))
        outs.append(F.max_pool2d(outs[-1], 1, 2, 0))       # P6
        return outs


# --------------------------------------------------------------------- RPN

def detectron_anchors(stride, size, aspect_ratios):
    """Cell anchors with the classic rounding (Detectron generate_anchors)."""
    w = h = float(stride)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    area = w * h
    out = []
    for r in aspect_ratios:
        ws = round(math.sqrt(area / r))
        hs = round(ws * r)
        ws *= size / stride
        hs *= size / stride
        out.append([cx - 0.5 * (ws - 1), cy - 0.5 * (hs - 1),
                    cx + 0.5 * (ws - 1), cy + 0.5 * (hs - 1)])
    return torch.tensor(out, dtype=torch.float32)


class RPNHead(nn.Module):
    def __init__(self, channels=128, num_anchors=3):
        super().__init__()
        self.conv = nn.Conv2d(channels, channels, 3, padding=1)
        self.cls_logits = nn.Conv2d(channels, num_anchors, 1)
        self.bbox_pred = nn.Conv2d(channels, num_anchors * 4, 1)

    def forward(self, feats):
        logits, deltas = [], []
        for f in feats:
            t = torch.relu(self.conv(f))
            logits.append(self.cls_logits(t))
            deltas.append(self.bbox_pred(t))
        return logits, deltas


class RPNSelector:
    """Test-time proposal selection (maskrcnn RPNPostProcessor with the
    amodal patch)."""

    def __init__(self, cfg):
        r = cfg.MODEL.RPN
        self.strides = tuple(r.ANCHOR_STRIDE)
        self.sizes = tuple(r.ANCHOR_SIZES)
        self.ratios = tuple(r.ASPECT_RATIOS)
        self.pre = r.PRE_NMS_TOP_N_TEST
        self.post = r.POST_NMS_TOP_N_TEST
        self.fpn_post = r.FPN_POST_NMS_TOP_N_TEST
        self.nms_thresh = r.NMS_THRESH
        self.min_size = r.MIN_SIZE
        self.amodal = bool(cfg.INPUT.AMODAL)
        self.coder = BoxCoder(weights=(1.0, 1.0, 1.0, 1.0))

    def anchors(self, feat_hw, stride, size):
        cell = detectron_anchors(stride, size, self.ratios)      # [A, 4]
        h, w = feat_hw
        sx = torch.arange(w, dtype=torch.float32) * stride
        sy = torch.arange(h, dtype=torch.float32) * stride
        shift_y, shift_x = torch.meshgrid(sy, sx, indexing="ij")
        shifts = torch.stack([shift_x, shift_y, shift_x, shift_y],
                             dim=-1).reshape(-1, 1, 4)
        return (shifts + cell[None]).reshape(-1, 4)

    def __call__(self, logits, deltas, image_size):
        per_level = []
        for lvl, (lg, dl) in enumerate(zip(logits, deltas)):
            a = lg.shape[1]
            h, w = lg.shape[-2:]
            # permute_and_flatten layout: (H, W, A)
            obj = lg[0].permute(1, 2, 0).reshape(-1).sigmoid()
            reg = (dl[0].reshape(a, 4, h, w).permute(2, 3, 0, 1)
                   .reshape(-1, 4))
            anchors = self.anchors((h, w), self.strides[lvl],
                                   self.sizes[lvl])
            k = min(self.pre, obj.numel())
            scores, idx = obj.topk(k)
            boxes = self.coder.decode(reg[idx], anchors[idx])
            if not self.amodal:
                boxes = clip_to_image(boxes, image_size)
            ws = boxes[:, 2] - boxes[:, 0] + 1
            hs = boxes[:, 3] - boxes[:, 1] + 1
            keep = (ws >= self.min_size) & (hs >= self.min_size)
            boxes, scores = boxes[keep], scores[keep]
            keep = nms(boxes, scores, self.nms_thresh, max_out=self.post)
            per_level.append((boxes[keep], scores[keep]))
        boxes = torch.cat([b for b, _ in per_level])
        scores = torch.cat([s for _, s in per_level])
        k = min(self.fpn_post, len(scores))
        _, idx = scores.topk(k)
        return boxes[idx], scores[idx]


# ---------------------------------------------------------------- box head

class BoxHead(nn.Module):
    def __init__(self, channels=128, mlp=1024, num_classes=2,
                 resolution=7, scales=(0.25, 0.125, 0.0625, 0.03125),
                 sampling=2):
        super().__init__()
        self.feature_extractor = nn.Module()
        self.feature_extractor.fc6 = nn.Linear(
            channels * resolution * resolution, mlp)
        self.feature_extractor.fc7 = nn.Linear(mlp, mlp)
        self.predictor = nn.Module()
        self.predictor.cls_score = nn.Linear(mlp, num_classes)
        self.predictor.bbox_pred = nn.Linear(mlp, num_classes * 4)
        self.resolution = resolution
        self.scales = scales
        self.sampling = sampling
        self.mapper = LevelMapper()

    def pool(self, feats, rois):
        levels = self.mapper(rois)
        out = feats[0].new_zeros((len(rois), feats[0].shape[1],
                                  self.resolution, self.resolution))
        for lvl, scale in enumerate(self.scales):
            sel = (levels == lvl).nonzero().squeeze(1)
            if sel.numel():
                out[sel] = roi_align(feats[lvl][0], rois[sel],
                                     (self.resolution, self.resolution),
                                     scale, self.sampling)
        return out

    def forward(self, feats, rois):
        x = self.pool(feats, rois).flatten(1)
        x = torch.relu(self.feature_extractor.fc6(x))
        x = torch.relu(self.feature_extractor.fc7(x))
        return self.predictor.cls_score(x), self.predictor.bbox_pred(x)


class BoxPostProcessor:
    """Track-aware PostProcessor (`box_head/inference.py:46-191`)."""

    def __init__(self, cfg):
        self.score_thresh = cfg.MODEL.ROI_HEADS.SCORE_THRESH
        self.nms_thresh = cfg.MODEL.ROI_HEADS.NMS
        self.coder = BoxCoder(tuple(cfg.MODEL.ROI_HEADS.BBOX_REG_WEIGHTS))
        self.amodal = bool(cfg.INPUT.AMODAL)

    def __call__(self, class_logits, box_regression, prop_boxes, prop_ids,
                 prop_labels, image_size):
        """Returns dict(boxes, scores, ids, labels) for class 1."""
        prob = F.softmax(class_logits, dim=-1)
        boxes = self.coder.decode(box_regression, prop_boxes)
        num_classes = prob.shape[1]

        if prop_labels is not None:        # track rows present: boost
            track = (prop_ids >= 0).nonzero().squeeze(1)
            if track.numel():
                orig = prob.clone()
                prob[track, :] = 0.0
                prob[track, prop_labels[track]] = \
                    orig[track, prop_labels[track]] + 1.0
        if not self.amodal:
            boxes = torch.cat([
                clip_to_image(boxes[:, 4 * j: 4 * j + 4], image_size)
                for j in range(num_classes)], dim=1)

        j = 1                                      # person class
        keep = prob[:, j] > self.score_thresh
        boxes_j = boxes[keep, 4 * j: 4 * j + 4]
        scores_j = prob[keep, j]
        ids_j = prop_ids[keep]

        det = ids_j < 0
        dk = nms(boxes_j[det], scores_j[det], self.nms_thresh)
        out_boxes = [boxes_j[det][dk]]
        out_scores = [scores_j[det][dk]]
        out_ids = [ids_j[det][dk]]
        if (~det).any():
            out_boxes.append(boxes_j[~det])
            out_scores.append(scores_j[~det])
            out_ids.append(ids_j[~det])
        boxes = torch.cat(out_boxes)
        return dict(boxes=boxes, scores=torch.cat(out_scores),
                    ids=torch.cat(out_ids),
                    labels=torch.full((len(boxes),), j, dtype=torch.long))


# --------------------------------------------------------------------- EMM

class EMMPredictor(nn.Module):
    def __init__(self, channels=128):
        super().__init__()

        def tower():
            # the reference's make_conv3x3(use_gn=True) builds a bias-FREE
            # conv; the JAX predictor carries a tower bias (zero when
            # importing true reference weights, so functionally identical
            # there).  Keep the slot so the exporter's dict loads strict.
            return nn.Sequential(
                nn.Conv2d(channels, channels, 3, padding=1, bias=True),
                nn.GroupNorm(32, channels),
                nn.ReLU())

        self.cls_tower = tower()
        self.reg_tower = tower()
        self.cls = nn.Sequential(nn.Conv2d(channels, 2, 3, padding=1))
        self.center = nn.Sequential(nn.Conv2d(channels, 1, 3, padding=1))
        self.reg = nn.Sequential(nn.Conv2d(channels, 4, 3, padding=1))

    def forward(self, x):
        cls_x = self.cls_tower(x)
        reg_x = self.reg_tower(x)
        return (self.cls(cls_x), self.center(cls_x),
                torch.relu(self.reg(reg_x)))


def xcorr_depthwise(x, kernel):
    b, c = kernel.shape[:2]
    out = F.conv2d(x.reshape(1, b * c, *x.shape[-2:]),
                   kernel.reshape(b * c, 1, *kernel.shape[-2:]),
                   groups=b * c)
    return out.reshape(b, c, *out.shape[-2:])


class SRPooler:
    """Pool with the level chosen by the TEMPLATE box (`sr_pool.py:75`)."""

    def __init__(self, resolution, scales=(0.25, 0.125, 0.0625, 0.03125),
                 sampling=2):
        self.resolution = resolution
        self.scales = scales
        self.sampling = sampling
        self.mapper = LevelMapper()

    def __call__(self, feats, template_boxes, rois=None):
        rois = template_boxes if rois is None else rois
        levels = self.mapper(template_boxes)
        out = feats[0].new_zeros((len(rois), feats[0].shape[1],
                                  self.resolution, self.resolution))
        for lvl, scale in enumerate(self.scales):
            sel = (levels == lvl).nonzero().squeeze(1)
            if sel.numel():
                out[sel] = roi_align(feats[lvl][0], rois[sel],
                                     (self.resolution, self.resolution),
                                     scale, self.sampling)
        return out


class EMM(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        t = cfg.MODEL.TRACK_HEAD
        self.predictor = EMMPredictor(cfg.MODEL.DLA.BACKBONE_OUT_CHANNELS)
        self.resolution = t.POOLER_RESOLUTION
        self.r = t.SEARCH_REGION
        self.pad_pixels = t.PAD_PIXELS
        self.min_search_wh = t.MINIMUM_SREACH_REGION
        self.search_expansion = t.SEARCH_REGION - 1.0
        self.sigma = t.EMM.COSINE_WINDOW_WEIGHT
        self.use_centerness = t.EMM.USE_CENTERNESS
        self.amodal = bool(cfg.INPUT.AMODAL)
        self.pooler_z = SRPooler(self.resolution,
                                 tuple(t.POOLER_SCALES),
                                 t.POOLER_SAMPLING_RATIO)
        self.pooler_x = SRPooler(int(self.resolution * self.r),
                                 tuple(t.POOLER_SCALES),
                                 t.POOLER_SAMPLING_RATIO)

    # -- track_utils ------------------------------------------------------
    def pad_feature(self, feats):
        out = []
        for i, f in enumerate(feats):
            p = int(self.pad_pixels / ((2 ** i) * 4))
            out.append(F.pad(f, [p, p, p, p]))
        return out

    def extend_bbox(self, boxes):
        w = boxes[:, 2] - boxes[:, 0] + 1
        h = boxes[:, 3] - boxes[:, 1] + 1
        w_ext = torch.max(w * (self.search_expansion / 2.0),
                          (self.min_search_wh - w)
                          / (self.search_expansion * 2.0))
        h_ext = torch.max(h * (self.search_expansion / 2.0),
                          (self.min_search_wh - h)
                          / (self.search_expansion * 2.0))
        return torch.stack([boxes[:, 0] - w_ext, boxes[:, 1] - h_ext,
                            boxes[:, 2] + w_ext, boxes[:, 3] + h_ext], dim=1)

    def extract_cache(self, feats, det_boxes):
        """End-of-frame memory: template features + search regions
        (`track_core.py:84-100`)."""
        template = self.pooler_z(feats, det_boxes)
        sr = self.extend_bbox(det_boxes + self.pad_pixels)
        return template, sr

    # -- propagation ------------------------------------------------------
    def track(self, feats, template_features, sr, template_boxes,
              image_size):
        """Returns (boxes, conf) per track (`track_core.py:68-135`)."""
        padded = self.pad_feature(feats)
        sr_features = self.pooler_x(padded, template_boxes, sr)
        resp = xcorr_depthwise(sr_features, template_features)
        cls_l, ctr_l, reg_l = self.predictor(resp)
        up = 16
        cls_l = F.interpolate(cls_l, scale_factor=up, mode="bicubic")
        ctr_l = F.interpolate(ctr_l, scale_factor=up, mode="bicubic")
        reg_l = F.interpolate(reg_l, scale_factor=up, mode="bicubic")

        locations = self.get_locations(sr, sr_features.shape[-1] * up,
                                       up_scale=up)
        boxes, conf = self.decode_response(cls_l, ctr_l, reg_l, locations,
                                           template_boxes)
        if not self.amodal:
            boxes = clip_to_image(boxes, image_size)
        return boxes, conf

    def get_locations(self, sr, up_hw, up_scale):
        n = len(sr)
        w = sr[:, 2] - sr[:, 0]
        h = sr[:, 3] - sr[:, 1]
        stride_w = w / (up_hw - 1)
        stride_h = h / (up_hw - 1)
        rng = torch.arange(up_hw, dtype=torch.float32)
        xs = sr[:, 0:1] + rng[None] * stride_w[:, None]
        ys = sr[:, 1:2] + rng[None] * stride_h[:, None]
        border = int(math.floor(self.resolution / 2)) * up_scale
        xs = xs[:, border:-border]
        ys = ys[:, border:-border]
        gy = ys[:, :, None].expand(n, ys.shape[1], xs.shape[1])
        gx = xs[:, None, :].expand(n, ys.shape[1], xs.shape[1])
        loc = torch.stack([gx.reshape(n, -1), gy.reshape(n, -1)], dim=2)
        return loc - self.pad_pixels       # back to un-padded image coords

    def decode_response(self, cls_l, ctr_l, reg_l, locations, boxes):
        prob = F.softmax(cls_l, dim=1)[:, 1:2]
        conf = prob * torch.sigmoid(ctr_l) if self.use_centerness else prob
        n = conf.shape[0]
        conf = conf.reshape(n, -1)
        tlbr = reg_l.reshape(n, 4, -1)

        box_w = boxes[:, 2] - boxes[:, 0]
        box_h = boxes[:, 3] - boxes[:, 1]
        r_w = tlbr[:, 2] + tlbr[:, 0]
        r_h = tlbr[:, 3] + tlbr[:, 1]
        sw = r_w / box_w[:, None]
        sh = r_h / box_h[:, None]
        sw = torch.max(sw, 1.0 / sw)
        sh = torch.max(sh, 1.0 / sh)
        penalty = torch.exp((-sw * sh + 1) * 0.1)

        side = int(math.sqrt(conf.shape[1]))
        hann = torch.hann_window(side)        # periodic (torch default)
        window = torch.outer(hann, hann).reshape(-1)

        p_conf = (conf * penalty) * (1 - self.sigma) + self.sigma * window
        idx = torch.argmax(p_conf, dim=1)
        ar = torch.arange(n)
        c = locations[ar, idx]
        t = tlbr[ar, :, idx]
        out = torch.stack([c[:, 0] - t[:, 0], c[:, 1] - t[:, 1],
                           c[:, 0] + t[:, 2], c[:, 1] + t[:, 3]], dim=1)
        return out, prob.reshape(n, -1)[ar, idx]


# ------------------------------------------------------- solver + trackpool

class TrackPool:
    def __init__(self, max_dormant_frames):
        self.max_dormant = max_dormant_frames
        self.reset()

    def reset(self):
        self.active = set()
        self.dormant = {}
        self.max_id = -1
        self.frame_idx = 0
        self.cache = {}

    def start_track(self):
        self.max_id += 1
        self.active.add(self.max_id)
        return self.max_id

    def suspend_track(self, tid):
        self.active.remove(tid)
        self.dormant[tid] = self.frame_idx - 1

    def resume_track(self, tid):
        self.active.add(tid)
        self.dormant.pop(tid)

    def expire_tracks(self):
        for tid, last in list(self.dormant.items()):
            if self.frame_idx - last >= self.max_dormant:
                self.dormant.pop(tid)
                self.cache.pop(tid, None)


class TrackSolver:
    def __init__(self, pool, track_thresh, start_thresh, resume_thresh):
        self.pool = pool
        self.track_thresh = track_thresh
        self.start_thresh = start_thresh
        self.resume_thresh = resume_thresh

    def __call__(self, det):
        """det: dict(boxes, scores, ids, labels); mutated + returned."""
        pool = self.pool
        if len(det["boxes"]) == 0:
            # reference early-returns WITHOUT expiring or advancing the
            # frame clock (track_solver.py:47-51)
            return det
        ids = det["ids"].clone()
        scores = det["scores"].clone()
        active_mask = torch.tensor([int(i) in pool.active for i in ids])
        scores[active_mask] += 1.0

        keep = nms(det["boxes"], scores, 0.5)
        nms_scores = scores[keep]
        nms_scores = torch.where(nms_scores >= 2, nms_scores - 2, nms_scores)
        nms_scores = torch.where(nms_scores >= 1, nms_scores - 1, nms_scores)
        _ids = ids[keep].clone()

        start_idx = ((_ids < 0)
                     & (nms_scores >= self.start_thresh)).nonzero().squeeze(1)
        inactive = (_ids >= 0) & (nms_scores < self.track_thresh)
        nms_removed = (set(int(i) for i in ids if i >= 0)
                       - set(int(i) for i in _ids if i >= 0))
        inactive_ids = set(int(i) for i in _ids[inactive]) | nms_removed

        dormant_mask = torch.tensor(
            [int(i) in pool.dormant for i in _ids])
        for tid in _ids[dormant_mask & (nms_scores >= self.resume_thresh)]:
            pool.resume_track(int(tid))
        for i in start_idx:
            _ids[i] = pool.start_track()
        for tid in inactive_ids:
            if tid in pool.active:
                pool.suspend_track(tid)
        _ids[inactive] = -1
        pool.expire_tracks()
        pool.frame_idx += 1
        return dict(boxes=det["boxes"][keep], scores=nms_scores, ids=_ids,
                    labels=det["labels"][keep])


# ----------------------------------------------------------------- replica

class SiamMOTReplica(nn.Module):
    """The composed inference graph, one frame at a time."""

    def __init__(self, cfg):
        super().__init__()
        self.backbone = nn.Module()
        # stage widths per conv body (mirrors models/dla.py DLA_VARIANTS;
        # DLA-MINI-FPN is the committed hermetic-fixture variant)
        ch = {"DLA-34-FPN": (16, 32, 64, 128, 256, 512),
              "DLA-MINI-FPN": (8, 16, 16, 32, 64, 64),
              }[cfg.MODEL.BACKBONE.CONV_BODY]
        self.backbone.body = DLA34(ch=ch)
        self.backbone.fpn = FPN(in_list=ch[2:6],
                                out=cfg.MODEL.DLA.BACKBONE_OUT_CHANNELS)
        self.rpn = nn.Module()
        self.rpn.head = RPNHead(cfg.MODEL.DLA.BACKBONE_OUT_CHANNELS,
                                len(cfg.MODEL.RPN.ASPECT_RATIOS))
        self.roi_heads = nn.Module()
        self.roi_heads.box = BoxHead(
            cfg.MODEL.DLA.BACKBONE_OUT_CHANNELS,
            cfg.MODEL.ROI_BOX_HEAD.MLP_HEAD_DIM,
            cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES,
            cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
            tuple(cfg.MODEL.ROI_BOX_HEAD.POOLER_SCALES),
            cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO)
        self.roi_heads.track = nn.Module()
        self.roi_heads.track.tracker = EMM(cfg)

        self.rpn_select = RPNSelector(cfg)
        self.box_post = BoxPostProcessor(cfg)
        self.pool = TrackPool(cfg.MODEL.TRACK_HEAD.MAX_DORMANT_FRAMES)
        self.solver = TrackSolver(self.pool,
                                  cfg.MODEL.TRACK_HEAD.TRACK_THRESH,
                                  cfg.MODEL.TRACK_HEAD.START_TRACK_THRESH,
                                  cfg.MODEL.TRACK_HEAD.RESUME_TRACK_THRESH)
        self.tracktor = bool(cfg.MODEL.TRACK_HEAD.TRACKTOR)
        self.memory = None             # (template_feats, sr, boxes, ids, labels)

    @torch.no_grad()
    def step(self, image, image_size, given_boxes=None):
        """image [1, 3, H, W] normalized; image_size (w, h) un-padded.

        given_boxes: optional [G, 4] public detections replacing RPN
        proposals (`roi_heads.py:24-33`, MOT17 mode).
        """
        emm = self.roi_heads.track.tracker
        feats = self.backbone.fpn(self.backbone.body(image))

        if given_boxes is None:
            logits, deltas = self.rpn.head(feats)
            prop_boxes, _ = self.rpn_select(logits, deltas, image_size)
        else:
            prop_boxes = given_boxes

        # detections from proposals
        cl, bd = self.roi_heads.box(feats, prop_boxes)
        det = self.box_post(cl, bd, prop_boxes,
                            torch.full((len(prop_boxes),), -1,
                                       dtype=torch.long),
                            None, image_size)

        # track propagation
        if self.memory is not None and len(self.memory[2]):
            tf, sr, tboxes, tids, tlabels = self.memory
            pboxes, pconf = emm.track(feats, tf, sr, tboxes, image_size)
            # the reference wraps then _refine_tracks via the box head
            tcl, tbd = self.roi_heads.box(feats, pboxes)
            refined = self.box_post(tcl, tbd, pboxes, tids, tlabels,
                                    image_size)
            if self.tracktor:
                rscores = refined["scores"]
            else:
                rscores = (refined["scores"] + (pconf + 1.0)) / 2.0
            det = dict(
                boxes=torch.cat([det["boxes"], refined["boxes"]]),
                scores=torch.cat([det["scores"], rscores]),
                ids=torch.cat([det["ids"], refined["ids"]]),
                labels=torch.cat([det["labels"], refined["labels"]]))

        out = self.solver(det)

        # next-frame memory for solver-active tracks (+ dormant cache)
        act = torch.tensor([int(i) in self.pool.active for i in out["ids"]],
                           dtype=torch.bool)
        aboxes = out["boxes"][act]
        aids = out["ids"][act]
        alabels = out["labels"][act]
        template, sr = emm.extract_cache(feats, aboxes)
        for j, tid in enumerate(aids):
            self.pool.cache[int(tid)] = (template[j], sr[j], aboxes[j],
                                         alabels[j])
        d_entries = [self.pool.cache[d] for d in self.pool.dormant
                     if d in self.pool.cache]
        d_ids = [d for d in self.pool.dormant if d in self.pool.cache]
        if d_entries:
            template = torch.cat([template] + [e[0][None] for e in d_entries])
            sr = torch.cat([sr] + [e[1][None] for e in d_entries])
            aboxes = torch.cat([aboxes] + [e[2][None] for e in d_entries])
            aids = torch.cat([aids, torch.tensor(d_ids, dtype=aids.dtype)])
            alabels = torch.cat(
                [alabels] + [e[3][None] for e in d_entries])
        self.memory = (template, sr, aboxes, aids, alabels)
        return out

    def reset(self):
        self.pool.reset()
        self.memory = None
