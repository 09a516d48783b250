#!/usr/bin/env python3
"""Measure the windowed-pooler clamp rate on a real box distribution.

The windowed-separable ROIAlign (PARITY #5/#9) drops bilinear taps that
fall outside a static per-ROI window; ``window_clamp_mask`` detects
exactly the ROIs whose result deviates from the exact gather pooler.
This tool runs the detector over an ingested dataset's GT + public
detections at all three production pool sites (box head 7x7/win64,
EMM template 15x15/win64, EMM search-region 30x30/win128+virtual pad)
with the config's inference geometry, and prints one JSON line of clamp
rates — the evidence behind keeping the windowed path as the default
(reference exactness bar: ``/root/reference/siammot/modelling/track_head/
EMM/sr_pool.py:64-68``).

Usage:
  JAX_PLATFORMS=cpu python tools/check_window_clamp.py \
      --config-file configs/dla/DLA_34_FPN_EMM_SYNMOT_HARD.yaml \
      --dataset SYNMOT_HARD --set test [DATASETS.ROOT_DIR /tmp]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from siammot_tpu.utils.platform import ensure_requested_platform

ensure_requested_platform()

import jax.numpy as jnp  # noqa: E402

from siammot_tpu.configs.defaults import get_cfg  # noqa: E402
from siammot_tpu.data.data_utils import (load_dataset_anno,  # noqa: E402
                                         load_public_detection)
from siammot_tpu.models.emm import EMMConfig, make_search_region  # noqa
from siammot_tpu.ops.roi_align import map_rois_to_levels  # noqa: E402
from siammot_tpu.ops.roi_align_windowed import window_clamp_mask  # noqa


def resize_factor(w, h, min_size, max_size):
    scale = min_size / min(w, h)
    if max(w, h) * scale > max_size:
        scale = max_size / max(w, h)
    return scale


def collect_boxes(samples, pub, cfg):
    """xyxy boxes in network-input coords, per source."""
    gt_boxes, det_boxes = [], []
    for vid, sample in samples:
        res = sample.metadata.get("resolution") or {}
        w, h = res.get("width", 640), res.get("height", 384)
        s = resize_factor(w, h, cfg.INPUT.MIN_SIZE_TEST,
                          cfg.INPUT.MAX_SIZE_TEST)
        for e in sample.entities:
            x, y, bw, bh = e.bbox
            gt_boxes.append([x * s, y * s, (x + bw) * s, (y + bh) * s])
        if pub and vid in pub:
            for e in pub[vid].entities:
                x, y, bw, bh = e.bbox
                det_boxes.append([x * s, y * s, (x + bw) * s,
                                  (y + bh) * s])
    return (np.asarray(gt_boxes, np.float32),
            np.asarray(det_boxes, np.float32))


def clamp_rate(boxes, heights, widths, out, ratio, window, pad_pixels=0,
               sr_cfg=None, chunk=65536):
    """Fraction of ROIs with clamped (deviating) samples."""
    scales_tbl = np.asarray((0.25, 0.125, 0.0625, 0.03125), np.float32)
    flags = []
    for i in range(0, len(boxes), chunk):
        b = jnp.asarray(boxes[i:i + chunk])
        levels = map_rois_to_levels(b, 2, 5)
        rois = b
        if sr_cfg is not None:  # SR site: level by template, crop by SR
            rois = make_search_region(b, sr_cfg)
        flags.append(np.asarray(window_clamp_mask(
            rois, scales_tbl[np.asarray(levels)], heights, widths,
            levels, out, ratio, window, pad_pixels=pad_pixels)))
    flags = np.concatenate(flags) if flags else np.zeros((0,), bool)
    return float(flags.mean()) if len(flags) else 0.0, int(flags.sum())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--set", default="test")
    ap.add_argument("opts", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    samples, _ = load_dataset_anno(cfg, args.dataset, set=args.set)
    pub = load_public_detection(cfg, args.dataset)
    gt, det = collect_boxes(samples, pub, cfg)
    print(f"{len(gt)} GT boxes, {len(det)} public detections "
          f"from {len(samples)} videos", file=sys.stderr)

    # inference feature geometry at the static input size
    ih = cfg.TPU.INPUT_HEIGHT or cfg.INPUT.MIN_SIZE_TEST
    iw = cfg.TPU.INPUT_WIDTH or cfg.INPUT.MAX_SIZE_TEST
    heights = [int(np.ceil(ih / (4 * 2 ** i))) for i in range(4)]
    widths = [int(np.ceil(iw / (4 * 2 ** i))) for i in range(4)]

    t = cfg.MODEL.TRACK_HEAD
    ecfg = EMMConfig(
        resolution=t.POOLER_RESOLUTION, scales=tuple(t.POOLER_SCALES),
        sampling_ratio=t.POOLER_SAMPLING_RATIO,
        search_region=t.SEARCH_REGION,
        min_search_wh=t.MINIMUM_SREACH_REGION,  # reference's typo, kept
        pad_pixels=t.PAD_PIXELS, use_centerness=True,
        cosine_window_weight=0.0, cls_pos_region=0.8,
        track_loss_weight=1.0, amodal=cfg.INPUT.AMODAL)

    all_det = np.concatenate([gt, det], 0) if len(det) else gt
    report = {"dataset": args.dataset, "set": args.set,
              "n_gt": len(gt), "n_pub_det": len(det)}
    r, n = clamp_rate(all_det, heights, widths,
                      cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
                      cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO,
                      cfg.TPU.WINDOW_BOX)
    report["box_head"] = {"clamp_rate": r, "clamped": n,
                          "window": cfg.TPU.WINDOW_BOX}
    r, n = clamp_rate(gt, heights, widths, t.POOLER_RESOLUTION,
                      t.POOLER_SAMPLING_RATIO, cfg.TPU.WINDOW_TEMPLATE)
    report["template"] = {"clamp_rate": r, "clamped": n,
                          "window": cfg.TPU.WINDOW_TEMPLATE}
    r, n = clamp_rate(gt, heights, widths, ecfg.sr_size,
                      t.POOLER_SAMPLING_RATIO, cfg.TPU.WINDOW_SR,
                      pad_pixels=t.PAD_PIXELS, sr_cfg=ecfg)
    report["search_region"] = {"clamp_rate": r, "clamped": n,
                               "window": cfg.TPU.WINDOW_SR}
    print(json.dumps(report))


if __name__ == "__main__":
    main()
