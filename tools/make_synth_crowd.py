#!/usr/bin/env python3
"""Generate SYNCROWD: a CrowdHuman-style crowded still-image corpus.

The reference recipe pretrains the detector on CrowdHuman stills before
video finetuning (``/root/reference/README.md:57``; the image-dataset
training path fakes inter-frame motion via SiamVideoMotionAugment).
CrowdHuman cannot ship with the repo, so this renders independent crowded
scenes with the SYNMOT hard-preset world model (amodal full-body boxes =
CrowdHuman "fbox" semantics) and writes a COCO-format annotation file the
``CocoDataset`` reader + image training path consume unchanged
(dataset_maps keys ``SYNCROWD_train_fbox`` / ``SYNCROWD_val_fbox``).

Usage:
  python tools/make_synth_crowd.py --root /tmp/SYNCROWD \
      [--train 600] [--val 60] [--size 640 384] [--sprites 36]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from make_synth_mot import (Camera, Occluder, WorldSprite, _paint,
                            _texture)


def render_still(rng, w, h, n_sprites):
    """One crowded frame; returns (uint8 image, [(amodal box, vis)])."""
    import cv2
    world_w, world_h = int(w * 1.25), int(h * 1.15)
    bg = _texture(rng, world_h, world_w, scale=24)
    cam = Camera(rng, w, h, world_w, world_h)
    sprites = [WorldSprite(rng, sid + 1, world_w, world_h, h)
               for sid in range(n_sprites)]
    occluders = [Occluder(rng, world_w, world_h, w, h)
                 for _ in range(rng.randint(1, 4))]

    z = cam.zoom
    x0v, y0v = cam.view_origin()
    M = np.float32([[z, 0, -z * x0v], [0, z, -z * y0v]])
    frame = cv2.warpAffine(bg, M, (w, h), flags=cv2.INTER_LINEAR,
                           borderMode=cv2.BORDER_REFLECT)
    owner = np.full((h, w), -1, np.int32)
    amodal = {}
    for s in sorted(sprites, key=lambda s: s.h):
        xi, yi, bwf, bhf = cam.project(s.x, s.y, s.w, s.h)
        amodal[s.id] = _paint(frame, owner, s.id, s.tex, s.mask,
                              xi, yi, bwf, bhf)
    for i, oc in enumerate(occluders):
        xi, yi, bwf, bhf = cam.project(oc.x, oc.y, oc.w, oc.h)
        _paint(frame, owner, -2 - i, oc.tex, None, xi, yi, bwf, bhf)

    counts = np.bincount(owner[owner >= 0].ravel(),
                         minlength=n_sprites + 2)
    boxes = []
    for s in sprites:
        x0, y0, bw, bh = amodal[s.id]
        vis = float(counts[s.id]) / float(bw * bh)
        boxes.append(((x0, y0, bw, bh), vis))
    noise = rng.randint(-6, 7, frame.shape, np.int16)
    frame = np.clip(frame.astype(np.int16) + noise, 0, 255).astype(np.uint8)
    return frame, boxes


def write_split(root, split, n_images, w, h, mean_sprites, rng):
    import cv2
    img_dir = os.path.join(root, "Images")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        img_id = (1 if split == "train" else 100000) + i
        lo = max(2, int(mean_sprites * 0.6))
        hi = max(lo + 1, int(mean_sprites * 1.4))
        frame, boxes = render_still(rng, w, h, int(rng.randint(lo, hi + 1)))
        fname = f"{split}_{img_id:06d}.jpg"
        cv2.imwrite(os.path.join(img_dir, fname), frame,
                    [cv2.IMWRITE_JPEG_QUALITY, 90])
        images.append(dict(id=img_id, file_name=fname, width=w, height=h))
        for (x0, y0, bw, bh), vis in boxes:
            # fully-invisible instances are unannotatable in a still
            if vis < 0.02:
                continue
            annotations.append(dict(
                id=ann_id, image_id=img_id,
                bbox=[float(x0), float(y0), float(bw), float(bh)],
                area=float(bw * bh), iscrowd=0, category_id=1,
                vis_ratio=round(vis, 3)))
            ann_id += 1
    anno = dict(
        images=images, annotations=annotations,
        categories=[dict(id=1, name="person")])
    path = os.path.join(root, "annotations",
                        f"annotation_{split}_fbox.json")
    with open(path, "w") as f:
        json.dump(anno, f)
    print(f"{split}: {n_images} images, {ann_id - 1} boxes -> {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--train", type=int, default=600)
    ap.add_argument("--val", type=int, default=60)
    ap.add_argument("--size", type=int, nargs=2, default=(640, 384),
                    metavar=("W", "H"))
    ap.add_argument("--sprites", type=int, default=36)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()
    w, h = args.size
    rng = np.random.RandomState(args.seed)
    write_split(args.root, "train", args.train, w, h, args.sprites, rng)
    write_split(args.root, "val", args.val, w, h, args.sprites, rng)


if __name__ == "__main__":
    main()
