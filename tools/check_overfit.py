#!/usr/bin/env python3
"""Post-overfit sanity: does the trained model detect its training boxes?

Loads the latest checkpoint from an overfit run, runs the inference step
on a training image, and reports best-IoU coverage of the GT boxes —
end-to-end evidence that the training machinery (losses, sampler,
optimizer, checkpointing) optimizes the detector.

Usage: python tools/check_overfit.py <run_dir> <coco_root> [img_idx]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from siammot_tpu.utils.platform import ensure_requested_platform

ensure_requested_platform()


def main():
    import cv2
    import jax
    import jax.numpy as jnp

    from siammot_tpu.configs.defaults import get_cfg
    from siammot_tpu.models.siammot import SiamMOT
    from siammot_tpu.utils.checkpoint import Checkpointer
    from siammot_tpu.data.transforms import EvalTransform

    run_dir, root = sys.argv[1], sys.argv[2]
    img_idx = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(run_dir, "config.yaml"))
    cfg.INPUT.MIN_SIZE_TEST = max(cfg.INPUT.MIN_SIZE_TRAIN)
    cfg.INPUT.MAX_SIZE_TEST = cfg.INPUT.MAX_SIZE_TRAIN
    cfg.freeze()
    model = SiamMOT(cfg)
    h = -(-cfg.INPUT.MIN_SIZE_TEST // 32) * 32
    params = model.init_params(jax.random.PRNGKey(0), (h, h))
    ck = Checkpointer(run_dir)
    restored = ck.load(None, like=None)
    params = restored["params"]
    print("loaded iter", restored.get("iteration"))

    anno = json.load(open(os.path.join(
        root, "mscoco/annotations/MSCOCO2017_train_person.json")))
    img_info = anno["images"][img_idx]
    gts = [a["bbox"] for a in anno["annotations"]
           if a["image_id"] == img_info["id"]]
    img = cv2.imread(os.path.join(root, "mscoco/images/train2017",
                                  img_info["file_name"]))
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    tr = EvalTransform(cfg)
    x, (in_w, in_h) = tr(img)
    step = model.jit_step(image_size=(in_w, in_h), donate_state=False)
    out, _ = step(params, jnp.asarray(x), model.empty_state())

    boxes = np.asarray(out.boxes)
    scores = np.asarray(out.scores)
    valid = np.asarray(out.valid) & (scores > 0.3)
    sx = img_info["width"] / in_w
    sy = img_info["height"] / in_h
    boxes = boxes * np.array([sx, sy, sx, sy])

    def iou(b, g):
        gx1, gy1, gw, gh = g
        gx2, gy2 = gx1 + gw, gy1 + gh
        ix1, iy1 = max(b[0], gx1), max(b[1], gy1)
        ix2, iy2 = min(b[2], gx2), min(b[3], gy2)
        inter = max(0, ix2 - ix1) * max(0, iy2 - iy1)
        a = (b[2] - b[0]) * (b[3] - b[1]) + gw * gh - inter
        return inter / a if a > 0 else 0

    n_det = int(valid.sum())
    covered = 0
    for g in gts:
        best = max((iou(b, g) for b in boxes[valid]), default=0.0)
        covered += best >= 0.5
        print(f"gt {g}: best IoU {best:.3f}")
    print(json.dumps({"detections": int(n_det), "gt": len(gts),
                      "covered@0.5": int(covered)}))


if __name__ == "__main__":
    main()
