"""TensorBoard metrics writer.

Counterpart of the reference writer
(``/root/reference/siammot/engine/tensorboard_writer.py:10-86``): scalar
losses every call and a periodic de-normalized image grid with GT boxes.
Uses ``torch.utils.tensorboard`` (baked-in torch, CPU-only use) and is
process-0-gated by the caller.
"""

from __future__ import annotations

import numpy as np


class TensorboardWriter:
    def __init__(self, cfg, output_dir: str, image_period: int = 500):
        from torch.utils.tensorboard import SummaryWriter
        self._w = SummaryWriter(log_dir=output_dir)
        self._mean = np.asarray(cfg.INPUT.PIXEL_MEAN, np.float32)
        self._std = np.asarray(cfg.INPUT.PIXEL_STD, np.float32)
        self._image_period = image_period

    def __call__(self, iteration: int, metrics: dict, images=None, gt=None):
        for k, v in metrics.items():
            tag = "loss/total" if k == "loss" else f"loss/{k}"
            self._w.add_scalar(tag, float(v), iteration)
        if images is not None and iteration % self._image_period == 0:
            self.write_image(iteration, images, gt)

    def write_image(self, iteration: int, images, gt=None, max_images: int = 4):
        """De-normalize a batch and draw GT boxes (reference ``:36-49``)."""
        import cv2
        imgs = np.asarray(images)[:max_images]
        out = []
        for i, im in enumerate(imgs):
            if im.dtype == np.uint8:     # raw frames (device-normalize mode)
                x = im.copy()
            else:
                x = np.clip((im * self._std + self._mean) * 255.0, 0,
                            255).astype(np.uint8).copy()
            if gt is not None:
                boxes = np.asarray(gt.boxes[i])
                valid = np.asarray(gt.valid[i])
                for b, v in zip(boxes, valid):
                    if v:
                        cv2.rectangle(x, (int(b[0]), int(b[1])),
                                      (int(b[2]), int(b[3])), (0, 255, 0), 2)
            out.append(x)
        grid = np.concatenate(out, axis=1)
        self._w.add_image("train/gt", grid, iteration, dataformats="HWC")

    def close(self):
        self._w.close()
