"""Box/ID/class overlay rendering.

Counterpart of ``/root/reference/demos/utils/vis_generator.py:8-76``:
50-color map sampled from matplotlib's gist_ncar, track-only rendering
(id >= 0), id text + class-name banner per box.
"""

from __future__ import annotations

import cv2
import numpy as np

COCO_CLASS_NAMES = ["person", "bicycle", "car", "motorcycle", "airplane",
                    "bus", "train", "truck", "boat"]


def get_n_colors(n: int, colormap: str = "gist_ncar", seed: int = 0):
    from matplotlib import cm
    colors = cm.get_cmap(colormap)(np.linspace(0, 1, n))
    rng = np.random.RandomState(seed)
    rng.shuffle(colors)
    return colors[:, (2, 1, 0)] * 255  # BGR for cv2


class VisGenerator:
    def __init__(self, vis_height=None):
        self._vis_height = vis_height
        self.num_colors = 50
        self.colors = get_n_colors(self.num_colors)
        self.class_names = COCO_CLASS_NAMES

    def normalize_output(self, frame, boxes_xyxy, scale=1.0):
        """Optionally rescale the frame (and boxes) to vis_height."""
        if self._vis_height is None:
            return frame, boxes_xyxy
        fh, fw = frame.shape[:2]
        ratio = float(self._vis_height) / fh
        frame = cv2.resize(frame, (int(round(fw * ratio)),
                                   int(round(fh * ratio))))
        return frame, boxes_xyxy * ratio

    def frame_vis_generator(self, frame: np.ndarray, boxes_xyxy: np.ndarray,
                            ids: np.ndarray, labels: np.ndarray):
        """frame: BGR uint8 (drawn in place on a copy); only id >= 0 rows
        are rendered (reference ``:55-76``)."""
        frame = np.ascontiguousarray(frame)
        keep = ids >= 0
        boxes_xyxy, ids, labels = boxes_xyxy[keep], ids[keep], labels[keep]
        frame, boxes_xyxy = self.normalize_output(frame, boxes_xyxy)
        for box, eid, lab in zip(boxes_xyxy, ids, labels):
            color = self.colors[int(eid) % self.num_colors]
            name = self.class_names[max(int(lab) - 1, 0)] \
                if int(lab) - 1 < len(self.class_names) else str(int(lab))
            x1, y1, x2, y2 = np.round(box).astype(int)
            cv2.rectangle(frame, (x1, y1), (x2, y2), color, thickness=3)
            cv2.putText(frame, str(int(eid)), (x1 + 5, y1 + 40),
                        cv2.FONT_HERSHEY_SIMPLEX, 1.5, color, thickness=3)
            cv2.rectangle(frame, (x1 - 5, y1 - 25),
                          (x1 + len(name) * 20, y1), color, -1)
            cv2.putText(frame, name, (x1 + 5, y1 - 5),
                        cv2.FONT_HERSHEY_SIMPLEX, 1, (0, 0, 0), thickness=2)
        return frame
