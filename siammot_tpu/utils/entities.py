"""Boxes <-> AnnoEntity bridging.

Equivalent of the reference's ``siammot/utils/boxlists_to_entities.py:6-58``
for the padded-array world: converts a frame's padded ``Boxes`` rows to
AnnoEntities (xywh, confidence, {class: conf} labels, id, frame/time) and
given public detections back into padded device arrays.
"""

from __future__ import annotations

import numpy as np

from ..core.structures import Boxes
from ..data.motion_dataset import AnnoEntity

DEFAULT_CLASS_TABLE = {1: "person", 2: "vehicle"}


def boxes_to_entities(out: Boxes, frame_idx: int, time_ms: float,
                      scale_xy=(1.0, 1.0),
                      class_table=None) -> list:
    """Valid rows of a solver output -> AnnoEntities in original-resolution
    xywh (+1 width convention, matching BoxList.convert('xywh'))."""
    class_table = class_table or DEFAULT_CLASS_TABLE
    boxes = np.asarray(out.boxes)
    scores = np.asarray(out.scores)
    ids = np.asarray(out.ids)
    labels = np.asarray(out.labels)
    valid = np.asarray(out.valid)

    sx, sy = scale_xy
    entities = []
    for i in np.flatnonzero(valid):
        x1, y1, x2, y2 = boxes[i]
        x1, x2 = x1 * sx, x2 * sx
        y1, y2 = y1 * sy, y2 * sy
        e = AnnoEntity(time=time_ms, id=int(ids[i]))
        e.bbox = [float(x1), float(y1),
                  float(x2 - x1 + 1), float(y2 - y1 + 1)]
        e.confidence = float(scores[i])
        name = class_table.get(int(labels[i]), str(int(labels[i])))
        e.labels = {name: float(scores[i])}
        e.blob = {"frame_idx": int(frame_idx)}
        entities.append(e)
    return entities


def entities_to_boxes(entities: list, capacity: int, scale_xy=(1.0, 1.0),
                      class_table=None) -> Boxes:
    """Given public detections -> padded Boxes in network-input coords
    (reference ``convert_given_detections_to_boxlist``)."""
    import jax.numpy as jnp

    class_table = class_table or DEFAULT_CLASS_TABLE
    name_to_label = {v: k for k, v in class_table.items()}

    boxes = np.zeros((capacity, 4), np.float32)
    scores = np.zeros((capacity,), np.float32)
    labels = np.zeros((capacity,), np.int32)
    valid = np.zeros((capacity,), bool)
    sx, sy = scale_xy
    for i, e in enumerate(entities[:capacity]):
        x, y, w, h = e.bbox
        boxes[i] = [x * sx, y * sy, (x + max(w - 1, 0)) * sx,
                    (y + max(h - 1, 0)) * sy]
        scores[i] = e.confidence
        name = next(iter(e.labels), "person") if e.labels else "person"
        labels[i] = name_to_label.get(name, 1)
        valid[i] = True
    return Boxes(boxes=jnp.asarray(boxes), scores=jnp.asarray(scores),
                 ids=jnp.full((capacity,), -1, jnp.int32),
                 labels=jnp.asarray(labels), valid=jnp.asarray(valid))
