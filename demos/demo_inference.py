"""Frame-streaming tracker wrapper for the demo CLI.

Counterpart of ``/root/reference/demos/demo_inference.py:18-122``.  The
reference auto-downloads a model zip per ``--track-class`` from S3; this
environment has no egress, so the model weights are supplied via
``model_path`` (a reference ``.pth`` is converted on the fly, an Orbax
directory is restored, and absent weights fall back to random init with a
warning — useful for smoke runs).  Per-class configs are bundled under
``demos/configs/``.
"""

from __future__ import annotations

import logging
import os

import numpy as np

logger = logging.getLogger(__name__)

TRACK_CLASSES = ("person", "person_vehicle")


class DemoInference:
    def __init__(self, track_class: str = "person", model_path: str = None,
                 vis_generator=None, vis_writer=None,
                 config_file: str = None):
        if track_class not in TRACK_CLASSES:
            raise ValueError(f"track_class must be one of {TRACK_CLASSES}")
        import jax

        from siammot_tpu.configs.defaults import get_cfg
        from siammot_tpu.data.transforms import EvalTransform
        from siammot_tpu.models.siammot import SiamMOT

        cfg_file = config_file or os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "configs", f"DLA34_emm_{track_class}.yaml")
        cfg = get_cfg()
        cfg.merge_from_file(cfg_file)
        cfg.freeze()
        self.cfg = cfg
        self.track_class = track_class
        self.transform = EvalTransform(cfg)
        self.model = SiamMOT(cfg)

        size = -(-cfg.INPUT.MIN_SIZE_TEST // 32) * 32
        self.params = self.model.init_params(jax.random.PRNGKey(0),
                                             (size, size))
        self._load(model_path)

        self.vis_generator = vis_generator
        self.vis_writer = vis_writer
        self._step = None
        self._step_size = None

    def _load(self, model_path):
        if model_path and model_path.endswith(".pth"):
            from siammot_tpu.utils.checkpoint import import_torch_checkpoint
            self.params, leftovers = import_torch_checkpoint(model_path,
                                                             self.params)
            logger.info("imported %s (%d unmatched keys)", model_path,
                        len(leftovers))
        elif model_path:
            from siammot_tpu.utils.checkpoint import Checkpointer
            # model_path is either one Orbax checkpoint (.../model_NNN) or
            # a run dir holding several (pick the latest) — same rule as
            # tools/test_net.py
            is_ckpt = os.path.basename(
                os.path.normpath(model_path)).startswith("model_")
            ckptr = Checkpointer(os.path.dirname(os.path.normpath(
                model_path)) if is_ckpt else model_path)
            restored = ckptr.load(model_path if is_ckpt else None,
                                  like=None)
            if not restored:
                raise FileNotFoundError(
                    f"no checkpoint found at {model_path}")
            self.params = restored["params"]
            logger.info("loaded checkpoint at iter %s",
                        restored.get("iteration"))
        else:
            logger.warning("no model_path given — running with random "
                           "weights (smoke mode). The reference downloads "
                           "demo weights from S3; no egress here.")

    def _step_for(self, wh):
        import jax.numpy as jnp
        if self._step_size != wh:
            self._step = self.model.jit_step(image_size=wh)
            self._step_size = wh
            self._state = self.model.empty_state()
        return self._step

    def process(self, frame: np.ndarray):
        """One RGB frame -> (boxes xywh [N,4], ids [N], labels [N],
        scores [N]) in original-frame coordinates (valid rows only)."""
        import jax.numpy as jnp
        orig_h, orig_w = frame.shape[:2]
        x, (in_w, in_h) = self.transform(frame)
        step = self._step_for((in_w, in_h))
        out, self._state = step(self.params, jnp.asarray(x), self._state)

        boxes = np.asarray(out.boxes)
        valid = np.asarray(out.valid)
        sx, sy = orig_w / in_w, orig_h / in_h
        boxes = boxes * np.array([sx, sy, sx, sy], np.float32)
        xywh = np.stack([boxes[:, 0], boxes[:, 1],
                         boxes[:, 2] - boxes[:, 0] + 1,
                         boxes[:, 3] - boxes[:, 1] + 1], axis=-1)
        return (xywh[valid], np.asarray(out.ids)[valid],
                np.asarray(out.labels)[valid], np.asarray(out.scores)[valid])

    def process_frame_sequence(self, frame_iterator):
        """Per-frame generator (reference ``process_frame_sequence``,
        ``demo_inference.py:112-122``); resets track state first."""
        self._state = self.model.empty_state() if self._step else None
        for frame_id, frame in frame_iterator:
            xywh, ids, labels, scores = self.process(frame)
            if self.vis_generator and self.vis_writer:
                xyxy = xywh.copy()
                xyxy[:, 2:] += xyxy[:, :2] - 1
                vis = self.vis_generator.frame_vis_generator(
                    frame[:, :, ::-1], xyxy, ids, labels)
                self.vis_writer.dump_artifacts(vis, frame_id)
            yield frame_id, (xywh, ids, labels, scores)
