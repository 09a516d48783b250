"""Frame sources for the demo CLI.

Counterpart of ``/root/reference/demos/video_iterator.py:9-124`` (decord /
cv2 / image-folder inputs with a rotation probe).  Decord does not exist
here; cv2 bundles FFmpeg and covers the video-file path, and image
folders are read directly.  Yields (frame_id, RGB frame) pairs.

Rotation: the reference probes the container's rotate tag via
``ffmpeg.probe`` and counter-rotates each decoded frame with ``np.rot90``
(``video_iterator.py:79-86``) so phone videos track upright.  No ffmpeg
binary ships here; cv2 5.x exposes the same display-matrix metadata as
``CAP_PROP_ORIENTATION_META``.  We disable cv2's implicit auto-rotation
(``CAP_PROP_ORIENTATION_AUTO``) and apply the rotation ourselves so the
semantics are explicit and identical to the reference's.
"""

from __future__ import annotations

import glob
import os
from typing import Iterator, Tuple

import cv2
import numpy as np

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


def check_rotation(path: str) -> int:
    """Probe the container rotation tag in degrees (0/90/180/270).

    Reference ``check_rotation`` (``video_iterator.py:79-86``) reads
    ``streams[0].tags.rotate`` via ffmpeg; this reads the equivalent
    display-matrix metadata through cv2's FFmpeg backend.  Returns 0 when
    the container carries no rotation metadata.
    """
    cap = cv2.VideoCapture(path)
    try:
        if not cap.isOpened():
            return 0
        # Make sure the probe itself never triggers implicit rotation.
        cap.set(cv2.CAP_PROP_ORIENTATION_AUTO, 0)
        meta = cap.get(cv2.CAP_PROP_ORIENTATION_META)
        rotation = int(meta) % 360 if meta else 0
        return rotation if rotation in (90, 180, 270) else 0
    finally:
        cap.release()


def apply_rotation(frame: np.ndarray, rotation: int) -> np.ndarray:
    """Counter-rotate a decoded frame upright (reference ``__call__``,
    ``video_iterator.py:70-73``: ``np.rot90(frame, k=(-(rot//90)) % 4)``)."""
    if rotation > 0:
        frame = np.rot90(frame, k=(-(rotation // 90)) % 4)
    return frame


class Cv2VideoIterator:
    def __init__(self, path: str):
        self.path = path
        self.rotation = check_rotation(path)
        cap = cv2.VideoCapture(path)
        if not cap.isOpened():
            raise IOError(f"cannot open video {path}")
        # We counter-rotate explicitly; stop cv2 from also doing it.
        cap.set(cv2.CAP_PROP_ORIENTATION_AUTO, 0)
        self.fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
        self.frame_count = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self._cap = cap

    def __iter__(self) -> Iterator[Tuple[int, np.ndarray]]:
        i = 0
        while True:
            ok, frame = self._cap.read()
            if not ok:
                self._cap.release()
                return
            frame = apply_rotation(frame, self.rotation)
            yield i, np.ascontiguousarray(frame[:, :, ::-1])
            i += 1


class ImageFolderIterator:
    def __init__(self, path: str):
        self.files = sorted(f for f in glob.glob(os.path.join(path, "*"))
                            if f.lower().endswith(IMAGE_EXTS))
        if not self.files:
            raise IOError(f"no images under {path}")
        self.fps = 30.0
        self.frame_count = len(self.files)

    def __iter__(self):
        for i, f in enumerate(self.files):
            img = cv2.imread(f, cv2.IMREAD_COLOR)
            if img is None:
                raise IOError(f"cannot read {f}")
            yield i, cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def build_video_iterator(path: str):
    """Reference ``build_video_iterator`` (``video_iterator.py:117-124``)."""
    if os.path.isdir(path):
        return ImageFolderIterator(path)
    return Cv2VideoIterator(path)
