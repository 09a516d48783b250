"""Frame sources for the demo CLI.

Counterpart of ``/root/reference/demos/video_iterator.py:9-124`` (decord /
cv2 / image-folder inputs with a rotation probe).  Decord does not exist
here; cv2 bundles FFmpeg and covers the video-file path, and image
folders are read directly.  Yields (frame_id, RGB frame) pairs.
"""

from __future__ import annotations

import glob
import os
from typing import Iterator, Tuple

import cv2
import numpy as np

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


class Cv2VideoIterator:
    def __init__(self, path: str):
        self.path = path
        cap = cv2.VideoCapture(path)
        if not cap.isOpened():
            raise IOError(f"cannot open video {path}")
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
            yield i, cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
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
