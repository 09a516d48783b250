"""Frame sources for inference and the demo.

Native replacement for the reference's decord/cv2/image-folder iterators
(``/root/reference/demos/video_iterator.py:9-124`` and the gluoncv frame
readers used by ``build_inference_data_loader.py:8-56``): decode stays on
the CPU (cv2 bundles FFmpeg), device transfer happens downstream.  A
background prefetch thread overlaps decode+resize with TPU compute.
"""

from __future__ import annotations

import glob
import os
import queue
import threading
from typing import Iterator, Optional

import cv2
import numpy as np

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


def video_frames(path: str) -> Iterator[np.ndarray]:
    """Yield RGB frames from a video file."""
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video {path}")
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            yield cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
    finally:
        cap.release()


def folder_frames(path: str) -> Iterator[np.ndarray]:
    """Yield RGB frames from a directory of numbered images."""
    files = sorted(f for f in glob.glob(os.path.join(path, "*"))
                   if f.lower().endswith(IMAGE_EXTS))
    for f in files:
        img = cv2.imread(f, cv2.IMREAD_COLOR)
        if img is None:
            raise IOError(f"cannot read image {f}")
        yield cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def build_frame_iterator(path: str) -> Iterator[np.ndarray]:
    if os.path.isdir(path):
        return folder_frames(path)
    return video_frames(path)


def video_metadata(path: str) -> dict:
    """(fps, frame count, width, height) for a file or image folder."""
    if os.path.isdir(path):
        files = sorted(f for f in glob.glob(os.path.join(path, "*"))
                       if f.lower().endswith(IMAGE_EXTS))
        if not files:
            return dict(fps=30.0, number_of_frames=0)
        img = cv2.imread(files[0])
        return dict(fps=30.0, number_of_frames=len(files),
                    resolution={"width": img.shape[1], "height": img.shape[0]})
    cap = cv2.VideoCapture(path)
    meta = dict(fps=cap.get(cv2.CAP_PROP_FPS) or 30.0,
                number_of_frames=int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
                resolution={"width": int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
                            "height": int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))})
    cap.release()
    return meta


class PrefetchIterator:
    """Run a frame iterator + transform on a background thread."""

    _DONE = object()

    def __init__(self, iterator, transform=None, depth: int = 4):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._transform = transform
        self._err: Optional[BaseException] = None
        self._t = threading.Thread(target=self._run, args=(iterator,),
                                   daemon=True)
        self._t.start()

    def _run(self, iterator):
        try:
            for item in iterator:
                self._q.put(self._transform(item) if self._transform else item)
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            self._q.put(self._DONE)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._DONE:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def normalized_frame_source(path: str, transform, depth: int = 4):
    """Prefetched stream of ``(normalized padded [1,H,W,3] f32, (w, h))``.

    JPEG image folders take the native fast path (csrc/frameio.so:
    threaded libjpeg decode fused with resize+normalize); everything else
    decodes via cv2 on a prefetch thread and runs ``transform`` per frame.
    """
    from . import native

    if os.path.isdir(path) and native.available():
        files = sorted(f for f in glob.glob(os.path.join(path, "*"))
                       if f.lower().endswith((".jpg", ".jpeg")))
        if files:
            size = native.image_size(files[0])
            if size is not None:
                w, h = size
                nw, nh = transform.input_size(w, h)

                device_norm = bool(getattr(transform, "device_normalize",
                                           False))

                def gen():
                    from .transforms import pad_to_divisible
                    for f in files:
                        x = native.decode_resize(f, nw, nh) if device_norm \
                            else native.decode_resize_normalize(
                                f, nw, nh, transform.mean, transform.std)
                        if x is None:  # corrupt file: cv2 fallback
                            img = cv2.cvtColor(cv2.imread(f),
                                               cv2.COLOR_BGR2RGB)
                            yield transform(img)
                            continue
                        x = pad_to_divisible(x, transform.divisor)
                        yield x[None], (nw, nh)

                return PrefetchIterator(gen(), None, depth)
    return PrefetchIterator(build_frame_iterator(path), transform, depth)


def resolve_data_path(sample, dataset_root: str) -> str:
    """Locate a sample's frame source under the dataset root."""
    p = sample.data_path
    if not p:
        raise IOError(f"sample {sample.id} has no data_path")
    if os.path.isabs(p):
        return p
    cand = os.path.join(dataset_root, p)
    if os.path.exists(cand):
        return cand
    # ingested MOT layouts keep raw sequences beside the annotation dir
    # rather than under <root>/raw_data — fall back to the dataset folder
    if os.path.basename(dataset_root) == "raw_data":
        alt = os.path.join(os.path.dirname(dataset_root), p)
        if os.path.exists(alt):
            return alt
    return cand
