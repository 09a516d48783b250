"""Frame sources: prefetch semantics, error propagation, native path."""

import os

import cv2
import numpy as np
import pytest

from siammot_tpu.configs.defaults import get_cfg
from siammot_tpu.data.transforms import EvalTransform
from siammot_tpu.data.video_loader import (PrefetchIterator,
                                           build_frame_iterator,
                                           normalized_frame_source,
                                           video_metadata)


def test_prefetch_preserves_order_and_transform():
    it = PrefetchIterator(iter(range(10)), transform=lambda x: x * 2,
                          depth=2)
    assert list(it) == [2 * i for i in range(10)]


def test_prefetch_propagates_errors():
    def gen():
        yield 1
        raise ValueError("boom")

    it = PrefetchIterator(gen())
    assert next(it) == 1
    with pytest.raises(ValueError):
        for _ in it:
            pass


def test_normalized_frame_source_folder(tmp_path):
    rng = np.random.RandomState(0)
    for i in range(3):
        cv2.imwrite(str(tmp_path / f"{i:03d}.jpg"),
                    rng.randint(0, 255, (48, 64, 3), np.uint8))
    cfg = get_cfg()
    cfg.INPUT.MIN_SIZE_TEST = 48
    cfg.INPUT.MAX_SIZE_TEST = 64
    tr = EvalTransform(cfg)
    frames = list(normalized_frame_source(str(tmp_path), tr))
    assert len(frames) == 3
    x, (w, h) = frames[0]
    assert x.shape[0] == 1 and x.shape[1] % 32 == 0
    assert x.dtype == np.uint8          # device-normalize default
    # matches the cv2 path bit-for-bit-ish (same decode + same sampling)
    ref = list(PrefetchIterator(build_frame_iterator(str(tmp_path)), tr))
    assert np.abs(x.astype(np.int32)
                  - ref[0][0].astype(np.int32)).mean() < 1.0


def test_video_metadata_folder(tmp_path):
    cv2.imwrite(str(tmp_path / "0.jpg"), np.zeros((20, 30, 3), np.uint8))
    meta = video_metadata(str(tmp_path))
    assert meta["number_of_frames"] == 1
    assert meta["resolution"] == {"width": 30, "height": 20}
