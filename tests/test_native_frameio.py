"""Native frame-IO (csrc/libframeio.so) vs cv2 reference."""

import os
import subprocess

import cv2
import numpy as np
import pytest

from siammot_tpu.data import native

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def build_lib():
    if not native.available():
        subprocess.run(["make", "-C", os.path.join(REPO, "csrc")], check=True)
    assert native.available()


def _write_jpeg(tmp_path, w=160, h=120, q=95):
    arr = np.random.RandomState(0).randint(0, 255, (h, w, 3), np.uint8)
    path = str(tmp_path / "img.jpg")
    cv2.imwrite(path, arr[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, q])
    return path


def test_image_size(tmp_path):
    path = _write_jpeg(tmp_path, 161, 121)
    assert native.image_size(path) == (161, 121)


def test_decode_matches_cv2(tmp_path):
    path = _write_jpeg(tmp_path)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    out = native.decode_resize_normalize(path, 96, 64, mean, std)
    assert out is not None and out.shape == (64, 96, 3)

    img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
    ref = cv2.resize(img, (96, 64), interpolation=cv2.INTER_LINEAR)
    ref = (ref.astype(np.float32) / 255.0 - mean) / std
    # same half-pixel bilinear sampling; jpeg decoders may differ by a few
    # LSBs so compare with a loose-but-tight tolerance in normalized units
    assert np.abs(out - ref).mean() < 0.02
    assert np.percentile(np.abs(out - ref), 99) < 0.1


def test_decode_batch(tmp_path):
    paths = []
    for i in range(6):
        arr = np.full((50, 60, 3), 40 * i, np.uint8)
        p = str(tmp_path / f"b{i}.jpg")
        cv2.imwrite(p, arr)
        paths.append(p)
    mean = np.zeros(3, np.float32)
    std = np.ones(3, np.float32)
    out = native.decode_batch(paths, 60, 50, mean, std)
    assert out.shape == (6, 50, 60, 3)
    for i in range(6):
        assert abs(float(out[i].mean()) - 40 * i / 255.0) < 0.02


def test_decode_missing_file():
    assert native.decode_resize_normalize("/nonexistent.jpg", 8, 8,
                                          np.zeros(3, np.float32),
                                          np.ones(3, np.float32)) is None
