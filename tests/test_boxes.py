"""Golden tests for core box ops against numpy oracles that mirror the
maskrcnn-benchmark semantics the reference relies on (TO_REMOVE=1, box
coder clip, clip_to_image bounds)."""

import numpy as np
import jax.numpy as jnp

from siammot_tpu.core import boxes as B


def rand_boxes(rng, n, size=(640, 480)):
    x1 = rng.uniform(0, size[0] - 2, n)
    y1 = rng.uniform(0, size[1] - 2, n)
    w = rng.uniform(1, 120, n)
    h = rng.uniform(1, 120, n)
    return np.stack([x1, y1, x1 + w, y1 + h], -1).astype(np.float32)


def oracle_iou(a, b):
    area_a = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
    area_b = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt + 1, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def test_iou_matches_oracle(rng):
    a, b = rand_boxes(rng, 13), rand_boxes(rng, 7)
    got = np.asarray(B.box_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, oracle_iou(a, b), rtol=1e-5)


def test_encode_decode_roundtrip(rng):
    proposals = rand_boxes(rng, 20)
    gt = rand_boxes(rng, 20)
    codes = B.encode(jnp.asarray(gt), jnp.asarray(proposals))
    rec = B.decode(codes, jnp.asarray(proposals))
    np.testing.assert_allclose(np.asarray(rec), gt, rtol=1e-4, atol=1e-3)


def test_decode_matches_torch_boxcoder(rng):
    # oracle: the Faster-R-CNN decode formula with +1 convention
    proposals = rand_boxes(rng, 16)
    codes = rng.randn(16, 4).astype(np.float32) * 0.4

    widths = proposals[:, 2] - proposals[:, 0] + 1
    heights = proposals[:, 3] - proposals[:, 1] + 1
    cx = proposals[:, 0] + 0.5 * widths
    cy = proposals[:, 1] + 0.5 * heights
    dx, dy = codes[:, 0] / 10, codes[:, 1] / 10
    dw = np.minimum(codes[:, 2] / 5, np.log(1000.0 / 16))
    dh = np.minimum(codes[:, 3] / 5, np.log(1000.0 / 16))
    pcx, pcy = dx * widths + cx, dy * heights + cy
    pw, ph = np.exp(dw) * widths, np.exp(dh) * heights
    want = np.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                     pcx + 0.5 * pw - 1, pcy + 0.5 * ph - 1], -1)

    got = np.asarray(B.decode(jnp.asarray(codes), jnp.asarray(proposals)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_clip_and_convert(rng):
    bx = rand_boxes(rng, 10, (100, 80)) * 2 - 30
    clipped = np.asarray(B.clip_to_image(jnp.asarray(bx), (100, 80)))
    assert clipped[:, 0::2].min() >= 0 and clipped[:, 0::2].max() <= 99
    assert clipped[:, 1::2].min() >= 0 and clipped[:, 1::2].max() <= 79

    xywh = np.asarray(B.xyxy_to_xywh(jnp.asarray(bx)))
    back = np.asarray(B.xywh_to_xyxy(jnp.asarray(xywh)))
    np.testing.assert_allclose(back, bx, rtol=1e-5, atol=1e-4)


def test_extend_box_matches_reference_formula(rng):
    # reference track_utils.extend_bbox with search_expansion = SEARCH_REGION-1
    bx = rand_boxes(rng, 8)
    exp = 1.0  # SEARCH_REGION 2.0
    got = np.asarray(B.extend_box(jnp.asarray(bx), exp, 0))
    w = bx[:, 2] - bx[:, 0] + 1
    h = bx[:, 3] - bx[:, 1] + 1
    want = np.stack([bx[:, 0] - w * exp / 2, bx[:, 1] - h * exp / 2,
                     bx[:, 2] + w * exp / 2, bx[:, 3] + h * exp / 2], -1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_resize_boxes():
    bx = jnp.asarray([[10.0, 20.0, 30.0, 60.0]])
    out = np.asarray(B.resize_boxes(bx, (100, 200), (50, 100)))
    np.testing.assert_allclose(out, [[5, 10, 15, 30]])
