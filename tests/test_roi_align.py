"""ROIAlign parity vs a numpy oracle transcribing the maskrcnn-benchmark
CUDA kernel semantics (csrc/ROIAlign_cuda.cu, aligned=False), including the
virtual-padding path vs physically padded features."""

import pytest
import numpy as np
import jax.numpy as jnp

from siammot_tpu.ops.roi_align import (roi_align, multilevel_roi_align,
                                       map_rois_to_levels)


def oracle_bilinear(feat, y, x):
    """maskrcnn bilinear_interpolate: zero outside [-1, size]; clamp."""
    h, w = feat.shape[:2]
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(feat.shape[2], feat.dtype)
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_low, x_low = int(y), int(x)
    if y_low >= h - 1:
        y_high = y_low = h - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= w - 1:
        x_high = x_low = w - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly, lx = y - y_low, x - x_low
    hy, hx = 1 - ly, 1 - lx
    return (hy * hx * feat[y_low, x_low] + hy * lx * feat[y_low, x_high]
            + ly * hx * feat[y_high, x_low] + ly * lx * feat[y_high, x_high])


def oracle_roi_align(feat, rois, out, scale, ratio):
    n = len(rois)
    c = feat.shape[2]
    res = np.zeros((n, out, out, c), np.float32)
    for r in range(n):
        x1, y1, x2, y2 = rois[r] * scale
        roi_w = max(x2 - x1, 1.0)
        roi_h = max(y2 - y1, 1.0)
        bin_w, bin_h = roi_w / out, roi_h / out
        for ph in range(out):
            for pw in range(out):
                acc = np.zeros(c, np.float32)
                for iy in range(ratio):
                    yy = y1 + ph * bin_h + (iy + 0.5) * bin_h / ratio
                    for ix in range(ratio):
                        xx = x1 + pw * bin_w + (ix + 0.5) * bin_w / ratio
                        acc += oracle_bilinear(feat, yy, xx)
                res[r, ph, pw] = acc / (ratio * ratio)
    return res


def test_roi_align_matches_oracle(rng):
    h, w, c = 37, 53, 8
    feat = rng.randn(h, w, c).astype(np.float32)
    rois = np.stack([
        rng.uniform(-10, w * 4 - 10, 20),
        rng.uniform(-10, h * 4 - 10, 20),
        rng.uniform(0, 120, 20),
        rng.uniform(0, 120, 20),
    ], -1).astype(np.float32)
    rois[:, 2] += rois[:, 0]
    rois[:, 3] += rois[:, 1]

    want = oracle_roi_align(feat, rois, 7, 0.25, 2)
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 7, 0.25, 2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_virtual_pad_equals_physical_pad(rng):
    """Pooling with pad=k from unpadded features must equal pooling the
    physically zero-padded map with shifted rois (track_utils semantics)."""
    h, w, c = 24, 30, 4
    pad_feat = 8          # feature-space pad
    scale = 0.25
    pad_img = pad_feat / scale
    feat = rng.randn(h, w, c).astype(np.float32)
    padded = np.zeros((h + 2 * pad_feat, w + 2 * pad_feat, c), np.float32)
    padded[pad_feat:-pad_feat, pad_feat:-pad_feat] = feat

    rois = np.stack([
        rng.uniform(-60, w * 4, 16),
        rng.uniform(-60, h * 4, 16),
        rng.uniform(20, 200, 16),
        rng.uniform(20, 200, 16),
    ], -1).astype(np.float32)
    rois[:, 2] += rois[:, 0]
    rois[:, 3] += rois[:, 1]
    rois_padded = rois + pad_img  # shifted into padded image coords

    want = np.asarray(roi_align(jnp.asarray(padded), jnp.asarray(rois_padded),
                                15, scale, 2, pad=0))
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois_padded),
                               15, scale, 2, pad=pad_feat))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_level_mapper():
    # FPN paper eqn: 224^2 area -> level 4; tiny boxes clamp to k_min
    boxes = jnp.asarray([
        [0, 0, 223, 223],     # -> level 4 -> idx 2
        [0, 0, 15, 15],       # tiny -> idx 0
        [0, 0, 1000, 1000],   # huge -> idx 3
        [0, 0, 111, 111],     # 112^2 -> level 3 -> idx 1
    ], dtype=jnp.float32)
    got = np.asarray(map_rois_to_levels(boxes, 2, 5))
    np.testing.assert_array_equal(got, [2, 0, 3, 1])


def test_multilevel_matches_per_level(rng):
    c = 8
    shapes = [(40, 52), (20, 26), (10, 13), (5, 7)]
    scales = (0.25, 0.125, 0.0625, 0.03125)
    feats = [rng.randn(h, w, c).astype(np.float32) for h, w in shapes]

    rois = np.stack([
        rng.uniform(0, 100, 24),
        rng.uniform(0, 80, 24),
        rng.uniform(10, 300, 24),
        rng.uniform(10, 300, 24),
    ], -1).astype(np.float32)
    rois[:, 2] += rois[:, 0]
    rois[:, 3] += rois[:, 1]
    levels = np.asarray(map_rois_to_levels(jnp.asarray(rois), 2, 5))

    got = np.asarray(multilevel_roi_align(
        [jnp.asarray(f) for f in feats], jnp.asarray(rois),
        jnp.asarray(levels), 7, scales, 2))

    for lvl in range(4):
        sel = levels == lvl
        if not sel.any():
            continue
        want = np.asarray(roi_align(jnp.asarray(feats[lvl]),
                                    jnp.asarray(rois[sel]), 7,
                                    scales[lvl], 2))
        np.testing.assert_allclose(got[sel], want, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_multilevel_virtual_pad(rng):
    """Multilevel pooler with PAD_PIXELS matches per-level physical pad."""
    c = 4
    pad_pixels = 64
    shapes = [(40, 52), (20, 26), (10, 13), (5, 7)]
    scales = (0.25, 0.125, 0.0625, 0.03125)
    feats = [rng.randn(h, w, c).astype(np.float32) for h, w in shapes]

    rois = np.stack([
        rng.uniform(-40, 140, 12),
        rng.uniform(-40, 120, 12),
        rng.uniform(30, 400, 12),
        rng.uniform(30, 400, 12),
    ], -1).astype(np.float32)
    rois[:, 2] += rois[:, 0]
    rois[:, 3] += rois[:, 1]
    levels = np.asarray(map_rois_to_levels(jnp.asarray(rois), 2, 5))
    rois_padded = rois + pad_pixels

    got = np.asarray(multilevel_roi_align(
        [jnp.asarray(f) for f in feats], jnp.asarray(rois_padded),
        jnp.asarray(levels), 15, scales, 2, pad_pixels=pad_pixels))

    for lvl in range(4):
        sel = levels == lvl
        if not sel.any():
            continue
        pf = int(round(pad_pixels * scales[lvl]))
        h, w = shapes[lvl]
        padded = np.zeros((h + 2 * pf, w + 2 * pf, c), np.float32)
        padded[pf:pf + h, pf:pf + w] = feats[lvl]
        want = np.asarray(roi_align(jnp.asarray(padded),
                                    jnp.asarray(rois_padded[sel]), 15,
                                    scales[lvl], 2))
        np.testing.assert_allclose(got[sel], want, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_batched_pooler_ignores_extra_levels(rng):
    """Passing the full FPN list (incl. P6, uncovered by pooler scales)
    must equal passing only the scale-covered levels — regression test for
    the (image, level) block-indexing bug that zeroed template pooling for
    images >= 1 during training."""
    import jax.numpy as jnp
    from siammot_tpu.ops.roi_align import (map_rois_to_levels,
                                           multilevel_roi_align_batched)
    scales = (0.25, 0.125, 0.0625, 0.03125)
    feats4 = [jnp.asarray(rng.randn(3, 32 // 2 ** i, 48 // 2 ** i, 8)
                          .astype(np.float32)) for i in range(4)]
    feats5 = feats4 + [jnp.asarray(rng.randn(3, 1, 2, 8).astype(np.float32))]
    n = 9
    x1 = rng.uniform(0, 100, n).astype(np.float32)
    y1 = rng.uniform(0, 80, n).astype(np.float32)
    rois = jnp.asarray(np.stack([x1, y1, x1 + 30, y1 + 40], -1))
    img_idx = jnp.asarray((np.arange(n) % 3).astype(np.int32))
    levels = map_rois_to_levels(rois, 2, 5)
    a = multilevel_roi_align_batched(feats4, rois, img_idx, levels, 7,
                                     scales, 2)
    b = multilevel_roi_align_batched(feats5, rois, img_idx, levels, 7,
                                     scales, 2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                               atol=1e-6)
    assert float(np.abs(np.asarray(a)).sum()) > 0
