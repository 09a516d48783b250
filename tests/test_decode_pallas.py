"""Pallas fused-decode kernel vs the XLA fused decode (interpret mode).

The kernel replaces only the upsample+penalty+argmax reduction; the
box-regression/location epilogue is shared code, so matching (idx, score)
via identical output boxes/scores is the complete parity statement.
"""

import jax.numpy as jnp
import jax
import numpy as np
import pytest

from siammot_tpu.configs.defaults import get_cfg
from siammot_tpu.models.emm import EMMConfig, decode_response_fused


def _inputs(rng, ecfg, k):
    s = ecfg.response_size
    cls_l = jnp.asarray(rng.randn(k, s, s, 2).astype(np.float32))
    ctr_l = jnp.asarray(rng.randn(k, s, s, 1).astype(np.float32))
    reg_l = jnp.asarray(np.abs(rng.randn(k, s, s, 4)).astype(np.float32) * 20)
    boxes = []
    for _ in range(k):
        x1, y1 = rng.uniform(0, 200, 2)
        w, h = rng.uniform(30, 120, 2)
        boxes.append([x1, y1, x1 + w, y1 + h])
    tmpl = jnp.asarray(np.array(boxes, np.float32))
    sr = tmpl + ecfg.pad_pixels
    ext = (sr[:, 2:] - sr[:, :2]) / 2.0
    sr = jnp.concatenate([sr[:, :2] - ext, sr[:, 2:] + ext], axis=1)
    return cls_l, ctr_l, reg_l, sr, tmpl


@pytest.mark.parametrize("use_centerness", [True, False])
def test_pallas_decode_matches_xla(rng, use_centerness):
    cfg = get_cfg()
    cfg.MODEL.TRACK_HEAD.EMM.USE_CENTERNESS = use_centerness
    ecfg = EMMConfig.from_cfg(cfg)
    k, up = 6, 16
    cls_l, ctr_l, reg_l, sr, tmpl = _inputs(rng, ecfg, k)

    ref_boxes, ref_scores = decode_response_fused(cls_l, ctr_l, reg_l, sr,
                                                  tmpl, ecfg, up)
    out_boxes, out_scores = decode_response_fused(
        cls_l, ctr_l, reg_l, sr, tmpl, ecfg, up,
        use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out_boxes), np.asarray(ref_boxes),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_scores),
                               np.asarray(ref_scores), rtol=1e-5, atol=1e-6)


def test_pallas_decode_dead_slots(rng):
    """All-zero (dead-slot) inputs decode without NaN/Inf."""
    cfg = get_cfg()
    ecfg = EMMConfig.from_cfg(cfg)
    k, s, up = 3, ecfg.response_size, 16
    z = jnp.zeros((k, s, s, 2)), jnp.zeros((k, s, s, 1)), \
        jnp.zeros((k, s, s, 4))
    tmpl = jnp.zeros((k, 4))
    sr = jnp.tile(jnp.asarray([[0.0, 0.0, 60.0, 60.0]]), (k, 1))
    boxes, scores = decode_response_fused(z[0], z[1], z[2], sr, tmpl, ecfg,
                                          up, use_pallas=True,
                                          interpret=True)
    assert np.all(np.isfinite(np.asarray(boxes)))
    assert np.all(np.isfinite(np.asarray(scores)))


def test_striped_decode_matches_unstriped(rng):
    """Forced striping == whole-map kernel (same contraction order —
    bitwise cells, running argmax)."""
    from siammot_tpu.ops.pallas.decode import emm_decode_pallas

    cfg = get_cfg()
    ecfg = EMMConfig.from_cfg(cfg)
    k, s, up = 4, ecfg.response_size, 16
    cls_l, ctr_l, reg_l, sr, tmpl = _inputs(rng, ecfg, k)
    diff = cls_l[..., 1] - cls_l[..., 0]
    x4 = jnp.stack([diff, ctr_l[..., 0],
                    reg_l[..., 0] + reg_l[..., 2],
                    reg_l[..., 1] + reg_l[..., 3]], axis=1)
    wh = jnp.stack([tmpl[:, 2] - tmpl[:, 0], tmpl[:, 3] - tmpl[:, 1]],
                   axis=-1)
    from siammot_tpu.ops.upsample import bicubic_matrix
    from siammot_tpu.models.emm import _hann_window
    u = jnp.asarray(bicubic_matrix(s, up), jnp.float32)
    win = jnp.asarray(_hann_window(s * up)).reshape(s * up, s * up)

    ref = emm_decode_pallas(x4, wh, u, win, sigma=0.4, use_centerness=True,
                            up_scale=up, interpret=True)
    for stripe in (8, 32):
        got = emm_decode_pallas(x4, wh, u, win, sigma=0.4,
                                use_centerness=True, up_scale=up,
                                stripe=stripe, interpret=True)
        np.testing.assert_array_equal(np.asarray(got[0]),
                                      np.asarray(ref[0]))
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                                   rtol=1e-6, atol=1e-7)


def test_fused_decode_pallas_aot_shape(rng):
    """SEARCH_REGION=5 (AOT): s_hi=976 routes to the striped kernel and
    matches the XLA fused decode."""
    cfg = get_cfg()
    cfg.MODEL.TRACK_HEAD.SEARCH_REGION = 5.0
    ecfg = EMMConfig.from_cfg(cfg)
    assert ecfg.response_size * 16 == 976
    k, up = 2, 16
    cls_l, ctr_l, reg_l, sr, tmpl = _inputs(rng, ecfg, k)

    ref_boxes, ref_scores = decode_response_fused(cls_l, ctr_l, reg_l, sr,
                                                  tmpl, ecfg, up)
    out_boxes, out_scores = decode_response_fused(
        cls_l, ctr_l, reg_l, sr, tmpl, ecfg, up,
        use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out_boxes), np.asarray(ref_boxes),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_scores),
                               np.asarray(ref_scores), rtol=1e-5, atol=1e-6)


def test_decode_pallas_masked_slots(rng):
    """Dead slots skip decode and emit (idx 0, score 0); live slots are
    bitwise-equal to the unmasked kernel."""
    from siammot_tpu.models.emm import _hann_window
    from siammot_tpu.ops.pallas.decode import emm_decode_pallas
    from siammot_tpu.ops.upsample import bicubic_matrix

    cfg = get_cfg()
    ecfg = EMMConfig.from_cfg(cfg)
    k, s, up = 6, ecfg.response_size, 16
    cls_l, ctr_l, reg_l, sr, tmpl = _inputs(rng, ecfg, k)
    x4 = jnp.stack([cls_l[..., 1] - cls_l[..., 0], ctr_l[..., 0],
                    reg_l[..., 0] + reg_l[..., 2],
                    reg_l[..., 1] + reg_l[..., 3]], axis=1)
    wh = jnp.stack([tmpl[:, 2] - tmpl[:, 0], tmpl[:, 3] - tmpl[:, 1]], -1)
    u = jnp.asarray(bicubic_matrix(s, up), jnp.float32)
    win = jnp.asarray(_hann_window(s * up)).reshape(s * up, s * up)
    valid = jnp.asarray([True, False, True, True, False, True])

    ref = emm_decode_pallas(x4, wh, u, win, sigma=0.4, use_centerness=True,
                            up_scale=up, interpret=True)
    got = emm_decode_pallas(x4, wh, u, win, valid, sigma=0.4,
                            use_centerness=True, up_scale=up,
                            interpret=True)
    v = np.asarray(valid)
    np.testing.assert_array_equal(np.asarray(got[0])[v],
                                  np.asarray(ref[0])[v])
    np.testing.assert_array_equal(np.asarray(got[1])[v],
                                  np.asarray(ref[1])[v])
    assert not np.any(np.asarray(got[0])[~v])
    assert not np.any(np.asarray(got[1])[~v])


def test_masked_decode_under_vmap(rng):
    """Multistream vmaps the frame step; the masked decode's batching
    must match a per-stream loop."""
    from siammot_tpu.models.emm import _hann_window
    from siammot_tpu.ops.pallas.decode import emm_decode_pallas
    from siammot_tpu.ops.upsample import bicubic_matrix

    n, k, s, up = 3, 4, 16, 16
    x4 = jnp.asarray(rng.randn(n, k, 4, s, s).astype(np.float32))
    wh = jnp.asarray(np.abs(rng.randn(n, k, 2)).astype(np.float32) * 50
                     + 20)
    u = jnp.asarray(bicubic_matrix(s, up), jnp.float32)
    win = jnp.asarray(_hann_window(s * up)).reshape(s * up, s * up)
    valid = jnp.asarray(rng.rand(n, k) < 0.5)

    fn = lambda x, w, v: emm_decode_pallas(
        x, w, u, win, v, sigma=0.4, use_centerness=True, up_scale=up,
        interpret=True)
    got = jax.vmap(fn)(x4, wh, valid)
    for i in range(n):
        want = fn(x4[i], wh[i], valid[i])
        np.testing.assert_array_equal(np.asarray(got[0][i]),
                                      np.asarray(want[0]))
        np.testing.assert_array_equal(np.asarray(got[1][i]),
                                      np.asarray(want[1]))
