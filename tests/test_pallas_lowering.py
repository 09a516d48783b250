"""Mosaic lowering regression for every Pallas kernel.

Interpret-mode parity cannot prove a kernel lowers on real TPU hardware
(round-1 lesson: the decode/predictor kernels passed interpret tests but
failed Mosaic with unimplemented ``dynamic_update_slice``/``dynamic_slice``
primitives and (8, 128) block-tiling violations).  ``jax.export`` performs
the full Mosaic lowering for the ``tpu`` platform on a CPU host, so this
catches those failures in CI without a chip.  On-chip numerics remain
covered by ``tools/verify_kernels_tpu.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def lower_tpu(fn, *args):
    jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    b, hs, ws, ht, wt, c = 8, 30, 30, 15, 15, 128
    return dict(
        rng=rng,
        search=jnp.asarray(rng.randn(b, hs, ws, c).astype(np.float32)),
        template=jnp.asarray(rng.randn(b, ht, wt, c).astype(np.float32)),
        valid=jnp.asarray(rng.rand(b) < 0.5),
    )


def test_xcorr_lowers(data):
    from siammot_tpu.ops.pallas.xcorr import xcorr_depthwise_pallas
    lower_tpu(lambda s, t: xcorr_depthwise_pallas(s, t),
              data["search"], data["template"])
    lower_tpu(lambda s, t, v: xcorr_depthwise_pallas(s, t, v),
              data["search"], data["template"], data["valid"])


def test_predictor_lowers(data):
    from siammot_tpu.models.emm import EMMPredictor
    from siammot_tpu.ops.pallas.predictor import emm_predictor_pallas
    rng = data["rng"]
    x = jnp.asarray(rng.randn(8, 16, 16, 128).astype(np.float32)) \
        .astype(jnp.bfloat16)
    model = EMMPredictor(channels=128, use_pallas=False)
    variables = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                             model.init(jax.random.PRNGKey(0), x))
    lower_tpu(lambda x, v, p: emm_predictor_pallas(x, v, p),
              x, data["valid"], variables["params"])


@pytest.mark.parametrize("variant", ["plain", "masked", "striped"])
def test_decode_lowers(data, variant):
    from siammot_tpu.models.emm import _hann_window
    from siammot_tpu.ops.pallas.decode import emm_decode_pallas
    from siammot_tpu.ops.upsample import bicubic_matrix
    rng = data["rng"]
    k, s_lo, up = 8, 16, 16
    x4 = jnp.asarray(rng.randn(k, 4, s_lo, s_lo).astype(np.float32))
    wh = jnp.asarray(np.abs(rng.randn(k, 2)).astype(np.float32) * 60 + 20)
    u = jnp.asarray(bicubic_matrix(s_lo, up), jnp.float32)
    win = jnp.asarray(_hann_window(s_lo * up)).reshape(s_lo * up, s_lo * up)
    kw = dict(sigma=0.4, use_centerness=True, up_scale=up)
    if variant == "plain":
        lower_tpu(lambda a, b: emm_decode_pallas(a, b, u, win, **kw),
                  x4, wh)
    elif variant == "masked":
        lower_tpu(lambda a, b, v: emm_decode_pallas(a, b, u, win, v, **kw),
                  x4, wh, data["valid"])
    else:
        lower_tpu(lambda a, b: emm_decode_pallas(a, b, u, win, stripe=64,
                                                 **kw), x4, wh)


def test_window_pool_lowers(data):
    from siammot_tpu.ops.pallas.window_pool import window_pool
    rng = data["rng"]
    table = jnp.asarray(rng.randn(512, 160, 128).astype(np.float32))
    n, out, window = 16, 15, 64
    origins = jnp.asarray(
        np.stack([rng.randint(0, 448, n), (rng.randint(0, 4, n)) * 8],
                 -1).astype(np.int32))
    wy = jnp.asarray(rng.rand(n, out, window).astype(np.float32))
    wx = jnp.asarray(rng.rand(n, out, window).astype(np.float32))
    lower_tpu(lambda t, o, a, b: window_pool(t, o, a, b, window),
              table, origins, wy, wx)
