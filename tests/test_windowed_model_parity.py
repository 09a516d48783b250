"""Full-model parity: windowed pooling vs exact gather pooling."""

import pytest as _pytest

pytestmark = _pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np

from siammot_tpu.configs.defaults import get_cfg
from siammot_tpu.models.siammot import SiamMOT


def _cfg(windowed: bool):
    cfg = get_cfg()
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 16
    cfg.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 16
    cfg.TPU.MAX_TRACKS = 4
    cfg.TPU.POOLER_WINDOWED = windowed
    cfg.TPU.POOLER_DTYPE = "float32"  # exact-parity comparison
    cfg.freeze()
    return cfg


def test_inference_windowed_matches_exact(rng):
    h, w = 96, 128
    frames = [jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
              for _ in range(3)]

    outs = {}
    for windowed in (False, True):
        model = SiamMOT(_cfg(windowed))
        params = model.init_params(jax.random.PRNGKey(0), (h, w))
        state = model.empty_state()
        step = model.jit_step(image_size=(w, h), donate_state=False)
        seq = []
        for f in frames:
            out, state = step(params, f, state)
            seq.append(jax.tree.map(np.asarray, out))
        outs[windowed] = seq

    for a, b in zip(outs[False], outs[True]):
        np.testing.assert_allclose(a.boxes, b.boxes, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(a.scores, b.scores, rtol=1e-3, atol=1e-3)
        np.testing.assert_array_equal(a.ids, b.ids)
        np.testing.assert_array_equal(a.valid, b.valid)
