"""Multi-stream vmapped inference + clip scan on the virtual CPU mesh."""

import pytest as _pytest

pytestmark = _pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from siammot_tpu.configs.defaults import get_cfg
from siammot_tpu.models.siammot import SiamMOT
from siammot_tpu.parallel.mesh import make_mesh
from siammot_tpu.parallel.multistream import (build_clip_scan,
                                              build_multistream_step,
                                              empty_states)


@pytest.fixture(scope="module")
def small_model():
    cfg = get_cfg()
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 16
    cfg.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 16
    cfg.TPU.MAX_TRACKS = 4
    cfg.freeze()
    model = SiamMOT(cfg)
    params = model.init_params(jax.random.PRNGKey(0), (64, 96))
    return model, params


def test_multistream_sharded_step(small_model):
    model, params = small_model
    s = 8
    mesh = make_mesh(8)
    step = build_multistream_step(model, mesh, image_size=(96, 64),
                                  donate_state=False)
    states = empty_states(model, s)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(s, 1, 64, 96, 3).astype(np.float32))
    out, states2 = step(params, images, states)
    assert out.boxes.shape[0] == s
    assert int(states2.frame_idx[0]) == 1
    assert np.all(np.asarray(states2.frame_idx) == 1)
    # streams are independent: same input per stream -> same next_id
    assert len(set(np.asarray(states2.next_id).tolist())) == 1


def test_clip_scan_matches_stepwise(small_model):
    model, params = small_model
    t = 3
    rng = np.random.RandomState(1)
    frames = jnp.asarray(rng.rand(t, 1, 64, 96, 3).astype(np.float32))

    scan = build_clip_scan(model, t, image_size=(96, 64))
    outs, state_scan = scan(params, frames, model.empty_state())
    assert outs.boxes.shape[0] == t

    step = model.jit_step(image_size=(96, 64), donate_state=False)
    state = model.empty_state()
    for i in range(t):
        out, state = step(params, frames[i], state)
        np.testing.assert_allclose(np.asarray(outs.boxes[i]),
                                   np.asarray(out.boxes), rtol=1e-5,
                                   atol=1e-5)
    assert int(state.frame_idx) == int(state_scan.frame_idx)
    np.testing.assert_array_equal(np.asarray(state.ids),
                                  np.asarray(state_scan.ids))
