"""End-to-end smoke: full jitted SiamMOT frame step over several frames."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from siammot_tpu.configs.defaults import get_cfg
from siammot_tpu.models.siammot import SiamMOT


@pytest.fixture(scope="module")
def model_and_params():
    cfg = get_cfg()
    cfg.TPU.MAX_TRACKS = 8
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 50
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 20
    cfg.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 20
    cfg.freeze()
    model = SiamMOT(cfg)
    params = model.init_params(jax.random.PRNGKey(0), (128, 160))
    return model, params


@pytest.mark.slow
def test_inference_step_runs_and_carries_state(model_and_params):
    model, params = model_and_params
    step = jax.jit(model.forward_inference)

    state = model.empty_state()
    rng = np.random.RandomState(0)
    outs = []
    for t in range(3):
        img = jnp.asarray(rng.randn(1, 128, 160, 3).astype(np.float32))
        out, state = step(params, img, state)
        outs.append(out)
        assert bool(jnp.isfinite(out.boxes).all())
        assert bool(jnp.isfinite(out.scores).all())
        assert int(state.frame_idx) == t + 1

    # state invariants
    ids = np.asarray(state.ids)
    occ = ids >= 0
    assert len(set(ids[occ].tolist())) == occ.sum(), "slot ids must be unique"
    assert int(state.next_id) >= occ.sum()
    # scores of emitted rows are in (0, 1]
    for out in outs:
        v = np.asarray(out.valid)
        s = np.asarray(out.scores)[v]
        if len(s):
            assert (s > 0).all() and (s <= 1.0 + 1e-5).all()


@pytest.mark.slow
def test_given_detection_mode(model_and_params):
    """MOT17 public-detection bypass (roi_heads.py:24-33)."""
    from siammot_tpu.core.structures import Boxes
    model, params = model_and_params
    n = 10
    given = Boxes(
        boxes=jnp.asarray(np.tile([[10.0, 10, 60, 90]], (n, 1)).astype(np.float32)
                          + np.arange(n)[:, None].astype(np.float32) * 8),
        scores=jnp.ones((n,), jnp.float32),
        ids=jnp.full((n,), -1, jnp.int32),
        labels=jnp.zeros((n,), jnp.int32),
        valid=jnp.asarray([True] * 6 + [False] * 4),
    )
    state = model.empty_state()
    img = jnp.zeros((1, 128, 160, 3), jnp.float32)
    out, state2 = jax.jit(model.forward_inference)(params, img, state, given)
    assert bool(jnp.isfinite(out.boxes).all())
    assert int(state2.frame_idx) == 1


@pytest.mark.slow
def test_aot_config_inference_step():
    """The AOT recipe (SEARCH_REGION=5, small anchors, exact gather
    pooler) runs the full jitted frame step end-to-end."""
    import os

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(os.path.dirname(__file__), "..",
                                     "configs/dla/DLA_34_FPN_EMM_AOT.yaml"))
    cfg.TPU.MAX_TRACKS = 4
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 50
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 20
    cfg.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 20
    cfg.freeze()
    model = SiamMOT(cfg)
    assert model.ecfg.search_region == 5.0
    params = model.init_params(jax.random.PRNGKey(0), (128, 160))

    step = jax.jit(model.forward_inference)
    state = model.empty_state()
    rng = np.random.RandomState(0)
    for t in range(2):
        img = jnp.asarray(rng.randn(1, 128, 160, 3).astype(np.float32))
        out, state = step(params, img, state)
        assert bool(jnp.isfinite(out.boxes).all())
        assert int(state.frame_idx) == t + 1
