"""WarmupMultiStepLR schedule + per-parameter optimizer policy."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from siammot_tpu.configs.defaults import get_cfg
from siammot_tpu.parallel.mesh import make_lr_schedule, make_optimizer


def test_warmup_multistep_schedule():
    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = 0.02
    cfg.SOLVER.WARMUP_FACTOR = 1.0 / 3
    cfg.SOLVER.WARMUP_ITERS = 500
    cfg.SOLVER.STEPS = (30000, 40000)
    cfg.SOLVER.GAMMA = 0.1
    sched = make_lr_schedule(cfg)
    assert np.isclose(float(sched(0)), 0.02 / 3)
    assert np.isclose(float(sched(500)), 0.02)
    assert np.isclose(float(sched(29999)), 0.02)
    assert np.isclose(float(sched(30000)), 0.002)
    assert np.isclose(float(sched(40000)), 0.0002)
    # linear ramp midpoint
    assert np.isclose(float(sched(250)), 0.02 * (1 / 3 * 0.5 + 0.5))


def test_optimizer_bias_policy():
    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = 0.02
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.MOMENTUM = 0.0
    cfg.SOLVER.WEIGHT_DECAY = 0.0
    params = {"layer": {"kernel": jnp.ones((2, 2)),
                        "bias": jnp.ones((2,))}}
    tx = make_optimizer(cfg, params)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # bias LR = 2x weight LR (maskrcnn BIAS_LR_FACTOR)
    k = float(updates["layer"]["kernel"][0, 0])
    b = float(updates["layer"]["bias"][0])
    assert np.isclose(b / k, 2.0)
    assert np.isclose(k, -0.02)
