"""Space-to-depth stem: exactness vs the standard full-resolution stem."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from siammot_tpu.models.dla import (FrozenBN, S2DStem, conv, s2d_to_stem,
                                    stem_to_s2d)


class StandardStem(nn.Module):
    c0: int = 16
    c1: int = 32

    @nn.compact
    def __call__(self, x):
        x = conv(self.c0, 7, 1, name="base_conv")(x)
        x = nn.relu(FrozenBN(self.c0, name="base_bn")(x))
        x = conv(self.c0, 3, 1, name="level0_conv0")(x)
        x = nn.relu(FrozenBN(self.c0, name="level0_bn0")(x))
        x = conv(self.c1, 3, 2, name="level1_conv0")(x)
        x = nn.relu(FrozenBN(self.c1, name="level1_bn0")(x))
        return x


def _random_standard_params(rng):
    r = np.random.RandomState(rng)

    def bn(c):
        return {"scale": r.randn(c).astype(np.float32) * 0.1 + 1.0,
                "bias": r.randn(c).astype(np.float32) * 0.1}

    return {"params": {
        "base_conv": {"kernel": r.randn(7, 7, 3, 16).astype(np.float32) * .1},
        "base_bn": bn(16),
        "level0_conv0": {"kernel": r.randn(3, 3, 16, 16).astype(np.float32) * .1},
        "level0_bn0": bn(16),
        "level1_conv0": {"kernel": r.randn(3, 3, 16, 32).astype(np.float32) * .1},
        "level1_bn0": bn(32),
    }}


def test_s2d_stem_exact():
    params = _random_standard_params(0)
    p = params["params"]
    s2d_params = {"params": stem_to_s2d(
        p["base_conv"]["kernel"], p["base_bn"],
        p["level0_conv0"]["kernel"], p["level0_bn0"],
        p["level1_conv0"]["kernel"], p["level1_bn0"])}

    x = jnp.asarray(np.random.RandomState(1)
                    .randn(2, 64, 96, 3).astype(np.float32))
    ref = StandardStem().apply(params, x)
    out = S2DStem(16, 32).apply(s2d_params, x)
    assert out.shape == ref.shape == (2, 32, 48, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_s2d_roundtrip():
    params = _random_standard_params(2)["params"]
    s2d = stem_to_s2d(params["base_conv"]["kernel"], params["base_bn"],
                      params["level0_conv0"]["kernel"], params["level0_bn0"],
                      params["level1_conv0"]["kernel"], params["level1_bn0"])
    back = s2d_to_stem(s2d, 16, 32)
    for mod in params:
        for leaf in params[mod]:
            np.testing.assert_allclose(np.asarray(back[mod][leaf]),
                                       np.asarray(params[mod][leaf]),
                                       err_msg=f"{mod}/{leaf}")
