"""Every DLA variant builds and produces the 4 pyramid levels."""

import jax
import jax.numpy as jnp
import pytest

from siammot_tpu.models.dla import DLA_VARIANTS, build_dla


@pytest.mark.parametrize("name", sorted(DLA_VARIANTS))
def test_variant_builds(name):
    m = build_dla(name)
    x = jnp.zeros((1, 64, 96, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(params, x)
    ch = DLA_VARIANTS[name]["channels"]
    assert [o.shape for o in outs] == [
        (1, 16, 24, ch[2]), (1, 8, 12, ch[3]),
        (1, 4, 6, ch[4]), (1, 2, 3, ch[5])]


def test_s2d_variant_builds():
    m = build_dla("DLA-34-FPN", s2d_stem=True)
    x = jnp.zeros((1, 64, 96, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(params, x)
    assert outs[0].shape == (1, 16, 24, 64)
