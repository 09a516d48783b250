"""Bottle2neck (Res2Net DLA block) parity vs a torch functional mirror.

The torch side re-states the reference ``DlaBottle2neck`` semantics
(``/root/reference/siammot/modelling/backbone/dla.py:108-170``) with
functional ops: 1x1 expand, per-split 3x3 cascade (cascade off on the
stride>1 "first" block, whose last split is avg-pooled with
count_include_pad semantics), concat, 1x1 project, residual.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from siammot_tpu.models.dla import Bottle2neck


def _w(params, name):
    # HWIO -> OIHW
    return torch.from_numpy(
        np.transpose(np.asarray(params[name]["kernel"]), (3, 2, 0, 1)))


def _affine(params, name, x):
    s = torch.from_numpy(np.asarray(params[name]["scale"]))[None, :, None, None]
    b = torch.from_numpy(np.asarray(params[name]["bias"]))[None, :, None, None]
    return x * s + b


def _torch_bottle2neck(x, params, planes, stride, scale, cardinality,
                       base_width):
    mid = int(math.floor(planes * (base_width / 64)) * cardinality) // 2
    is_first = stride > 1
    residual = x
    if is_first:
        residual = F.max_pool2d(x, stride, stride)  # Tree's bottom downsample
    out = F.relu(_affine(params, "bn1",
                         F.conv2d(x, _w(params, "conv1"))))
    spx = torch.split(out, mid, 1)
    spo = []
    sp = None
    for i in range(max(1, scale - 1)):
        sp = spx[i] if i == 0 or is_first else sp + spx[i]
        sp = F.conv2d(sp, _w(params, f"convs_{i}"), stride=stride,
                      padding=1, groups=cardinality)
        sp = F.relu(_affine(params, f"bns_{i}", sp))
        spo.append(sp)
    if scale > 1:
        spo.append(F.avg_pool2d(spx[-1], 3, stride, 1,
                                count_include_pad=True)
                   if is_first else spx[-1])
    out = torch.cat(spo, 1)
    out = _affine(params, "bn3", F.conv2d(out, _w(params, "conv3")))
    return F.relu(out + residual)


@pytest.mark.parametrize("stride,cardinality,base_width,planes",
                         [(1, 1, 28, 64), (2, 1, 28, 64), (2, 8, 4, 64)])
def test_bottle2neck_matches_torch(stride, cardinality, base_width, planes):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 12, 16, planes).astype(np.float32)

    residual = jnp.asarray(x)
    if stride > 1:
        # the Tree always hands stride>1 blocks the downsampled bottom
        import flax.linen as nn
        residual = nn.max_pool(residual, (stride, stride),
                               strides=(stride, stride))

    m = Bottle2neck(planes, stride=stride, cardinality=cardinality,
                    base_width=base_width)
    variables = m.init(jax.random.PRNGKey(1), jnp.asarray(x), residual)
    params = jax.tree.map(
        lambda a: np.asarray(
            jax.random.normal(jax.random.PRNGKey(hash(str(a.shape)) % 997),
                              a.shape, jnp.float32) * 0.1),
        variables["params"])

    got = m.apply({"params": params}, jnp.asarray(x), residual)

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    want = _torch_bottle2neck(xt, params, planes, stride, 4, cardinality,
                              base_width)
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want.numpy(),
        rtol=2e-4, atol=2e-4)
