"""ResNet-FPN backbone family: torch-semantics parity, build matrix,
checkpoint roundtrip, and FREEZE_CONV_BODY_AT optimizer labeling.

The torch mirror re-states maskrcnn-benchmark's Caffe2 conventions
(``BottleneckWithFixedBatchNorm``: stride on the first 1x1 when
STRIDE_IN_1X1, FrozenBN as folded affine, projection shortcut on the
first block of each stage; stem = 7x7/2 + bn + relu + maxpool 3x3/2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from siammot_tpu.models.resnet import ResNet, ResNetBottleneck


def _rand_params(variables, seed=0):
    rng = np.random.RandomState(seed)
    return jax.tree.map(
        lambda a: np.asarray(rng.randn(*a.shape).astype(np.float32)) * 0.1,
        variables)


def _w(params, name):
    return torch.from_numpy(
        np.transpose(np.asarray(params[name]["kernel"]), (3, 2, 0, 1)))


def _affine(params, name, x):
    s = torch.from_numpy(np.asarray(params[name]["scale"]))[None, :, None,
                                                            None]
    b = torch.from_numpy(np.asarray(params[name]["bias"]))[None, :, None,
                                                           None]
    return x * s + b


def _torch_bottleneck(x, p, stride, stride_in_1x1, num_groups,
                      use_downsample):
    identity = x
    if use_downsample:
        identity = _affine(p, "downsample_bn",
                           F.conv2d(x, _w(p, "downsample_conv"),
                                    stride=stride))
    s1, s3 = (stride, 1) if stride_in_1x1 else (1, stride)
    out = F.relu(_affine(p, "bn1", F.conv2d(x, _w(p, "conv1"), stride=s1)))
    out = F.relu(_affine(p, "bn2", F.conv2d(out, _w(p, "conv2"), stride=s3,
                                            padding=1, groups=num_groups)))
    out = _affine(p, "bn3", F.conv2d(out, _w(p, "conv3")))
    return F.relu(out + identity)


@pytest.mark.parametrize(
    "stride,stride_in_1x1,num_groups,use_downsample",
    [(1, True, 1, True), (2, True, 1, True), (2, False, 1, True),
     (1, True, 1, False), (2, True, 32, True)])
def test_bottleneck_matches_torch(stride, stride_in_1x1, num_groups,
                                  use_downsample):
    cin, cmid, cout = 64, 32 if num_groups == 1 else 64, 64
    if not use_downsample:
        cout = cin
    rng = np.random.RandomState(1)
    x = rng.randn(2, 10, 14, cin).astype(np.float32)

    m = ResNetBottleneck(out_channels=cout, bottleneck_channels=cmid,
                         stride=stride, num_groups=num_groups,
                         stride_in_1x1=stride_in_1x1,
                         use_downsample=use_downsample)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _rand_params(variables)
    got = np.asarray(m.apply(params, jnp.asarray(x)))

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    want = _torch_bottleneck(xt, params["params"], stride, stride_in_1x1,
                             num_groups, use_downsample)
    want = np.transpose(want.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_stem_and_stage_strides():
    m = ResNet(stage_blocks=(1, 1, 1, 1))
    x = jnp.zeros((1, 64, 96, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(variables, x)
    assert [o.shape for o in outs] == [
        (1, 16, 24, 256), (1, 8, 12, 512), (1, 4, 6, 1024), (1, 2, 3, 2048)]


def test_stem_matches_torch():
    m = ResNet(stage_blocks=(1,))
    rng = np.random.RandomState(2)
    x = rng.randn(1, 32, 48, 3).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _rand_params(variables)

    p = params["params"]
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    want = F.relu(_affine(p, "stem_bn1",
                          F.conv2d(xt, _w(p, "stem_conv1"), stride=2,
                                   padding=3)))
    want = F.max_pool2d(want, 3, 2, 1)
    want = _torch_bottleneck(want, p["layer1_0"], 1, True, 1, True)
    got = np.asarray(m.apply(params, jnp.asarray(x))[0])
    np.testing.assert_allclose(got, np.transpose(want.numpy(), (0, 2, 3, 1)),
                               rtol=2e-5, atol=2e-5)


def _r50_model():
    from siammot_tpu.configs.defaults import get_cfg
    from siammot_tpu.models.siammot import SiamMOT
    cfg = get_cfg()
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN"
    cfg.TPU.MAX_TRACKS = 4
    cfg.freeze()
    model = SiamMOT(cfg)
    params = model.init_params(jax.random.PRNGKey(3), (64, 96))
    return cfg, model, params


@pytest.mark.slow
def test_r50_siammot_builds_and_roundtrips():
    _, model, params = _r50_model()
    assert model.channels == 256
    f = model.net.apply(params, jnp.zeros((1, 64, 96, 3)),
                        method=model.net.features)
    assert [x.shape[-1] for x in f] == [256] * 5

    from siammot_tpu.utils.checkpoint import (export_torch_checkpoint,
                                              import_torch_checkpoint)
    sd = export_torch_checkpoint(params)
    assert "backbone.body.stem.conv1.weight" in sd
    assert "backbone.body.layer4.2.conv3.weight" in sd
    restored, leftovers = import_torch_checkpoint(
        sd, jax.tree.map(np.zeros_like, params))
    assert leftovers == []
    restored_map = {jax.tree_util.keystr(p): v for p, v
                    in jax.tree_util.tree_leaves_with_path(restored)}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(restored_map[key]),
                                   rtol=1e-6, atol=1e-6, err_msg=key)


@pytest.mark.slow
def test_freeze_conv_body_at_zeroes_stem_and_layer1():
    import optax

    from siammot_tpu.parallel.mesh import make_optimizer
    cfg, model, params = _r50_model()
    cfg.defrost()
    cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT = 2
    cfg.freeze()
    tx = make_optimizer(cfg, params)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    flat = {jax.tree_util.keystr(p): np.asarray(v) for p, v
            in jax.tree_util.tree_leaves_with_path(updates)}
    n_frozen = n_live = 0
    for key, upd in flat.items():
        if "/body/" in key.replace("']['", "/"):
            mod = key.split("body")[1]
            frozen = ("stem_" in mod.split("/")[0].replace("']['", "/")
                      or "stem_" in mod or "layer1_" in mod)
        else:
            frozen = False
        if frozen:
            assert not np.any(upd), key
            n_frozen += 1
        else:
            assert np.any(upd), key
            n_live += 1
    assert n_frozen >= 30 and n_live >= 100


def test_resnet_dcn_stage_builds(rng):
    """STAGE_WITH_DCN wires DeformConv into the 3x3 slot and still runs."""
    m = ResNet(stage_blocks=(1, 1), stage_with_dcn=(False, True, False,
                                                    False))
    x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    flat = jax.tree_util.tree_leaves_with_path(variables)
    names = {jax.tree_util.keystr(p) for p, _ in flat}
    assert any("layer2_0" in n and "offset" in n for n in names), \
        "DCN offset conv missing from the dcn stage"
    outs = m.apply(variables, x)
    assert outs[1].shape == (1, 4, 4, 512)
    assert np.all(np.isfinite(np.asarray(outs[1])))
