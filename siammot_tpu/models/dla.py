"""Deep Layer Aggregation backbone family (DLA-34 … DLA-169).

TPU-native re-implementation of the reference backbone
(``/root/reference/siammot/modelling/backbone/dla.py``): NHWC layout,
bfloat16-friendly convs, and FrozenBatchNorm realised as a per-channel
affine ``scale``/``bias`` pair (``scale = gamma / sqrt(running_var)``,
``bias = beta - running_mean * scale`` — folded at checkpoint-conversion
time, matching maskrcnn ``FrozenBatchNorm2d`` which uses no eps).

The recursive ``DlaTree`` aggregation (reference ``dla.py:192-239``) is
built by Python recursion at trace time, flattening into a static DAG for
XLA.  Returns the four feature levels at strides 4/8/16/32
(reference ``dla.py:289-304``).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBN(nn.Module):
    """Per-channel affine with gradients stopped (maskrcnn FrozenBatchNorm2d)."""

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        scale = jax.lax.stop_gradient(scale).astype(x.dtype)
        bias = jax.lax.stop_gradient(bias).astype(x.dtype)
        return x * scale + bias


def conv3x3_matmul(x, kernel, stride=1, dilation=1, impl="im2col"):
    """Exact 3x3 SAME conv as an explicit MXU matmul.

    The deep DLA stages (46x80x256, 23x40x512 at 720p) run XLA's native
    conv at ~18% MXU (tools/profile_deep_convs.py): the small spatial
    extents tile the systolic array poorly.  Flattening positions to rows
    gives one dense [B*Ho*Wo, 9C] @ [9C, Co] product ("im2col") or nine
    accumulated [B*Ho*Wo, C] @ [C, Co] products ("9tap") — both exact
    (same taps, f32 accumulation like XLA's conv) and layout-friendly.

    Supports stride 1/2 and dilation (groups=1 only).
    """
    b, h, w, c = x.shape
    co = kernel.shape[-1]
    pad = dilation
    ho, wo = (h - 1) // stride + 1, (w - 1) // stride + 1
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))

    def tap(dy, dx):
        return jax.lax.slice(
            xp, (0, dy * dilation, dx * dilation, 0),
            (b, dy * dilation + (ho - 1) * stride + 1,
             dx * dilation + (wo - 1) * stride + 1, c),
            (1, stride, stride, 1)).reshape(b * ho * wo, c)

    if impl == "9tap":
        acc = jnp.zeros((b * ho * wo, co), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                acc = acc + jax.lax.dot_general(
                    tap(dy, dx), kernel[dy, dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        out = acc
    else:
        patches = jnp.concatenate(
            [tap(dy, dx) for dy in range(3) for dx in range(3)], axis=-1)
        out = jax.lax.dot_general(
            patches, kernel.reshape(9 * c, co),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return out.astype(x.dtype).reshape(b, ho, wo, co)


class MatmulConv(nn.Module):
    """Drop-in for ``conv(features, 3, ...)`` using :func:`conv3x3_matmul`.

    Parameter name/shape ("kernel", [3, 3, Cin, Cout]) matches ``nn.Conv``,
    so checkpoints are interchangeable with the plain formulation."""

    features: int
    stride: int = 1
    dilation: int = 1
    impl: str = "im2col"

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.linear.default_kernel_init,
            (3, 3, x.shape[-1], self.features))
        return conv3x3_matmul(x, kernel.astype(x.dtype), self.stride,
                              self.dilation, self.impl)


def conv(features, kernel, stride=1, dilation=1, groups=1, bias=False,
         name=None, matmul=False):
    pad = dilation * (kernel - 1) // 2
    if matmul and kernel == 3 and groups == 1 and not bias:
        return MatmulConv(features, stride, dilation, name=name)
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)),
                   kernel_dilation=(dilation, dilation),
                   feature_group_count=groups, use_bias=bias, name=name)


class BasicBlock(nn.Module):
    """DLA basic block: two 3x3 convs + residual (reference dla.py:30-57)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    conv_matmul: bool = False

    @nn.compact
    def __call__(self, x, residual=None):
        if residual is None:
            residual = x
        out = conv(self.planes, 3, self.stride, self.dilation, name="conv1",
                   matmul=self.conv_matmul)(x)
        out = FrozenBN(self.planes, name="bn1")(out)
        out = nn.relu(out)
        out = conv(self.planes, 3, 1, self.dilation, name="conv2",
                   matmul=self.conv_matmul)(out)
        out = FrozenBN(self.planes, name="bn2")(out)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """DLA bottleneck (reference dla.py:60-105): 1x1 -> 3x3 -> 1x1.

    ``with_dcn`` swaps the 3x3 for a deformable conv (DCNv1), matching
    the reference's optional ``DFConv2d`` (``dla.py:74-77``)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    cardinality: int = 1
    base_width: int = 64
    expansion: int = 2
    with_dcn: bool = False
    conv_matmul: bool = False

    @nn.compact
    def __call__(self, x, residual=None):
        if residual is None:
            residual = x
        mid = int(math.floor(self.planes * (self.base_width / 64))
                  * self.cardinality) // self.expansion
        out = conv(mid, 1, name="conv1")(x)
        out = nn.relu(FrozenBN(mid, name="bn1")(out))
        if self.with_dcn:
            from ..ops.deform_conv import DeformConv
            out = DeformConv(mid, 3, self.stride, self.dilation,
                             name="conv2")(out)
        else:
            out = conv(mid, 3, self.stride, self.dilation,
                       groups=self.cardinality, name="conv2",
                       matmul=self.conv_matmul)(out)
        out = nn.relu(FrozenBN(mid, name="bn2")(out))
        out = conv(self.planes, 1, name="conv3")(out)
        out = FrozenBN(self.planes, name="bn3")(out)
        return nn.relu(out + residual)


class Bottle2neck(nn.Module):
    """DLA Res2Net bottleneck (reference ``DlaBottle2neck``, dla.py:108-170).

    1x1 expand to ``scale`` splits of ``width`` channels; splits 0..scale-2
    go through 3x3 grouped convs with a running-sum cascade (cascade
    disabled on stride>1 blocks, where the last split is avg-pooled
    instead of passed through); concat -> 1x1 project -> residual."""

    planes: int
    stride: int = 1
    dilation: int = 1
    scale: int = 4
    cardinality: int = 8
    base_width: int = 4
    expansion: int = 2

    @nn.compact
    def __call__(self, x, residual=None):
        if residual is None:
            residual = x
        is_first = self.stride > 1
        mid = int(math.floor(self.planes * (self.base_width / 64))
                  * self.cardinality) // self.expansion
        out = conv(mid * self.scale, 1, name="conv1")(x)
        out = nn.relu(FrozenBN(mid * self.scale, name="bn1")(out))
        spx = [out[..., i * mid:(i + 1) * mid] for i in range(self.scale)]
        spo = []
        sp = None
        for i in range(max(1, self.scale - 1)):
            sp = spx[i] if i == 0 or is_first else sp + spx[i]
            sp = conv(mid, 3, self.stride, self.dilation,
                      groups=self.cardinality, name=f"convs_{i}")(sp)
            spo.append(nn.relu(FrozenBN(mid, name=f"bns_{i}")(sp)))
            sp = spo[-1]
        if self.scale > 1:
            last = spx[-1]
            if is_first:
                # torch AvgPool2d(3, stride, 1) counts padded zeros
                last = nn.avg_pool(last, (3, 3),
                                   strides=(self.stride, self.stride),
                                   padding=((1, 1), (1, 1)),
                                   count_include_pad=True)
            spo.append(last)
        out = jnp.concatenate(spo, axis=-1)
        out = conv(self.planes, 1, name="conv3")(out)
        out = FrozenBN(self.planes, name="bn3")(out)
        return nn.relu(out + residual)


class Root(nn.Module):
    """Aggregation node: 1x1 conv over concat(children) (dla.py:172-189)."""

    features: int
    residual: bool

    @nn.compact
    def __call__(self, *children):
        x = jnp.concatenate(children, axis=-1)
        x = conv(self.features, 1, name="conv")(x)
        x = FrozenBN(self.features, name="bn")(x)
        if self.residual:
            x = x + children[0]
        return nn.relu(x)


class Tree(nn.Module):
    """Recursive DLA tree (reference dla.py:192-239)."""

    levels: int
    block: Any
    in_channels: int
    out_channels: int
    stride: int = 1
    level_root: bool = False
    root_dim: int = 0
    root_residual: bool = False
    block_kwargs: dict | None = None

    @nn.compact
    def __call__(self, x, children=None):
        bk = self.block_kwargs or {}
        root_dim = self.root_dim
        if root_dim == 0:
            root_dim = 2 * self.out_channels
        if self.level_root:
            root_dim += self.in_channels

        children = [] if children is None else children
        bottom = (nn.max_pool(x, (self.stride, self.stride),
                              strides=(self.stride, self.stride))
                  if self.stride > 1 else x)
        if self.in_channels != self.out_channels:
            residual = conv(self.out_channels, 1, name="project_conv")(bottom)
            residual = FrozenBN(self.out_channels, name="project_bn")(residual)
        else:
            residual = bottom
        if self.level_root:
            children.append(bottom)

        if self.levels == 1:
            x1 = self.block(self.out_channels, self.stride, name="tree1", **bk)(
                x, residual)
            x2 = self.block(self.out_channels, 1, name="tree2", **bk)(x1)
            return Root(self.out_channels, self.root_residual, name="root")(
                x2, x1, *children)

        x1 = Tree(self.levels - 1, self.block, self.in_channels,
                  self.out_channels, self.stride,
                  root_residual=self.root_residual, block_kwargs=bk,
                  name="tree1")(x)
        children.append(x1)
        return Tree(self.levels - 1, self.block, self.out_channels,
                    self.out_channels, 1, root_dim=root_dim + self.out_channels,
                    root_residual=self.root_residual, block_kwargs=bk,
                    name="tree2")(x1, children=children)


class S2DStem(nn.Module):
    """Space-to-depth DLA stem: exact phase-decomposed rewrite of
    base(7x7 s1) -> level0(3x3 s1) -> level1(3x3 s2).

    The three stem convs run at full input resolution with 3/16/16 input
    channels — 8x under-utilizing the 128 MXU/VPU lanes and costing more
    wall-clock than the entire rest of DLA-34 at 720p.  Splitting the
    image into 2x2 phase channels ([H, W, 3] -> [H/2, W/2, 12]) and
    re-indexing each kernel by phase turns them into half-resolution
    convs over 12/64/64 channels producing *bit-equivalent* outputs
    (``stem_to_s2d`` maps standard weights; zero taps fill positions a
    phase never reads).  level1's stride-2 output lands exactly on the
    phase grid, so its S2D form needs no output phases.
    """

    c0: int   # channels[0] of the variant (16)
    c1: int   # channels[1] (32)

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        assert h % 2 == 0 and w % 2 == 0
        # [B, H, W, C] -> [B, H/2, W/2, 4C], channel order (a, b, c)
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)

        x = nn.Conv(4 * self.c0, (5, 5), padding=((2, 2), (2, 2)),
                    use_bias=False, name="s2d_base_conv")(x)
        x = nn.relu(FrozenBN(4 * self.c0, name="s2d_base_bn")(x))
        x = nn.Conv(4 * self.c0, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="s2d_level0_conv")(x)
        x = nn.relu(FrozenBN(4 * self.c0, name="s2d_level0_bn")(x))
        # stride-2 conv -> 2x2 taps over phases, asymmetric pad (1, 0)
        x = nn.Conv(self.c1, (2, 2), padding=((1, 0), (1, 0)),
                    use_bias=False, name="s2d_level1_conv")(x)
        x = nn.relu(FrozenBN(self.c1, name="s2d_level1_bn")(x))
        return x


def _phase_decompose(kernel: "np.ndarray", pad: int, out_phases: bool):
    """Standard [kh, kw, ci, co] stride-1 kernel -> S2D kernel.

    S2D input channels are ordered (alpha, beta, c); output channels
    (a, b, o) when ``out_phases`` (stride-1 full-res output) else plain o
    (stride-2 output on the phase grid, i.e. a = b = 0).
    """
    import numpy as np
    kh, kw, ci, co = kernel.shape
    a_range = (0, 1) if out_phases else (0,)
    # tap index s = a + u - pad = 2U + alpha
    s_lo = min(a_range) - pad
    s_hi = max(a_range) + kh - 1 - pad
    u_lo, u_hi = s_lo >> 1, s_hi >> 1
    kh2 = u_hi - u_lo + 1
    n_out = 4 * co if out_phases else co
    out = np.zeros((kh2, kh2, 4 * ci, n_out), kernel.dtype)
    for a in a_range:
        for b_ in a_range:
            for u in range(kh):
                for v in range(kw):
                    sy, sx = a + u - pad, b_ + v - pad
                    uy, al = sy >> 1, sy & 1
                    ux, be = sx >> 1, sx & 1
                    oc = slice((a * 2 + b_) * co, (a * 2 + b_ + 1) * co) \
                        if out_phases else slice(0, co)
                    ic = slice((al * 2 + be) * ci, (al * 2 + be + 1) * ci)
                    out[uy - u_lo, ux - u_lo, ic, oc] = kernel[u, v]
    return out, (-u_lo, u_hi)


def stem_to_s2d(base_k, base_bn, l0_k, l0_bn, l1_k, l1_bn):
    """Map standard stem weights (HWIO kernels + {scale, bias} FrozenBN
    pairs) onto the S2DStem parameter tree.  Exact."""
    import numpy as np

    def tile_bn(bn):
        return {"scale": np.tile(np.asarray(bn["scale"]), 4),
                "bias": np.tile(np.asarray(bn["bias"]), 4)}

    k_base, _ = _phase_decompose(np.asarray(base_k), pad=3, out_phases=True)
    k_l0, _ = _phase_decompose(np.asarray(l0_k), pad=1, out_phases=True)
    k_l1, _ = _phase_decompose(np.asarray(l1_k), pad=1, out_phases=False)
    return {
        "s2d_base_conv": {"kernel": k_base},
        "s2d_base_bn": tile_bn(base_bn),
        "s2d_level0_conv": {"kernel": k_l0},
        "s2d_level0_bn": tile_bn(l0_bn),
        "s2d_level1_conv": {"kernel": k_l1},
        "s2d_level1_bn": {"scale": np.asarray(l1_bn["scale"]),
                          "bias": np.asarray(l1_bn["bias"])},
    }


def s2d_to_stem(s2d: dict, c0: int, c1: int):
    """Inverse of ``stem_to_s2d``: recover the standard stem weights.
    Every original tap appears once in each output-phase block, so the
    (a, b) = (0, 0) block suffices."""
    import numpy as np

    def un_phase(k2, kh, pad, ci, co, out_phases):
        k = np.zeros((kh, kh, ci, co), np.asarray(k2).dtype)
        s_lo = -pad
        u_lo = s_lo >> 1
        for u in range(kh):
            for v in range(kh):
                sy, sx = u - pad, v - pad
                uy, al = sy >> 1, sy & 1
                ux, be = sx >> 1, sx & 1
                ic = slice((al * 2 + be) * ci, (al * 2 + be + 1) * ci)
                k[u, v] = np.asarray(k2)[uy - u_lo, ux - u_lo, ic, :co]
        return k

    def untile_bn(bn, c):
        return {"scale": np.asarray(bn["scale"])[:c],
                "bias": np.asarray(bn["bias"])[:c]}

    return {
        "base_conv": {"kernel": un_phase(
            s2d["s2d_base_conv"]["kernel"], 7, 3, 3, c0, True)},
        "base_bn": untile_bn(s2d["s2d_base_bn"], c0),
        "level0_conv0": {"kernel": un_phase(
            s2d["s2d_level0_conv"]["kernel"], 3, 1, c0, c0, True)},
        "level0_bn0": untile_bn(s2d["s2d_level0_bn"], c0),
        "level1_conv0": {"kernel": un_phase(
            s2d["s2d_level1_conv"]["kernel"], 3, 1, c0, c1, False)},
        "level1_bn0": {"scale": np.asarray(s2d["s2d_level1_bn"]["scale"]),
                       "bias": np.asarray(s2d["s2d_level1_bn"]["bias"])},
    }


class DLA(nn.Module):
    """DLA feature extractor returning strides 4/8/16/32 maps."""

    levels: Sequence[int]
    channels: Sequence[int]
    block: Any = BasicBlock
    residual_root: bool = False
    block_kwargs: dict | None = None
    stage_with_dcn: Sequence[bool] = (False,) * 6
    s2d_stem: bool = False
    # stages whose BasicBlock/Bottleneck 3x3s run as explicit MXU matmuls
    # (conv3x3_matmul); chosen by on-chip measurement, empty = XLA conv
    matmul_stages: Sequence[int] = ()

    @nn.compact
    def __call__(self, x):
        ch = self.channels
        bk = self.block_kwargs or {}

        def stage_kwargs(stage: int) -> dict:
            # DCN applies to plain bottleneck stages only (reference DlaBasic
            # swallows with_dcn, dla.py:30, and DlaBottle2neck takes none;
            # dcn_config[2..5], dla.py:265-271)
            kw = dict(bk)
            if self.stage_with_dcn[stage] and self.block is Bottleneck:
                kw["with_dcn"] = True
            if stage in self.matmul_stages and self.block in (BasicBlock,
                                                              Bottleneck):
                kw["conv_matmul"] = True
            return kw

        if self.s2d_stem:
            assert self.levels[0] == self.levels[1] == 1
            x1 = S2DStem(ch[0], ch[1], name="stem")(x)
        else:
            x = conv(ch[0], 7, 1, name="base_conv")(x)
            x = nn.relu(FrozenBN(ch[0], name="base_bn")(x))

            def conv_level(x, planes, convs, stride, name):
                for i in range(convs):
                    x = conv(planes, 3, stride if i == 0 else 1,
                             name=f"{name}_conv{i}")(x)
                    x = nn.relu(FrozenBN(planes, name=f"{name}_bn{i}")(x))
                return x

            x0 = conv_level(x, ch[0], self.levels[0], 1, "level0")
            x1 = conv_level(x0, ch[1], self.levels[1], 2, "level1")
        x2 = Tree(self.levels[2], self.block, ch[1], ch[2], 2,
                  root_residual=self.residual_root,
                  block_kwargs=stage_kwargs(2),
                  name="level2")(x1)
        x3 = Tree(self.levels[3], self.block, ch[2], ch[3], 2, level_root=True,
                  root_residual=self.residual_root,
                  block_kwargs=stage_kwargs(3),
                  name="level3")(x2)
        x4 = Tree(self.levels[4], self.block, ch[3], ch[4], 2, level_root=True,
                  root_residual=self.residual_root,
                  block_kwargs=stage_kwargs(4),
                  name="level4")(x3)
        x5 = Tree(self.levels[5], self.block, ch[4], ch[5], 2, level_root=True,
                  root_residual=self.residual_root,
                  block_kwargs=stage_kwargs(5),
                  name="level5")(x4)
        return [x2, x3, x4, x5]


# variants (reference dla.py:307-374)
DLA_VARIANTS = {
    "DLA-34-FPN": dict(levels=(1, 1, 1, 2, 2, 1),
                       channels=(16, 32, 64, 128, 256, 512), block=BasicBlock),
    # tiny DLA-34-shaped body (same tree depths, ~1/50 the params) for
    # committed-weight parity fixtures and fast debug runs; not in the
    # reference zoo
    "DLA-MINI-FPN": dict(levels=(1, 1, 1, 2, 2, 1),
                         channels=(8, 16, 16, 32, 64, 64), block=BasicBlock),
    "DLA-46-C-FPN": dict(levels=(1, 1, 1, 2, 2, 1),
                         channels=(16, 32, 64, 64, 128, 256), block=Bottleneck),
    "DLA-46-XC-FPN": dict(levels=(1, 1, 1, 2, 2, 1),
                          channels=(16, 32, 64, 64, 128, 256), block=Bottleneck,
                          block_kwargs=dict(cardinality=32, base_width=4)),
    "DLA-60-FPN": dict(levels=(1, 1, 1, 2, 3, 1),
                       channels=(16, 32, 128, 256, 512, 1024), block=Bottleneck),
    "DLA-60-RES2NET-FPN": dict(levels=(1, 1, 1, 2, 3, 1),
                               channels=(16, 32, 128, 256, 512, 1024),
                               block=Bottle2neck,
                               block_kwargs=dict(cardinality=1, base_width=28)),
    "DLA-102-FPN": dict(levels=(1, 1, 1, 3, 4, 1),
                        channels=(16, 32, 128, 256, 512, 1024), block=Bottleneck,
                        residual_root=True),
    "DLA-169-FPN": dict(levels=(1, 1, 2, 3, 5, 1),
                        channels=(16, 32, 128, 256, 512, 1024), block=Bottleneck,
                        residual_root=True),
}


def build_dla(conv_body: str, stage_with_dcn=(False,) * 6,
              s2d_stem: bool = False, matmul_stages=()) -> DLA:
    if conv_body not in DLA_VARIANTS:
        raise KeyError(f"unknown backbone {conv_body}; "
                       f"choices: {sorted(DLA_VARIANTS)}")
    return DLA(stage_with_dcn=tuple(stage_with_dcn), s2d_stem=s2d_stem,
               matmul_stages=tuple(matmul_stages),
               **DLA_VARIANTS[conv_body])
