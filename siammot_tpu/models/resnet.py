"""ResNet-FPN backbone family (maskrcnn-benchmark Caffe2 conventions).

The reference's detector-initialization model zoo covers ResNet-50/101
Faster-RCNN backbones alongside DLA (``/root/reference/readme/
model_zoo.md:56-59``); the bodies come from maskrcnn-benchmark's
``modeling/backbone/resnet.py`` (external dependency — the reference repo
ships no ResNet code of its own).  This is a TPU-native re-implementation
of those semantics:

  - Caffe2-style stem: 7x7/2 conv (no bias) + FrozenBN + relu +
    3x3/2 max pool (pad 1).
  - ``BottleneckWithFixedBatchNorm``: 1x1 -> 3x3 -> 1x1 with the stage
    stride on the FIRST 1x1 (``STRIDE_IN_1X1=True``, the Caffe2 quirk the
    pretrained zoo weights require), grouped 3x3 for ResNeXt widths,
    1x1+FrozenBN projection shortcut on the first block of each stage.
  - Four stages (C2..C5, strides 4/8/16/32) feed the shared FPN; stage
    strides are 1,2,2,2 (the stem already provides stride 4).
  - Optional DCNv1 on the 3x3 (``MODEL.RESNETS.STAGE_WITH_DCN``),
    mirroring maskrcnn's ``with_dcn`` stage option.

FrozenBN is the same folded scale/bias module the DLA body uses, so
checkpoint import/export shares the BN-folding path.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn

from .dla import FrozenBN, conv


class ResNetBottleneck(nn.Module):
    """maskrcnn ``BottleneckWithFixedBatchNorm`` (Caffe2 layout)."""

    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    dilation: int = 1
    num_groups: int = 1
    stride_in_1x1: bool = True
    with_dcn: bool = False
    use_downsample: bool = False
    conv_matmul: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        if self.use_downsample:
            # dilation>1 stages keep stride 1 in the shortcut (maskrcnn
            # down_stride rule)
            ds_stride = self.stride if self.dilation == 1 else 1
            ds = conv(self.out_channels, 1, ds_stride,
                      name="downsample_conv")(x)
            identity = FrozenBN(self.out_channels, name="downsample_bn")(ds)

        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        out = conv(self.bottleneck_channels, 1, s1, name="conv1")(x)
        out = nn.relu(FrozenBN(self.bottleneck_channels, name="bn1")(out))
        if self.with_dcn:
            from ..ops.deform_conv import DeformConv
            out = DeformConv(self.bottleneck_channels, 3, s3, self.dilation,
                             name="conv2")(out)
        else:
            out = conv(self.bottleneck_channels, 3, s3, self.dilation,
                       groups=self.num_groups, name="conv2",
                       matmul=self.conv_matmul)(out)
        out = nn.relu(FrozenBN(self.bottleneck_channels, name="bn2")(out))
        out = conv(self.out_channels, 1, name="conv3")(out)
        out = FrozenBN(self.out_channels, name="bn3")(out)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """ResNet body returning C2..C5 (strides 4/8/16/32)."""

    stage_blocks: Sequence[int]            # blocks per stage, e.g. (3,4,6,3)
    stem_channels: int = 64
    res2_out_channels: int = 256
    num_groups: int = 1
    width_per_group: int = 64
    stride_in_1x1: bool = True
    stage_with_dcn: Sequence[bool] = (False,) * 4
    # stages (DLA numbering: 2..5 = output strides 4/8/16/32, i.e. resnet
    # stage s maps to entry s+1) whose 3x3s run as explicit MXU matmuls
    matmul_stages: Sequence[int] = ()

    @nn.compact
    def __call__(self, x):
        x = conv(self.stem_channels, 7, 2, name="stem_conv1")(x)
        x = nn.relu(FrozenBN(self.stem_channels, name="stem_bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        in_channels = self.stem_channels
        for stage, n_blocks in enumerate(self.stage_blocks, start=1):
            factor = 2 ** (stage - 1)
            out_channels = self.res2_out_channels * factor
            bottleneck = self.num_groups * self.width_per_group * factor
            first_stride = 1 if stage == 1 else 2
            for b in range(n_blocks):
                x = ResNetBottleneck(
                    out_channels=out_channels,
                    bottleneck_channels=bottleneck,
                    stride=first_stride if b == 0 else 1,
                    num_groups=self.num_groups,
                    stride_in_1x1=self.stride_in_1x1,
                    with_dcn=self.stage_with_dcn[stage - 1],
                    conv_matmul=(stage + 1) in self.matmul_stages,
                    use_downsample=(b == 0 and in_channels != out_channels),
                    name=f"layer{stage}_{b}")(x)
            in_channels = out_channels
            outs.append(x)
        return outs


# blocks per stage (torchvision/Caffe2 standard depths)
RESNET_VARIANTS = {
    "R-50-FPN": dict(stage_blocks=(3, 4, 6, 3)),
    "R-101-FPN": dict(stage_blocks=(3, 4, 23, 3)),
    "R-152-FPN": dict(stage_blocks=(3, 8, 36, 3)),
}


def build_resnet(conv_body: str, stage_with_dcn=(False,) * 4,
                 num_groups: int = 1, width_per_group: int = 64,
                 stride_in_1x1: bool = True, stem_channels: int = 64,
                 res2_out_channels: int = 256, matmul_stages=()) -> ResNet:
    if conv_body not in RESNET_VARIANTS:
        raise KeyError(f"unknown backbone {conv_body}; "
                       f"choices: {sorted(RESNET_VARIANTS)}")
    return ResNet(stage_with_dcn=tuple(stage_with_dcn),
                  num_groups=num_groups, width_per_group=width_per_group,
                  stride_in_1x1=stride_in_1x1, stem_channels=stem_channels,
                  res2_out_channels=res2_out_channels,
                  matmul_stages=tuple(matmul_stages),
                  **RESNET_VARIANTS[conv_body])
