"""Torch DLA-34 body with reference module naming.

Semantics per the reference backbone (`siammot/modelling/backbone/dla.py`):
basic residual blocks, recursive aggregation trees whose root convs
concatenate (tree2_out, tree1_out, *children), FrozenBatchNorm2d, and the
P2-P5 stage outputs.  Module attribute names line up with the state dict
emitted by ``siammot_tpu.utils.checkpoint.export_torch_checkpoint`` so the
exported weights load with ``strict=True``.
"""

import torch
from torch import nn

from .layers import FrozenBatchNorm2d


def _conv_bn_relu(cin, cout, stride=1):
    return nn.Sequential(
        nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False),
        FrozenBatchNorm2d(cout),
        nn.ReLU(inplace=True))


class BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride=stride, padding=1,
                               bias=False)
        self.bn1 = FrozenBatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.bn2 = FrozenBatchNorm2d(cout)

    def forward(self, x, residual=None):
        if residual is None:
            residual = x
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + residual)


class Root(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, 1, bias=False)
        self.bn = FrozenBatchNorm2d(cout)

    def forward(self, *children):
        x = self.bn(self.conv(torch.cat(children, dim=1)))
        return torch.relu(x)        # DLA-34: no root residual


class Tree(nn.Module):
    def __init__(self, levels, cin, cout, stride=1, level_root=False,
                 root_dim=0):
        super().__init__()
        if root_dim == 0:
            root_dim = 2 * cout
        if level_root:
            root_dim += cin
        self.levels = levels
        self.level_root = level_root
        if levels == 1:
            self.tree1 = BasicBlock(cin, cout, stride)
            self.tree2 = BasicBlock(cout, cout, 1)
            self.root = Root(root_dim, cout)
        else:
            self.tree1 = Tree(levels - 1, cin, cout, stride, root_dim=0)
            self.tree2 = Tree(levels - 1, cout, cout, 1,
                              root_dim=root_dim + cout)
        self.downsample = (nn.MaxPool2d(stride, stride=stride)
                           if stride > 1 else None)
        self.project = None
        if cin != cout:
            self.project = nn.Sequential(
                nn.Conv2d(cin, cout, 1, bias=False),
                FrozenBatchNorm2d(cout))

    def forward(self, x, children=None):
        children = [] if children is None else children
        bottom = self.downsample(x) if self.downsample else x
        residual = self.project(bottom) if self.project else bottom
        if self.level_root:
            children.append(bottom)
        x1 = self.tree1(x, residual) if self.levels == 1 else self.tree1(x)
        if self.levels == 1:
            x2 = self.tree2(x1)
            return self.root(x2, x1, *children)
        children.append(x1)
        return self.tree2(x1, children=children)


class DLA34(nn.Module):
    """Stage outputs level2..level5 (strides 4/8/16/32)."""

    def __init__(self, ch=(16, 32, 64, 128, 256, 512)):
        super().__init__()
        self.base_layer = nn.Sequential(
            nn.Conv2d(3, ch[0], 7, padding=3, bias=False),
            FrozenBatchNorm2d(ch[0]),
            nn.ReLU(inplace=True))
        self.level0 = _conv_bn_relu(ch[0], ch[0])
        self.level1 = _conv_bn_relu(ch[0], ch[1], stride=2)
        self.level2 = Tree(1, ch[1], ch[2], 2, level_root=False)
        self.level3 = Tree(2, ch[2], ch[3], 2, level_root=True)
        self.level4 = Tree(2, ch[3], ch[4], 2, level_root=True)
        self.level5 = Tree(1, ch[4], ch[5], 2, level_root=True)

    def forward(self, x):
        x = self.base_layer(x)
        x = self.level0(x)
        x = self.level1(x)
        outs = []
        for name in ("level2", "level3", "level4", "level5"):
            x = getattr(self, name)(x)
            outs.append(x)
        return outs
