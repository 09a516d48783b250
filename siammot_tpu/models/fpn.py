"""Feature Pyramid Network with size-agnostic top-down upsampling.

Reproduces maskrcnn's FPN as patched by the reference
(``/root/reference/siammot/operator_patch/fpn_patch.py:8-65``): the
top-down pathway upsamples with *bilinear resize to the lateral's spatial
shape* (``align_corners=False``) instead of nearest x2, so input sizes
need not be divisible by 32.  ``LastLevelMaxPool`` appends a stride-64 P6
via 1x1/stride-2 max pooling.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def resize_bilinear(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Bilinear resize with half-pixel centers (align_corners=False),
    matching ``F.interpolate(mode='bilinear')``."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, out_hw[0], out_hw[1], c), method="bilinear")


class FPN(nn.Module):
    """4-level FPN + P6 max-pool top block; out_channels=128 for DLA-34."""

    out_channels: int

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        inner = [
            nn.Conv(self.out_channels, (1, 1), name=f"inner{i + 1}")(f)
            for i, f in enumerate(features)
        ]
        # top-down accumulation
        last = inner[-1]
        laterals = [last]
        for f in inner[-2::-1]:
            last = f + resize_bilinear(last, f.shape[1:3])
            laterals.insert(0, last)
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, name=f"layer{i + 1}")(l)
            for i, l in enumerate(laterals)
        ]
        # LastLevelMaxPool: kernel 1, stride 2 (maskrcnn fpn.py)
        p6 = nn.max_pool(outs[-1], (1, 1), strides=(2, 2))
        outs.append(p6)
        return outs
