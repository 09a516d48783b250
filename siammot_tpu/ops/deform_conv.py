"""Deformable convolution (DCNv1).

TPU-native equivalent of maskrcnn-benchmark's ``DFConv2d`` /
``deform_conv_cuda.cu``, consumed by the reference's DLA bottlenecks when
``MODEL.DLA.STAGE_WITH_DCN`` enables it (``/root/reference/siammot/
modelling/backbone/dla.py:74-77``; off by default, used by the
DLA-102-DCN / DLA-169-DCN model-zoo detectors).

Formulation: the offset branch is a regular conv (zero-initialized, as in
the reference) producing per-tap (dy, dx); the main conv becomes a
bilinear gather of the 9 deformed taps followed by one [9C -> C'] matmul
(MXU).  Out-of-bounds samples contribute 0, matching the CUDA kernel.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def deform_sample(x: jnp.ndarray, coords_y: jnp.ndarray,
                  coords_x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of x [B, H, W, C] at float coords [B, Ho, Wo, T].

    Samples with any corner outside [0, H) x [0, W) follow the deform-conv
    convention: corners out of range contribute 0 (zero padding).
    Returns [B, Ho, Wo, T, C].
    """
    b, h, w, c = x.shape

    y0 = jnp.floor(coords_y)
    x0 = jnp.floor(coords_x)
    fy = coords_y - y0
    fx = coords_x - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    def gather(yi, xi):
        ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        flat = x.reshape(b, h * w, c)
        idx = yc * w + xc                                 # [B, Ho, Wo, T]
        bs, ho, wo, t = idx.shape
        out = jnp.take_along_axis(
            flat, idx.reshape(b, -1, 1), axis=1).reshape(bs, ho, wo, t, c)
        return out * ok[..., None].astype(x.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wy = fy[..., None].astype(x.dtype)
    wx = fx[..., None].astype(x.dtype)
    return (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
            + v10 * wy * (1 - wx) + v11 * wy * wx)


def deform_conv2d(x: jnp.ndarray, offsets: jnp.ndarray, kernel: jnp.ndarray,
                  stride: int = 1, dilation: int = 1) -> jnp.ndarray:
    """DCNv1 forward.

    Args:
      x: [B, H, W, C] input.
      offsets: [B, Ho, Wo, 2*kh*kw] per-tap (dy, dx) pairs, tap-major
        (the torchvision/maskrcnn channel layout).
      kernel: [kh, kw, C, C'] conv kernel (HWIO).
      stride/dilation: as a padded SAME-style 3x3 conv (pad = dilation).

    Returns [B, Ho, Wo, C'].
    """
    b, h, w, c = x.shape
    kh, kw, _, co = kernel.shape
    pad = dilation * (kh - 1) // 2
    bo, ho, wo, _ = offsets.shape

    base_y = jnp.arange(ho) * stride - pad
    base_x = jnp.arange(wo) * stride - pad
    tap_y = jnp.arange(kh) * dilation
    tap_x = jnp.arange(kw) * dilation
    ty = jnp.repeat(tap_y, kw)                            # [T] row of tap
    tx = jnp.tile(tap_x, kh)                              # [T] col of tap
    gy = base_y[:, None, None] + ty[None, None, :]        # [Ho, 1, T]
    gx = base_x[None, :, None] + tx[None, None, :]        # [1, Wo, T]

    off = offsets.reshape(b, ho, wo, kh * kw, 2)
    cy = gy[None] + off[..., 0]                           # [B, Ho, Wo, T]
    cx = gx[None] + off[..., 1]

    sampled = deform_sample(x, cy, cx)                    # [B,Ho,Wo,T,C]
    return jnp.einsum("bhwtc,tcd->bhwd",
                      sampled, kernel.reshape(kh * kw, c, co),
                      preferred_element_type=jnp.float32).astype(x.dtype)


class DeformConv(nn.Module):
    """DFConv2d-equivalent flax module: zero-init offset conv + DCNv1."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        t = self.kernel_size * self.kernel_size
        pad = self.dilation * (self.kernel_size - 1) // 2
        offsets = nn.Conv(
            2 * t, (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            kernel_dilation=(self.dilation, self.dilation),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name="offset")(x)
        kernel = self.param(
            "kernel", nn.initializers.he_normal(),
            (self.kernel_size, self.kernel_size, x.shape[-1], self.features))
        return deform_conv2d(x, offsets, kernel.astype(x.dtype),
                             self.stride, self.dilation)
