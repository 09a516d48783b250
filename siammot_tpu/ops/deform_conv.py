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

import os

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


def deform_sample_patch(x: jnp.ndarray, coords_y: jnp.ndarray,
                        coords_x: jnp.ndarray) -> jnp.ndarray:
    """Exact bilinear sample via ONE [2, 2, C] patch gather per coord.

    Same semantics as :func:`deform_sample` (oob corners contribute 0)
    but fetches each sample's 2x2 neighbourhood with a single
    ``lax.gather`` instead of four independent row gathers — half the
    gather traffic and one contiguous [2, 2C] slice per sample, which
    XLA:TPU streams far better than four strided row fetches.

    The patch start is clamped fully in-bounds ([0, H-2] x [0, W-2]); an
    IN-BOUNDS corner always lands on patch row/col {0, 1} after that
    clamp (proof: corner y in [0, H-1] and start = clip(floor(cy), 0,
    H-2) differ by at most 1 with corner >= start), and out-of-bounds
    corners get weight 0, so no gather fill mode is needed.
    """
    b, h, w, c = x.shape
    # the clip(., 0, H-2) patch-start clamp below needs H, W >= 2; with a
    # 1-pixel map the bound goes negative and PROMISE_IN_BOUNDS gathers
    # would read out of bounds silently (static shapes: trace-time check)
    assert h >= 2 and w >= 2, f"deform_sample_patch needs H,W>=2, got {h}x{w}"
    y0 = jnp.floor(coords_y)
    x0 = jnp.floor(coords_x)
    fy = (coords_y - y0).astype(x.dtype)
    fx = (coords_x - x0).astype(x.dtype)
    iy = y0.astype(jnp.int32)
    ix = x0.astype(jnp.int32)
    bs, ho, wo, t = iy.shape
    n = ho * wo * t

    sy = jnp.clip(iy, 0, h - 2)
    sx = jnp.clip(ix, 0, w - 2)
    starts = jnp.stack([sy.reshape(bs, n), sx.reshape(bs, n)], axis=-1)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))

    def one(img, st):
        return jax.lax.gather(
            img, st, dnums, slice_sizes=(2, 2, c),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    patches = jax.vmap(one)(x, starts)                   # [B, N, 2, 2, C]

    # scatter the 4 bilinear corner weights onto patch coordinates:
    # corner row cy maps to patch row cy - sy
    def ok(yi, xi):
        return ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)).astype(x.dtype)
    oy = iy - sy                                         # {-1, 0, 1}
    ox = ix - sx
    corners = (
        ((1 - fy) * (1 - fx) * ok(iy, ix), oy, ox),
        ((1 - fy) * fx * ok(iy, ix + 1), oy, ox + 1),
        (fy * (1 - fx) * ok(iy + 1, ix), oy + 1, ox),
        (fy * fx * ok(iy + 1, ix + 1), oy + 1, ox + 1),
    )
    wp = []
    for a in range(2):
        for b_ in range(2):
            wp.append(sum(wv * ((ry == a) & (rx == b_)).astype(x.dtype)
                          for wv, ry, rx in corners))
    wp = jnp.stack(wp, axis=-1).reshape(bs, n, 2, 2)
    sampled = jnp.einsum("bnyxc,bnyx->bnc", patches, wp,
                         preferred_element_type=jnp.float32)
    return sampled.astype(x.dtype).reshape(bs, ho, wo, t, c)


def _shiftwin_sampled(x: jnp.ndarray, offsets: jnp.ndarray, kh: int, kw: int,
                      stride: int, dilation: int, r: int) -> jnp.ndarray:
    """Gather-free deformable sampling over a static shift window.

    Decomposes each bilinear sample into contributions from integer
    shifts ``s`` of the tap's static position:

        sampled[p, t] = sum_{sy, sx in [-r, r+1]} wy[p,t,sy] * wx[p,t,sx]
                        * x[base(p) + tap(t) + (sy, sx)]

    where ``wy``/``wx`` carry the two bilinear corner weights at the
    floor/floor+1 rows (separably in y and x).  Every term is a STATIC
    strided slice of the zero-padded input FMA'd with a data-dependent
    weight map — pure vector math the TPU VPU streams at full tilt, no
    gathers at all.  Exact (bit-matching :func:`deform_sample`, which
    zero-weights out-of-bounds corners — zero padding reproduces that)
    whenever every offset's integer part lies in [-r, r]; the caller
    guards with that predicate and falls back to the gather path.

    Cost grows as (2r+2)^2 weighted [Ho, Wo, C] maps per tap, so keep r
    small (trained DCNv1 offsets concentrate within a couple of pixels;
    the zero-initialized offset conv starts them at exactly 0).
    """
    b, h, w, c = x.shape
    pad = dilation * (kh - 1) // 2
    bo, ho, wo, _ = offsets.shape
    t = kh * kw
    off = offsets.reshape(b, ho, wo, t, 2)
    oy, ox = off[..., 0], off[..., 1]
    y0 = jnp.floor(oy)
    x0 = jnp.floor(ox)
    fy = (oy - y0).astype(x.dtype)
    fx = (ox - x0).astype(x.dtype)
    iy = y0.astype(jnp.int32)
    ix = x0.astype(jnp.int32)

    lo = pad + r
    hi = pad + r + 1
    xp = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)))

    def tapview(abs_y, abs_x):
        # static strided [B, Ho, Wo, C] view at displacement (abs_y, abs_x)
        # relative to the un-padded origin (indices into xp are +lo)
        return jax.lax.slice(
            xp, (0, abs_y + lo, abs_x + lo, 0),
            (b, abs_y + lo + (ho - 1) * stride + 1,
             abs_x + lo + (wo - 1) * stride + 1, c),
            (1, stride, stride, 1))

    one = jnp.ones((), x.dtype)
    sampled = []
    for ti in range(t):
        dy = (ti // kw) * dilation - pad
        dx = (ti % kw) * dilation - pad
        iy_t, ix_t = iy[..., ti], ix[..., ti]
        fy_t, fx_t = fy[..., ti], fx[..., ti]
        acc = jnp.zeros((b, ho, wo, c), jnp.float32)
        for sy in range(-r, r + 2):
            wy = ((one - fy_t) * (iy_t == sy) + fy_t * (iy_t == sy - 1))
            for sx in range(-r, r + 2):
                wx = ((one - fx_t) * (ix_t == sx)
                      + fx_t * (ix_t == sx - 1))
                wgt = (wy * wx)[..., None]
                acc = acc + (wgt * tapview(dy + sy, dx + sx)
                             ).astype(jnp.float32)
        sampled.append(acc.astype(x.dtype))
    return jnp.stack(sampled, axis=3)                    # [B,Ho,Wo,T,C]


@jax.custom_vjp
def _pallas_guarded(x, offsets, kernel):
    """Tile-resident Pallas DCN for in-window offsets (floor in [-R, R]),
    exact ``lax.cond`` fallback to the patch-gather formulation outside —
    the same guarantee structure as ``shiftwin``.  Backward routes
    through the exact patch formulation (the Pallas kernel is
    forward-only), so training through this impl stays exact."""
    from .pallas.deform import HALO, R, deform_conv_pallas

    # VMEM gate: one program keeps the [9,C,Co] tap weights, the haloed
    # row tile, the output block, and ~3 response-sized f32 temporaries
    # resident.  Measured Mosaic stack usage runs ~1.25x this estimate
    # (f32 C=Co=512 hit 17.65M vs 14.3M estimated); past the 16M scoped
    # limit route to the exact patch formulation instead.  In production
    # the trunk is bf16 and every DLA/ResNet DCN stage fits; the f32
    # trace (param init) and oversized experiments take the fallback.
    b, h, w, c = x.shape
    co = kernel.shape[-1]
    th, wo, wp = 8, w, w + 2 * HALO
    isz = jnp.dtype(x.dtype).itemsize
    est = (isz * (9 * c * co + (th + 2 * HALO) * wp * c + th * wo * co)
           + 4 * (3 * th * wo * c + th * wo * wp + th * wo * co))
    if est * 1.25 > 15 * 2 ** 20:
        return deform_conv2d(x, offsets, kernel, 1, 1, impl="patch")

    off = offsets.reshape(offsets.shape[:3] + (-1, 2))
    io = jnp.floor(off).astype(jnp.int32)
    in_win = (jnp.min(io) >= -R) & (jnp.max(io) <= R)
    return jax.lax.cond(
        in_win,
        lambda: deform_conv_pallas(x, offsets, kernel),
        lambda: deform_conv2d(x, offsets, kernel, 1, 1, impl="patch"))


def _pallas_guarded_fwd(x, offsets, kernel):
    return _pallas_guarded(x, offsets, kernel), (x, offsets, kernel)


def _pallas_guarded_bwd(res, g):
    x, offsets, kernel = res
    _, vjp = jax.vjp(
        lambda a, b, c: deform_conv2d(a, b, c, 1, 1, impl="patch"),
        x, offsets, kernel)
    return vjp(g)


_pallas_guarded.defvjp(_pallas_guarded_fwd, _pallas_guarded_bwd)


def deform_conv2d(x: jnp.ndarray, offsets: jnp.ndarray, kernel: jnp.ndarray,
                  stride: int = 1, dilation: int = 1,
                  impl: str = "auto", shift_r: int = 2) -> jnp.ndarray:
    """DCNv1 forward.

    Args:
      x: [B, H, W, C] input.
      offsets: [B, Ho, Wo, 2*kh*kw] per-tap (dy, dx) pairs, tap-major
        (the torchvision/maskrcnn channel layout).
      kernel: [kh, kw, C, C'] conv kernel (HWIO).
      stride/dilation: as a padded SAME-style 3x3 conv (pad = dilation).
      impl: "gather4" (reference ladder: four corner row gathers),
        "patch" (single 2x2-patch gather per sample), "shiftwin"
        (gather-free static shift window of radius ``shift_r`` with a
        lax.cond fallback to "patch" for offsets outside the window —
        still exact), "pallas" (tile-resident Pallas kernel, same exact
        guard/fallback structure), or "auto" (environment override
        ``SIAMMOT_DCN_IMPL`` if set, else "pallas" — chip shootout:
        full-model DLA-102-DCN runs 42.3 FPS pallas / 29.3 patch /
        21.6 gather4 / 12.9 shiftwin, 2026-08-21; the kernel falls back
        to "patch" itself for non-3x3/stride/dilation geometry,
        non-128-multiple channels, or VMEM-exceeding shapes).
      shift_r: shift-window radius (exact-fast-path coverage: every
        offset's integer part in [-r, r]); cost per tap grows (2r+2)^2.

    Returns [B, Ho, Wo, C'].
    """
    b, h, w, c = x.shape
    kh, kw, _, co = kernel.shape
    pad = dilation * (kh - 1) // 2
    bo, ho, wo, _ = offsets.shape
    if impl == "auto":
        impl = os.environ.get("SIAMMOT_DCN_IMPL", "pallas")
    if impl not in ("gather4", "patch", "shiftwin", "pallas"):
        raise ValueError(
            f"unknown DCN impl {impl!r} (from SIAMMOT_DCN_IMPL?); "
            "expected one of 'gather4', 'patch', 'shiftwin', 'pallas'")
    if impl == "pallas" and not (kh == kw == 3 and stride == 1
                                 and dilation == 1):
        impl = "patch"      # kernel covers the production DCN geometry
    if impl == "pallas" and c % 128 != 0 and \
            jax.default_backend() in ("tpu", "axon"):
        impl = "patch"      # hardware DMA wants 128-multiple lanes
    if impl == "pallas":
        return _pallas_guarded(x, offsets, kernel)

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

    def matmul(sampled):
        # one clean [N, T*C] @ [T*C, Co] MXU matmul (not a rank-5 einsum)
        out = jax.lax.dot_general(
            sampled.reshape(b * ho * wo, kh * kw * c),
            kernel.reshape(kh * kw * c, co),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return out.astype(x.dtype).reshape(b, ho, wo, co)

    if impl == "shiftwin":
        io_y = jnp.floor(off[..., 0]).astype(jnp.int32)
        io_x = jnp.floor(off[..., 1]).astype(jnp.int32)
        in_win = ((jnp.min(io_y) >= -shift_r) & (jnp.max(io_y) <= shift_r)
                  & (jnp.min(io_x) >= -shift_r)
                  & (jnp.max(io_x) <= shift_r))
        return jax.lax.cond(
            in_win,
            lambda: matmul(_shiftwin_sampled(
                x, offsets, kh, kw, stride, dilation, shift_r)),
            lambda: matmul(deform_sample_patch(x, cy, cx)))

    sample = deform_sample if impl == "gather4" else deform_sample_patch
    return matmul(sample(x, cy, cx))


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
