"""Windowed-separable ROIAlign.

Same math as ``ops/roi_align.py`` (maskrcnn semantics, virtual padding),
restructured for the TPU memory system.  The gather formulation fetches
4 corners per sample — ``N x (S*r)^2 x 4`` *element* gathers, the slowest
access pattern TPUs have.  This version exploits two structural facts:

  1. ROIAlign's bilinear kernel is **separable**: ``out[i,j] = sum_y
     Wy[i,y] * sum_x Wx[j,x] * F[y,x]`` with sparse (2-tap) rows in
     ``Wy/Wx`` — densifying the taps into per-ROI weight matrices turns
     pooling into two small matmuls (MXU work).
  2. The taps of one ROI live in a **contiguous window** of its FPN
     level whose size is bounded by the LevelMapper: a ROI assigned to
     level k has extent ~[14, 28) feature px per sqrt-area axis, so a
     static window (rows x cols) covers every realistic aspect ratio —
     one `dynamic_slice` block load per ROI instead of thousands of
     element gathers.

All FPN levels are stacked into one zero-padded row table so a single
dynamic slice serves any (image, level) pair.  Samples outside the real
feature (or, for pathological aspect ratios, outside the window) get
zero weight — identical to the virtually-padded exact path for every ROI
whose sample span fits the window (SR pooling at SEARCH_REGION=2 fits
through aspect ~1:5; the pool sites pick window sizes accordingly).
"""

from __future__ import annotations

from functools import partial

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from .roi_align import _sample_positions


@flax.struct.dataclass
class LevelPack:
    """Stacked FPN levels ready for windowed pooling.  ``scales`` and
    ``num_levels`` are static (hashable) so a pack can cross jit
    boundaries as an argument."""

    table: jnp.ndarray        # [R, Wmax, C]
    row_offsets: jnp.ndarray  # [B * L] block start rows
    heights: jnp.ndarray      # [L]
    widths: jnp.ndarray       # [L]
    scales: tuple = flax.struct.field(pytree_node=False)
    num_levels: int = flax.struct.field(pytree_node=False)


def pack_levels(features: list, scales: tuple, dtype=None) -> LevelPack:
    """Build a LevelPack from per-level [B, Hi, Wi, C] maps (one copy).

    ``dtype=bfloat16`` halves the per-ROI window DMA of the Pallas pooler
    (pooled outputs are always f32-accumulated).
    """
    table, offsets, heights, widths = stack_levels(features)
    if dtype is not None:
        table = table.astype(dtype)
    return LevelPack(table=table, row_offsets=jnp.asarray(offsets),
                     heights=jnp.asarray(heights),
                     widths=jnp.asarray(widths), scales=tuple(scales),
                     num_levels=len(features))


def windowed_pool(pack: LevelPack, rois: jnp.ndarray, img_idx: jnp.ndarray,
                  levels: jnp.ndarray, output_size: int, sampling_ratio: int,
                  window: int, pad_pixels: int = 0,
                  backend: str = "auto", valid=None) -> jnp.ndarray:
    """FPN pooling over a LevelPack (drop-in for the gather pooler).

    backend "auto": the fused Pallas kernel on TPU (windows stay in VMEM),
    the XLA formulation elsewhere.

    ``valid`` ([N] bool, optional): rows marked invalid pool to zeros and
    skip their window DMA + matmuls entirely (fixed-capacity padding lanes
    cost ~an HBM write instead of a full pool).
    """
    if backend == "auto":
        backend = "pallas" if jax.default_backend() in ("tpu", "axon") \
            else "xla"
    scales = jnp.asarray(np.array(pack.scales, np.float32))[levels]
    return roi_align_windowed(
        pack.table, pack.row_offsets, pack.heights, pack.widths, rois,
        img_idx * pack.num_levels + levels, scales, output_size,
        sampling_ratio, window, pad_pixels, pack.num_levels,
        backend=backend, valid=valid)


def stack_levels(features: list, img_idx_levels: int = None):
    """Stack per-level [B, Hi, Wi, C] maps into one row table.

    Returns (table [R, Wmax, C], row_offsets [B*L], heights [L], widths
    [L]) where the row block for (image b, level l) starts at
    ``row_offsets[b * L + l]``.
    """
    b = features[0].shape[0]
    c = features[0].shape[-1]
    wmax = max(f.shape[2] for f in features)
    blocks = []
    offsets = []
    row = 0
    for bi in range(b):
        for f in features:
            h, w = f.shape[1:3]
            pad_w = wmax - w
            blk = f[bi]
            if pad_w:
                blk = jnp.pad(blk, ((0, 0), (0, pad_w), (0, 0)))
            blocks.append(blk)
            offsets.append(row)
            row += h
    table = jnp.concatenate(blocks, axis=0)
    heights = np.array([f.shape[1] for f in features], np.int32)
    widths = np.array([f.shape[2] for f in features], np.int32)
    return table, np.array(offsets, np.int32), heights, widths


def window_clamp_mask(rois, scales, heights, widths, levels,
                      output_size: int, sampling_ratio: int, window: int,
                      pad_pixels: int = 0):
    """Per-ROI deviation detector for the windowed pooler (PARITY #5/#9).

    Returns [N] bool: True iff some bilinear tap that the exact gather
    pooler would weight with a REAL feature value (i.e., a tap inside the
    unpadded level) falls outside this ROI's static window — exactly the
    ROIs whose windowed result differs from ``multilevel_roi_align``.
    Taps in the virtual-pad region are zeros in both paths and never count.

    Mirrors ``roi_align_windowed``'s origin computation (incl. the
    8-aligned column origin) tap for tap.
    """
    rois = jnp.asarray(rois, jnp.float32)
    scales = jnp.asarray(scales, jnp.float32)
    h_arr = jnp.asarray(heights, jnp.int32)[levels]
    w_arr = jnp.asarray(widths, jnp.int32)[levels]
    pads = jnp.round(pad_pixels * scales).astype(jnp.int32)

    start = rois[:, :2] * scales[:, None]
    end = rois[:, 2:] * scales[:, None]
    extent = jnp.maximum(end - start, 1.0)
    xs = _sample_positions(start[:, 0], extent[:, 0], output_size,
                           sampling_ratio)
    ys = _sample_positions(start[:, 1], extent[:, 1], output_size,
                           sampling_ratio)

    def origin(pos, pad, size):
        first = jnp.floor(pos[:, 0]).astype(jnp.int32) - pad
        last = jnp.floor(pos[:, -1]).astype(jnp.int32) + 1 - pad
        o = first - jnp.maximum((window - (last - first + 1)) // 2, 0)
        return jnp.clip(o, 0, jnp.maximum(size - window, 0))

    def clamped(pos, pad, size, o):
        sp = (size + 2 * pad).astype(pos.dtype)[:, None]
        p = jnp.clip(pos, 0.0, sp - 1)
        lo = jnp.minimum(jnp.floor(p).astype(jnp.int32),
                         (size + 2 * pad)[:, None] - 1)
        hi = jnp.minimum(lo + 1, (size + 2 * pad)[:, None] - 1)
        # taps the exact path weights with real feature values
        inside = (pos >= -1.0) & (pos <= sp)
        real_lo = lo - pad[:, None]
        real_hi = hi - pad[:, None]
        ok_lo = inside & (real_lo >= 0) & (real_lo < size[:, None])
        ok_hi = inside & (real_hi >= 0) & (real_hi < size[:, None])
        out_lo = ok_lo & ((real_lo < o[:, None])
                          | (real_lo >= o[:, None] + window))
        out_hi = ok_hi & ((real_hi < o[:, None])
                          | (real_hi >= o[:, None] + window))
        return jnp.any(out_lo | out_hi, axis=-1)

    oy = origin(ys, pads, h_arr)
    ox = (origin(xs, pads, w_arr) // 8) * 8
    return clamped(ys, pads, h_arr, oy) | clamped(xs, pads, w_arr, ox)


def _axis_weights(pos, size_real, pad, origin, window: int):
    """Dense per-ROI interpolation weights along one axis.

    Args:
      pos: [N, S] float sample positions in *padded* level coords.
      size_real: [N] real (unpadded) extent of the level on this axis.
      pad: [N] virtual pad (feature px).
      origin: [N] window origin in real coords.
      window: static window size.

    Returns W: [N, S, window] with maskrcnn boundary semantics baked in.
    """
    n, s = pos.shape
    size_padded = (size_real + 2 * pad).astype(pos.dtype)[:, None]
    inside = (pos >= -1.0) & (pos <= size_padded)
    p = jnp.clip(pos, 0.0, size_padded - 1)
    lo = jnp.floor(p).astype(jnp.int32)
    lo = jnp.minimum(lo, (size_real + 2 * pad)[:, None] - 1)
    hi = jnp.minimum(lo + 1, (size_real + 2 * pad)[:, None] - 1)
    at_edge = lo >= (size_real + 2 * pad)[:, None] - 1
    frac = jnp.where(at_edge, 0.0, p - lo.astype(p.dtype))

    # to real (unpadded) coords, then window-relative
    def rel(idx):
        real = idx - pad[:, None]
        ok = (real >= 0) & (real < size_real[:, None])
        return real - origin[:, None], ok

    lo_r, lo_ok = rel(lo)
    hi_r, hi_ok = rel(hi)
    w_lo = jnp.where(inside & lo_ok, 1.0 - frac, 0.0)
    w_hi = jnp.where(inside & hi_ok, frac, 0.0)

    # scatter the two taps into dense rows; out-of-window taps get 0
    cols = jnp.arange(window, dtype=jnp.int32)
    w = (w_lo[..., None] * (lo_r[..., None] == cols).astype(pos.dtype)
         + w_hi[..., None] * (hi_r[..., None] == cols).astype(pos.dtype))
    return w  # [N, S, window]


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio",
                                   "window", "pad_pixels", "num_levels",
                                   "backend"))
def roi_align_windowed(table: jnp.ndarray, row_offsets: jnp.ndarray,
                       heights: jnp.ndarray, widths: jnp.ndarray,
                       rois: jnp.ndarray, block_idx: jnp.ndarray,
                       scales: jnp.ndarray, output_size: int,
                       sampling_ratio: int, window: int,
                       pad_pixels: int = 0, num_levels: int = 4,
                       backend: str = "xla", valid=None):
    """ROIAlign over a stacked level table.

    Args:
      table: [R, Wmax, C] stacked levels (see ``stack_levels``).
      row_offsets/heights/widths: level geometry; heights/widths are [L],
        row_offsets is [B*L].
      rois: [N, 4] xyxy (padded coords if pad_pixels > 0).
      block_idx: [N] int32 = img_idx * num_levels + level.
      scales: [N] float spatial scale of each ROI's level.
      window: static window size (rows == cols).

    Returns [N, output_size, output_size, C].
    """
    n = rois.shape[0]
    c = table.shape[-1]

    # Mosaic DMA slices on the lane dim must be 128-aligned; narrow-channel
    # bodies (e.g. the DLA-MINI parity fixture, C=32) take the XLA windowed
    # path instead — same math, parity-tested in tests/test_roi_align.py
    if backend == "pallas" and c % 128 != 0:
        backend = "xla"

    # SMEM gate: the [N, 4] s32 scalar-prefetch table pads to 128 lanes in
    # SMEM (512 B/ROI); v5e's 1 MB SMEM overflows at N = 2048 (measured:
    # "Exceeded smem capacity by 1.1K" on a batch-16/accum-4 train step).
    # N = 1024 (batch-2 train, inference K<=512 slots) is chip-proven, so
    # fall back to the XLA windowed path — same math, parity-tested —
    # rather than fail compile on large-batch training shapes.
    if backend == "pallas" and n > 1024:
        backend = "xla"

    # guarantee every window slice stays in-bounds: small levels overhang
    # their row block (zero-weighted), and narrow tables need width >=
    # window.  Overhang rows read neighbouring blocks or zeros — all
    # masked out by the weights.
    pad_r = max(0, window)  # worst-case row overhang at the last block
    pad_w = max(0, window - table.shape[1])
    if pad_r or pad_w:
        table = jnp.pad(table, ((0, pad_r), (0, pad_w), (0, 0)))

    level = block_idx % num_levels
    h_arr = heights[level].astype(jnp.int32)
    w_arr = widths[level].astype(jnp.int32)
    pads = jnp.round(pad_pixels * scales).astype(jnp.int32)
    row0 = row_offsets[block_idx]

    start = rois[:, :2] * scales[:, None]
    end = rois[:, 2:] * scales[:, None]
    extent = jnp.maximum(end - start, 1.0)
    xs = _sample_positions(start[:, 0], extent[:, 0], output_size,
                           sampling_ratio)
    ys = _sample_positions(start[:, 1], extent[:, 1], output_size,
                           sampling_ratio)

    # window origin: center the sample span, clamped into the level
    def origin(pos, pad, size):
        first = jnp.floor(pos[:, 0]).astype(jnp.int32) - pad
        last = jnp.floor(pos[:, -1]).astype(jnp.int32) + 1 - pad
        o = first - jnp.maximum((window - (last - first + 1)) // 2, 0)
        return jnp.clip(o, 0, jnp.maximum(size - window, 0))

    oy = origin(ys, pads, h_arr)
    # column origins 8-aligned: VMEM memref slices on the sublane dim must
    # start at a tile boundary (Mosaic); costs <= 7 columns of slack
    ox = (origin(xs, pads, w_arr) // 8) * 8

    wy = _axis_weights(ys, h_arr, pads, oy, window)      # [N, S, win]
    wx = _axis_weights(xs, w_arr, pads, ox, window)

    # Fold the r x r bin-average into the weight matrices (linearity of
    # ROIAlign: mean_a,b sum_h,w wy[or+a,h] wx[or+b,w] F = sum_h,w
    # (mean_a wy)[o,h] (mean_b wx)[o,w] F).  The pool then emits the
    # final [N, out, out, C] directly — 4x less kernel output traffic
    # (236 MB of pre-average samples at SR-pool shapes) and no separate
    # mean epilogue.
    if sampling_ratio > 1:
        wy = wy.reshape(n, output_size, sampling_ratio, window).mean(axis=2)
        wx = wx.reshape(n, output_size, sampling_ratio, window).mean(axis=2)

    if backend == "pallas":
        # differentiable wrapper: Pallas forward + Pallas scatter backward
        from .pallas.window_pool import window_pool
        origins = jnp.stack([row0 + oy, ox], axis=-1).astype(jnp.int32)
        if valid is None:
            acc = window_pool(table, origins, wy, wx, window)
        else:
            # compact live ROIs to a prefix so the kernel can skip the
            # dead tail; outputs land back in original slots via the
            # out-block scatter
            perm = jnp.argsort(~valid, stable=True).astype(jnp.int32)
            n_valid = jnp.sum(valid).astype(jnp.int32)
            live = (jnp.arange(n, dtype=jnp.int32) < n_valid)[:, None]
            origins = jnp.where(live, origins[perm], 0)  # dead: in-bounds
            acc = window_pool(table, origins, wy[perm], wx[perm], window,
                              out_blocks=perm, n_valid=n_valid)
    else:
        if valid is not None:
            # zero the weights of dead rows (where, not multiply: dead
            # rows may hold NaN boxes): output becomes exact zeros,
            # matching the Pallas compacted path
            wy = jnp.where(valid[:, None, None], wy, 0.0)

        # one contiguous block load per ROI
        def load(roi_row0, roi_ox):
            return jax.lax.dynamic_slice(
                table, (roi_row0, roi_ox, 0), (window, window, c))

        windows = jax.vmap(load)(row0 + oy, ox)          # [N, win, win, C]
        tmp = jnp.einsum("nsh,nhwc->nswc", wy, windows,
                         preferred_element_type=jnp.float32)
        acc = jnp.einsum("ntw,nswc->nstc", wx, tmp,
                         preferred_element_type=jnp.float32)
    return acc.astype(jnp.float32)       # [N, out, out, C]
