"""Pallas fused windowed ROIAlign.

Same separable-window formulation as ``ops/roi_align_windowed.py`` but the
per-ROI feature window is DMA'd HBM->VMEM and consumed in place by the two
interpolation matmuls — the XLA version materializes the gathered
[N, win, win, C] windows tensor in HBM (up to ~1 GB/frame at SR-pool
shapes), which this kernel never allocates.

Both kernels stream each window in ROW STRIPES of ``hb`` rows (hb | window,
hb % 8 == 0 when striped) so VMEM stays bounded for any window size and
table dtype: the un-striped formulation needs several [win, win, C]
intermediates at once, which blows the 16 MB scoped-VMEM limit at the
f32 SR-pool shapes the training path uses (window 128, C 128).

Grid: one program per ROI.  Forward: the next stripe's DMA (possibly of
the next ROI) is prefetched into a second buffer while the current stripe
is interpolated.  Backward: one program per ROI scatter-adds
W_y^T G W_x into the table gradient stripe by stripe; the TPU grid is
sequential, so the read-modify-write of overlapping windows is race-free.

The dense per-axis weight matrices (Wy/Wx, with all boundary/virtual-pad
masking folded in) are computed by the XLA prologue in
``roi_align_windowed._axis_weights`` — they are tiny ([N, S, win]).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stripe_rows(window: int) -> int:
    """Largest stripe height (multiple of 8, dividing window) <= 32; the
    whole window when none exists (small/odd windows fit un-striped)."""
    for hb in (32, 24, 16, 8):
        if window % hb == 0:
            return hb
    return window


def _kernel(origins_ref,              # scalar-prefetch: [N, 4]
            # (row0+oy, ox, out block, n_valid) — ROIs sorted valid-first
            wyt_ref, wx_ref,          # [1, win, S] / [1, S, win] blocks
            table_ref,                # full [R, Wmax, C] in ANY/HBM
            out_ref,                  # [1, S, S, C] block (f32)
            win_buf, sems, *, window: int, c: int, hb: int, n_buf: int):
    i = pl.program_id(0)
    n_valid = origins_ref[0, 3]
    wyt = wyt_ref[0]                                # [win, S]
    wx = wx_ref[0]                                  # [S, win]
    s = wx.shape[0]
    k_str = window // hb

    def dma(slot, roi, k):
        # the XLA prologue 8-aligns column origins; assert it to Mosaic
        ox = pl.multiple_of(origins_ref[roi, 1], 8)
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(origins_ref[roi, 0] + k * hb, hb),
                         pl.ds(ox, window), pl.ds(0, c)],
            win_buf.at[slot], sems.at[slot])

    if n_buf == 2:
        @pl.when((i == 0) & (n_valid > 0))
        def _():
            dma(0, 0, 0).start()

    # dead (invalid) slots: zero output, no DMA, no matmuls — capacity
    # padding costs ~an HBM write instead of a full window pool
    @pl.when(i >= n_valid)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    def stripe(k, _):
        slot = (i * k_str + k) % 2 if n_buf == 2 else 0
        if n_buf == 2:
            # prefetch the next stripe in the global (roi, stripe) order,
            # chain bounded by the live prefix
            g_next = i * k_str + k + 1

            @pl.when(g_next < n_valid * k_str)
            def _():
                dma((g_next) % 2, g_next // k_str, g_next % k_str).start()
        else:
            dma(0, i, k).start()
        dma(slot, i, k).wait()
        win = win_buf[slot]                         # [hb, win_w, C]
        dt = win.dtype
        # pass 1 (contract W), batch over stripe rows:
        #   partial[hh, q, c] = sum_w wx[q, w] win[hh, w, c]
        wx_b = jnp.broadcast_to(wx.astype(dt)[None], (hb, s, window))
        partial = jax.lax.dot_general(
            wx_b, win, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)     # [hb, S, C]
        # pass 2 (contract stripe rows), batch over q:
        #   contrib[q, p, c] = sum_hh wyt[k*hb + hh, p] partial[hh, q, c]
        if k_str == 1:
            wy_s = wyt
        else:
            h0 = pl.multiple_of(k * hb, 8)
            wy_s = wyt_ref[0, pl.ds(h0, hb), :]     # [hb, S]
        partial_t = partial.transpose(1, 0, 2).astype(dt)
        wy_b = jnp.broadcast_to(
            wy_s.astype(dt).T[None], (s, s, hb))    # [q, p, hh]
        contrib = jax.lax.dot_general(
            wy_b, partial_t, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)     # [q, p, C]
        contrib = contrib.transpose(1, 0, 2)        # [p, q, C]
        if k_str == 1:
            out_ref[0] = contrib
        else:
            @pl.when(k == 0)
            def _():
                out_ref[0] = contrib

            @pl.when(k > 0)
            def _():
                out_ref[0] = out_ref[0] + contrib
        return 0

    @pl.when(i < n_valid)
    def _():
        jax.lax.fori_loop(0, k_str, stripe, 0)


def _bwd_kernel(origins_ref,              # scalar-prefetch: [N, 4]
                wyt_ref, wx_ref,          # [1, win, S] / [1, S, win] blocks
                g_ref,                    # [1, S, S, C] block (cotangent)
                zeros_ref,                # aliased to dtable_ref (unused)
                dtable_ref,               # full [R, Wmax, C] in ANY/HBM
                win_buf, sems, *, window: int, c: int, hb: int):
    del zeros_ref
    i = pl.program_id(0)
    n_valid = origins_ref[0, 3]
    ox = pl.multiple_of(origins_ref[i, 1], 8)
    row0 = origins_ref[i, 0]

    g = g_ref[0]                                    # [S, S, C] f32
    wyt = wyt_ref[0].astype(jnp.float32)            # [win, S]
    wx = wx_ref[0].astype(jnp.float32)              # [S, win]
    s = wx.shape[0]
    g_t = g.transpose(1, 0, 2)                      # [sx, sy, C]
    k_str = window // hb

    def stripe(k, _):
        sl = (pl.ds(row0 + k * hb, hb), pl.ds(ox, window), pl.ds(0, c))
        read = pltpu.make_async_copy(dtable_ref.at[sl], win_buf, sems.at[0])
        read.start()
        if k_str == 1:
            wy_s = wyt
        else:
            h0 = pl.multiple_of(k * hb, 8)
            wy_s = wyt_ref[0, pl.ds(h0, hb), :].astype(jnp.float32)
        # stage 1, batch over sx:
        #   P[hh, sx, c] = sum_sy wy_s[hh, sy] g[sy, sx, c]
        wy_b = jnp.broadcast_to(wy_s[None], (s, hb, s))
        p_t = jax.lax.dot_general(
            wy_b, g_t, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)     # [sx, hh, C]
        p = p_t.transpose(1, 0, 2)                  # [hh, sx, C]
        # stage 2, batch over stripe rows:
        #   dwin[hh, w, c] = sum_sx wx[sx, w] P[hh, sx, c]
        wxt_b = jnp.broadcast_to(wx.T[None], (hb, window, s))
        dwin = jax.lax.dot_general(
            wxt_b, p, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)     # [hh, w, C]
        read.wait()
        win_buf[...] = (win_buf[...].astype(jnp.float32) + dwin
                        ).astype(win_buf.dtype)
        write = pltpu.make_async_copy(win_buf, dtable_ref.at[sl], sems.at[1])
        write.start()
        write.wait()
        return 0

    # dead slots contribute nothing (their forward output is constant 0)
    @pl.when(i < n_valid)
    def _():
        jax.lax.fori_loop(0, k_str, stripe, 0)


def _scalar_rows(origins: jnp.ndarray, out_blocks, n_valid) -> jnp.ndarray:
    """[N, 2] (row, col) origins -> [N, 4] kernel scalar rows
    (row, col, out block, n_valid)."""
    n = origins.shape[0]
    if out_blocks is None:
        out_blocks = jnp.arange(n, dtype=jnp.int32)
    nv = jnp.full((n,), n, jnp.int32) if n_valid is None else \
        jnp.broadcast_to(jnp.asarray(n_valid, jnp.int32).reshape(()), (n,))
    return jnp.stack([origins[:, 0].astype(jnp.int32),
                      origins[:, 1].astype(jnp.int32),
                      out_blocks.astype(jnp.int32), nv], axis=1)


@functools.partial(jax.jit, static_argnames=("table_shape", "table_dtype",
                                             "window", "interpret",
                                             "compacted"))
def window_pool_pallas_bwd(g: jnp.ndarray, origins: jnp.ndarray,
                           wy: jnp.ndarray, wx: jnp.ndarray,
                           table_shape, table_dtype, window: int,
                           interpret: bool = False,
                           out_blocks=None, n_valid=None,
                           compacted: bool = False) -> jnp.ndarray:
    """dL/dtable for ``window_pool_pallas``.

    Feature-gradient only, like the reference ROIAlign backward
    (maskrcnn ``csrc/ROIAlign_cuda.cu`` computes grad_input, never
    grad_rois); the interpolation weights carry box-coordinate
    dependence and get zero cotangents upstream.  For well-conditioned
    accumulation train with a float32 table (``TPU.POOLER_DTYPE``).
    """
    n, s = wy.shape[:2]
    c = table_shape[-1]
    hb = _stripe_rows(window)
    zeros = jnp.zeros(table_shape, table_dtype)
    if compacted:
        # g arrives in original slot order; the kernel walks ROIs in
        # sorted (valid-first) order, so gather g rows to match
        g = jnp.take(g, out_blocks.astype(jnp.int32), axis=0)
    scalars = _scalar_rows(origins, out_blocks, n_valid)
    wyt = jnp.swapaxes(wy, 1, 2)                    # [N, win, S]
    kernel = functools.partial(_bwd_kernel, window=window, c=c, hb=hb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, window, s), lambda i, o: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, window), lambda i, o: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, s, c), lambda i, o: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((hb, window, c), table_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(table_shape, table_dtype),
        input_output_aliases={4: 0},    # zeros table buffer -> dtable
        interpret=interpret,
    )(scalars, wyt, wx, g.astype(jnp.float32), zeros)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _window_pool_vjp(table, origins, wy, wx, out_blocks, n_valid,
                     window: int, channel_block: int, interpret: bool,
                     compacted: bool):
    return window_pool_pallas(table, origins, wy, wx, window,
                              channel_block, interpret, out_blocks, n_valid)


def _window_pool_fwd(table, origins, wy, wx, out_blocks, n_valid, window,
                     channel_block, interpret, compacted):
    out = window_pool_pallas(table, origins, wy, wx, window,
                             channel_block, interpret, out_blocks, n_valid)
    # table rides along only for its static shape/dtype in bwd
    return out, (origins, wy, wx, out_blocks, n_valid, table)


def _window_pool_bwd(window, channel_block, interpret, compacted, res, g):
    origins, wy, wx, out_blocks, n_valid, table = res
    dtable = window_pool_pallas_bwd(g, origins, wy, wx, table.shape,
                                    table.dtype, window,
                                    interpret=interpret,
                                    out_blocks=out_blocks, n_valid=n_valid,
                                    compacted=compacted)
    # feature-only gradient (reference ROIAlign backward parity)
    zl = jax.tree.map(jnp.zeros_like, (origins, wy, wx, out_blocks, n_valid))
    return (dtable,) + zl


_window_pool_vjp.defvjp(_window_pool_fwd, _window_pool_bwd)


def window_pool(table, origins, wy, wx, window: int,
                channel_block: int = 128, interpret: bool = False,
                out_blocks=None, n_valid=None):
    """Differentiable window pooling: Pallas forward + Pallas scatter
    backward (feature-gradient only, like the reference ROIAlign).

    ``out_blocks``/``n_valid`` enable compacted mode: ROI inputs arrive
    sorted valid-first, program i writes output block ``out_blocks[i]``,
    and programs past ``n_valid`` skip the pool and write zeros."""
    return _window_pool_vjp(table, origins, wy, wx, out_blocks, n_valid,
                            window, channel_block, interpret,
                            out_blocks is not None)


@functools.partial(jax.jit, static_argnames=("window", "channel_block",
                                             "interpret"))
def window_pool_pallas(table: jnp.ndarray, origins: jnp.ndarray,
                       wy: jnp.ndarray, wx: jnp.ndarray, window: int,
                       channel_block: int = 128,
                       interpret: bool = False,
                       out_blocks=None, n_valid=None) -> jnp.ndarray:
    """Pooling samples (pre bin-average).

    Args:
      table: [R, Wmax, C] stacked levels (row/col padded so any window
        slice is in bounds).  DMA slices on the lane dim must be
        128-aligned, so C must be a multiple of 128 (cast/pad upstream).
      origins: [N, 2] int32 (absolute row, col) window origins; columns
        8-aligned.  In compacted mode, sorted valid-first with dead rows
        zeroed (kept in-bounds).
      wy/wx: [N, S, window] dense interpolation weights (sorted order in
        compacted mode).
      out_blocks: [N] int32 original slot of sorted ROI i (None =
        identity).
      n_valid: scalar count of live ROIs (None = all N).

    Returns [N, S, S, C] float32 interpolated samples, in original slot
    order; dead slots are zeros.
    """
    del channel_block  # full-channel windows; kept for API stability
    n, s = wy.shape[:2]
    c = table.shape[-1]
    scalars = _scalar_rows(origins, out_blocks, n_valid)
    # bf16 windows <= 128 fit VMEM whole (the proven inference envelope,
    # one DMA per ROI); stripe otherwise (f32 tables / larger windows)
    hb = window if table.dtype.itemsize <= 2 and window <= 128 \
        else _stripe_rows(window)
    # double-buffer when two stripes comfortably fit VMEM
    n_buf = 2 if 2 * hb * window * c * table.dtype.itemsize \
        <= 9 * 2 ** 20 else 1
    wyt = jnp.swapaxes(wy, 1, 2)                    # [N, win, S]

    kernel = functools.partial(_kernel, window=window, c=c, hb=hb,
                               n_buf=n_buf)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, window, s), lambda i, o: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, window), lambda i, o: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, s, s, c),
                               lambda i, o: (o[i, 2], 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_buf, hb, window, c), table.dtype),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, s, s, c), jnp.float32),
        interpret=interpret,
    )(scalars, wyt, wx, table)
