"""Pallas fused windowed ROIAlign.

Same separable-window formulation as ``ops/roi_align_windowed.py`` but the
per-ROI feature window is DMA'd HBM->VMEM and consumed in place by the two
interpolation matmuls — the XLA version materializes the gathered
[N, win, win, C] windows tensor in HBM (up to ~1 GB/frame at SR-pool
shapes), which this kernel never allocates.

Grid: one program per ROI, with the next ROI's window DMA prefetched into
a second buffer while the current one is interpolated (double buffering).

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


def _kernel(origins_ref,              # scalar-prefetch: [N, 2] (row0+oy, ox)
            wy_ref, wx_ref,           # [1, S, win] blocks
            table_ref,                # full [R, Wmax, C] in ANY/HBM
            out_ref,                  # [1, S, S, C] block
            win_buf, sems, *, window: int, c: int, n_buf: int):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    wy = wy_ref[0]                                  # [S, win]
    wx = wx_ref[0]

    def dma(slot, idx):
        # the XLA prologue 8-aligns column origins; assert it to Mosaic
        ox = pl.multiple_of(origins_ref[idx, 1], 8)
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(origins_ref[idx, 0], window),
                         pl.ds(ox, window), pl.ds(0, c)],
            win_buf.at[slot], sems.at[slot])

    if n_buf == 2:                                  # double-buffered
        @pl.when(i == 0)
        def _():
            dma(0, 0).start()

        @pl.when(i + 1 < n)
        def _():
            dma((i + 1) % 2, i + 1).start()

        dma(i % 2, i).wait()
        win = win_buf[i % 2]                        # [H=win, W=win, C]
    else:                                           # VMEM-tight fallback
        d = dma(0, i)
        d.start()
        d.wait()
        win = win_buf[0]
    dt = win.dtype                                  # compute in table dtype
    s = wy.shape[0]
    # Mosaic supports batched (rank-3) matmuls but not plain rank-3
    # contractions; formulate both interpolation passes as batched
    # matmuls with channel lanes intact, f32 accumulation.
    # pass 1 (contract W), batch over H: [H,T,W] @ [H,W,C] -> [H,T,C]
    wx_b = jnp.broadcast_to(wx.astype(dt)[None], (window, s, window))
    b = jax.lax.dot_general(
        wx_b, win, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)         # [H, T, C]
    # pass 2 (contract H), batch over T: [T,S,H] @ [T,H,C] -> [T,S,C]
    b_t = b.transpose(1, 0, 2).astype(dt)
    wy_b = jnp.broadcast_to(wy.astype(dt)[None], (s, s, window))
    out = jax.lax.dot_general(
        wy_b, b_t, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)         # [T, S, C]
    out_ref[0] = out.transpose(1, 0, 2)


def _bwd_kernel(origins_ref,              # scalar-prefetch: [N, 2]
                wy_ref, wx_ref,           # [1, S, win] blocks
                g_ref,                    # [1, S, S, C] block (cotangent)
                zeros_ref,                # aliased to dtable_ref (unused)
                dtable_ref,               # full [R, Wmax, C] in ANY/HBM
                win_buf, sems, *, window: int, c: int):
    del zeros_ref
    """Scatter-add W_y^T G W_x into the table gradient, one ROI per
    program.  The TPU grid is sequential, so the read-modify-write of
    overlapping windows is race-free (single-buffered: each window's
    write-back completes before the next program's read starts)."""
    i = pl.program_id(0)
    ox = pl.multiple_of(origins_ref[i, 1], 8)
    sl = (pl.ds(origins_ref[i, 0], window), pl.ds(ox, window), pl.ds(0, c))

    read = pltpu.make_async_copy(dtable_ref.at[sl], win_buf, sems.at[0])
    read.start()

    g = g_ref[0]                                    # [S, S, C] f32
    wy = wy_ref[0].astype(jnp.float32)              # [S, win]
    wx = wx_ref[0].astype(jnp.float32)
    s = wy.shape[0]
    # A[s, w, c] = sum_t wx[t, w] g[s, t, c]  (batched over s)
    wxt_b = jnp.broadcast_to(wx.T[None], (s, window, s))
    a = jax.lax.dot_general(
        wxt_b, g, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # [S, win, C]
    # dWin[h, w, c] = sum_s wy[s, h] A[s, w, c]  (batched over w)
    a_t = a.transpose(1, 0, 2)                       # [win, S, C]
    wyt_b = jnp.broadcast_to(wy.T[None], (window, window, s))
    dwin = jax.lax.dot_general(
        wyt_b, a_t, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # [win_w, win_h, C]
    dwin = dwin.transpose(1, 0, 2)                   # [win_h, win_w, C]

    read.wait()
    win_buf[...] = (win_buf[...].astype(jnp.float32) + dwin
                    ).astype(win_buf.dtype)
    write = pltpu.make_async_copy(win_buf, dtable_ref.at[sl], sems.at[1])
    write.start()
    write.wait()


@functools.partial(jax.jit, static_argnames=("table_shape", "table_dtype",
                                             "window", "interpret"))
def window_pool_pallas_bwd(g: jnp.ndarray, origins: jnp.ndarray,
                           wy: jnp.ndarray, wx: jnp.ndarray,
                           table_shape, table_dtype, window: int,
                           interpret: bool = False) -> jnp.ndarray:
    """dL/dtable for ``window_pool_pallas``.

    Feature-gradient only, like the reference ROIAlign backward
    (maskrcnn ``csrc/ROIAlign_cuda.cu`` computes grad_input, never
    grad_rois); the interpolation weights carry box-coordinate
    dependence and get zero cotangents upstream.  For well-conditioned
    accumulation train with a float32 table (``TPU.POOLER_DTYPE``).
    """
    n, s = wy.shape[:2]
    c = table_shape[-1]
    zeros = jnp.zeros(table_shape, table_dtype)
    kernel = functools.partial(_bwd_kernel, window=window, c=c)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, s, window), lambda i, o: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, window), lambda i, o: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, s, c), lambda i, o: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((window, window, c), table_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(table_shape, table_dtype),
        input_output_aliases={4: 0},    # zeros table buffer -> dtable
        interpret=interpret,
    )(origins, wy, wx, g.astype(jnp.float32), zeros)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _window_pool_vjp(table, origins, wy, wx, window: int,
                     channel_block: int, interpret: bool):
    return window_pool_pallas(table, origins, wy, wx, window,
                              channel_block, interpret)


def _window_pool_fwd(table, origins, wy, wx, window, channel_block,
                     interpret):
    out = window_pool_pallas(table, origins, wy, wx, window,
                             channel_block, interpret)
    # table rides along only for its static shape/dtype in bwd
    return out, (origins, wy, wx, table)


def _window_pool_bwd(window, channel_block, interpret, res, g):
    origins, wy, wx, table = res
    dtable = window_pool_pallas_bwd(g, origins, wy, wx, table.shape,
                                    table.dtype, window,
                                    interpret=interpret)
    # feature-only gradient (reference ROIAlign backward parity)
    return (dtable, jnp.zeros_like(origins), jnp.zeros_like(wy),
            jnp.zeros_like(wx))


_window_pool_vjp.defvjp(_window_pool_fwd, _window_pool_bwd)


def window_pool(table, origins, wy, wx, window: int,
                channel_block: int = 128, interpret: bool = False):
    """Differentiable window pooling: Pallas forward + Pallas scatter
    backward (feature-gradient only, like the reference ROIAlign)."""
    return _window_pool_vjp(table, origins, wy, wx, window, channel_block,
                            interpret)


@functools.partial(jax.jit, static_argnames=("window", "channel_block",
                                             "interpret"))
def window_pool_pallas(table: jnp.ndarray, origins: jnp.ndarray,
                       wy: jnp.ndarray, wx: jnp.ndarray, window: int,
                       channel_block: int = 128,
                       interpret: bool = False) -> jnp.ndarray:
    """Pooling samples (pre bin-average).

    Args:
      table: [R, Wmax, C] stacked levels (row/col padded so any window
        slice is in bounds).  DMA slices on the lane dim must be
        128-aligned, so C must be a multiple of 128 (cast/pad upstream).
      origins: [N, 2] int32 (absolute row, col) window origins; columns
        8-aligned.
      wy/wx: [N, S, window] dense interpolation weights.

    Returns [N, S, S, C] float32 interpolated samples.
    """
    del channel_block  # full-channel windows; kept for API stability
    n, s = wy.shape[:2]
    c = table.shape[-1]
    # double-buffer when two windows comfortably fit VMEM
    n_buf = 2 if 2 * window * window * c * table.dtype.itemsize \
        <= 9 * 2 ** 20 else 1

    kernel = functools.partial(_kernel, window=window, c=c, n_buf=n_buf)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, s, window), lambda i, o: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, window), lambda i, o: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, s, s, c), lambda i, o: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_buf, window, window, c), table.dtype),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, s, s, c), jnp.float32),
        interpret=interpret,
    )(origins, wy, wx, table)
