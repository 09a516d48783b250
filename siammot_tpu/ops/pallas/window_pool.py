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
