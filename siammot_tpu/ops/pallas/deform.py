"""Pallas deformable-conv (DCNv1) forward: tile-resident bilinear
sampling + tap matmuls, no HBM gather traffic.

The XLA formulations in ``ops/deform_conv.py`` are exact but gather-
bound: the best ("patch") materializes a [B,Ho,Wo,9,2,2,C] corner tensor
in HBM (~270 MB/layer at DLA stage-3 shapes) and runs DLA-102-DCN at
29.3 FPS vs 77.4 for the plain body.  TPU vector units have no per-lane
gather, so a kernel cannot index VMEM per-sample either — but for the
production offset regime (|offset| <= r, the same bounded-window premise
as the ``shiftwin`` formulation, with the same exact ``lax.cond``
fallback) sampling decomposes into machine-friendly pieces:

  * **rows**: the sampled row index ``py + dy + floor_y + corner`` spans
    a static window of 6 integer shifts; each shift is a STATIC slice of
    the VMEM tile on the (untiled) outer dimension — free on Mosaic.
  * **columns**: per output position the two corner columns form a
    dense one-hot-pair matrix ``OHX[px, w] = (1-fx)[w==x0] + fx[w==x0+1]``,
    so column interpolation is a batched [Wo, Wp] @ [Wp, C] MXU matmul
    (one per tap, batched over the tile's rows).
  * the 9 tap results hit the [C, Co] weight matmuls with f32
    accumulation, accumulated straight into the output block.

Each program owns ``th`` output rows: one DMA brings the haloed input
rows (th+8) into VMEM; everything else stays on-chip.  Cost per layer is
pure MXU work (9 taps x 6 row-shifts batched matmuls) instead of 36x
feature-bytes of HBM gather traffic.

Reference parity target: maskrcnn-benchmark ``csrc/deform_conv_cuda.cu``
(deformable im2col + GEMM), reached here without per-sample addressing.
Forward-only; the wrapper in ``ops/deform_conv.py`` routes gradients
through the exact patch-gather formulation via ``jax.custom_vjp``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# static geometry: 3x3 taps, stride 1, dilation 1 (the DLA-DCN config),
# offsets bounded to |o| <= R with exact fallback outside
R = 2                      # shift window radius (floor in [-R, R])
HALO = R + 2               # rows/cols of zero padding each side
N_SY = 2 * R + 2           # integer row shifts: floor + corner


def _kernel(x_ref, fly_ref, fy_ref, flx_ref, fx_ref, w_ref, out_ref,
            tile, sem, *, th: int, wo: int, wp: int, c: int, co: int,
            rows_per_image: int):
    i = pl.program_id(0)
    j = pl.program_id(1)

    # haloed input rows for this block: [th + 2*HALO, Wp, C] out of the
    # row-flattened [B*(Hp+2*HALO), Wp, C] padded input
    copy = pltpu.make_async_copy(
        x_ref.at[pl.ds(i * rows_per_image + j * th, th + 2 * HALO)],
        tile, sem)
    copy.start()
    copy.wait()

    # Mosaic's tpu.iota is integer-only: build int32 and cast (an f32
    # broadcasted_iota fails MLIR verification on the real chip)
    px = jax.lax.broadcasted_iota(jnp.int32, (th, wo, 1), 1
                                  ).astype(jnp.float32)
    wiota = jax.lax.broadcasted_iota(jnp.int32, (th, wo, wp), 2
                                     ).astype(jnp.float32)
    dt = tile.dtype
    acc = jnp.zeros((th * wo, co), jnp.float32)

    for t in range(9):
        dy, dx = t // 3 - 1, t % 3 - 1
        fly = fly_ref[0, t]                              # [th, Wo] f32
        fy = fy_ref[0, t]
        flx = flx_ref[0, t]
        fx = fx_ref[0, t]
        # column one-hot pair: sampled col = px + HALO + dx + flx (+1)
        tgt = px + (HALO + dx) + flx[..., None]
        ohx = (jnp.where(wiota == tgt, 1.0 - fx[..., None], 0.0)
               + jnp.where(wiota == tgt + 1.0, fx[..., None], 0.0)
               ).astype(dt)                              # [th, Wo, Wp]
        samp = jnp.zeros((th, wo, c), jnp.float32)
        for sy in range(-R, R + 2):
            # static row slice: tile rows rel + HALO + dy + sy
            src = tile[pl.ds(HALO + dy + sy, th)]        # [th, Wp, C]
            part = jax.lax.dot_general(
                ohx, src, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)      # [th, Wo, C]
            cy = (jnp.where(fly == sy, 1.0 - fy, 0.0)
                  + jnp.where(fly == sy - 1.0, fy, 0.0))  # [th, Wo]
            samp = samp + cy[..., None] * part
        acc = acc + jax.lax.dot_general(
            samp.reshape(th * wo, c).astype(dt), w_ref[t],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(th, wo, co).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def deform_conv_pallas(x: jnp.ndarray, offsets: jnp.ndarray,
                       kernel: jnp.ndarray,
                       interpret: bool = None) -> jnp.ndarray:
    """Bounded-offset DCNv1 forward (3x3, stride 1, dilation 1).

    Args:
      x: [B, H, W, C] input (C a multiple of 128 on hardware).
      offsets: [B, H, W, 18] tap-major (dy, dx) pairs with
        ``floor(offset)`` in [-R, R] (caller guarantees via the
        ``lax.cond`` in ``ops/deform_conv.py``; out-of-window offsets
        here sample zeros — WRONG values, which is why the caller must
        gate).
      kernel: [3, 3, C, Co] HWIO weights.

    Returns [B, H, W, Co] in x.dtype.
    """
    if interpret is None:       # run everywhere: interpret off-TPU
        interpret = jax.default_backend() not in ("tpu", "axon")
    b, h, w, c = x.shape
    co = kernel.shape[-1]
    th = 8
    nb = -(-h // th)
    hp = nb * th

    # zero padding implements the oob-corners-contribute-0 semantics of
    # the exact samplers for every in-window offset
    xp = jnp.pad(x, ((0, 0), (HALO, HALO + hp - h), (HALO, HALO),
                     (0, 0)))
    wp = w + 2 * HALO

    off = offsets.reshape(b, h, w, 9, 2)
    off = jnp.pad(off, ((0, 0), (0, hp - h), (0, 0), (0, 0), (0, 0)))
    oy = jnp.moveaxis(off[..., 0], 3, 1)                 # [B, 9, Hp, W]
    ox = jnp.moveaxis(off[..., 1], 3, 1)
    fly = jnp.floor(oy)
    flx = jnp.floor(ox)
    coeffs = (fly.astype(jnp.float32),
              (oy - fly).astype(jnp.float32),
              flx.astype(jnp.float32),
              (ox - flx).astype(jnp.float32))

    wflat = kernel.reshape(9, c, co).astype(x.dtype)

    grid = (b, nb)
    rows_per_image = hp + 2 * HALO
    coeff_spec = pl.BlockSpec((1, 9, th, w), lambda i, j: (i, 0, j, 0),
                              memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, th=th, wo=w, wp=wp, c=c, co=co,
                             rows_per_image=rows_per_image)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            coeff_spec, coeff_spec, coeff_spec, coeff_spec,
            pl.BlockSpec((9, c, co), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, co), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * HALO, wp, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp.reshape(b * rows_per_image, wp, c), *coeffs, wflat)
    return out[:, :h]
