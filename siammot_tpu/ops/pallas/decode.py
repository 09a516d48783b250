"""Pallas fused EMM response decode: upsample + penalize + argmax in VMEM.

The reference decodes track propagation by bicubically upsampling the
response maps x16 and arg-maxing a penalized confidence
(``/root/reference/siammot/modelling/track_head/EMM/track_core.py:69-135``).
The XLA fused path (``models/emm.py:decode_response_fused``) already
collapses 7 upsampled channels to 4, but still materializes
[K, 256, 256, 4] f32 in HBM (~134 MB at K=128) just to take one argmax
per track.  This kernel computes the 4 upsampled channels per track as
MXU matmuls (``U @ X @ U^T``), forms the penalized confidence, and
reduces it to (argmax index, classification score) without the response
ever leaving VMEM — HBM sees only the [K, 4, 16, 16] input and two
scalars per track.

Grid: one program per track slot.  The box-regression-at-argmax and
image-space location math stay in XLA (``decode_response_fused``'s
epilogue, shared with the fallback path — [K]-sized, cheap).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_kernel(i, x4_ref, u_ref, ut_ref, win_ref, wh_ref, idx_ref,
                   score_ref, *, sigma: float, use_centerness: bool,
                   s_hi: int):
    """``wh_ref`` is the FULL [1, 2K] SMEM row ([w0, h0, w1, h1, ...]);
    ``idx_ref``/``score_ref`` are full [1, K] SMEM rows — per-slot (1, 2)
    and (1, 1) blocks violate Mosaic's (8, 128) block tiling, so every
    program addresses its own column.  ``i`` is the program id, passed in
    by the wrapper (calling ``pl.program_id`` inside a ``pl.when`` branch
    has no interpret-mode lowering)."""
    hi = jax.lax.Precision.HIGHEST

    def up(c):
        # U [S_hi, S] @ X_c [S, S] @ U^T [S, S_hi] — full-f32 MXU passes to
        # match the XLA path's precision=HIGHEST einsums
        t = jax.lax.dot_general(u_ref[...], x4_ref[0, c],
                                (((1,), (0,)), ((), ())), precision=hi,
                                preferred_element_type=jnp.float32)
        return jax.lax.dot_general(t, ut_ref[...],
                                   (((1,), (0,)), ((), ())), precision=hi,
                                   preferred_element_type=jnp.float32)

    cls_prob = jax.nn.sigmoid(up(0))
    conf = cls_prob * jax.nn.sigmoid(up(1)) if use_centerness else cls_prob

    # raw IEEE divisions (reference semantics — zero/negative upsampled
    # reg values carry meaning; see models/emm.py decode_response)
    # zero extents only on dead slots (see models/emm.py decode_response)
    bw = jnp.where(wh_ref[0, 2 * i] == 0, 1.0, wh_ref[0, 2 * i])
    bh = jnp.where(wh_ref[0, 2 * i + 1] == 0, 1.0, wh_ref[0, 2 * i + 1])
    scale_w = up(2) / bw
    scale_h = up(3) / bh
    scale_w = jnp.maximum(scale_w, 1.0 / scale_w)
    scale_h = jnp.maximum(scale_h, 1.0 / scale_h)
    penalty = jnp.exp((-scale_w * scale_h + 1.0) * 0.1)

    p_conf = conf * penalty * (1.0 - sigma) + sigma * win_ref[...]

    # first-occurrence argmax (row-major), matching jnp.argmax
    m = jnp.max(p_conf)
    ii = jax.lax.broadcasted_iota(jnp.int32, (s_hi, s_hi), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (s_hi, s_hi), 1)
    flat = ii * s_hi + jj
    idx = jnp.min(jnp.where(p_conf == m, flat, s_hi * s_hi))
    idx_ref[0, i] = idx
    score_ref[0, i] = jnp.max(jnp.where(flat == idx, cls_prob,
                                        -jnp.float32(jnp.inf)))


def _decode_kernel_striped(prog, x4_ref, u_ref, ut_ref, win_ref, wh_ref,
                           idx_ref, score_ref, *, sigma: float,
                           use_centerness: bool, s_hi: int, stripe: int):
    """Row-striped variant for large upsampled maps (AOT's SEARCH_REGION=5
    gives 976x976 — several full maps would blow scoped VMEM).  Keeps the
    un-striped kernel's contraction order ((U @ X) row-block @ U^T), so
    every cell is bitwise-identical to it; the penalized argmax becomes a
    running (max, first-index, cls-at-max) over stripes (strict ``>``
    keeps the earliest stripe on ties — jnp.argmax's first-occurrence
    order)."""
    hi = jax.lax.Precision.HIGHEST

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   precision=hi,
                                   preferred_element_type=jnp.float32)

    x4 = [x4_ref[0, c] for c in range(4)]                   # [S, S]
    w = jnp.where(wh_ref[0, 2 * prog] == 0, 1.0, wh_ref[0, 2 * prog])
    h = jnp.where(wh_ref[0, 2 * prog + 1] == 0, 1.0,
                  wh_ref[0, 2 * prog + 1])
    big = jnp.int32(s_hi * s_hi)

    def body(k, carry):
        best_m, best_idx, best_cls = carry
        r0 = pl.multiple_of(k * stripe, 8)
        # slice the REF (values have no dynamic_slice lowering in Mosaic):
        # stripe rows of U @ X @ U^T, same per-row contraction order as
        # the whole-map kernel -> bitwise-equal cells
        u_rows = u_ref[pl.ds(r0, stripe), :]
        up = [dot(dot(u_rows, x4[c]), ut_ref[...])
              for c in range(4)]                            # [stripe, S_hi]
        cls_prob = jax.nn.sigmoid(up[0])
        conf = cls_prob * jax.nn.sigmoid(up[1]) if use_centerness \
            else cls_prob
        scale_w = up[2] / w
        scale_h = up[3] / h
        scale_w = jnp.maximum(scale_w, 1.0 / scale_w)
        scale_h = jnp.maximum(scale_h, 1.0 / scale_h)
        penalty = jnp.exp((-scale_w * scale_h + 1.0) * 0.1)
        win = win_ref[pl.ds(r0, stripe), :]
        p_conf = conf * penalty * (1.0 - sigma) + sigma * win

        m = jnp.max(p_conf)
        ii = jax.lax.broadcasted_iota(jnp.int32, (stripe, s_hi), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (stripe, s_hi), 1)
        flat = (ii + r0) * s_hi + jj
        idx = jnp.min(jnp.where(p_conf == m, flat, big))
        cls_at = jnp.max(jnp.where(flat == idx, cls_prob,
                                   -jnp.float32(jnp.inf)))
        better = m > best_m
        return (jnp.where(better, m, best_m),
                jnp.where(better, idx, best_idx),
                jnp.where(better, cls_at, best_cls))

    init = (-jnp.float32(jnp.inf), big, -jnp.float32(jnp.inf))
    _, idx, cls_at = jax.lax.fori_loop(0, s_hi // stripe, body, init)
    idx_ref[0, prog] = idx
    score_ref[0, prog] = cls_at


def _pick_stripe(s_hi: int) -> int:
    for d in (128, 64, 32, 16, 8):
        if s_hi % d == 0:
            return d
    raise ValueError(f"s_hi={s_hi} has no multiple-of-8 stripe divisor")


def _plain_kernel(body):
    def kernel(*refs):
        body(pl.program_id(0), *refs)
    return kernel


def _gated_kernel(body):
    """Scalar-prefetch dead-slot gate: invalid slots write (0, 0)."""
    def kernel(valid_ref, x4_ref, u_ref, ut_ref, win_ref, wh_ref, idx_ref,
               score_ref):
        i = pl.program_id(0)

        @pl.when(valid_ref[i] != 0)
        def _():
            body(i, x4_ref, u_ref, ut_ref, win_ref, wh_ref, idx_ref,
                 score_ref)

        @pl.when(valid_ref[i] == 0)
        def _():
            idx_ref[0, i] = jnp.int32(0)
            score_ref[0, i] = jnp.float32(0.0)

    return kernel


@functools.partial(jax.jit, static_argnames=("sigma", "use_centerness",
                                             "up_scale", "stripe",
                                             "interpret"))
def emm_decode_pallas(x4, wh, u, window, valid=None, *, sigma: float,
                      use_centerness: bool, up_scale: int,
                      stripe: int | None = None,
                      interpret: bool = False):
    """Penalized-confidence argmax over the upsampled response.

    Args:
      x4: [K, 4, S, S] f32 — (cls logit difference, centerness logit,
        l+r, t+b) response channels (bicubic upsampling is linear, so
        these upsample instead of the raw 7; see decode_response_fused).
      wh: [K, 2] f32 template box extents.
      u: [S*up_scale, S] f32 bicubic interpolation matrix.
      window: [S*up_scale, S*up_scale] f32 Hann window.
      valid: optional [K] bool — dead track slots skip the decode and
        emit (idx 0, score 0); consumers mask on occupancy (PARITY.md).

    Returns (idx [K] int32 flat argmax in the upsampled map,
             score [K] f32 cls probability at the argmax).
    """
    k, _, s_lo, _ = x4.shape
    s_hi = s_lo * up_scale
    # whole-map kernel up to 512 (several [s_hi, s_hi] f32 maps live in
    # VMEM); row-striped beyond (bitwise-equal cells, running argmax).
    # ``stripe`` forces the striped path (tests).
    if stripe is None and s_hi > 512:
        stripe = _pick_stripe(s_hi)
    if stripe is not None:
        body = functools.partial(_decode_kernel_striped, sigma=float(sigma),
                                 use_centerness=bool(use_centerness),
                                 s_hi=s_hi, stripe=int(stripe))
    else:
        body = functools.partial(_decode_kernel, sigma=float(sigma),
                                 use_centerness=bool(use_centerness),
                                 s_hi=s_hi)

    # wh rides as one [1, 2K] SMEM row and (idx, score) come back as
    # [1, K] SMEM rows — full-array blocks (block == array always passes
    # Mosaic's (8, 128) tiling check); each program addresses column
    # ``program_id`` (see tests/test_pallas_lowering.py)
    args = (x4.astype(jnp.float32), u, jnp.transpose(u), window,
            jnp.asarray(wh, jnp.float32).reshape(1, 2 * k))
    block_shapes = [(1, 4, s_lo, s_lo), (s_hi, s_lo), (s_lo, s_hi),
                    (s_hi, s_hi), (1, 2 * k)]
    slot_major = [True, False, False, False, False]
    smem = [False, False, False, False, True]
    out_shape = [jax.ShapeDtypeStruct((1, k), jnp.int32),
                 jax.ShapeDtypeStruct((1, k), jnp.float32)]

    def spec(shape, per_slot, extra_scalar, in_smem=False):
        nd = len(shape)
        if per_slot:
            idx_map = (lambda i, v: (i,) + (0,) * (nd - 1)) \
                if extra_scalar else (lambda i: (i,) + (0,) * (nd - 1))
        else:
            idx_map = (lambda i, v: (0,) * nd) if extra_scalar \
                else (lambda i: (0,) * nd)
        return pl.BlockSpec(shape, idx_map,
                            memory_space=pltpu.SMEM if in_smem
                            else pltpu.VMEM)

    out_spec = lambda xs: spec((1, k), False, xs, in_smem=True)  # noqa
    if valid is None:
        idx, score = pl.pallas_call(
            _plain_kernel(body), grid=(k,),
            in_specs=[spec(s, m, False, ms)
                      for s, m, ms in zip(block_shapes, slot_major, smem)],
            out_specs=[out_spec(False)] * 2,
            out_shape=out_shape, interpret=interpret)(*args)
    else:
        idx, score = pl.pallas_call(
            _gated_kernel(body),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(k,),
                in_specs=[spec(s, m, True, ms)
                          for s, m, ms in zip(block_shapes, slot_major,
                                              smem)],
                out_specs=[out_spec(True)] * 2),
            out_shape=out_shape, interpret=interpret,
        )(valid.astype(jnp.int32), *args)
    return idx[0], score[0]
