"""Pallas fused EMM predictor: conv towers + GroupNorm + heads per track
slot, dead slots skipped.

The reference's EMM predictor (``EMM/feature_extractor.py:43-68``) runs
two 3x3 conv+GN(32)+ReLU towers over the [K, 16, 16, C] correlation
response, then 3x3 heads (2-ch cls, 1-ch centerness, 4-ch regression).
On TPU the XLA formulation processes all K fixed-capacity slots even
though occupancy is usually far below capacity, and the tiny 16x16
spatial extent tiles the conv poorly.  This kernel runs one program per
slot with everything resident in VMEM:

  - 3x3 convs as 9 shifted [S*S, C] x [C, Cout] MXU matmuls over a
    zero-padded copy of the response (f32 accumulation),
  - GroupNorm stats via indicator matmuls (row-sum -> per-group sum ->
    broadcast back), float32, flax ``use_fast_variance`` semantics
    (var = E[x^2] - E[x]^2),
  - dead (invalid) slots skip all of it and write zeros (downstream
    consumers mask on ``TrackState.occupied``; the XLA path instead
    produces constant bias maps there — equally meaningless).

Intermediate activations never touch HBM; outputs are f32 (the XLA path
rounds logits to the compute dtype before the f32 upcast — the kernel's
accumulators are strictly more precise).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv9(xp, w, s: int, out_dtype):
    """Sum of 9 shifted [S*S, Cin] @ [Cin, Cout] taps, f32 accumulation.

    xp: [S+2, S+2, Cin] zero-padded input; w: [3, 3, Cin, Cout].
    """
    cin = xp.shape[-1]
    cout = w.shape[-1]
    acc = jnp.zeros((s * s, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            win = jax.lax.slice(xp, (dy, dx, 0), (dy + s, dx + s, cin))
            acc = acc + jax.lax.dot_general(
                win.reshape(s * s, cin), w[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return acc.astype(out_dtype)


def _pad1(x, s: int, c: int):
    """[S, S, C] -> [S+2, S+2, C] zero border (SAME padding for 3x3).

    Built from concatenates: ``dynamic_update_slice`` has no Mosaic
    lowering rule (found via jax.export cross-lowering; see
    tests/test_pallas_lowering.py)."""
    zrow = jnp.zeros((1, s, c), x.dtype)
    x = jnp.concatenate([zrow, x, zrow], axis=0)
    zcol = jnp.zeros((s + 2, 1, c), x.dtype)
    return jnp.concatenate([zcol, x, zcol], axis=1)


def _group_norm(y, scale, bias, groups: int, eps: float):
    """Flax GroupNorm over a [S*S, C] f32 tower output (stats in f32,
    var = E[x^2] - E[x]^2, y' = (y - mean) * rsqrt(var + eps) * scale
    + bias)."""
    n, c = y.shape
    gs = c // groups
    ones = jnp.ones((1, n), jnp.float32)
    sum_c = jax.lax.dot_general(ones, y, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    sq_c = jax.lax.dot_general(ones, y * y, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    # channel -> group indicator [C, G] (contiguous gs-channel groups,
    # matching flax's (..., G, C//G) reshape)
    cc = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gg = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    ind = (cc // gs == gg).astype(jnp.float32)
    dot = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    cnt = float(n * gs)
    mean_g = dot(sum_c, ind) / cnt                       # [1, G]
    var_g = dot(sq_c, ind) / cnt - mean_g * mean_g
    mean_c = dot(mean_g, ind.T)                          # [1, C]
    rstd_c = dot(jax.lax.rsqrt(var_g + eps), ind.T)
    return (y - mean_c) * rstd_c * scale + bias


def _predictor_kernel(valid_ref, x_ref, wct_ref, bct_ref, sct_ref, oct_ref,
                      wrt_ref, brt_ref, srt_ref, ort_ref, wa_ref, ba_ref,
                      wb_ref, bb_ref, cls_ref, ctr_ref, reg_ref, *,
                      s: int, groups: int, eps: float):
    i = pl.program_id(0)

    @pl.when(valid_ref[i] != 0)
    def _():
        x = x_ref[0]                                     # [S, S, C]
        c = x.shape[-1]
        xp = _pad1(x, s, c)
        dt = x.dtype

        def tower(w_ref, b_ref, s_ref, o_ref):
            y = _conv9(xp, w_ref[...], s, jnp.float32)
            y = y + b_ref[...].astype(jnp.float32)
            y = _group_norm(y, s_ref[...].astype(jnp.float32),
                            o_ref[...].astype(jnp.float32), groups, eps)
            y = jnp.maximum(y, 0.0).astype(dt)
            return _pad1(y.reshape(s, s, c), s, c)

        cls_x = tower(wct_ref, bct_ref, sct_ref, oct_ref)
        reg_x = tower(wrt_ref, brt_ref, srt_ref, ort_ref)

        # cls(2) + centerness(1) share the cls tower -> one [C, 3] head
        out_a = _conv9(cls_x, wa_ref[...], s, jnp.float32) \
            + ba_ref[...].astype(jnp.float32)
        out_b = _conv9(reg_x, wb_ref[...], s, jnp.float32) \
            + bb_ref[...].astype(jnp.float32)
        cls_ref[0] = out_a[:, :2].reshape(s, s, 2)
        ctr_ref[0] = out_a[:, 2:3].reshape(s, s, 1)
        reg_ref[0] = jnp.maximum(out_b, 0.0).reshape(s, s, 4)

    @pl.when(valid_ref[i] == 0)
    def _():
        cls_ref[0] = jnp.zeros((s, s, 2), cls_ref.dtype)
        ctr_ref[0] = jnp.zeros((s, s, 1), ctr_ref.dtype)
        reg_ref[0] = jnp.zeros((s, s, 4), reg_ref.dtype)


def _conv9b(xp, w, b: int, s: int, out_dtype):
    """Block version of ``_conv9``: 9 shifted [B*S*S, Cin] @ [Cin, Cout]
    taps over a [B, S+2, S+2, Cin] zero-padded block, f32 accumulation.
    One matmul per tap with B*S*S rows instead of S*S — the per-slot
    kernel's 256-row matmuls under-fill the MXU (roofline r5: 8.1% MXU);
    batching slots multiplies the row count by the block size."""
    cin = xp.shape[-1]
    cout = w.shape[-1]
    acc = jnp.zeros((b * s * s, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            win = jax.lax.slice(xp, (0, dy, dx, 0),
                                (b, dy + s, dx + s, cin))
            acc = acc + jax.lax.dot_general(
                win.reshape(b * s * s, cin), w[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return acc.astype(out_dtype)


def _pad1b(x, b: int, s: int, c: int):
    """[B, S, S, C] -> [B, S+2, S+2, C] zero border."""
    zrow = jnp.zeros((b, 1, s, c), x.dtype)
    x = jnp.concatenate([zrow, x, zrow], axis=1)
    zcol = jnp.zeros((b, s + 2, 1, c), x.dtype)
    return jnp.concatenate([zcol, x, zcol], axis=2)


def _group_norm_b(y, scale, bias, b: int, groups: int, eps: float):
    """Per-slot GroupNorm over a [B*S*S, C] f32 block tower output
    (same math as ``_group_norm``, stats per slot)."""
    n = y.shape[0] // b
    c = y.shape[-1]
    gs = c // groups
    yb = y.reshape(b, n, c)
    sum_c = jnp.sum(yb, axis=1)                          # [B, C]
    sq_c = jnp.sum(yb * yb, axis=1)
    cc = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gg = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    ind = (cc // gs == gg).astype(jnp.float32)
    dot = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    cnt = float(n * gs)
    mean_g = dot(sum_c, ind) / cnt                       # [B, G]
    var_g = dot(sq_c, ind) / cnt - mean_g * mean_g
    mean_c = dot(mean_g, ind.T)                          # [B, C]
    rstd_c = dot(jax.lax.rsqrt(var_g + eps), ind.T)
    out = (yb - mean_c[:, None]) * rstd_c[:, None] * scale + bias
    return out.reshape(b * n, c)


def _predictor_kernel_blocked(valid_ref, x_ref, wct_ref, bct_ref, sct_ref,
                              oct_ref, wrt_ref, brt_ref, srt_ref, ort_ref,
                              wa_ref, ba_ref, wb_ref, bb_ref, cls_ref,
                              ctr_ref, reg_ref, *, b: int, s: int,
                              groups: int, eps: float):
    i = pl.program_id(0)
    live = 0
    for t in range(b):
        live += valid_ref[i * b + t]

    @pl.when(live > 0)
    def _():
        x = x_ref[...]                                   # [B, S, S, C]
        c = x.shape[-1]
        xp = _pad1b(x, b, s, c)
        dt = x.dtype

        def tower(w_ref, b_ref, s_ref, o_ref):
            y = _conv9b(xp, w_ref[...], b, s, jnp.float32)
            y = y + b_ref[...].astype(jnp.float32)
            y = _group_norm_b(y, s_ref[...].astype(jnp.float32),
                              o_ref[...].astype(jnp.float32), b, groups,
                              eps)
            y = jnp.maximum(y, 0.0).astype(dt)
            return _pad1b(y.reshape(b, s, s, c), b, s, c)

        cls_x = tower(wct_ref, bct_ref, sct_ref, oct_ref)
        reg_x = tower(wrt_ref, brt_ref, srt_ref, ort_ref)

        out_a = _conv9b(cls_x, wa_ref[...], b, s, jnp.float32) \
            + ba_ref[...].astype(jnp.float32)
        out_b = _conv9b(reg_x, wb_ref[...], b, s, jnp.float32) \
            + bb_ref[...].astype(jnp.float32)
        # dead lanes inside a live block still emit zeros (parity with
        # the per-slot kernel)
        lane = jax.lax.broadcasted_iota(jnp.int32, (b, 1, 1, 1), 0)
        mask = jnp.zeros((b, 1, 1, 1), jnp.float32)
        for t in range(b):
            mask = mask + jnp.where(lane == t,
                                    (valid_ref[i * b + t] != 0)
                                    .astype(jnp.float32), 0.0)
        cls_ref[...] = out_a[:, :2].reshape(b, s, s, 2) * mask
        ctr_ref[...] = out_a[:, 2:3].reshape(b, s, s, 1) * mask
        reg_ref[...] = jnp.maximum(out_b, 0.0).reshape(b, s, s, 4) * mask

    @pl.when(live == 0)
    def _():
        cls_ref[...] = jnp.zeros((b, s, s, 2), cls_ref.dtype)
        ctr_ref[...] = jnp.zeros((b, s, s, 1), ctr_ref.dtype)
        reg_ref[...] = jnp.zeros((b, s, s, 4), reg_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "block",
                                             "interpret"))
def emm_predictor_pallas_blocked(response, valid, params, *,
                                 groups: int = 32, eps: float = 1e-5,
                                 block: int = 8, interpret: bool = False):
    """Slot-block variant of :func:`emm_predictor_pallas`: one program
    per ``block`` slots, so the tap matmuls carry block*S*S rows (the
    per-slot kernel's [S*S, C] matmuls run the MXU at ~8%).  Because the
    step compacts live tracks to the slot prefix (``top_k`` in
    ``forward_inference``), whole blocks past the occupancy boundary
    still skip all compute.
    """
    k, s, _, c = response.shape
    b = block
    assert k % b == 0, (k, b)
    dt = response.dtype

    def p2(a):
        return jnp.asarray(a).reshape(1, -1)

    wa = jnp.concatenate([params["cls"]["kernel"],
                          params["center"]["kernel"]], axis=-1).astype(dt)
    ba = jnp.concatenate([params["cls"]["bias"],
                          params["center"]["bias"]]).reshape(1, 3)
    args = (
        response,
        params["cls_tower_conv"]["kernel"].astype(dt),
        p2(params["cls_tower_conv"]["bias"]),
        p2(params["cls_tower_gn"]["scale"]),
        p2(params["cls_tower_gn"]["bias"]),
        params["reg_tower_conv"]["kernel"].astype(dt),
        p2(params["reg_tower_conv"]["bias"]),
        p2(params["reg_tower_gn"]["scale"]),
        p2(params["reg_tower_gn"]["bias"]),
        wa, ba,
        params["reg"]["kernel"].astype(dt),
        p2(params["reg"]["bias"]),
    )

    def bcast(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, v, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    in_specs = [pl.BlockSpec((b, s, s, c), lambda i, v: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [bcast(a.shape) for a in args[1:]]
    out_specs = [
        pl.BlockSpec((b, s, s, 2), lambda i, v: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((b, s, s, 1), lambda i, v: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((b, s, s, 4), lambda i, v: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    kernel = functools.partial(_predictor_kernel_blocked, b=b, s=s,
                               groups=groups, eps=eps)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(k // b,), in_specs=in_specs,
            out_specs=out_specs),
        out_shape=[
            jax.ShapeDtypeStruct((k, s, s, 2), jnp.float32),
            jax.ShapeDtypeStruct((k, s, s, 1), jnp.float32),
            jax.ShapeDtypeStruct((k, s, s, 4), jnp.float32),
        ],
        interpret=interpret,
    )(valid.astype(jnp.int32), *args)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "interpret"))
def emm_predictor_pallas(response, valid, params, *, groups: int = 32,
                         eps: float = 1e-5, interpret: bool = False):
    """Masked fused predictor over [K, S, S, C] responses.

    Args:
      response: [K, S, S, C] correlation response (any float dtype; taps
        run in this dtype on the MXU with f32 accumulation).
      valid: [K] bool — dead slots skip compute and emit zeros.
      params: the flax ``EMMPredictor`` param subtree
        ({cls_tower_conv: {kernel, bias}, cls_tower_gn: {scale, bias},
        reg_tower_conv, reg_tower_gn, cls, center, reg}), already cast
        to the compute dtype.

    Returns (cls [K,S,S,2], center [K,S,S,1], reg [K,S,S,4]), float32.
    """
    k, s, _, c = response.shape
    dt = response.dtype

    def p2(a):          # [C] -> [1, C] (Mosaic wants >= 2D operands)
        return jnp.asarray(a).reshape(1, -1)

    wa = jnp.concatenate([params["cls"]["kernel"],
                          params["center"]["kernel"]], axis=-1).astype(dt)
    ba = jnp.concatenate([params["cls"]["bias"],
                          params["center"]["bias"]]).reshape(1, 3)
    args = (
        response,
        params["cls_tower_conv"]["kernel"].astype(dt),
        p2(params["cls_tower_conv"]["bias"]),
        p2(params["cls_tower_gn"]["scale"]),
        p2(params["cls_tower_gn"]["bias"]),
        params["reg_tower_conv"]["kernel"].astype(dt),
        p2(params["reg_tower_conv"]["bias"]),
        p2(params["reg_tower_gn"]["scale"]),
        p2(params["reg_tower_gn"]["bias"]),
        wa, ba,
        params["reg"]["kernel"].astype(dt),
        p2(params["reg"]["bias"]),
    )

    def bcast(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, v, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    in_specs = [pl.BlockSpec((1, s, s, c), lambda i, v: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [bcast(a.shape) for a in args[1:]]
    out_specs = [
        pl.BlockSpec((1, s, s, 2), lambda i, v: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s, s, 1), lambda i, v: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s, s, 4), lambda i, v: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    kernel = functools.partial(_predictor_kernel, s=s, groups=groups,
                               eps=eps)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(k,), in_specs=in_specs,
            out_specs=out_specs),
        out_shape=[
            jax.ShapeDtypeStruct((k, s, s, 2), jnp.float32),
            jax.ShapeDtypeStruct((k, s, s, 1), jnp.float32),
            jax.ShapeDtypeStruct((k, s, s, 4), jnp.float32),
        ],
        interpret=interpret,
    )(valid.astype(jnp.int32), *args)
