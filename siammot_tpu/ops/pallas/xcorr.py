"""Pallas fused depthwise cross-correlation.

The hot op of EMM track propagation (reference ``EMM/xcorr.py:37-46``
runs it as a groups=B*C cuDNN conv).  The pure-XLA fallback
(``ops/xcorr.py``) lowers to Ht*Wt shifted multiply-adds whose [B, Ho,
Wo, C] temporaries round-trip HBM on every step (~11 GB of traffic at
bench shapes).  This kernel keeps one track's search region + template
resident in VMEM and runs the whole Ht x Wt shift-and-MAC on the VPU with
a single output write — the response tile is [Ho, Wo, C=128] so the
C-lane dimension fills the vector lanes exactly.

Grid: one program per batch row (track slot / training pair).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _xcorr_kernel(search_ref, template_ref, out_ref, *, ht: int, wt: int,
                  ho: int, wo: int):
    search = search_ref[0].astype(jnp.float32)      # [Hs, Ws, C]
    template = template_ref[0].astype(jnp.float32)  # [Ht, Wt, C]
    c = search.shape[-1]
    acc = jnp.zeros((ho, wo, c), jnp.float32)
    for i in range(ht):
        for j in range(wt):
            acc = acc + search[i:i + ho, j:j + wo, :] * template[i, j, :]
    out_ref[0] = acc.astype(out_ref.dtype)


def _xcorr_kernel_masked(valid_ref, search_ref, template_ref, out_ref, *,
                         ht: int, wt: int, ho: int, wo: int):
    """Dead (invalid) track slots skip the Ht*Wt MAC and write zeros —
    identical output, since their pooled inputs are already zeroed."""
    i = pl.program_id(0)

    @pl.when(valid_ref[i] != 0)
    def _():
        _xcorr_kernel(search_ref, template_ref, out_ref, ht=ht, wt=wt,
                      ho=ho, wo=wo)

    @pl.when(valid_ref[i] == 0)
    def _():
        c = search_ref.shape[-1]
        out_ref[0] = jnp.zeros((ho, wo, c), out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def xcorr_depthwise_pallas(search: jnp.ndarray, template: jnp.ndarray,
                           valid: jnp.ndarray | None = None,
                           interpret: bool = False) -> jnp.ndarray:
    """[B, Hs, Ws, C] x [B, Ht, Wt, C] -> [B, Hs-Ht+1, Ws-Wt+1, C].

    ``valid`` ([B] bool, optional) marks live slots; dead slots skip their
    shift-and-MAC entirely (inference fast path over fixed-capacity track
    slots, where occupancy is usually far below capacity).
    """
    b, hs, ws, c = search.shape
    _, ht, wt, _ = template.shape
    ho, wo = hs - ht + 1, ws - wt + 1

    in_specs = [
        pl.BlockSpec((1, hs, ws, c), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ht, wt, c), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = pl.BlockSpec((1, ho, wo, c), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, ho, wo, c), jnp.float32)

    if valid is None:
        kernel = functools.partial(_xcorr_kernel, ht=ht, wt=wt, ho=ho, wo=wo)
        return pl.pallas_call(kernel, grid=(b,), in_specs=in_specs,
                              out_specs=out_specs, out_shape=out_shape,
                              interpret=interpret)(search, template)

    kernel = functools.partial(_xcorr_kernel_masked, ht=ht, wt=wt, ho=ho,
                               wo=wo)
    # index maps under scalar prefetch also receive the scalar ref
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(b,),
            in_specs=[
                pl.BlockSpec((1, hs, ws, c), lambda i, v: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ht, wt, c), lambda i, v: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, ho, wo, c), lambda i, v: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)),
        out_shape=out_shape,
        interpret=interpret,
    )(valid.astype(jnp.int32), search, template)
