"""Depthwise cross-correlation.

TPU-native equivalent of the reference's ``xcorr_depthwise``
(``EMM/xcorr.py:37-46``), which reshapes a [B, C, Hs, Ws] search-region
stack into a groups=B*C conv2d.  Grouped conv with singleton channels is a
poor fit for the MXU; here the op is a channels-last shift-and-MAC: the
template slides over the search region as Ht*Wt fused multiply-adds over
[B, Ho, Wo, C] tiles, which the VPU executes with C=128 lanes at full
width.  A fused Pallas kernel (``ops/pallas/xcorr.py``) implements the same
contraction with the search region resident in VMEM; this module provides
the pure-XLA reference used as fallback and in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def xcorr_depthwise_auto(search: jnp.ndarray,
                         template: jnp.ndarray) -> jnp.ndarray:
    """Dispatch: fused Pallas kernel on TPU, pure-XLA fallback elsewhere
    (CPU-mesh tests / dryruns run the same numerics via the fallback).

    Carries a custom VJP (Pallas kernels have none): with
    ``out[p] = sum_i s[p+i] * t[i]`` per (batch, channel) lane,

      * d_t = xcorr(s, g)                       — g slides over the search;
      * d_s[y] = sum_i g[y-i] * t[i]            — a depthwise *convolution*,
        i.e. xcorr of zero-padded g with the spatially flipped template.
    """
    return _xcorr_impl(search, template)


def _xcorr_impl(search, template):
    if jax.default_backend() in ("tpu", "axon"):
        from .pallas.xcorr import xcorr_depthwise_pallas
        return xcorr_depthwise_pallas(search, template)
    return xcorr_depthwise(search, template)


def _xcorr_fwd(search, template):
    return _xcorr_impl(search, template), (search, template)


def _xcorr_bwd(res, g):
    search, template = res
    _, ht, wt, _ = template.shape
    d_template = _xcorr_impl(search, g).astype(template.dtype)
    g_pad = jnp.pad(g, ((0, 0), (ht - 1, ht - 1), (wt - 1, wt - 1), (0, 0)))
    d_search = _xcorr_impl(g_pad,
                           template[:, ::-1, ::-1, :]).astype(search.dtype)
    return d_search, d_template


xcorr_depthwise_auto.defvjp(_xcorr_fwd, _xcorr_bwd)


def xcorr_depthwise_masked(search: jnp.ndarray, template: jnp.ndarray,
                           valid: jnp.ndarray) -> jnp.ndarray:
    """Inference-only variant: dead track slots (``valid`` False) skip
    their shift-and-MAC in the Pallas kernel.  Output is identical to the
    unmasked op because dead slots' pooled inputs are already zeroed (the
    window poolers zero invalid lanes); no VJP — the training path uses
    ``xcorr_depthwise_auto``."""
    if jax.default_backend() in ("tpu", "axon"):
        from .pallas.xcorr import xcorr_depthwise_pallas
        return xcorr_depthwise_pallas(search, template, valid)
    return xcorr_depthwise(search, template)


def xcorr_depthwise(search: jnp.ndarray, template: jnp.ndarray) -> jnp.ndarray:
    """Depthwise (per-sample, per-channel) cross-correlation.

    Args:
      search: [B, Hs, Ws, C] search-region features (NHWC).
      template: [B, Ht, Wt, C] template features.

    Returns:
      [B, Hs-Ht+1, Ws-Wt+1, C] response map (valid correlation).
    """
    b, hs, ws, c = search.shape
    _, ht, wt, _ = template.shape
    ho, wo = hs - ht + 1, ws - wt + 1

    # One tap per (i, j) template cell, accumulated by a lax.scan in the
    # same i-major order as the naive double loop (bitwise-identical f32
    # accumulation).  The scan exists for *compiler* reasons, not brevity:
    # unrolled, XLA is free to fuse the whole Ht*Wt shift-MAC chain into
    # downstream per-element consumers — e.g. the ROIAlign-backward
    # scatter-update producers in the training graph — re-evaluating the
    # entire chain per scatter row (observed 20x step slowdown on the CPU
    # mesh).  A loop region is opaque to fusion, so the response/gradient
    # is materialized exactly once.
    def tap(acc, ij):
        i, j = ij // wt, ij % wt
        window = jax.lax.dynamic_slice(search, (0, i, j, 0), (b, ho, wo, c))
        t = jax.lax.dynamic_slice(template, (0, i, j, 0), (b, 1, 1, c))
        return acc + window.astype(jnp.float32) * t.astype(jnp.float32), None

    acc = jnp.zeros((b, ho, wo, c), dtype=jnp.float32)
    acc, _ = jax.lax.scan(tap, acc, jnp.arange(ht * wt))
    return acc.astype(search.dtype)
