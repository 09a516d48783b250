#!/usr/bin/env python3
"""Deformable-conv formulation shootout at DLA-102-DCN stage shapes.

DLA-102-DCN benches 21.6 FPS vs 77.4 for plain DLA-102
(readme/model_zoo.md): the gather-based DCNv1 (`ops/deform_conv.py`) is
the one kernel without a TPU-first redesign.  This measures, per DCN
stage shape (stages 3/4/5 of DLA-102 at 736x1280 input), where the time
actually goes and which exact reformulation wins:

  a) current: 4x take_along_axis corner gathers + rank-5 einsum
  b) patch-gather: ONE lax.gather of [2,2,C] patches per (pos, tap)
  c) onehot: bilinear one-hot [P*9, H*W] matmul (MXU instead of gather;
     only plausible for small H*W)
  d) split parts of (a): gather-only vs einsum-only, to locate the cost

Per-conv counts for DLA-102-DCN (levels (1,1,1,3,4,1), DCN on stages
3/4/5): 8 convs at stage3, 16 at stage4, 2 at stage5.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from siammot_tpu.ops.deform_conv import deform_conv2d, deform_sample


def timeit(fn, *args, iters=30):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1000.0


def coords(offsets, h, w, stride=1, dilation=1, kh=3):
    b, ho, wo, _ = offsets.shape
    pad = dilation * (kh - 1) // 2
    base_y = jnp.arange(ho) * stride - pad
    base_x = jnp.arange(wo) * stride - pad
    ty = jnp.repeat(jnp.arange(kh) * dilation, kh)
    tx = jnp.tile(jnp.arange(kh) * dilation, kh)
    gy = base_y[:, None, None] + ty[None, None, :]
    gx = base_x[None, :, None] + tx[None, None, :]
    off = offsets.reshape(b, ho, wo, kh * kh, 2)
    return gy[None] + off[..., 0], gx[None] + off[..., 1]


def gather_only(x, offsets):
    cy, cx = coords(offsets, x.shape[1], x.shape[2])
    return deform_sample(x, cy, cx)


def einsum_only(sampled, kernel):
    kh, kw, c, co = kernel.shape
    return jnp.einsum("bhwtc,tcd->bhwd", sampled,
                      kernel.reshape(kh * kw, c, co),
                      preferred_element_type=jnp.float32).astype(sampled.dtype)


def dcn_patch_gather(x, offsets, kernel):
    """ONE lax.gather of 2x2 patches per (pos, tap) + weight + matmul."""
    b, h, w, c = x.shape
    kh, kw, _, co = kernel.shape
    cy, cx = coords(offsets, h, w)
    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    fy = (cy - y0).astype(x.dtype)
    fx = (cx - x0).astype(x.dtype)
    iy = y0.astype(jnp.int32)
    ix = x0.astype(jnp.int32)
    bs, ho, wo, t = iy.shape
    n = ho * wo * t
    # patch start clamped fully in-bounds ([0, h-2] x [0, w-2]); an
    # in-bounds corner always lands on patch row/col {0, 1} after the
    # clamp (oob corners get weight 0), so no fill mode is needed
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

    patches = jax.vmap(one)(x, starts)                  # [B, N, 2, 2, C]

    # scatter the 4 corner weights onto patch coordinates: corner row
    # c_y maps to patch row c_y - sy (in {0,1} whenever c_y is in bounds)
    def ok(yi, xi):
        return ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)).astype(x.dtype)
    oy = (iy - sy).astype(jnp.int8)                     # {-1, 0, 1}
    ox = (ix - sx).astype(jnp.int8)
    corners = (
        ((1 - fy) * (1 - fx) * ok(iy, ix), oy, ox),
        ((1 - fy) * fx * ok(iy, ix + 1), oy, ox + 1),
        (fy * (1 - fx) * ok(iy + 1, ix), oy + 1, ox),
        (fy * fx * ok(iy + 1, ix + 1), oy + 1, ox + 1),
    )
    wp = jnp.zeros((bs, ho, wo, t, 2, 2), x.dtype)
    for a in range(2):
        for b_ in range(2):
            acc = sum(wv * ((ry == a) & (rx == b_)).astype(x.dtype)
                      for wv, ry, rx in corners)
            wp = wp.at[..., a, b_].set(acc)
    sampled = jnp.einsum("bnyxc,bnyx->bnc", patches,
                         wp.reshape(bs, n, 2, 2))
    sampled = sampled.reshape(bs, ho, wo, t * c)
    return jax.lax.dot_general(
        sampled.reshape(-1, t * c), kernel.reshape(t * c, co),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype).reshape(
            bs, ho, wo, co)


def dcn_onehot(x, offsets, kernel):
    """Bilinear one-hot [N, H*W] @ [H*W, C] — MXU does the gathering."""
    b, h, w, c = x.shape
    kh, kw, _, co = kernel.shape
    cy, cx = coords(offsets, h, w)
    bs, ho, wo, t = cy.shape
    n = ho * wo * t
    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    fy = cy - y0
    fx = cx - x0
    iy = y0.astype(jnp.int32).reshape(bs, n)
    ix = x0.astype(jnp.int32).reshape(bs, n)
    fy = fy.reshape(bs, n)
    fx = fx.reshape(bs, n)

    grid = jnp.arange(h * w, dtype=jnp.int32)

    def onehot_row(iyv, ixv, fyv, fxv):
        # [N, H*W] with <=4 nonzeros per row
        def corner(yy, xx, wv):
            okm = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
            idx = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
            return (grid[None, :] == idx[:, None]) * (
                wv * okm.astype(wv.dtype))[:, None]
        return (corner(iyv, ixv, (1 - fyv) * (1 - fxv))
                + corner(iyv, ixv + 1, (1 - fyv) * fxv)
                + corner(iyv + 1, ixv, fyv * (1 - fxv))
                + corner(iyv + 1, ixv + 1, fyv * fxv))

    oh = jax.vmap(onehot_row)(iy, ix, fy, fx).astype(jnp.bfloat16)
    sampled = jnp.einsum("bns,bsc->bnc", oh,
                         x.reshape(bs, h * w, c).astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
    sampled = sampled.astype(x.dtype).reshape(bs, ho, wo, t * c)
    return jax.lax.dot_general(
        sampled.reshape(-1, t * c), kernel.reshape(t * c, co),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype).reshape(
            bs, ho, wo, co)


# DLA-102-DCN stage shapes at 736x1280 (mid channels of the bottleneck)
SHAPES = [
    ("stage3 92x160 c128", 92, 160, 128, 8),
    ("stage4 46x80  c256", 46, 80, 256, 16),
    ("stage5 23x40  c512", 23, 40, 512, 2),
]


def main():
    rng = np.random.RandomState(0)
    total = {}
    for name, h, w, c, n_convs in SHAPES:
        x = jnp.asarray(rng.randn(1, h, w, c).astype(np.float32)
                        ).astype(jnp.bfloat16)
        k = jnp.asarray((rng.randn(3, 3, c, c) * 0.05).astype(np.float32)
                        ).astype(jnp.bfloat16)
        off = jnp.asarray((rng.randn(1, h, w, 18) * 2.0).astype(np.float32))

        fns = {
            "gather4": jax.jit(partial(deform_conv2d, impl="gather4")),
            "patch": jax.jit(partial(deform_conv2d, impl="patch")),
            "patch_local": jax.jit(dcn_patch_gather),
            # gather-free static shift window (r=2); measured twice: on
            # its fast path (small offsets) and through the lax.cond
            # fallback (these randn*2 offsets always exceed the window)
            "shiftwin_fb": jax.jit(partial(deform_conv2d, impl="shiftwin",
                                           shift_r=2)),
        }
        if h * w <= 4000:
            fns["onehot"] = jax.jit(dcn_onehot)

        off_small = off * 0.4                 # |off| well inside r=2
        ref = fns["gather4"](x, off, k)
        ref_small = fns["gather4"](x, off_small, k)
        line = [f"{name} x{n_convs:2d}"]
        for label, fn in fns.items():
            out = fn(x, off, k)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            ms = timeit(fn, x, off, k)
            total.setdefault(label, 0.0)
            total[label] += ms * n_convs
            line.append(f"{label} {ms:7.3f} ms (err {err:.1e})")
        out = fns["shiftwin_fb"](x, off_small, k)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref_small.astype(jnp.float32))))
        ms = timeit(fns["shiftwin_fb"], x, off_small, k)
        total.setdefault("shiftwin", 0.0)
        total["shiftwin"] += ms * n_convs
        line.append(f"shiftwin {ms:7.3f} ms (err {err:.1e})")
        # cost split of the current path
        g = jax.jit(gather_only)
        sampled = g(x, off)
        ms_g = timeit(g, x, off)
        e = jax.jit(einsum_only)
        _ = e(sampled, k)
        ms_e = timeit(e, sampled, k)
        line.append(f"[gather {ms_g:.3f} + einsum {ms_e:.3f}]")
        print("   ".join(line), flush=True)
    print("projected per-frame DCN totals:",
          {k2: f"{v:.1f} ms" for k2, v in total.items()})


if __name__ == "__main__":
    main()
