#!/usr/bin/env python3
"""Sub-stage timing of RPN proposal selection on the real chip.

``select_proposals`` is the biggest named lever in the step profile
(~3 ms of 9.5; CLAUDE.md).  This times its pieces with IN-JIT loop
amplification (a lax.scan whose carry perturbs the inputs, defeating
CSE) so the tunnel's per-dispatch floor (~2.5-4 ms) divides out.

NOTE: while_loop-bearing pieces (the NMS epilogue) serialize under scan
and report inflated times (see core/nms.py header) — for those, trust
full-step A/B deltas only.  Run with SIAMMOT_NMS_EPILOGUE=0 to amplify
the fori-only NMS body.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_AMP = 30


def amp_time(fn, *args, n=N_AMP, reps=3):
    """Time fn amplified n times inside ONE jit dispatch."""
    @jax.jit
    def run(eps, args):
        def body(c, _):
            a = jax.tree.map(
                lambda x: x + c.astype(x.dtype) if jnp.issubdtype(
                    x.dtype, jnp.floating) else x, args)
            out = fn(*a)
            s = sum(jnp.sum(l.astype(jnp.float32))
                    for l in jax.tree.leaves(out))
            return (s * 1e-30).astype(jnp.float32), None

        c, _ = jax.lax.scan(body, eps, None, length=n)
        return c

    eps = jnp.float32(0.0)
    _ = float(run(eps, args))
    best = float("inf")
    for _i in range(reps):
        t0 = time.perf_counter()
        _ = float(run(eps, args))
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1000.0


def main():
    from siammot_tpu.configs.defaults import get_cfg
    from siammot_tpu.core import boxes as box_ops
    from siammot_tpu.core import nms as nms_mod
    from siammot_tpu.core.nms import nms_mask
    from siammot_tpu.models.rpn import (_grouped_topk, _topk_level,
                                        select_proposals)
    from siammot_tpu.models.siammot import SiamMOT
    from functools import partial

    if os.environ.get("SIAMMOT_NMS_EPILOGUE", "1") == "0":
        nms_mod.DYNAMIC_EPILOGUE = False
        print("(NMS dynamic epilogue OFF for amplification)")

    cfg = get_cfg()
    cfg.freeze()
    model = SiamMOT(cfg)
    h, w = 736, 1280
    params = model.init_params(jax.random.PRNGKey(0), (h, w))
    net = model.net

    image = jnp.asarray(np.random.rand(1, h, w, 3).astype(np.float32))
    feats = jax.jit(lambda p, x: net.apply(p, x, method=net.features))(
        params, image)
    logits, deltas = jax.jit(
        lambda p, f: net.apply(p, f, method=net.rpn_maps))(params, feats)
    anchors = model.anchors_for((h, w))
    rcfg = model.rcfg_test
    k_pre = rcfg.pre_nms_top_n

    print(f"levels: {[l.shape for l in logits]}  k_pre={k_pre} "
          f"post={rcfg.post_nms_top_n} fpn_post={rcfg.fpn_post_nms_top_n}")

    # whole select (single dispatch, includes tunnel floor)
    t = amp_time(lambda l, d: select_proposals(l, d, anchors, (w, h), rcfg),
                 logits, deltas, n=10)
    print(f"select_proposals (amplified x10)   {t:8.3f} ms")

    # per-level top-k
    for i, (lg, dl, anch) in enumerate(zip(logits, deltas, anchors)):
        n_im, hh, ww, a = lg.shape
        obj = lg.reshape(n_im, hh * ww * a)[0]
        t = amp_time(lambda o: _grouped_topk(o, k_pre)
                     if o.shape[0] >= k_pre else jax.lax.top_k(o, o.shape[0]),
                     obj)
        print(f"  L{i} top-k over {obj.shape[0]:>7d}          {t:8.3f} ms")

    # level0 full _topk_level (topk + decode + clip + minsize)
    lg, dl, anch = logits[0], deltas[0], anchors[0]
    n_im, hh, ww, a = lg.shape
    obj = lg.reshape(hh * ww * a)
    dlt = dl.reshape(hh * ww * a, 4)
    t = amp_time(lambda o, d: _topk_level(o, d, jnp.asarray(anch), (w, h),
                                          rcfg, k_pre), obj, dlt)
    print(f"  L0 _topk_level (topk+decode)     {t:8.3f} ms")

    # NMS pieces at the real stacked shape [5, k_pre]
    rng = np.random.RandomState(0)
    sb = jnp.asarray(rng.rand(5, k_pre, 4).astype(np.float32) * 500)
    sb = sb.at[..., 2:].set(sb[..., :2] + 20 + sb[..., 2:] * 0.2)
    ss = jnp.asarray(rng.rand(5, k_pre).astype(np.float32))
    sk = jnp.ones((5, k_pre), bool)

    t = amp_time(jax.vmap(lambda b: box_ops.box_iou(b, b)), sb)
    print(f"  iou matrix build [5,1k,1k]       {t:8.3f} ms")
    t = amp_time(jax.vmap(lambda s: jnp.argsort(-s, stable=True)), ss)
    print(f"  argsort [5,1k]                   {t:8.3f} ms")
    t = amp_time(jax.vmap(partial(nms_mask, iou_threshold=rcfg.nms_thresh,
                                  max_out=rcfg.post_nms_top_n)), sb, ss, sk)
    print(f"  nms_mask [5,1k]                  {t:8.3f} ms")

    # final cross-level top-k + gathers
    boxes = jnp.asarray(rng.rand(1, 5 * k_pre, 4).astype(np.float32))
    scores = jnp.asarray(rng.rand(1, 5 * k_pre).astype(np.float32))
    keep = jnp.asarray(rng.rand(1, 5 * k_pre) > 0.5)

    def final(bx, sc, kp):
        k = min(rcfg.fpn_post_nms_top_n, bx.shape[1])
        masked = jnp.where(kp, sc, -jnp.inf)
        top, idx = jax.lax.top_k(masked, k)
        return (jnp.take_along_axis(bx, idx[..., None], axis=1),
                jnp.take_along_axis(sc, idx, axis=1))

    t = amp_time(final, boxes, scores, keep)
    print(f"  final top-{rcfg.fpn_post_nms_top_n} + gather           {t:8.3f} ms")


if __name__ == "__main__":
    main()
