#!/usr/bin/env python3
"""Profile the jitted train step on the real chip, isolated from the
data pipeline: synthetic batch, per-iteration sync via a fetched scalar.

Usage:
  python tools/profile_train_step.py [--config configs/dla/DLA_34_FPN_EMM_SYNMOT.yaml] \
      [--iters 20] [KEY VALUE ...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from siammot_tpu.utils.platform import ensure_requested_platform  # noqa: E402
ensure_requested_platform()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config",
                    default="configs/dla/DLA_34_FPN_EMM_SYNMOT.yaml")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("opts", nargs="*")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from siammot_tpu.configs.defaults import get_cfg
    from siammot_tpu.core.structures import Boxes
    from siammot_tpu.models.siammot import SiamMOT
    from siammot_tpu.parallel.mesh import (build_train_step, make_mesh,
                                           make_optimizer)

    cfg = get_cfg()
    cfg.merge_from_file(args.config)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    h = -(-cfg.TPU.INPUT_HEIGHT // 32) * 32
    w = -(-cfg.TPU.INPUT_WIDTH // 32) * 32
    accum = max(1, cfg.SOLVER.ACCUMULATION_STEPS)
    # the fwd/bwd analysis jits below see ONE microbatch (the train step
    # scans over accum microbatches — a full-batch forward_train at
    # accum 8 would allocate 8x the activations and OOM at compile)
    b = 2 * cfg.SOLVER.VIDEO_CLIPS_PER_BATCH // accum
    g = cfg.TPU.MAX_GT

    model = SiamMOT(cfg)
    params = model.init_params(jax.random.PRNGKey(0), (h, w))
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)
    step = build_train_step(model, tx, make_mesh(), image_size=(w, h),
                            accum_steps=accum)

    bf = b * accum                      # full per-step batch (all micros)
    rng = np.random.RandomState(0)
    images_f = jnp.asarray(rng.rand(bf, h, w, 3).astype(np.float32))
    boxes = np.zeros((bf, g, 4), np.float32)
    boxes[..., 0] = rng.uniform(0, w - 80, (bf, g))
    boxes[..., 1] = rng.uniform(0, h - 80, (bf, g))
    boxes[..., 2] = boxes[..., 0] + rng.uniform(16, 80, (bf, g))
    boxes[..., 3] = boxes[..., 1] + rng.uniform(16, 80, (bf, g))
    ids = np.tile(np.arange(g, dtype=np.int32)[None], (bf, 1))
    ids += (np.arange(bf, dtype=np.int32) // 2 * g)[:, None]
    gt_f = Boxes(boxes=jnp.asarray(boxes),
                 scores=jnp.ones((bf, g), jnp.float32),
                 ids=jnp.asarray(ids),
                 labels=jnp.ones((bf, g), jnp.int32),
                 valid=jnp.ones((bf, g), bool))

    sizes_f = jnp.tile(jnp.asarray([[w, h]], jnp.int32), (bf, 1))
    # one microbatch's view for the fwd/bwd analysis jits
    images = images_f[:b]
    gt = jax.tree.map(lambda x: x[:b], gt_f)
    sizes = sizes_f[:b]
    key = jax.random.PRNGKey(1)

    # --- stage split: forward-only loss vs value_and_grad (fwd+bwd) ---
    def timeit(jfn, *args, iters=10):
        out = jfn(*args)
        _ = float(jax.tree.leaves(out)[0])
        t0 = time.time()
        for _ in range(iters):
            out = jfn(*args)
        _ = float(jax.tree.leaves(out)[0])
        return (time.time() - t0) / iters * 1000.0

    def loss_fn(p, k_):
        losses = model.forward_train(p, k_, images, gt, image_size=(w, h),
                                     frame_sizes=sizes)
        return sum(losses.values()), losses

    fwd = jax.jit(lambda p, k_: loss_fn(p, k_)[0])
    vg = jax.jit(lambda p, k_: jax.tree.map(
        lambda g: jnp.sum(jnp.abs(g.astype(jnp.float32))),
        jax.value_and_grad(lambda p2: loss_fn(p2, k_)[0])(p)[1]))
    ms_fwd = timeit(fwd, params, key)
    ms_vg = timeit(vg, params, key)
    print(f"loss fwd only: {ms_fwd:.1f} ms   fwd+bwd: {ms_vg:.1f} ms  "
          f"(bwd ~= {ms_vg - ms_fwd:.1f} ms, {ms_vg / ms_fwd:.2f}x fwd)")
    # per-loss-term forward cost: drop one term at a time is invasive;
    # instead report the loss dict so the config's enabled terms are clear
    _, losses = jax.jit(loss_fn)(params, key)
    print("loss terms:", {k2: round(float(v), 4)
                          for k2, v in losses.items()})
    t0 = time.time()
    params, opt_state, metrics = step(params, opt_state, images_f, gt_f,
                                      sizes_f, key)
    loss0 = float(metrics["loss"])  # force (compile + first run)
    print(f"compile+first step: {time.time() - t0:.1f}s  loss {loss0:.4f}")

    times = []
    for i in range(args.iters):
        key, k = jax.random.split(key)
        t0 = time.time()
        params, opt_state, metrics = step(params, opt_state, images_f, gt_f,
                                          sizes_f, k)
        _ = float(metrics["loss"])  # sync (block_until_ready unreliable on axon)
        times.append(time.time() - t0)
    times = np.asarray(times)
    fps = bf / float(np.median(times))
    print(f"step: median {np.median(times)*1e3:.1f} ms  "
          f"min {times.min()*1e3:.1f} ms  "
          f"({fps:.1f} train frames/s at batch {bf} = {accum}x{b} micro, "
          f"{h}x{w})")


if __name__ == "__main__":
    main()
