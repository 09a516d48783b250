#!/usr/bin/env python3
"""Multi-stream 720p tracking throughput on one chip (serving bench).

The reference caps inference at one video per GPU
(``/root/reference/tools/test_net.py:3``); the TPU build batches S
independent streams through one vmapped step (aggregate frames/s is the
serving-throughput metric; ``bench.py`` measures single-stream latency).

Measures under REAL serving conditions, exactly like ``bench.py``:
trained weights when the SYNMOT checkpoint exists (SIAMMOT_BENCH_CKPT
override), per-stream rendered crowded scenes (distinct seeds), uint8
frames with on-device normalization (the production transfer path), and
per-stream live-track occupancy reported in the JSON.  Frames are
pre-staged on device so the loop times compute, not the tunnel.

Usage: python tools/bench_multistream.py [n_streams ...]   # default 1 2 4 8 16
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

H, W = 720, 1280
HP = -(-H // 32) * 32


def _load(cfg, model):
    import jax

    from bench import CKPT
    from siammot_tpu.utils.checkpoint import Checkpointer

    params = model.init_params(jax.random.PRNGKey(0), (HP, W))
    if os.path.isdir(CKPT):
        ck = Checkpointer(CKPT)
        path = ck.latest()
        if path:
            restored = ck.load(path, like=None)
            rp = restored["params"]
            a, b = jax.tree.leaves(params), jax.tree.leaves(rp)
            if len(a) == len(b) and all(x.shape == np.asarray(y).shape
                                        for x, y in zip(a, b)):
                return jax.device_put(rp), True
    return params, False


def bench(model, params, trained, n_streams: int, n_frames: int = 8):
    import jax
    import jax.numpy as jnp

    from bench import render_scene
    from siammot_tpu.parallel.multistream import (build_multistream_step,
                                                  empty_states)

    step = build_multistream_step(model, image_size=(W, H))

    if trained:
        per_stream = [render_scene(n_frames, HP, seed=100 + s)
                      for s in range(n_streams)]
        frames = [jnp.asarray(np.concatenate([per_stream[s][t]
                                              for s in range(n_streams)])
                              [:, None])
                  for t in range(n_frames)]
    else:
        rng = np.random.RandomState(0)
        frames = [jnp.asarray((rng.rand(n_streams, 1, HP, W, 3) * 255)
                              .astype(np.uint8)) for _ in range(4)]

    states = empty_states(model, n_streams)
    # warmup: compile + saturate every stream's tracker with live tracks
    for i in range(10 if trained else 1):
        out, states = step(params, frames[i % len(frames)], states)
    _ = int(states.frame_idx[0])
    occ = np.asarray(states.active).sum(axis=-1)

    n_iters = 30
    t0 = time.perf_counter()
    for i in range(n_iters):
        out, states = step(params, frames[i % len(frames)], states)
    _ = int(states.frame_idx[0])
    dt = (time.perf_counter() - t0) / n_iters
    return n_streams / dt, occ.tolist()


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench_anchor import measure_anchor
    from siammot_tpu.configs.defaults import get_cfg
    from siammot_tpu.models.siammot import SiamMOT

    cfg = get_cfg()
    cfg.freeze()
    model = SiamMOT(cfg)
    params, trained = _load(cfg, model)
    anchor = measure_anchor()

    streams = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8, 16]
    for s in streams:
        fps, occ = bench(model, params, trained, s)
        print(json.dumps({
            "metric": f"720p_tracking_fps_{s}streams_per_chip",
            "value": round(fps, 2), "unit": "frames/s",
            "vs_baseline": round(fps / 17.0, 3),
            "per_stream_fps": round(fps / s, 2),
            "occupancy": occ, "trained_weights": trained,
            **anchor}), flush=True)


if __name__ == "__main__":
    main()
