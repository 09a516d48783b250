#!/usr/bin/env python3
"""Multi-stream 720p tracking throughput on one chip.

The reference caps inference at one video per GPU
(``/root/reference/tools/test_net.py:3``); the TPU build batches S
independent streams through one vmapped step (aggregate frames/s is the
serving-throughput metric; ``bench.py`` measures single-stream latency).

Usage: python tools/bench_multistream.py [n_streams ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def bench(n_streams: int):
    import jax
    import jax.numpy as jnp

    from siammot_tpu.configs.defaults import get_cfg
    from siammot_tpu.models.siammot import SiamMOT
    from siammot_tpu.parallel.multistream import (build_multistream_step,
                                                  empty_states)

    cfg = get_cfg()
    cfg.freeze()
    model = SiamMOT(cfg)
    h, w = 736, 1280
    params = model.init_params(jax.random.PRNGKey(0), (h, w))
    step = build_multistream_step(model, image_size=(w, 720))

    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.rand(n_streams, 1, h, w, 3).astype(np.float32))
    states = empty_states(model, n_streams)

    out, states = step(params, frames, states)
    _ = int(states.frame_idx[0])
    n_iters = 30
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out, states = step(params, frames, states)
    _ = int(states.frame_idx[0])
    dt = (time.perf_counter() - t0) / n_iters
    return n_streams / dt


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    streams = [int(a) for a in sys.argv[1:]] or [2, 4]
    for s in streams:
        fps = bench(s)
        print(json.dumps({
            "metric": f"720p_tracking_fps_{s}streams_per_chip",
            "value": round(fps, 2), "unit": "frames/s",
            "vs_baseline": round(fps / 17.0, 3)}))


if __name__ == "__main__":
    main()
