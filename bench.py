"""Benchmark: single-stream 720p EMM online tracking FPS per TPU chip.

Measures the full jitted per-frame step (backbone + FPN + RPN + box head +
EMM propagation + solver + memory update) on 1280x720 frames with the
DLA-34-FPN-EMM flagship config, against the reference's 17 FPS/GPU
(``/root/reference/README.md:22``; BASELINE.md north star: >= 60 FPS/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from siammot_tpu.configs.defaults import get_cfg
    from siammot_tpu.models.siammot import SiamMOT

    cfg = get_cfg()
    cfg.freeze()
    model = SiamMOT(cfg)

    h, w = 720, 1280
    hp = -(-h // 32) * 32  # pad to SIZE_DIVISIBILITY like to_image_list
    params = model.init_params(jax.random.PRNGKey(0), (hp, w))
    step = model.jit_step(image_size=(w, h))

    rng = np.random.RandomState(0)
    frames = [jnp.asarray(np.pad(rng.rand(1, h, w, 3),
                                 ((0, 0), (0, hp - h), (0, 0), (0, 0))
                                 ).astype(np.float32))
              for _ in range(8)]

    # warmup / compile + populate some tracks.
    # NOTE: sync via a tiny host fetch — block_until_ready does not block
    # on the tunneled axon platform.
    state = model.empty_state()
    out, state = step(params, frames[0], state)
    _ = int(state.frame_idx)

    n_iters = 50
    t0 = time.perf_counter()
    for i in range(n_iters):
        out, state = step(params, frames[i % len(frames)], state)
    _ = int(state.frame_idx)  # forces the whole dependent chain
    dt = (time.perf_counter() - t0) / n_iters

    fps = 1.0 / dt
    print(json.dumps({
        "metric": "720p_tracking_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 17.0, 3),
    }))


if __name__ == "__main__":
    main()
