"""Drive the new ResNet-FPN backbone end-to-end on the real TPU chip:
build an R-50-FPN SiamMOT, jit the full per-frame tracking step, and run
a few frames (verification script, not a test)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from siammot_tpu.configs.defaults import get_cfg
    from siammot_tpu.models.siammot import SiamMOT

    print("devices:", jax.devices())
    cfg = get_cfg()
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN"
    cfg.freeze()
    model = SiamMOT(cfg)
    assert model.channels == 256

    h, w = 720, 1280
    hp = -(-h // 32) * 32
    params = model.init_params(jax.random.PRNGKey(0), (hp, w))
    step = model.jit_step(image_size=(w, h))

    rng = np.random.RandomState(0)
    frame = jnp.asarray(rng.rand(1, hp, w, 3).astype(np.float32))
    state = model.empty_state()
    t0 = time.perf_counter()
    out, state = step(params, frame, state)
    _ = int(state.frame_idx)
    print(f"compile+first frame: {time.perf_counter() - t0:.1f}s")

    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out, state = step(params, frame, state)
    _ = int(state.frame_idx)
    dt = (time.perf_counter() - t0) / n
    print(f"R-50-FPN 720p step: {dt * 1e3:.1f} ms/frame ({1 / dt:.1f} FPS)")
    assert int(state.frame_idx) == n + 1
    b = np.asarray(out.boxes)
    assert np.all(np.isfinite(b)), "non-finite boxes"
    print("verify OK")


if __name__ == "__main__":
    main()
