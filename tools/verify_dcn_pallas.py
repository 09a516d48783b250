#!/usr/bin/env python3
"""On-chip verification of the Pallas DCN kernel, stage shape by stage
shape (the full DLA-102-DCN bench crashed the TPU worker — this isolates
which shape faults and checks numerics vs the exact patch sampler).

Usage: python tools/verify_dcn_pallas.py [stage ...]
  stages: 3 4 5 (DLA-102-DCN at 736x1280), default all, smallest first.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from siammot_tpu.utils.platform import ensure_requested_platform  # noqa: E402
ensure_requested_platform()   # honor JAX_PLATFORMS=cpu (sitecustomize
                              # force-registers the axon TPU otherwise)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# DLA-102 DCN stage shapes at 736x1280 input (NHWC, bf16)
SHAPES = {
    "5": (1, 23, 40, 512, 512),
    "4": (1, 46, 80, 256, 256),
    "3": (1, 92, 160, 128, 128),
}


def main():
    t0 = time.perf_counter()
    xw = jnp.ones((128, 128))
    _ = float(jnp.sum(xw @ xw))
    print(f"chip alive ({time.perf_counter() - t0:.1f}s)", flush=True)

    from siammot_tpu.ops.pallas.deform import deform_conv_pallas
    from siammot_tpu.ops.deform_conv import deform_conv2d

    stages = sys.argv[1:] or ["5", "4", "3"]
    rng = np.random.RandomState(0)
    for st in stages:
        b, h, w, c, co = SHAPES[st]
        x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32) * 0.1
                        ).astype(jnp.bfloat16)
        # production regime: zero-init offset conv -> small offsets
        off = jnp.asarray(rng.uniform(-1.5, 1.5,
                                      (b, h, w, 18)).astype(np.float32))
        kern = jnp.asarray(rng.randn(3, 3, c, co).astype(np.float32)
                           * (1.0 / np.sqrt(9 * c))).astype(jnp.bfloat16)
        print(f"stage {st}: [{b},{h},{w},{c}] -> co={co}", flush=True)
        t0 = time.perf_counter()
        out = deform_conv_pallas(x, off, kern)
        got = np.asarray(out.astype(jnp.float32))
        print(f"  pallas ran ({time.perf_counter() - t0:.1f}s) "
              f"mean|out|={np.abs(got).mean():.4f}", flush=True)
        ref = np.asarray(
            deform_conv2d(x, off, kern, impl="patch").astype(jnp.float32))
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6)
        print(f"  rel err vs patch: {err:.5f}", flush=True)
        assert err < 2e-2, f"stage {st} mismatch"
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
