#!/usr/bin/env python3
"""Floor-free stage breakdown of the inference step on the real chip.

``tools/profile_step.py`` times each stage in its own jit, so every
number carries the tunnel's per-dispatch floor (~0.4-4 ms) and sub-ms
stages are unreadable.  This amplifies each stage xN inside ONE jit
(lax.scan whose carry perturbs the inputs, defeating CSE — the
``profile_rpn.py`` trick) so the floor divides out, then checks that the
amplified stage times actually add up to the measured full step.

Caveat: while_loop-bearing stages (NMS dynamic epilogue) serialize under
scan and report inflated times; run with SIAMMOT_NMS_EPILOGUE=0 to see
the fori-only cost.
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

N_AMP = 10


def amp_time(fn, *args, perturb=None, n=N_AMP, reps=3):
    """Amplified timing: run fn xN inside one jit, per-iteration cost.

    Uses a TWO-POINT slope — per-iter = (T(3n) - T(n)) / 2n — so the
    per-dispatch tunnel floor cancels exactly instead of dividing by n
    (sessions have shown 2.5-25 ms sync round-trips; at 25 ms a single
    x10 run would still carry a 2.5 ms bias on every stage).

    ``perturb`` lists the arg indices whose leaves get the carry added
    (defeating CSE).  Perturbing a 20M-param tree costs ~3 ms/iter by
    itself, so param args must NOT be in the list; pass
    ``perturb="first-leaf:<i>"`` to nudge just one leaf of arg i when
    nothing else varies (e.g. a params-only stage).
    """
    first_leaf_of = None
    if isinstance(perturb, str) and perturb.startswith("first-leaf:"):
        first_leaf_of = int(perturb.split(":")[1])
        perturb = ()
    elif perturb is None:
        perturb = tuple(range(len(args)))

    def nudge(x, c):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x + c.astype(x.dtype)
        if jnp.issubdtype(x.dtype, jnp.integer) or x.dtype == jnp.uint8:
            return x + c.astype(jnp.int32).astype(x.dtype)  # wraparound ok
        return x

    def make_run(length):
        @jax.jit
        def run(eps, args):
            def body(c, _):
                a = list(args)
                for i in perturb:
                    a[i] = jax.tree.map(lambda x: nudge(x, c), a[i])
                if first_leaf_of is not None:
                    leaves, td = jax.tree.flatten(a[first_leaf_of])
                    leaves[0] = leaves[0] + c.astype(leaves[0].dtype)
                    a[first_leaf_of] = jax.tree.unflatten(td, leaves)
                out = fn(*a)
                s = sum(jnp.sum(l.astype(jnp.float32))
                        for l in jax.tree.leaves(out)
                        if hasattr(l, "astype"))
                return (s * 1e-30).astype(jnp.float32), None

            c, _ = jax.lax.scan(body, eps, None, length=length)
            return c
        return run

    eps = jnp.float32(0.0)

    def best_of(run):
        _ = float(run(eps, args))          # warm/compile
        best = float("inf")
        for _i in range(reps):
            t0 = time.perf_counter()
            _ = float(run(eps, args))
            best = min(best, time.perf_counter() - t0)
        return best

    t_short = best_of(make_run(n))
    t_long = best_of(make_run(3 * n))
    return max(t_long - t_short, 0.0) / (2 * n) * 1000.0


def main():
    import argparse

    from siammot_tpu.configs.defaults import get_cfg
    from siammot_tpu.models.siammot import SiamMOT
    from stage_defs import build_stages

    ap = argparse.ArgumentParser()
    ap.add_argument("--occupancy", type=int, default=38)
    ns = ap.parse_args()

    cfg = get_cfg()
    cfg.freeze()
    model = SiamMOT(cfg)
    h, w = 736, 1280
    params = model.init_params(jax.random.PRNGKey(0), (h, w))

    stages, extras = build_stages(model, params, h, w,
                                  occupancy=ns.occupancy)
    print(f"occupancy {ns.occupancy}/{model.max_tracks}")
    image_u8, state = extras["image_u8"], extras["state"]

    rows = []
    for name, fn, args, perturb in stages:
        t = amp_time(fn, *args, perturb=perturb)
        rows.append((name, t))
        print(f"{name:26s} {t:8.3f} ms", flush=True)

    total = sum(t for _, t in rows)
    print(f"{'SUM of stages':26s} {total:8.3f} ms")

    step = model.jit_step(image_size=(w, h))
    out, st = step(params, image_u8, state)
    _ = int(st.frame_idx)
    t0 = time.perf_counter()
    for _ in range(30):
        out, st = step(params, image_u8, st)
    _ = int(st.frame_idx)
    dt = (time.perf_counter() - t0) / 30 * 1000
    print(f"{'FULL STEP':26s} {dt:8.3f} ms  ({1000.0/dt:.1f} FPS)")


if __name__ == "__main__":
    main()
