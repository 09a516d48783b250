#!/usr/bin/env python3
"""Multi-HOST (multi-controller) training dryrun on the CPU backend.

The single-process multichip dryrun (``__graft_entry__.py``) validates
mesh sharding + collectives inside one controller; this tool validates
the genuinely multi-controller path the reference covers with
``torch.distributed.launch`` + NCCL DDP (``/root/reference/tools/
train_net.py:50-54``): ``jax.distributed.initialize`` over N processes,
per-process loader shards assembled into global arrays
(``parallel.mesh.host_batch_to_global``), the jitted DP step over the
global mesh, and checkpoint save/restore under process_count>1:

  * save is called by ALL processes (orbax synchronizes hosts inside
    save and writes on the primary; a rank-0-only call deadlocks);
  * resume emulates a NON-shared filesystem — only process 0 reads the
    checkpoint, then ``parallel.mesh.sync_restored_state`` broadcasts
    params/opt_state/start_iter so every process agrees.

Parent mode runs the same 4-step training three ways — one process with
8 local CPU devices; two coordinated processes with 4 local devices each
(checkpointing at step 2); and two processes RESUMED from that
checkpoint — and asserts all per-step global losses agree to float
tolerance (device order, shard layout and pmean topology are identical,
so every variant must reproduce the single-controller run).

Usage:  python tools/dryrun_multihost.py            # parent, ~5-8 min
        (children are spawned automatically with --child)
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_child(n_local: int, num_processes: int, process_id: int,
              coordinator: str, steps: int = 2, ckpt_dir: str = "",
              save_at: int = 0, resume: bool = False):
    import jax
    # sitecustomize force-sets jax_platforms='axon,cpu'; this dryrun must
    # never touch the tunneled chip
    jax.config.update("jax_platforms", "cpu")
    # children re-compile the same tiny train step per spawn — cache it
    # (topology is part of the cache key, so 1x8 and 2x4 coexist)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
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
                                           replicate_to_global,
                                           sync_restored_state)
    from siammot_tpu.utils.checkpoint import Checkpointer

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

    start_iter = 0
    if resume:
        # emulate a non-shared filesystem: ONLY process 0 sees the
        # checkpoint; processes != 0 keep fresh init at iteration 0 and
        # must be rescued by the broadcast (the exact divergence that
        # silently corrupts training without sync_restored_state)
        if process_id == 0:
            ckptr = Checkpointer(ckpt_dir)
            restored = ckptr.load(ckptr.latest(),
                                  like={"params": params,
                                        "opt_state": opt_state,
                                        "iteration": 0})
            params = restored["params"]
            opt_state = restored["opt_state"]
            start_iter = int(restored["iteration"])
        params, opt_state, start_iter = sync_restored_state(
            params, opt_state, start_iter)
        assert start_iter > 0, "resume found no checkpoint"

    mesh = make_mesh()
    assert mesh.size == n_global, (mesh.size, n_global)
    params, opt_state = replicate_to_global(mesh, (params, opt_state))
    step = build_train_step(model, tx, mesh)
    saver = Checkpointer(ckpt_dir) if (ckpt_dir and save_at) else None

    losses = []
    for it in range(start_iter, steps):
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

        if saver is not None and (it + 1) == save_at and not resume:
            # called by EVERY process (regression for the rank-0-only
            # deadlock): orbax writes on the primary host only
            saver.save(it + 1, params, opt_state)

    if process_id == 0:
        print("MULTIHOST_LOSSES " + json.dumps(losses), flush=True)


def spawn(num_processes: int, n_local: int, timeout: int = 1800,
          steps: int = 2, ckpt_dir: str = "", save_at: int = 0,
          resume: bool = False):
    port = _free_port()
    coordinator = f"localhost:{port}"
    env = dict(os.environ,
               XLA_FLAGS=f"--xla_force_host_platform_device_count={n_local}",
               JAX_PLATFORMS="cpu")
    extra = ["--steps", str(steps)]
    if ckpt_dir:
        extra += ["--ckpt-dir", ckpt_dir, "--save-at", str(save_at)]
    if resume:
        extra += ["--resume"]
    def attempt():
        procs = [subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child",
             "--n-local", str(n_local),
             "--num-processes", str(num_processes),
             "--process-id", str(i), "--coordinator", coordinator] + extra,
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

    try:
        return attempt()
    except RuntimeError as e:
        # Gloo context init gives peers 30 s to arrive (no public knob);
        # on this one-core host concurrent child tracing/compilation can
        # skew arrival past that.  A single retry rides the now-warm
        # persistent compile cache, so both children reach the first
        # collective in seconds.  Loss assertions are unaffected.
        rendezvous = ("Gloo context initialization failed" in str(e)
                      or "DEADLINE_EXCEEDED" in str(e))
        if not rendezvous or num_processes == 1:
            raise
        return attempt()


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _close(a, b):
    return abs(a - b) < 1e-4 * max(1.0, abs(a))


def run_parent(with_checkpoint: bool = True, timeout: int = 1800):
    steps = 4 if with_checkpoint else 2
    single = spawn(num_processes=1, n_local=8, steps=steps, timeout=timeout)
    print("single-controller losses:", single)
    if not with_checkpoint:
        multi = spawn(num_processes=2, n_local=4, steps=steps,
                      timeout=timeout)
        print("two-controller losses:  ", multi)
        assert all(_close(a, b) for a, b in zip(single, multi)), \
            (single, multi)
        return single, multi

    with tempfile.TemporaryDirectory(prefix="mh_ckpt_") as ckpt_dir:
        multi = spawn(num_processes=2, n_local=4, steps=steps,
                      ckpt_dir=ckpt_dir, save_at=2, timeout=timeout)
        print("two-controller losses (ckpt at 2):", multi)
        assert all(_close(a, b) for a, b in zip(single, multi)), \
            (single, multi)
        resumed = spawn(num_processes=2, n_local=4, steps=steps,
                        ckpt_dir=ckpt_dir, resume=True, timeout=timeout)
        print("two-controller RESUMED losses:    ", resumed)
        assert len(resumed) == steps - 2
        assert all(_close(a, b) for a, b in zip(single[2:], resumed)), \
            (single, resumed)
    return single, multi, resumed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--n-local", type=int, default=4)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--coordinator", default="")
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--ckpt-dir", default="")
    ap.add_argument("--save-at", type=int, default=0)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--no-checkpoint", action="store_true",
                    help="parent: skip the checkpoint/resume phase")
    args = ap.parse_args()

    if args.child:
        run_child(args.n_local, args.num_processes, args.process_id,
                  args.coordinator, steps=args.steps,
                  ckpt_dir=args.ckpt_dir, save_at=args.save_at,
                  resume=args.resume)
        return

    run_parent(with_checkpoint=not args.no_checkpoint)
    print("dryrun_multihost OK: 2-process jax.distributed training, "
          "all-process checkpoint save, and non-shared-FS resume all "
          "reproduce the single-process losses")


if __name__ == "__main__":
    main()
