"""Data-parallel training over a TPU device mesh.

TPU-native replacement for the reference's NCCL DDP stack
(``tools/train_net.py:50-54,85-91``; ``trainer.py:56-65``):

  * one ``jax.sharding.Mesh(('data',))`` over all chips (ICI within a pod
    slice) instead of one process per GPU;
  * the batch is sharded over 'data', parameters/optimizer state are
    replicated, and the gradient all-reduce is induced by ``jax.jit``
    output shardings (XLA psum over ICI) instead of DDP hooks;
  * loss-dict reduction for logging (maskrcnn ``reduce_loss_dict``)
    falls out of the same program — the returned metrics are already
    globally averaged.

The mesh is 1-axis because the reference model (~20M params) needs only
DP (SURVEY.md §2c); the axis name is threaded so larger backbones can
add model axes later.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("data",))


def host_batch_to_global(mesh: Mesh, tree, spec=P("data")):
    """Form global arrays from per-process local batch shards.

    Single-controller (one process): identity — jit's ``in_shardings``
    moves host numpy onto the mesh directly.  Multi-controller
    (``jax.distributed.initialize``): each process holds only its slice
    of the global batch (the loader shards by ``jax.process_index()``),
    and jit cannot implicitly globalize host-local data, so every leaf is
    assembled into a global ``jax.Array`` whose addressable shards are
    this process's data.  Contiguous batch sharding: ``jax.devices()``
    orders devices by process index, so process p's local block lands on
    its own chips — the multi-host analogue of the reference's DDP
    rank-sharded sampler (``/root/reference/tools/train_net.py:50-54``).
    """
    if jax.process_count() == 1:
        return tree
    sh = NamedSharding(mesh, spec)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sh, np.asarray(x)), tree)


def replicate_to_global(mesh: Mesh, tree):
    """Replicate host-local values (params/optimizer state, identical on
    every process) onto the global mesh.  Identity when single-process."""
    if jax.process_count() == 1:
        return tree
    sh = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sh, np.asarray(x)), tree)


def sync_restored_state(params, opt_state, start_iter: int):
    """Make init/resume state consistent across processes.

    Multi-controller resume hazard: each process independently resolves
    ``checkpointer.latest()`` / ``MODEL.WEIGHT``; on a non-shared
    filesystem processes != 0 may find nothing and initialize fresh at
    iteration 0 while process 0 resumes at k — divergent params AND a
    desynced (seed, iteration)-keyed loader silently corrupt training.
    Broadcast everything from process 0 so its view wins everywhere
    (the reference gets this for free from DDP's rank-0 parameter
    broadcast at wrap time, ``/root/reference/tools/train_net.py:50-54``).
    Identity when single-process.  Returns (params, opt_state, start_iter).
    """
    if jax.process_count() == 1:
        return params, opt_state, int(start_iter)
    from jax.experimental import multihost_utils
    params, opt_state, it = multihost_utils.broadcast_one_to_all(
        (params, opt_state, np.int32(start_iter)))
    return params, opt_state, int(it)


def make_lr_schedule(cfg):
    """maskrcnn WarmupMultiStepLR: linear warmup (factor 1/3, 500 iters)
    then x0.1 at each SOLVER.STEPS milestone."""
    base = cfg.SOLVER.BASE_LR
    steps = sorted(cfg.SOLVER.STEPS)
    gamma = cfg.SOLVER.GAMMA
    wf = cfg.SOLVER.WARMUP_FACTOR
    wi = cfg.SOLVER.WARMUP_ITERS

    def schedule(it):
        it = jnp.asarray(it, jnp.float32)
        alpha = jnp.clip(it / max(wi, 1), 0.0, 1.0)
        # maskrcnn WarmupMultiStepLR: factor 1 once it >= warmup_iters
        warm = jnp.where(it >= wi, 1.0, wf * (1 - alpha) + alpha)
        decay = jnp.asarray(1.0)
        for s in steps:
            decay = decay * jnp.where(it >= s, gamma, 1.0)
        return base * warm * decay

    return schedule


def _is_bias_like(path) -> bool:
    leaf = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    return leaf in ("bias", "scale")


def make_optimizer(cfg, params):
    """SGD + momentum with the reference's per-parameter policy
    (``maskrcnn make_optimizer``): weight decay only on weights; biases get
    2x LR and no decay; FrozenBN scale/bias never move (zero grads via
    stop_gradient + no decay here).

    ``MODEL.BACKBONE.FREEZE_CONV_BODY_AT`` freezes the ResNet stem
    (at >= 1) and ``layer1..layer{at-1}`` (maskrcnn ``_freeze_backbone``,
    a ResNet-body feature — the reference's DLA bodies ignore it, as
    here)."""
    schedule = make_lr_schedule(cfg)
    freeze_at = cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT

    def _frozen(path) -> bool:
        if freeze_at <= 0:
            return False
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        if "body" not in keys:
            return False
        mod = keys[keys.index("body") + 1]
        if mod.startswith("stem_"):
            return True
        return any(mod.startswith(f"layer{s}_")
                   for s in range(1, freeze_at))

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda p, _: "frozen" if _frozen(p)
            else ("bias" if _is_bias_like(p) else "weight"), params)

    def sgd(lr_factor, weight_decay):
        def scaled(it):
            return schedule(it) * lr_factor

        chain = [optax.add_decayed_weights(weight_decay)] if weight_decay else []
        chain += [optax.sgd(learning_rate=scaled,
                            momentum=cfg.SOLVER.MOMENTUM)]
        return optax.chain(*chain)

    return optax.multi_transform(
        {"weight": sgd(1.0, cfg.SOLVER.WEIGHT_DECAY),
         "bias": sgd(cfg.SOLVER.BIAS_LR_FACTOR, cfg.SOLVER.WEIGHT_DECAY_BIAS),
         "frozen": optax.set_to_zero()},
        label_fn)


def build_train_step(model, tx, mesh: Mesh, image_size=None,
                     accum_steps: int = 1):
    """Jitted DP train step: params replicated, batch sharded over 'data'.

    batch = dict(images [B, H, W, 3], gt: Boxes with [B, G] fields,
    rng key). Returns (params', opt_state', metrics) with metrics already
    globally reduced.

    ``accum_steps`` > 1 runs the per-device batch as that many equal
    microbatches under a ``lax.scan``, averaging gradients before the
    single optimizer update — the reference's 8-GPU batch-16 recipe
    (``/root/reference/configs/dla/DLA_34_FPN_EMM.yaml`` SOLVER) on one
    chip: peak activation memory is one microbatch's (the scan
    sequentializes fwd+bwd per micro), while LR schedule/optimizer see
    exactly one step per global batch.  Microbatches must hold whole
    frame pairs: (B / n_devices / accum_steps) must be even.

    The per-device loss+grad is expressed with ``shard_map`` (manual
    partitioning, explicit ``pmean`` over 'data' = the DDP gradient
    all-reduce) rather than jit sharding propagation: the model's train
    graph is large (gathers, scans, NMS fixed-point loops), and running
    GSPMD sharding propagation over all of it costs tens of minutes of
    compile time at 8 devices, vs seconds for the manually partitioned
    form.  Each device must hold whole frame PAIRS: B/n_devices must be
    even (clips are laid out adjacently, so contiguous batch sharding
    keeps pairs together).
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    def local_grads(params, images, gt, frame_sizes, rng):
        # decorrelate per-device sampling; data differs per shard anyway
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))

        def grads_of(mb_rng, mb_images, mb_gt, mb_sizes):
            def loss_fn(p):
                losses = model.forward_train(p, mb_rng, mb_images, mb_gt,
                                             image_size=image_size,
                                             frame_sizes=mb_sizes)
                return sum(losses.values()), losses

            (total, losses), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            return grads, total, losses

        if accum_steps <= 1:
            grads, total, losses = grads_of(rng, images, gt, frame_sizes)
        else:
            b = images.shape[0]
            assert b % accum_steps == 0 and (b // accum_steps) % 2 == 0, (
                f"per-device batch {b} not divisible into {accum_steps} "
                f"pair-preserving microbatches")

            def to_micro(x):
                return x.reshape((accum_steps, b // accum_steps)
                                 + x.shape[1:])

            micro = jax.tree.map(to_micro, (images, gt, frame_sizes))

            def body(carry, xs):
                acc, idx = carry
                mb_images, mb_gt, mb_sizes = xs
                out = grads_of(jax.random.fold_in(rng, idx),
                               mb_images, mb_gt, mb_sizes)
                return (jax.tree.map(jnp.add, acc, out), idx + 1), None

            micro0 = jax.tree.map(lambda x: x[0], micro)
            shapes = jax.eval_shape(lambda: grads_of(rng, *micro0))
            zeros = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                                 shapes)
            (acc, _), _ = jax.lax.scan(body, (zeros, 0), micro)
            grads, total, losses = jax.tree.map(
                lambda x: x / accum_steps, acc)
        # DDP all-reduce: mean of per-device batch-mean losses/grads ==
        # global batch mean (equal shard sizes)
        return jax.lax.pmean((grads, total, losses), "data")

    # check_vma=False: the varying-axis checker rejects while_loop carries
    # (NMS fixed-point) whose initial value is shard-invariant; everything
    # here is per-device anyway.
    sharded_grads = jax.shard_map(
        local_grads, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data"), P()),
        out_specs=(P(), P(), P()),
        check_vma=False)

    def step(params, opt_state, images, gt, frame_sizes, rng):
        grads, total, losses = sharded_grads(params, images, gt,
                                             frame_sizes, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(losses, loss=total)
        return params, opt_state, metrics

    jstep = jax.jit(
        step,
        in_shardings=(repl, repl, data, data, data, repl),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )
    if jax.process_count() == 1:
        return jstep

    # multi-controller: per-call batch leaves are process-local shards and
    # must be assembled into global arrays before entering the jit; the
    # rng key is identical on every process (same seed chain) and rides
    # replicated.  params/opt_state are global already (the caller runs
    # them through ``replicate_to_global`` once; step outputs stay global).
    def multihost_step(params, opt_state, images, gt, frame_sizes, rng):
        images, gt, frame_sizes = host_batch_to_global(
            mesh, (images, gt, frame_sizes))
        rng = replicate_to_global(mesh, rng)
        return jstep(params, opt_state, images, gt, frame_sizes, rng)

    return multihost_step
