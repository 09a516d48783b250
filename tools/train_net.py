#!/usr/bin/env python3
"""Training CLI.

Counterpart of the reference launcher
(``/root/reference/tools/train_net.py:28-130``), TPU-native: instead of
one process per GPU with NCCL DDP, a single process drives a
``jax.sharding.Mesh`` over all local chips (multi-host via
``jax.distributed.initialize`` when JAX_COORDINATOR_ADDRESS is set) and
the jitted data-parallel train step does the gradient psum over ICI.

Usage:
  python tools/train_net.py --config-file configs/dla/DLA_34_FPN_EMM.yaml \
      --train-dir runs/ [--model-suffix tag] [KEY VALUE ...]
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def setup_logger(output_dir: str):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s: %(message)s",
        handlers=[logging.StreamHandler(),
                  logging.FileHandler(os.path.join(output_dir, "log.txt"))])
    return logging.getLogger("siammot_tpu")


def train(cfg, output_dir: str, logger):
    import jax
    import numpy as np

    from siammot_tpu.data.build import build_train_data_loader
    from siammot_tpu.engine.tensorboard_writer import TensorboardWriter
    from siammot_tpu.engine.trainer import do_train
    from siammot_tpu.models.siammot import SiamMOT
    from siammot_tpu.parallel.mesh import (build_train_step, make_mesh,
                                           make_optimizer,
                                           replicate_to_global,
                                           sync_restored_state)
    from siammot_tpu.utils.checkpoint import (Checkpointer,
                                              import_torch_checkpoint)

    model = SiamMOT(cfg)
    init_h = max(cfg.INPUT.MIN_SIZE_TRAIN)
    init_h = -(-init_h // 32) * 32
    params = model.init_params(jax.random.PRNGKey(0),
                               (init_h, init_h))

    checkpointer = Checkpointer(output_dir)
    start_iter = 0
    weight = cfg.MODEL.WEIGHT
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)

    latest = checkpointer.latest()
    if latest is not None:
        # restore against live templates so optax's NamedTuple state
        # keeps its structure (a raw orbax restore yields plain dicts)
        restored = checkpointer.load(
            latest, like={"params": params, "opt_state": opt_state,
                          "iteration": 0})
        if restored:
            params = restored["params"]
            opt_state = restored["opt_state"]
            start_iter = int(restored.get("iteration", 0))
            logger.info("resumed from %s at iter %d", latest, start_iter)
    elif weight.endswith(".pth"):
        params, leftovers = import_torch_checkpoint(weight, params)
        logger.info("imported torch weights %s (%d unmatched keys)",
                    weight, len(leftovers))
    elif weight:
        # native checkpoint init (params only — fresh optimizer/schedule),
        # e.g. detector-pretrain -> video-finetune (the reference's
        # CrowdHuman -> MOT17 recipe loads MODEL.WEIGHT the same way)
        src = Checkpointer(weight) if os.path.isdir(weight) else None
        path = src.latest() if src else weight
        restored = Checkpointer(os.path.dirname(path)).load(path, like=None)
        rp = restored["params"]
        ours, theirs = jax.tree.leaves(params), jax.tree.leaves(rp)
        if len(ours) != len(theirs) or any(
                a.shape != tuple(b.shape) for a, b in zip(ours, theirs)):
            raise ValueError(f"MODEL.WEIGHT {weight} is not "
                             f"shape-compatible with this config")
        params = jax.device_put(rp)
        logger.info("initialized params from %s", path)

    # multi-controller: init/resume above ran per-process against possibly
    # non-shared filesystems — process 0's restored state and start_iter
    # must win everywhere BEFORE the loader (keyed by (seed, iteration))
    # and the global mesh are built
    params, opt_state, start_iter = sync_restored_state(
        params, opt_state, start_iter)

    mesh = make_mesh(cfg.TPU.DATA_PARALLEL or None)
    logger.info("mesh: %s (%d processes)", mesh, jax.process_count())
    # multi-controller: params/opt_state (identical on every process) must
    # become global replicated arrays before entering the global-mesh jit
    params, opt_state = replicate_to_global(mesh, (params, opt_state))
    static = None
    if cfg.TPU.INPUT_HEIGHT and cfg.TPU.INPUT_WIDTH:
        static = (cfg.TPU.INPUT_WIDTH, cfg.TPU.INPUT_HEIGHT)
    step = build_train_step(model, tx, mesh, image_size=static,
                            accum_steps=cfg.SOLVER.ACCUMULATION_STEPS)

    loader = build_train_data_loader(cfg, start_iter=start_iter)
    tb = None
    if jax.process_index() == 0:
        tb = TensorboardWriter(cfg, os.path.join(output_dir, "tb"))

    do_train(model, step, params, opt_state, loader, checkpointer,
             max_iter=cfg.SOLVER.MAX_ITER,
             checkpoint_period=cfg.SOLVER.CHECKPOINT_PERIOD,
             start_iter=start_iter, tensorboard_writer=tb)


from siammot_tpu.utils.platform import ensure_requested_platform
ensure_requested_platform()


def main():
    parser = argparse.ArgumentParser(description="SiamMOT-TPU training")
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--train-dir", default="runs")
    parser.add_argument("--model-suffix", default="")
    parser.add_argument("opts", nargs=argparse.REMAINDER,
                        help="config overrides: KEY VALUE ...")
    args = parser.parse_args()

    from siammot_tpu.configs.defaults import get_cfg
    from siammot_tpu.utils.model_name import get_model_name

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    output_dir = os.path.join(args.train_dir,
                              get_model_name(cfg, args.model_suffix))
    os.makedirs(output_dir, exist_ok=True)
    logger = setup_logger(output_dir)
    logger.info("config:\n%s", cfg.dump())
    with open(os.path.join(output_dir, "config.yaml"), "w") as f:
        f.write(cfg.dump())

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        import jax
        jax.distributed.initialize()

    train(cfg, output_dir, logger)


if __name__ == "__main__":
    main()
