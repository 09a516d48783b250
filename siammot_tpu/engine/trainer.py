"""Training engine.

TPU-native counterpart of the reference train loop
(``/root/reference/siammot/engine/trainer.py:14-104``): iteration-based
(no epochs), periodic smoothed-loss logging, periodic checkpointing, and
TensorBoard scalars — but the step itself is one jitted DP program
(``parallel/mesh.build_train_step``) so there is no DDP wrapper, no AMP
scaler (bf16 needs none) and the loss reduction for logging falls out of
the same XLA program.
"""

from __future__ import annotations

import logging
import time
from collections import deque

import jax
import numpy as np

logger = logging.getLogger(__name__)


class SmoothedValue:
    """Windowed median/avg meter (maskrcnn MetricLogger semantics)."""

    def __init__(self, window: int = 20):
        self.values = deque(maxlen=window)
        self.total = 0.0
        self.count = 0

    def update(self, v: float):
        self.values.append(v)
        self.total += v
        self.count += 1

    @property
    def median(self):
        return float(np.median(self.values)) if self.values else 0.0

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)


def do_train(model, train_step, params, opt_state, data_loader, checkpointer,
             max_iter: int, checkpoint_period: int, start_iter: int = 0,
             log_period: int = 20, tensorboard_writer=None, rng=None,
             stop_file: str = None):
    """Run the training loop; returns final (params, opt_state).

    SIGTERM triggers a final checkpoint + clean exit, so externally
    time-limited runs (schedulers, CI timeouts) lose at most one step
    and resume from where they stopped.  ``stop_file`` (or the
    SIAMMOT_STOP_FILE env var): if that path exists at a step boundary,
    checkpoint and exit cleanly — the safe way to stop a long run on a
    tunneled chip where killing a process mid-RPC wedges the device.
    """
    import os
    stop_file = stop_file or os.environ.get("SIAMMOT_STOP_FILE")
    import signal
    stop_requested = []

    def _on_term(signum, frame):
        logger.warning("SIGTERM received — checkpointing and stopping")
        stop_requested.append(True)

    try:
        prev_handler = signal.signal(signal.SIGTERM, _on_term)
    except ValueError:  # not on the main thread
        prev_handler = None

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    # multi-host: EVERY process must call save — orbax synchronizes all
    # hosts inside save() and restricts the actual write to the primary,
    # so a rank-0-only call would park process 0 in the sync barrier
    # while the others run ahead into the next step's collectives
    # (deadlock; see tools/dryrun_multihost.py --with-checkpoint)
    save_here = checkpointer is not None
    meters = {"loss": SmoothedValue(), "time": SmoothedValue(),
              "data": SmoothedValue()}
    logger.info("Start training")
    start = time.time()
    end = time.time()

    iteration = start_iter
    for images, gt, frame_sizes in data_loader:
        if stop_file and os.path.exists(stop_file):
            logger.warning("stop file %s present — checkpointing and "
                           "stopping at iter %d", stop_file, iteration)
            stop_requested.append(True)
        if iteration >= max_iter or stop_requested:
            break
        iteration += 1
        meters["data"].update(time.time() - end)

        # per-iteration key by fold_in (not a sequential split chain):
        # a resumed run at start_iter=k draws the SAME keys iterations
        # k+1.. as the uninterrupted run — with the deterministic
        # (seed, iteration)-keyed loader this makes resume bit-faithful
        # (the reference's resume replays neither sampler nor RNG state)
        step_rng = jax.random.fold_in(rng, iteration)
        with jax.profiler.StepTraceAnnotation("train_step",
                                              step_num=iteration):
            params, opt_state, metrics = train_step(params, opt_state,
                                                    images, gt,
                                                    frame_sizes, step_rng)

        if iteration % log_period == 0 or iteration == max_iter:
            host = {k: float(v) for k, v in metrics.items()}
            meters["loss"].update(host["loss"])
            eta = (time.time() - start) / max(iteration - start_iter, 1) \
                * (max_iter - iteration)
            logger.info(
                "iter %d/%d  loss %.4f (med %.4f)  %s  data %.3fs  eta %.0fs",
                iteration, max_iter, host["loss"], meters["loss"].median,
                "  ".join(f"{k} {v:.4f}" for k, v in sorted(host.items())
                          if k != "loss"), meters["data"].median, eta)
            if tensorboard_writer is not None:
                tensorboard_writer(iteration, host)

        if iteration % checkpoint_period == 0 and save_here:
            checkpointer.save(iteration, params, opt_state)

        meters["time"].update(time.time() - end)
        end = time.time()

    if save_here:
        checkpointer.save(iteration, params, opt_state)
        checkpointer.save(iteration, params, opt_state, tag="model_final")
    if prev_handler is not None:
        import signal as _s
        _s.signal(_s.SIGTERM, prev_handler)
    total = time.time() - start
    logger.info("Total training time: %.0fs (%.4f s/it)", total,
                total / max(iteration - start_iter, 1))
    return params, opt_state
