"""Multi-stream batched inference and frame-scan.

The reference's inference is explicitly single-GPU, one video at a time
(``/root/reference/tools/test_net.py:3``; per-video parallelism noted as a
TODO at ``inferencer.py:156``).  On TPU the natural scale-out is:

  * ``build_multistream_step`` — vmap the whole per-frame step over S
    independent video streams, optionally sharding the stream axis over a
    ``Mesh`` so each chip tracks its own subset (states are carried
    per-stream, so streams never interact);
  * ``track_clip`` — ``lax.scan`` the step over a frame-major clip so an
    entire clip compiles into one XLA while-op (zero host round-trips
    between frames; SURVEY.md §5.7).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.track_state import TrackState


def empty_states(model, n_streams: int) -> TrackState:
    """Stacked per-stream TrackStates, leading axis S."""
    one = model.empty_state()
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (n_streams,) + x.shape), one)


def build_multistream_step(model, mesh: Optional[Mesh] = None,
                           image_size=None, donate_state: bool = True,
                           use_given: bool = False):
    """Jitted step over stacked streams.

    Signature: (params, images [S, 1, H, W, 3], states [S, ...]) ->
    (outputs [S, ...], states' [S, ...]).  With ``use_given``, a fourth
    argument carries per-stream public detections (a stacked ``Boxes``
    pytree, MOT17 mode) replacing each stream's RPN proposals.  With a
    mesh, the stream axis is sharded over 'data' and params are
    replicated.
    """
    in_axes = (None, 0, 0, 0) if use_given else (None, 0, 0)
    fn = jax.vmap(partial(model.forward_inference, image_size=image_size),
                  in_axes=in_axes)
    if mesh is None:
        return jax.jit(fn, donate_argnums=(2,) if donate_state else ())
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    n_in = 4 if use_given else 3
    return jax.jit(fn, in_shardings=(repl,) + (data,) * (n_in - 1),
                   out_shardings=(data, data),
                   donate_argnums=(2,) if donate_state else ())


def build_clip_scan(model, clip_len: int, image_size=None):
    """Jitted scan of the frame step over a [T, 1, H, W, 3] clip.

    Returns fn(params, frames, state) -> (stacked outputs over T, state').
    The whole clip is one XLA program — the tightest possible inference
    loop for offline (non-latency-bound) tracking.
    """
    def scan_fn(params, frames, state):
        def body(st, frame):
            out, st = model.forward_inference(params, frame, st,
                                              image_size=image_size)
            return st, out

        state, outs = jax.lax.scan(body, state, frames)
        return outs, state

    del clip_len  # shape is carried by `frames`; kept for API clarity
    return jax.jit(scan_fn, donate_argnums=(2,))
