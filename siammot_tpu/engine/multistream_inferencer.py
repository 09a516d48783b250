"""Multi-video batched inference.

The reference tracks one video per GPU process and leaves per-video
parallelism as a TODO (``/root/reference/siammot/engine/inferencer.py:156``,
``tools/test_net.py:3``).  Here independent videos batch through ONE
vmapped frame step (``parallel/multistream.py``): videos are grouped by
padded network-input shape, processed in waves of ``n_streams``, each
stream carrying its own on-device TrackState.  Streams that end early
ride along as masked lanes until the wave's longest video finishes
(their outputs are simply not collected) — shapes stay static, no
recompiles mid-wave.  Public-detection (MOT17) mode is supported: each
stream's given detections are stacked into one batched ``Boxes`` per
frame and replace that stream's RPN proposals.

Results are identical to the sequential engine per video (same jitted
math, states never interact); see tests/test_multistream_inference.py.
"""

from __future__ import annotations

import logging
import os
import time
from collections import defaultdict

import jax
import numpy as np

from ..data.motion_dataset import DataSample
from ..data.transforms import EvalTransform
from ..data.video_loader import normalized_frame_source, resolve_data_path
from ..parallel.multistream import build_multistream_step, empty_states
from ..utils.entities import boxes_to_entities, entities_to_boxes

logger = logging.getLogger(__name__)


def pack_waves(group, n_streams):
    """Length-aware wave packing: each wave runs for max(len) of its
    members (finished streams ride along as masked lanes), so pack
    longest-with-longest — a length-skewed set (MOT17: 450-1500 frames)
    otherwise pays the max over an arbitrary mix per wave.  Per-video
    outputs are unaffected (stream states never interact).

    Addresses the TODO the reference never did
    (``/root/reference/siammot/engine/inferencer.py:156``).
    """
    if os.environ.get("SIAMMOT_MS_PACK", "1") != "0":   # A/B toggle
        group = sorted(group, key=lambda sv: len(sv[1]), reverse=True)
    return [group[i:i + n_streams]
            for i in range(0, len(group), n_streams)]


def wave_lane_steps(waves, n_streams):
    """Total batched lane-steps the schedule will execute (each wave
    steps n_streams lanes for max-member-length frames)."""
    return sum(max(len(s) for _, s in w) * n_streams for w in waves)


def do_inference_multistream(cfg, model, params, samples: list,
                             transforms=None, dataset_root: str = "",
                             n_streams: int = 4,
                             given_detections: dict = None) -> dict:
    """Track a list of (sample_id, DataSample) videos; returns
    {sample_id: DataSample} predictions.

    given_detections: optional {sample_id: DataSample} of public
    detections (MOT17 mode, reference ``inferencer.py:47-54``).
    """
    transforms = transforms or EvalTransform(cfg)
    use_given = bool(given_detections)
    # pre-cast params to the compute dtype once (see inferencer.py: the
    # in-step cast otherwise re-reads the f32 tree every frame)
    params = jax.jit(model.cast_params)(params)

    groups = defaultdict(list)
    for sid, sample in samples:
        in_w, in_h = transforms.input_size(sample.width, sample.height)
        pad_w = -(-in_w // transforms.divisor) * transforms.divisor
        pad_h = -(-in_h // transforms.divisor) * transforms.divisor
        groups[(pad_w, pad_h, in_w, in_h)].append((sid, sample))

    results = {}
    for (pad_w, pad_h, in_w, in_h), group in groups.items():
        step = _cached_step(model, (in_w, in_h), use_given)
        for wave in pack_waves(group, n_streams):
            results.update(_run_wave(cfg, model, params, step, wave,
                                     transforms, dataset_root, n_streams,
                                     (pad_h, pad_w), (in_w, in_h),
                                     given_detections))
    return results


_STEP_CACHE = {}


def _cached_step(model, image_size, use_given):
    """One traced/jitted batched step per (model, size, mode): repeat
    calls (several dataset groups, A/B harnesses, re-entry from
    DatasetInference) reuse the traced callable instead of re-tracing a
    full-model vmap each time (seconds of one-core host work)."""
    key = (id(model), image_size, bool(use_given))
    if key not in _STEP_CACHE:
        _STEP_CACHE[key] = build_multistream_step(
            model, image_size=image_size, use_given=use_given)
    return _STEP_CACHE[key]


def _stack_boxes(box_list):
    return jax.tree.map(lambda *xs: np.stack(xs), *box_list)


def _run_wave(cfg, model, params, step, wave, transforms, dataset_root,
              n_streams, pad_hw, in_wh, given_detections=None):
    import jax.numpy as jnp

    from .inferencer import GIVEN_DETECTION_CAPACITY

    use_given = bool(given_detections)
    sources = []
    metas = []
    for sid, sample in wave:
        path = resolve_data_path(sample, dataset_root)
        sources.append(normalized_frame_source(path, transforms))
        metas.append((sid, sample))

    states = empty_states(model, n_streams)
    outs = {sid: [] for sid, _ in metas}
    alive = [True] * len(sources)
    t0 = time.perf_counter()
    frame_idx = 0
    n_net_frames = 0
    # dtype matters: uint8 batches are normalized on device (the model keys
    # on input dtype, models/siammot.py forward_inference); silently
    # upcasting uint8 frames to f32 here would skip normalization
    batch_dtype = np.uint8 if getattr(transforms, "device_normalize",
                                      False) else np.float32
    # given-detection template for dead/missing lanes (all-invalid)
    empty_given = entities_to_boxes([], GIVEN_DETECTION_CAPACITY, (1.0, 1.0)) \
        if use_given else None

    def assemble(fidx):
        """Read one frame per live stream; returns (batch, givens,
        had_frame mask) and updates ``alive``/``n_net_frames``."""
        nonlocal n_net_frames
        batch = np.zeros((n_streams, 1, pad_hw[0], pad_hw[1], 3),
                         batch_dtype)
        givens = [empty_given] * n_streams if use_given else None
        had = [False] * n_streams
        for i, src in enumerate(sources):
            if not alive[i]:
                continue
            item = next(src, None)
            if item is None:
                alive[i] = False
                continue
            batch[i] = item[0]
            had[i] = True
            n_net_frames += 1
            if use_given:
                sid, sample = metas[i]
                pub = given_detections.get(sid)
                ents = pub.get_entities_for_frame_num(fidx) \
                    if pub is not None else []
                givens[i] = entities_to_boxes(
                    ents, GIVEN_DETECTION_CAPACITY,
                    (in_wh[0] / sample.width, in_wh[1] / sample.height))
        return batch, givens, had

    # one-frame upload pipeline: the host->device batch transfer of frame
    # t+1 rides the tunnel while the device executes step t (a worker
    # thread because a blocking transfer in the loop serializes with
    # compute); per-frame outputs are unchanged — only timing moves
    from concurrent.futures import ThreadPoolExecutor
    uploader = ThreadPoolExecutor(max_workers=1)
    # SIAMMOT_MS_PIPELINE=0: synchronous upload (A/B baseline) — the
    # worker still runs the transfer but we resolve it immediately, so
    # the copy no longer overlaps the previous step's compute
    pipelined = os.environ.get("SIAMMOT_MS_PIPELINE", "1") != "0"

    def submit(fidx):
        batch, givens, had = assemble(fidx)
        if not any(had):
            return None
        fut = uploader.submit(jnp.asarray, batch)
        if not pipelined:
            fut.result()
        return fut, givens, had

    pending = submit(0)
    try:
        while pending is not None:
            fut, givens, had = pending
            pending = submit(frame_idx + 1)
            if use_given:
                out, states = step(params, fut.result(), states,
                                   _stack_boxes(givens))
            else:
                out, states = step(params, fut.result(), states)
            for i, (sid, sample) in enumerate(metas):
                if had[i] and frame_idx < len(sample):
                    outs[sid].append((frame_idx, jax.tree.map(
                        lambda x, i=i: x[i], out)))
            frame_idx += 1
    finally:
        # if step()/assemble() raised mid-wave, an in-flight host->device
        # transfer on the worker thread must complete before we unwind —
        # an orphaned RPC can wedge the tunneled chip (see CLAUDE.md)
        if pending is not None:
            try:
                pending[0].result()
            except Exception:
                pass
        uploader.shutdown(wait=True)

    results = {}
    for i, (sid, sample) in enumerate(metas):
        pred = DataSample(sid, metadata=dict(sample.metadata))
        sx = sample.width / in_wh[0]
        sy = sample.height / in_wh[1]
        for fi, o in outs[sid]:
            host = jax.tree.map(np.asarray, o)
            for e in boxes_to_entities(host, fi, fi * 1000.0 / sample.fps,
                                       (sx, sy)):
                pred.add_entity(e)
        results[sid] = pred
    dt = time.perf_counter() - t0
    # masked-lane waste: lane-steps spent on finished/empty lanes (the
    # batched step always computes n_streams lanes per frame_idx)
    lane_steps = frame_idx * n_streams
    waste = lane_steps - n_net_frames
    logger.info(
        "wave of %d videos: %d frames in %.1fs (%.1f fps aggregate); "
        "masked-lane waste %d/%d lane-steps (%.1f%%)",
        len(wave), n_net_frames, dt, n_net_frames / max(dt, 1e-6),
        waste, lane_steps, 100.0 * waste / max(lane_steps, 1))
    return results
