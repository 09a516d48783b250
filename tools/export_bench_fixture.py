#!/usr/bin/env python3
"""Export a trained checkpoint as a compact repo-resident weight fixture.

`bench.py` reports the serving-realistic number only when trained weights
are available (an empty tracker overstates FPS); its checkpoint
candidates live in /tmp, which does not survive sessions.  This tool
snapshots the latest checkpoint of a train dir into a single
float16 .npz (weights are < O(100) in magnitude, so f16 round-trip is
lossless to ~1e-3 relative — compute runs in bf16 anyway) that bench.py
falls back to when no /tmp checkpoint exists.

Usage:
  python tools/export_bench_fixture.py \
      [--train-dir /tmp/train_synmot_v2/DLA34_box_EMM_SYNMOT_v2] \
      [--out fixtures/bench_weights_f16.npz]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _default_train_dir():
    """Same preference order as bench.py's checkpoint candidates, so
    re-running the exporter with defaults snapshots the checkpoint the
    bench itself would pick (not a stale hardcoded dir)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench
    return next((p for p in bench._CKPT_CANDIDATES if os.path.isdir(p)),
                bench._CKPT_CANDIDATES[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-dir", default=None,
                    help="default: first existing bench.py checkpoint "
                    "candidate")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "fixtures",
        "bench_weights_f16.npz"))
    args = ap.parse_args()
    train_dir = args.train_dir or _default_train_dir()

    from siammot_tpu.utils.checkpoint import Checkpointer, _flatten

    ck = Checkpointer(train_dir)
    path = ck.latest()
    if not path:
        sys.exit(f"no checkpoint under {train_dir}")
    restored = ck.load(path, like=None)
    flat = _flatten(restored["params"])
    out = {}
    max_rel = 0.0
    for k, v in flat.items():
        f32 = np.asarray(v, np.float32)
        f16 = f32.astype(np.float16)
        # f16 overflows at 65504: a folded-BN scale from a near-zero
        # variance would silently become inf and corrupt the bench
        if not np.isfinite(f16).all():
            sys.exit(f"{k}: f16 overflow (max |v| = "
                     f"{np.abs(f32).max():.3e}) — fixture would be corrupt")
        denom = np.maximum(np.abs(f32), 1e-6)
        max_rel = max(max_rel, float(
            (np.abs(f16.astype(np.float32) - f32) / denom).max()))
        out[k] = f16
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez_compressed(args.out, **out)
    mb = os.path.getsize(args.out) / 2**20
    print(f"wrote {args.out}: {len(out)} arrays, "
          f"{sum(a.size for a in out.values())/1e6:.1f}M params, {mb:.1f} MB"
          f" (from {path}; max f16 rel err {max_rel:.2e})")


if __name__ == "__main__":
    main()
