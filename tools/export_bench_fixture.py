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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-dir",
                    default="/tmp/train_synmot_v2/DLA34_box_EMM_SYNMOT_v2")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "fixtures",
        "bench_weights_f16.npz"))
    args = ap.parse_args()

    from siammot_tpu.utils.checkpoint import Checkpointer, _flatten

    ck = Checkpointer(args.train_dir)
    path = ck.latest()
    if not path:
        sys.exit(f"no checkpoint under {args.train_dir}")
    restored = ck.load(path, like=None)
    flat = _flatten(restored["params"])
    out = {k: np.asarray(v, np.float32).astype(np.float16)
           for k, v in flat.items()}
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez_compressed(args.out, **out)
    mb = os.path.getsize(args.out) / 2**20
    print(f"wrote {args.out}: {len(out)} arrays, "
          f"{sum(a.size for a in out.values())/1e6:.1f}M params, {mb:.1f} MB"
          f" (from {path})")


if __name__ == "__main__":
    main()
