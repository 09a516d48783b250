#!/usr/bin/env python3
"""Train + commit the hermetic golden-parity fixture weights.

The decisive RPN-mode golden test (tests/test_reference_model_parity.py)
needs TRAINED weights — random init leaves every top-k/NMS decision
inside float noise.  A full DLA-34 checkpoint is ~80 MB (not
committable), so this trains the DLA-MINI-FPN body (same DLA-34 tree
shape, ~1/50 the params) on the SYNMOT corpus and exports the weights
through the production torch converter to a small committed npz:

    tests/fixtures/parity_mini_sd.npz   (~1-2 MB)

The fixture is trained with the standard stem (TPU.S2D_STEM=False) so
the exported parameterization is exactly the reference's — both
frameworks in the parity test load the identical state dict strict=True.

Usage (on the chip, ~10 min):  python tools/train_parity_fixture.py
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

OUT = os.path.join(REPO, "tests", "fixtures", "parity_mini_sd.npz")
TRAIN_DIR = "/tmp/train_parity_mini"


def mini_overrides():
    """Config overrides shared with the parity test (shapes must match
    the committed fixture)."""
    return [
        "MODEL.BACKBONE.CONV_BODY", "DLA-MINI-FPN",
        "MODEL.DLA.DLA_STAGE2_OUT_CHANNELS", 16,
        "MODEL.DLA.DLA_STAGE3_OUT_CHANNELS", 32,
        "MODEL.DLA.DLA_STAGE4_OUT_CHANNELS", 64,
        "MODEL.DLA.DLA_STAGE5_OUT_CHANNELS", 64,
        "MODEL.DLA.BACKBONE_OUT_CHANNELS", 32,
        "MODEL.ROI_BOX_HEAD.MLP_HEAD_DIM", 64,
        "TPU.S2D_STEM", False,
        # mini widths (C=32) are below the Pallas kernels' 128-lane
        # envelope; train the fixture on the exact/XLA paths (which is
        # also the parameterization the parity test itself runs)
        "TPU.USE_PALLAS", False,
        "TPU.TRAIN_POOLER_WINDOWED", False,
    ]


def main():
    import numpy as np

    import jax

    from siammot_tpu.utils.checkpoint import (Checkpointer,
                                              export_torch_checkpoint)

    # train via the production CLI path (identical loop/loader/solver)
    sys.argv = [
        "train_net.py",
        "--config-file", os.path.join(REPO, "configs", "dla",
                                      "DLA_34_FPN_EMM_SYNMOT.yaml"),
        "--train-dir", TRAIN_DIR,
        "--model-suffix", "mini",
        "DATASETS.ROOT_DIR", "/tmp",
        "SOLVER.MAX_ITER", "2500",
        "SOLVER.STEPS", "(1500, 2200)",
        "SOLVER.CHECKPOINT_PERIOD", "2500",
    ] + [str(v) for v in mini_overrides()]
    import train_net
    train_net.main()

    sub = [d for d in os.listdir(TRAIN_DIR)
           if os.path.isdir(os.path.join(TRAIN_DIR, d))]
    assert len(sub) == 1, sub
    run_dir = os.path.join(TRAIN_DIR, sub[0])
    ck = Checkpointer(run_dir)
    restored = ck.load(ck.latest(), like=None)
    sd = export_torch_checkpoint(restored["params"])
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **{k: np.asarray(v, np.float32)
                                for k, v in sd.items()})
    print(f"fixture written: {OUT} "
          f"({os.path.getsize(OUT) / 1e6:.2f} MB, {len(sd)} tensors)")


if __name__ == "__main__":
    main()
