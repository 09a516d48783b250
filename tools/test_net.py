#!/usr/bin/env python3
"""Dataset inference + evaluation CLI.

Counterpart of ``/root/reference/tools/test_net.py:24-84``: build the
model, load a checkpoint (Orbax dir, latest-in-dir, or a reference
``.pth``), load the test dataset annotations + filter + optional public
detections, and run ``DatasetInference`` (per-video JSON caching,
track post-filtering, CLEAR-MOT summary).

Usage:
  python tools/test_net.py --config-file configs/dla/DLA_34_FPN_EMM.yaml \
      --output-dir out/ --model-file ckpt --test-dataset MOT17 --set val
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


from siammot_tpu.utils.platform import ensure_requested_platform
ensure_requested_platform()


def main():
    parser = argparse.ArgumentParser(description="SiamMOT-TPU inference")
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--model-file", default=None,
                        help=".pth / Orbax checkpoint path, or a directory "
                             "holding model_* checkpoints")
    parser.add_argument("--test-dataset", required=True)
    parser.add_argument("--set", default="test", choices=("train", "val",
                                                          "test"))
    parser.add_argument("--n-streams", type=int, default=1,
                        help="batch N videos through the vmapped multi-"
                             "stream engine (aggregate throughput; results "
                             "match the sequential engine per video)")
    parser.add_argument("--eval-det-ap", action="store_true",
                        help="also report detection AP@[0.50:0.95] over the "
                             "post-filtered tracks (the reference keeps this "
                             "path dead-commented, inferencer.py:170)")
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s: %(message)s")
    logger = logging.getLogger("siammot_tpu")

    from siammot_tpu.configs.defaults import get_cfg
    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    import jax

    from siammot_tpu.data.data_utils import (load_dataset_anno,
                                             load_public_detection)
    from siammot_tpu.data.filters import build_data_filter_fn
    from siammot_tpu.engine.inferencer import DatasetInference
    from siammot_tpu.models.siammot import SiamMOT
    from siammot_tpu.utils.checkpoint import (Checkpointer,
                                              import_torch_checkpoint)

    model = SiamMOT(cfg)
    size = -(-cfg.INPUT.MIN_SIZE_TEST // 32) * 32
    params = model.init_params(jax.random.PRNGKey(0), (size, size))

    mf = args.model_file
    if mf and mf.endswith(".pth"):
        params, leftovers = import_torch_checkpoint(mf, params)
        logger.info("imported torch weights (%d unmatched)", len(leftovers))
    elif mf:
        ckptr = Checkpointer(mf if os.path.isdir(mf) else
                             os.path.dirname(mf) or ".")
        path = mf if os.path.basename(mf).startswith("model_") else None
        # restore as saved (training checkpoints carry opt_state too)
        restored = ckptr.load(path, like=None)
        if restored:
            params = restored["params"]
            logger.info("loaded checkpoint at iter %s",
                        restored.get("iteration"))

    dataset, info = load_dataset_anno(cfg, args.test_dataset, set=args.set)
    filter_fn = build_data_filter_fn(args.test_dataset)
    public_detection = None
    if cfg.INFERENCE.USE_GIVEN_DETECTIONS:
        public_detection = load_public_detection(cfg, args.test_dataset)

    os.makedirs(args.output_dir, exist_ok=True)
    inference = DatasetInference(cfg, model, params, dataset,
                                 args.output_dir, filter_fn,
                                 public_detection,
                                 dataset_root=info.get("dataset_root", ""),
                                 n_streams=args.n_streams)
    inference()
    if args.eval_det_ap:
        _, txt = inference.eval_det_ap()
        logger.info(txt)


if __name__ == "__main__":
    main()
