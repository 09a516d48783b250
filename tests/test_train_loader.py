"""IterationLoader: determinism, shapes, prefetch."""

import json
import os

import cv2
import numpy as np

from siammot_tpu.configs.defaults import get_cfg
from siammot_tpu.data.build import build_train_data_loader


def _make_coco(tmp_path, n=4):
    img_dir = tmp_path / "mscoco" / "images" / "train2017"
    ann_dir = tmp_path / "mscoco" / "annotations"
    img_dir.mkdir(parents=True)
    ann_dir.mkdir(parents=True)
    images, annotations = [], []
    rng = np.random.RandomState(0)
    for i in range(n):
        cv2.imwrite(str(img_dir / f"im{i}.jpg"),
                    rng.randint(0, 255, (60, 80, 3), np.uint8))
        images.append(dict(id=i, file_name=f"im{i}.jpg", width=80, height=60))
        annotations.append(dict(id=i, image_id=i, category_id=1,
                                bbox=[10, 10, 30, 30], iscrowd=0, area=900))
    (ann_dir / "MSCOCO2017_train_person.json").write_text(json.dumps(
        dict(images=images, annotations=annotations,
             categories=[dict(id=1, name="person")])))


def test_loader_deterministic_and_shaped(tmp_path):
    _make_coco(tmp_path)
    cfg = get_cfg()
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MAX_SIZE_TRAIN = 96
    cfg.SOLVER.VIDEO_CLIPS_PER_BATCH = 2
    cfg.SOLVER.MAX_ITER = 3
    cfg.DATASETS.ROOT_DIR = str(tmp_path)
    cfg.DATASETS.TRAIN = ("COCO17_train",)
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.TPU.MAX_GT = 8

    batches_a = [(i.copy(), g, s) for i, g, s in
                 build_train_data_loader(cfg, seed=7)]
    batches_b = [(i.copy(), g, s) for i, g, s in
                 build_train_data_loader(cfg, seed=7)]
    assert len(batches_a) == 3
    for (ia, ga, sa), (ib, gb, sb) in zip(batches_a, batches_b):
        np.testing.assert_array_equal(sa, sb)
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(np.asarray(ga.boxes),
                                      np.asarray(gb.boxes))
        np.testing.assert_array_equal(np.asarray(ga.ids),
                                      np.asarray(gb.ids))

    images, gt, sizes = batches_a[0]
    assert images.dtype == np.uint8 and sizes.shape == (4, 2)
    assert images.shape[0] == 4            # 2 clips x 2 frames
    assert images.shape[1] % 32 == 0 and images.shape[2] % 32 == 0
    assert gt.boxes.shape == (4, 8, 4)
    # frame pairs carry matching uids (same image duplicated)
    assert set(np.asarray(gt.ids[0])[np.asarray(gt.valid[0])].tolist()) == \
        set(np.asarray(gt.ids[1])[np.asarray(gt.valid[1])].tolist())

    # different seed -> different sample selection (almost surely)
    batches_c = [(i.copy(), g, s) for i, g, s in
                 build_train_data_loader(cfg, seed=8)]
    assert any(not np.array_equal(a[0], c[0])
               for a, c in zip(batches_a, batches_c))


def test_loader_process_sharding(tmp_path):
    """Process shards partition the global batch contiguously: the
    concatenation of every process's batch equals the single-process
    global batch (multi-host loader contract, parallel/mesh
    ``host_batch_to_global``)."""
    _make_coco(tmp_path)
    cfg = get_cfg()
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MAX_SIZE_TRAIN = 96
    cfg.SOLVER.VIDEO_CLIPS_PER_BATCH = 4
    cfg.SOLVER.MAX_ITER = 2
    cfg.DATASETS.ROOT_DIR = str(tmp_path)
    cfg.DATASETS.TRAIN = ("COCO17_train",)
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.TPU.MAX_GT = 8
    # static size so every shard pads identically regardless of content
    cfg.TPU.INPUT_HEIGHT = 96
    cfg.TPU.INPUT_WIDTH = 96

    from siammot_tpu.data.build import IterationLoader, build_dataset
    from siammot_tpu.data.datasets import ClipCollator

    def batches(pi, pc):
        dataset = build_dataset(cfg)
        collator = ClipCollator(cfg.DATALOADER.SIZE_DIVISIBILITY,
                                max_gt=cfg.TPU.MAX_GT,
                                static_size=(96, 96))
        loader = IterationLoader(dataset, collator, batch_clips=4,
                                 max_iter=2, num_workers=2, seed=3,
                                 process_index=pi, process_count=pc)
        return [(i.copy(), g, s) for i, g, s in loader]

    full = batches(0, 1)
    shard0 = batches(0, 2)
    shard1 = batches(1, 2)
    assert len(full) == len(shard0) == len(shard1) == 2
    for (fi, fg, fs), (ai, ag, as_), (bi, bg, bs) in zip(full, shard0,
                                                         shard1):
        assert fi.shape[0] == 8 and ai.shape[0] == bi.shape[0] == 4
        np.testing.assert_array_equal(fi, np.concatenate([ai, bi]))
        np.testing.assert_array_equal(fs, np.concatenate([as_, bs]))
        np.testing.assert_array_equal(
            np.asarray(fg.boxes),
            np.concatenate([np.asarray(ag.boxes), np.asarray(bg.boxes)]))

    import pytest
    with pytest.raises(ValueError):
        IterationLoader(build_dataset(cfg), None, batch_clips=3,
                        max_iter=1, process_count=2)
