"""Training data pipeline: augmentation geometry, datasets, collator."""

import json
import os
import random

import cv2
import numpy as np
import pytest

from siammot_tpu.configs.defaults import get_cfg
from siammot_tpu.data.augmentation import (ClipHFlip, ClipResize,
                                           JpegCompression, MotionAugment,
                                           build_siam_augmentation,
                                           train_resize_dims)
from siammot_tpu.data.datasets import (ClipCollator, ConcatDataset,
                                       ImageDataset, VideoDataset)
from siammot_tpu.data.coco import CocoDataset
from siammot_tpu.data.motion_dataset import AnnoEntity, DataSample
from siammot_tpu.data.target import FrameTarget


def make_target():
    return FrameTarget(
        boxes=np.array([[10., 20., 50., 80.], [100., 40., 140., 90.]],
                       np.float32),
        ids=np.array([3, 7]), labels=np.array([1, 1]), size=(200, 100))


def test_hflip_geometry():
    t = make_target()
    f = t.hflip()
    # x -> W - x - 1 (maskrcnn transpose), double flip = identity
    assert np.allclose(f.boxes[0], [200 - 50 - 1, 20, 200 - 10 - 1, 80])
    assert np.allclose(f.hflip().boxes, t.boxes)


def test_resize_scales_boxes():
    t = make_target().resize((400, 300))
    assert np.allclose(t.boxes[0], [20., 60., 100., 240.])
    assert t.size == (400, 300)


def test_train_resize_dims_divisibility():
    rng = random.Random(0)
    for _ in range(10):
        w, h = rng.randrange(300, 2000), rng.randrange(300, 2000)
        nw, nh = train_resize_dims(w, h, (640, 800), 1333, 32, rng)
        assert nw % 32 == 0 and nh % 32 == 0
        assert max(nw, nh) <= 1333


def test_motion_augment_keeps_a_box():
    rng = random.Random(1)
    img = np.random.RandomState(0).randint(0, 255, (100, 200, 3),
                                           dtype=np.uint8)
    aug = MotionAugment(motion_limit=0.1, amodal=False)
    frames, targets = aug([img, img], [make_target(), make_target()], rng)
    assert frames[0].shape == frames[1].shape == (100, 200, 3)
    assert all(len(t) >= 1 for t in targets)
    for t in targets:
        assert (t.boxes[:, 2] > t.boxes[:, 0]).all()
        assert (t.boxes[:, 0] >= 0).all() and (t.boxes[:, 2] <= 199).all()


def test_full_augmentation_runs():
    cfg = get_cfg()
    cfg.INPUT.BRIGHTNESS = cfg.INPUT.CONTRAST = 0.1
    cfg.INPUT.SATURATION = cfg.INPUT.HUE = 0.1
    pipeline = build_siam_augmentation(cfg, is_train=True, modality="image")
    img = np.random.RandomState(0).randint(0, 255, (120, 160, 3),
                                           dtype=np.uint8)
    frames, targets = pipeline([img, img.copy()],
                               [make_target().resize((160, 120))] * 2,
                               random.Random(0))
    # device-normalize default: raw uint8 out (models normalize on device)
    assert frames[0].dtype == np.uint8
    assert frames[0].shape[0] % 32 == 0 and frames[0].shape[1] % 32 == 0

    cfg2 = get_cfg()
    cfg2.TPU.DEVICE_NORMALIZE = False
    pipeline = build_siam_augmentation(cfg2, is_train=True, modality="image")
    frames, targets = pipeline([img, img.copy()],
                               [make_target().resize((160, 120))] * 2,
                               random.Random(0))
    assert frames[0].dtype == np.float32
    # normalized output roughly centered
    assert abs(float(np.mean(frames[0]))) < 3.0


def _write_coco(tmp_path, n_images=3):
    img_dir = tmp_path / "Images"
    img_dir.mkdir()
    images, annotations = [], []
    aid = 0
    for i in range(n_images):
        w, h = 160, 120
        arr = np.full((h, w, 3), 30 * i, np.uint8)
        cv2.imwrite(str(img_dir / f"im{i}.jpg"), arr)
        images.append(dict(id=i, file_name=f"im{i}.jpg", width=w, height=h))
        for j in range(2):
            annotations.append(dict(id=aid, image_id=i, category_id=1,
                                    bbox=[10 + 20 * j, 15, 30, 40],
                                    iscrowd=0, area=1200))
            aid += 1
    # one duplicate box + one crowd: hygiene should drop both
    annotations.append(dict(id=aid, image_id=0, category_id=1,
                            bbox=[10, 15, 30, 40], iscrowd=0, area=1200))
    annotations.append(dict(id=aid + 1, image_id=0, category_id=1,
                            bbox=[50, 50, 20, 20], iscrowd=1, area=400))
    anno = dict(images=images, annotations=annotations,
                categories=[dict(id=1, name="person")])
    path = tmp_path / "anno.json"
    path.write_text(json.dumps(anno))
    return str(path), str(img_dir)


def test_image_dataset_and_collator(tmp_path):
    anno_path, img_dir = _write_coco(tmp_path)
    cfg = get_cfg()
    transforms = build_siam_augmentation(cfg, is_train=True, modality="image")
    ds = ImageDataset(CocoDataset(anno_path), img_dir, transforms=transforms,
                      frames_per_image=2)
    assert len(ds) == 3
    frames, targets, name = ds[(0, 42)]
    assert len(frames) == 2 and len(targets) == 2
    assert len(targets[0]) == 2  # dedupe + crowd dropped

    collator = ClipCollator(size_divisibility=32, max_gt=8)
    images, gt, sizes, vids = collator([ds[(i, 7)] for i in range(3)])
    assert images.shape[0] == 6 and images.shape[3] == 3
    assert images.shape[1] % 32 == 0
    assert images.dtype == np.uint8      # device-normalize default
    assert sizes.shape == (6, 2)
    assert (sizes[:, 0] <= images.shape[2]).all()
    assert (sizes[:, 1] <= images.shape[1]).all()
    assert gt.boxes.shape == (6, 8, 4)
    # uids batch-unique and consistent within each clip pair
    for i in range(0, 6, 2):
        a = gt.ids[i][gt.valid[i]]
        b = gt.ids[i + 1][gt.valid[i + 1]]
        assert set(a.tolist()) == set(b.tolist())
    all_ids = [tuple(sorted(gt.ids[i][gt.valid[i]].tolist()))
               for i in range(0, 6, 2)]
    assert len(set(all_ids)) == 3  # distinct across videos


def _write_video_sample(tmp_path, n_frames=6):
    vid_dir = tmp_path / "frames"
    vid_dir.mkdir()
    for i in range(n_frames):
        cv2.imwrite(str(vid_dir / f"{i:06d}.jpg"),
                    np.full((120, 160, 3), 10 * i, np.uint8))
    s = DataSample("vid0", metadata=dict(
        fps=10.0, number_of_frames=n_frames, data_path=str(vid_dir),
        resolution={"width": 160, "height": 120}))
    for i in range(n_frames):
        for k in range(2):
            e = AnnoEntity(time=i * 100.0, id=k)
            e.bbox = [10 + 5 * i + 30 * k, 20, 25, 35]
            e.labels = {"person": 1.0}
            e.blob = {"frame_idx": i}
            s.add_entity(e)
    return s


def test_video_dataset(tmp_path):
    sample = _write_video_sample(tmp_path)
    cfg = get_cfg()
    transforms = build_siam_augmentation(cfg, is_train=True, modality="video")
    ds = VideoDataset([("vid0", sample)], sampling_interval=200,
                      clip_len=300, frames_in_clip=2, transforms=transforms,
                      dataset_root="")
    assert len(ds) > 0
    frames, targets, vid = ds[(0, 3)]
    assert vid == "vid0"
    assert len(frames) == 2
    assert len(targets[0]) == 2
    assert targets[0].boxes.shape == (2, 4)

    both = ConcatDataset([ds, ds])
    assert len(both) == 2 * len(ds)
    _, _, v2 = both[(len(ds), 5)]
    assert v2 == "vid0"
