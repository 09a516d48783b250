"""Model-level golden parity vs the pure-torch reference replica.

The replica (tests/torch_replica/) independently re-implements the
reference's composed inference graph (rcnn.py:41, box_head/inference.py:
46-191, EMM/track_core.py:68-135, track_solver.py) in torch.  Weights are
shared through the production checkpoint converter, so these tests prove
the whole chain: converter key inventory (strict load), backbone/FPN/RPN
numerics, and — through the given-detection golden test — the full
detect -> propagate -> refine -> solve -> memory loop producing the same
boxes, scores and ids over consecutive frames.

A final RPN-mode golden test runs when a trained SYNMOT checkpoint is
available (decisive detection scores make the top-k/NMS decisions stable;
random weights would flip selections inside float noise).  Train one with
  python tools/train_net.py --config-file configs/dla/DLA_34_FPN_EMM_SYNMOT.yaml ...
or point SIAMMOT_PARITY_CKPT at an existing run directory.
"""

import pytest as _pytest

pytestmark = _pytest.mark.slow

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from siammot_tpu.configs.defaults import get_cfg
from siammot_tpu.core.structures import Boxes
from siammot_tpu.models.siammot import SiamMOT
from siammot_tpu.utils.checkpoint import (export_torch_checkpoint,
                                          import_torch_checkpoint)

from torch_replica.rcnn import SiamMOTReplica

H, W = 192, 256


def make_cfg(**overrides):
    cfg = get_cfg()
    cfg.TPU.S2D_STEM = False            # exact shared parameterization
    cfg.TPU.POOLER_WINDOWED = False     # gather pooler = reference ROIAlign
    cfg.TPU.TRAIN_POOLER_WINDOWED = False
    cfg.TPU.USE_PALLAS = False
    cfg.TPU.MAX_TRACKS = 8
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 500
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 100
    cfg.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 100
    for k, v in overrides.items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = getattr(node, p)
        setattr(node, parts[-1], v)
    cfg.freeze()
    return cfg


def load_replica(cfg, params):
    sd = export_torch_checkpoint(params)
    replica = SiamMOTReplica(cfg)
    missing = replica.load_state_dict(
        {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()},
        strict=True)
    assert not missing.missing_keys and not missing.unexpected_keys
    replica.eval()
    return replica


def t2np(x):
    return x.detach().cpu().numpy()


@pytest.fixture(scope="module")
def shared():
    cfg = make_cfg()
    model = SiamMOT(cfg)
    params = model.init_params(jax.random.PRNGKey(7), (H, W))
    replica = load_replica(cfg, params)
    rng = np.random.RandomState(3)
    image = rng.rand(1, H, W, 3).astype(np.float32) * 4.0 - 2.0
    return cfg, model, params, replica, image


def test_strict_state_dict_roundtrip(shared):
    """Every parameter the replica (= reference graph) owns is produced by
    the exporter with the right name and shape — the converter inventory
    is complete in both directions (strict load asserts inside fixture)."""
    cfg, model, params, replica, image = shared
    # and the inverse: importing the export back reproduces the tree
    sd = export_torch_checkpoint(params)
    back, leftovers = import_torch_checkpoint(sd, params)
    assert not leftovers
    a = jax.tree.leaves(params)
    b = jax.tree.leaves(back)
    assert all(np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(a, b))


def test_backbone_fpn_rpn_parity(shared):
    cfg, model, params, replica, image = shared
    net = model.net
    feats = net.apply(params, jnp.asarray(image), method=net.features)
    timage = torch.from_numpy(image.transpose(0, 3, 1, 2))
    with torch.no_grad():
        tfeats = replica.backbone.fpn(replica.backbone.body(timage))
        tlogits, tdeltas = replica.rpn.head(tfeats)
    assert len(feats) == len(tfeats) == 5
    for f, tf in zip(feats, tfeats):
        ref = t2np(tf).transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(f), ref, atol=2e-4, rtol=1e-3)

    logits, deltas = net.apply(params, feats, method=net.rpn_maps)
    for lg, tlg in zip(logits, tlogits):
        # torch layout [1, A, h, w] -> NHWA
        np.testing.assert_allclose(np.asarray(lg),
                                   t2np(tlg).transpose(0, 2, 3, 1),
                                   atol=3e-4, rtol=1e-3)
    for dl, tdl in zip(deltas, tdeltas):
        a = dl.shape[-1] // 4
        h, w = tdl.shape[-2:]
        # JAX layout [1,h,w,A*4] with (A,4) fastest; torch [1, A*4, h, w]
        ref = t2np(tdl).reshape(1, a, 4, h, w).transpose(0, 3, 4, 1, 2)
        np.testing.assert_allclose(np.asarray(dl).reshape(1, h, w, a, 4),
                                   ref, atol=3e-4, rtol=1e-3)


def _render_frames(n_frames, rng, w=W, h=H):
    """Textured moving sprites on a textured background, normalized to
    zero-mean unit-ish range; identical input for both frameworks."""
    base = rng.rand(h, w, 3).astype(np.float32) * 0.4
    frames = []
    centers = np.array([[60.0, 60.0], [170.0, 90.0], [90.0, 150.0]])
    vel = np.array([[3.0, 1.5], [-2.5, 2.0], [2.0, -2.5]])
    tex = [rng.rand(40, 30, 3).astype(np.float32) * 2.0 + 0.5
           for _ in range(3)]
    boxes = []
    for t in range(n_frames):
        f = base.copy()
        fb = []
        for i, (c, v) in enumerate(zip(centers, vel)):
            cx, cy = c + v * t
            bh, bw = tex[i].shape[:2]
            x1, y1 = int(cx - bw / 2), int(cy - bh / 2)
            f[y1:y1 + bh, x1:x1 + bw] = tex[i]
            fb.append([x1, y1, x1 + bw - 1, y1 + bh - 1])
        frames.append(f[None])
        boxes.append(np.asarray(fb, np.float32))
    return frames, boxes


def _extract_rows(out):
    v = np.asarray(out.valid)
    rows = np.concatenate([np.asarray(out.boxes),
                           np.asarray(out.scores)[:, None],
                           np.asarray(out.ids)[:, None].astype(np.float32)],
                          axis=1)
    return rows[v]


def _match_rows(jrows, trows, box_atol, score_atol, ctx):
    assert len(jrows) == len(trows), \
        f"{ctx}: row count {len(jrows)} vs {len(trows)}"
    used = set()
    for r in jrows:
        best, best_d = None, 1e9
        for i, t in enumerate(trows):
            if i in used:
                continue
            d = np.abs(r[:4] - t[:4]).max()
            if d < best_d:
                best, best_d = i, d
        t = trows[best]
        assert best_d <= box_atol, f"{ctx}: box diff {best_d}\n{r}\n{t}"
        assert abs(r[4] - t[4]) <= score_atol, f"{ctx}: score {r[4]} {t[4]}"
        assert int(r[5]) == int(t[5]), f"{ctx}: id {r[5]} vs {t[5]}"
        used.add(best)


def test_given_detection_tracking_golden(shared):
    """Full multi-frame loop in MOT17 public-detection mode (amodal, given
    boxes): detections, propagated + refined tracks, solver transitions and
    ids must agree row for row over 4 frames."""
    cfg = make_cfg(**{"INPUT.AMODAL": True,
                      "TPU.MAX_TRACKS": 16,   # replica capacity is unbounded
                      "MODEL.TRACK_HEAD.START_TRACK_THRESH": 0.25,
                      "MODEL.TRACK_HEAD.TRACK_THRESH": 0.05,
                      "MODEL.TRACK_HEAD.RESUME_TRACK_THRESH": 0.05})
    model = SiamMOT(cfg)
    params = model.init_params(jax.random.PRNGKey(7), (H, W))
    replica = load_replica(cfg, params)

    rng = np.random.RandomState(11)
    frames, gt_boxes = _render_frames(4, rng)

    state = model.empty_state()
    g = 4  # given capacity

    for t, (frame, gb) in enumerate(zip(frames, gt_boxes)):
        n = len(gb)
        pad = g - n
        given = Boxes(
            boxes=jnp.asarray(np.concatenate([gb, np.zeros((pad, 4),
                                                           np.float32)])),
            scores=jnp.ones((g,), jnp.float32),
            ids=jnp.full((g,), -1, jnp.int32),
            labels=jnp.zeros((g,), jnp.int32),
            valid=jnp.asarray(np.concatenate([np.ones(n, bool),
                                              np.zeros(pad, bool)])))
        out, state = model.forward_inference(params, jnp.asarray(frame),
                                             state, given=given,
                                             image_size=(W, H))
        tout = replica.step(torch.from_numpy(frame.transpose(0, 3, 1, 2)),
                            (W, H), given_boxes=torch.from_numpy(gb))
        jrows = _extract_rows(out)
        trows = np.concatenate([t2np(tout["boxes"]),
                                t2np(tout["scores"])[:, None],
                                t2np(tout["ids"])[:, None].astype(np.float32)],
                               axis=1)
        _match_rows(jrows, trows, box_atol=0.1, score_atol=5e-3,
                    ctx=f"frame {t}")
        # every object is being tracked from frame 1 on
        if t >= 1:
            ids = jrows[:, 5]
            assert (ids >= 0).sum() >= len(gb), f"frame {t}: lost tracks"


CKPT = os.environ.get(
    "SIAMMOT_PARITY_CKPT",
    "/tmp/train_synmot_std/DLA34_box_EMM_SYNMOT_std")


@pytest.mark.skipif(
    not os.path.isdir(CKPT),
    reason=f"requires a chip-trained std-stem checkpoint at {CKPT} "
    "(perishable /tmp state; the hermetic committed-fixture goldens in "
    "test_parity_fixture_golden.py carry this proof on fresh clones). "
    "Regenerate (~15 min on chip): python tools/train_net.py "
    "--config-file configs/dla/DLA_34_FPN_EMM_SYNMOT.yaml "
    "--train-dir /tmp/train_synmot_std --model-suffix std "
    "DATASETS.ROOT_DIR /tmp TPU.S2D_STEM False SOLVER.MAX_ITER 2500 "
    "SOLVER.STEPS '(1500, 2200)'")
def test_rpn_mode_tracking_golden_trained():
    """End-to-end RPN-mode golden test with trained (decisive) weights:
    RPN selection, NMS, box head, EMM propagation and solver agree over 3
    frames."""
    from siammot_tpu.utils.checkpoint import Checkpointer

    cfg = make_cfg()
    model = SiamMOT(cfg)
    template = model.init_params(jax.random.PRNGKey(0), (H, W))
    ck = Checkpointer(CKPT)
    path = ck.latest()
    assert path, CKPT
    # the checkpoint was trained with the S2D stem: route through the
    # torch exporter (projects onto the reference stem parameterization)
    # and import into the standard-stem template so BOTH frameworks run
    # the identical projected weights
    # NB: the checkpoint must be trained with TPU.S2D_STEM=False — a
    # trained S2D stem cannot be represented in the reference stem
    # parameterization and the exporter would PROJECT it (and warn),
    # wrecking detection quality on both sides of this comparison.
    restored = ck.load(path, like=None)
    sd = export_torch_checkpoint(restored["params"])
    params, leftovers = import_torch_checkpoint(sd, template)
    assert not leftovers
    replica = load_replica(cfg, params)

    # render SYNMOT-style frames (the training distribution) in-memory so
    # detection scores are decisive; out-of-distribution input would leave
    # every decision inside float noise
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    from make_synth_mot import Sprite, _texture

    h, w = 384, 640
    rng = np.random.RandomState(5)
    bg = _texture(rng, h, w, scale=16)
    sprites = [Sprite(rng, i + 1, w, h) for i in range(6)]
    frames = []
    for _ in range(3):
        f = bg.copy()
        for s in sorted(sprites, key=lambda s: s.h):
            s.draw(f)
        frames.append(f.copy())
        for s in sprites:
            s.step(rng, w, h)

    mean = np.asarray(cfg.INPUT.PIXEL_MEAN, np.float32)
    std = np.asarray(cfg.INPUT.PIXEL_STD, np.float32)

    def norm(f):
        x = f.astype(np.float32)
        if cfg.INPUT.TO_BGR255:
            x = x[..., ::-1]
        else:
            x = x / 255.0
        return ((x - mean) / std).astype(np.float32)[None]

    def confident(rows, thresh=0.1):
        return rows[rows[:, 4] >= thresh]

    state = model.empty_state()
    n_conf = 0
    for t, frame in enumerate(frames):
        x = norm(frame)
        out, state = model.forward_inference(params, jnp.asarray(x), state,
                                             image_size=(w, h))
        tout = replica.step(
            torch.from_numpy(x.transpose(0, 3, 1, 2).copy()), (w, h))
        jrows = _extract_rows(out)
        trows = np.concatenate([t2np(tout["boxes"]),
                                t2np(tout["scores"])[:, None],
                                t2np(tout["ids"])[:, None].astype(np.float32)],
                               axis=1)
        # sub-0.1-score rows are float-noise territory (the reference on a
        # different GPU would flip them too); everything above must match
        # box-for-box with identical ids
        _match_rows(confident(jrows), confident(trows), box_atol=0.5,
                    score_atol=2e-2, ctx=f"frame {t}")
        n_conf += (confident(jrows)[:, 4] >= 0.5).sum()
    assert n_conf >= 6, "fixture not decisive enough to prove anything"
