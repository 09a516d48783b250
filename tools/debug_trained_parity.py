"""Debug trained-checkpoint parity: where do JAX and the replica diverge?"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import torch

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from siammot_tpu.configs.defaults import get_cfg
from siammot_tpu.models.siammot import SiamMOT
from siammot_tpu.utils.checkpoint import (Checkpointer,
                                          export_torch_checkpoint,
                                          import_torch_checkpoint)
from torch_replica.rcnn import SiamMOTReplica
from make_synth_mot import Sprite, _texture

H, W = 384, 640
cfg = get_cfg()
cfg.TPU.S2D_STEM = False
cfg.TPU.POOLER_WINDOWED = False
cfg.TPU.USE_PALLAS = False
cfg.TPU.MAX_TRACKS = 8
cfg.freeze()

model = SiamMOT(cfg)
template = model.init_params(jax.random.PRNGKey(0), (H, W))
ck = Checkpointer("/tmp/train_synmot_r2/DLA34_box_EMM_SYNMOT_v2")
restored = ck.load(ck.latest(), like=None)
sd = export_torch_checkpoint(restored["params"])
params, leftovers = import_torch_checkpoint(sd, template)
print("leftovers:", leftovers)

replica = SiamMOTReplica(cfg)
replica.load_state_dict({k: torch.from_numpy(np.asarray(v).copy())
                         for k, v in sd.items()}, strict=True)
replica.eval()

rng = np.random.RandomState(5)
bg = _texture(rng, H, W, scale=16)
sprites = [Sprite(rng, i + 1, W, H) for i in range(6)]
f = bg.copy()
for s in sorted(sprites, key=lambda s: s.h):
    s.draw(f)

mean = np.asarray(cfg.INPUT.PIXEL_MEAN, np.float32)
std = np.asarray(cfg.INPUT.PIXEL_STD, np.float32)
x = f.astype(np.float32)
if cfg.INPUT.TO_BGR255:
    x = x[..., ::-1]
x = ((x - mean) / std).astype(np.float32)[None]
print("input stats", x.min(), x.max(), cfg.INPUT.TO_BGR255, mean)

net = model.net
with torch.no_grad():
    jf = net.apply(params, jnp.asarray(x), method=net.features)
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
    tf = replica.backbone.fpn(replica.backbone.body(tx))
    for i, (a, b) in enumerate(zip(jf, tf)):
        a = np.asarray(a)
        b = b.permute(0, 2, 3, 1).numpy()
        print(f"P{i+2}: maxdiff {np.abs(a-b).max():.5f} "
              f"| jax rms {np.sqrt((a**2).mean()):.4f} "
              f"torch rms {np.sqrt((b**2).mean()):.4f}")

    logits, deltas = net.apply(params, jf, method=net.rpn_maps)
    tlogits, tdeltas = replica.rpn.head(tf)
    for i, (lg, tlg) in enumerate(zip(logits, tlogits)):
        d = np.abs(np.asarray(lg) - tlg.permute(0, 2, 3, 1).numpy()).max()
        print(f"rpn L{i}: maxdiff {d:.5f} max jax {float(jnp.max(lg)):.3f} "
              f"max torch {tlg.max().item():.3f}")

# ---- properly scaled input + box head comparison
x = f.astype(np.float32) / 255.0
x = ((x - mean) / std).astype(np.float32)[None]
print("== scaled ==", x.min(), x.max())
with torch.no_grad():
    jf = net.apply(params, jnp.asarray(x), method=net.features)
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
    tf = replica.backbone.fpn(replica.backbone.body(tx))

    # shared fixed proposals: sprite boxes
    rois = []
    for s in sprites:
        rois.append([s.x, s.y, s.x + s.w - 1, s.y + s.h - 1])
    rois = np.asarray(rois, np.float32)
    trois = torch.from_numpy(rois)

    tcl, tbd = replica.roi_heads.box(tf, trois)
    tprob = torch.softmax(tcl, dim=-1)[:, 1]
    print("torch box scores:", tprob.numpy().round(3))

    from siammot_tpu.models.box_head import pool_levels
    jl = pool_levels(jnp.asarray(rois), 4)
    jcl, jbd = net.apply(params, jf, jnp.asarray(rois)[None], jl[None],
                         None, None, method=net.box_predict)
    jprob = jax.nn.softmax(jcl[0], axis=-1)[:, 1]
    print("jax box scores:  ", np.asarray(jprob).round(3))
    print("cls logits maxdiff", np.abs(np.asarray(jcl[0]) - tcl.numpy()).max())
    print("box deltas maxdiff", np.abs(np.asarray(jbd[0]) - tbd.numpy()).max())

    # pooled features comparison
    tpool = replica.roi_heads.box.pool(tf, trois)
    from siammot_tpu.ops.roi_align import multilevel_roi_align
    jpool = multilevel_roi_align([ff[0] for ff in jf[:4]], jnp.asarray(rois),
                                 jl, 7, tuple(cfg.MODEL.ROI_BOX_HEAD.POOLER_SCALES), 2)
    print("pool maxdiff", np.abs(np.asarray(jpool)
                                 - tpool.permute(0, 2, 3, 1).numpy()).max(),
          "rms", float(np.sqrt((np.asarray(jpool)**2).mean())))
    # level assignment comparison
    print("jax levels", np.asarray(jl), "torch levels",
          replica.roi_heads.box.mapper(trois).numpy())
