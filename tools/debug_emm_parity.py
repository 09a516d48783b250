"""Stage-by-stage EMM parity debug: JAX vs torch replica on shared weights.

Usage: python tools/debug_emm_parity.py   (CPU)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np
import torch

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from siammot_tpu.configs.defaults import get_cfg
from siammot_tpu.models.siammot import SiamMOT
from siammot_tpu.models import emm as emm_mod
from siammot_tpu.utils.checkpoint import export_torch_checkpoint
from torch_replica.rcnn import SiamMOTReplica

H, W = 192, 256

cfg = get_cfg()
cfg.TPU.S2D_STEM = False
cfg.TPU.POOLER_WINDOWED = False
cfg.TPU.USE_PALLAS = False
cfg.TPU.MAX_TRACKS = 4
cfg.INPUT.AMODAL = True
cfg.freeze()

model = SiamMOT(cfg)
params = model.init_params(jax.random.PRNGKey(7), (H, W))
sd = export_torch_checkpoint(params)
replica = SiamMOTReplica(cfg)
replica.load_state_dict({k: torch.from_numpy(np.asarray(v).copy())
                         for k, v in sd.items()}, strict=True)
replica.eval()

rng = np.random.RandomState(3)
f1 = rng.rand(1, H, W, 3).astype(np.float32) * 2 - 1
f2 = rng.rand(1, H, W, 3).astype(np.float32) * 2 - 1

boxes = np.array([[40.0, 50.0, 80.0, 100.0],
                  [120.0, 30.0, 180.0, 90.0]], np.float32)

net = model.net
ecfg = model.ecfg
emm = replica.roi_heads.track.tracker


def cmp(name, a, b, atol=2e-4):
    a, b = np.asarray(a), np.asarray(b)
    d = np.abs(a - b).max() if a.shape == b.shape else "SHAPE"
    print(f"{name:28s} {a.shape} vs {b.shape}  maxdiff={d}")
    return d


with torch.no_grad():
    # features on both frames
    jf1 = net.apply(params, jnp.asarray(f1), method=net.features)
    jf2 = net.apply(params, jnp.asarray(f2), method=net.features)
    tf1 = replica.backbone.fpn(replica.backbone.body(
        torch.from_numpy(f1.transpose(0, 3, 1, 2))))
    tf2 = replica.backbone.fpn(replica.backbone.body(
        torch.from_numpy(f2.transpose(0, 3, 1, 2))))

    tb = torch.from_numpy(boxes)
    jb = jnp.asarray(boxes)
    k = len(boxes)
    img_idx = jnp.zeros((k,), jnp.int32)

    # template pooling (frame 1)
    jt = emm_mod.pool_template([f[0:1] for f in jf1], jb, img_idx, ecfg)
    tt = emm.pooler_z(tf1, tb)
    cmp("template", jt, tt.permute(0, 2, 3, 1).numpy())

    # search region boxes
    jsr = emm_mod.make_search_region(jb, ecfg)
    tsr = emm.extend_bbox(tb + emm.pad_pixels)
    cmp("sr boxes", jsr, tsr.numpy())

    # sr features (frame 2)
    jsrf = emm_mod.pool_search_region([f[0:1] for f in jf2], jb, jsr,
                                      img_idx, ecfg)
    padded = emm.pad_feature(tf2)
    tsrf = emm.pooler_x(padded, tb, tsr)
    cmp("sr feats", jsrf, tsrf.permute(0, 2, 3, 1).numpy())

    # predictor logits
    jcls, jctr, jreg = net.apply(params, jsrf, jt, None,
                                 method=net.emm_predict)
    from torch_replica.rcnn import xcorr_depthwise
    resp = xcorr_depthwise(tsrf, tt)
    tcls, tctr, treg = emm.predictor(resp)
    cmp("cls logits", jcls, tcls.permute(0, 2, 3, 1).numpy(), atol=1e-3)
    cmp("ctr logits", jctr, tctr.permute(0, 2, 3, 1).numpy(), atol=1e-3)
    cmp("reg logits", jreg, treg.permute(0, 2, 3, 1).numpy(), atol=1e-3)

    # decode
    from siammot_tpu.models.siammot import UPSCALE
    jbox, jconf = emm_mod.decode_response_fused(
        jcls, jctr, jreg, jsr, jb, ecfg, UPSCALE, use_pallas=False)
    tboxes, tconf = emm.track(tf2, tt, tsr, tb, (W, H))
    cmp("decoded boxes", jbox, tboxes.numpy(), atol=1e-2)
    cmp("decoded conf", jconf, tconf.numpy(), atol=1e-3)
    print("jbox", np.asarray(jbox))
    print("tbox", tboxes.numpy())

    # --- dig into the decode: compare p_conf maps
    import torch.nn.functional as TF
    import math
    up = 16
    tcls_u = TF.interpolate(tcls, scale_factor=up, mode="bicubic")
    tctr_u = TF.interpolate(tctr, scale_factor=up, mode="bicubic")
    treg_u = TF.interpolate(treg, scale_factor=up, mode="bicubic")
    prob_t = TF.softmax(tcls_u, dim=1)[:, 1:2]
    conf_t = (prob_t * torch.sigmoid(tctr_u)).reshape(k, -1)
    tlbr_t = treg_u.reshape(k, 4, -1)
    bw = tb[:, 2] - tb[:, 0]
    bh = tb[:, 3] - tb[:, 1]
    sw = (tlbr_t[:, 2] + tlbr_t[:, 0]) / bw[:, None]
    sh = (tlbr_t[:, 3] + tlbr_t[:, 1]) / bh[:, None]
    sw = torch.max(sw, 1 / sw)
    sh = torch.max(sh, 1 / sh)
    pen_t = torch.exp((-sw * sh + 1) * 0.1)
    side = 256
    hann = torch.hann_window(side)
    win = torch.outer(hann, hann).reshape(-1)
    pconf_t = (conf_t * pen_t) * 0.6 + 0.4 * win[None]

    # JAX unfused
    from siammot_tpu.ops.upsample import upsample_bicubic
    jcls_u = upsample_bicubic(jcls, up)
    jctr_u = upsample_bicubic(jctr, up)
    jreg_u = upsample_bicubic(jreg, up)
    prob_j = jax.nn.softmax(jcls_u, axis=-1)[..., 1].reshape(k, -1)
    conf_j = prob_j * jax.nn.sigmoid(jctr_u[..., 0]).reshape(k, -1)
    tlbr_j = np.asarray(jreg_u).reshape(k, side * side, 4)
    cmp("cls upsampled", jcls_u, tcls_u.permute(0, 2, 3, 1).numpy())
    cmp("reg upsampled", jreg_u, treg_u.permute(0, 2, 3, 1).numpy())
    cmp("conf map", conf_j, conf_t.numpy())
    sw_j = (tlbr_j[..., 2] + tlbr_j[..., 0]) / np.asarray(bw)[:, None]
    sh_j = (tlbr_j[..., 3] + tlbr_j[..., 1]) / np.asarray(bh)[:, None]
    sw_j = np.maximum(sw_j, 1 / sw_j)
    sh_j = np.maximum(sh_j, 1 / sh_j)
    pen_j = np.exp((-sw_j * sh_j + 1) * 0.1)
    cmp("penalty", pen_j, pen_t.numpy())
    pconf_j = conf_j * pen_j * 0.6 + 0.4 * np.asarray(
        emm_mod._hann_window(side))[None]
    cmp("pconf", pconf_j, pconf_t.numpy())
    print("argmax torch", pconf_t.argmax(1).numpy(),
          "jax", np.argmax(pconf_j, 1))
    print("pconf_t range", pconf_t.min().item(), pconf_t.max().item())
