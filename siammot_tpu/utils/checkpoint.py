"""Checkpointing: Orbax pytree save/load + PyTorch reference-weight import.

Replaces the reference's maskrcnn ``DetectronCheckpointer``
(``tools/train_net.py:56-70``; SURVEY.md §5.4): model + optimizer +
iteration are saved as an Orbax pytree every CHECKPOINT_PERIOD and the
latest checkpoint resumes training.  ``import_torch_checkpoint`` converts
a reference/maskrcnn ``.pth`` state dict into this framework's parameter
tree (conv OIHW -> HWIO transpose, FC transpose, FrozenBatchNorm folded
into scale/bias) so released SiamMOT checkpoints can run here for
box-level parity testing.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax
import numpy as np


class Checkpointer:
    """Orbax-backed save/load of (params, opt_state, iteration)."""

    def __init__(self, output_dir: str):
        import orbax.checkpoint as ocp
        self.dir = os.path.abspath(output_dir)
        os.makedirs(self.dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def save(self, iteration: int, params, opt_state, tag: Optional[str] = None):
        name = tag or f"model_{iteration:07d}"
        path = os.path.join(self.dir, name)
        self._ckptr.save(path, {"params": params, "opt_state": opt_state,
                                "iteration": iteration}, force=True)
        self._ckptr.wait_until_finished()

    def latest(self) -> Optional[str]:
        """Highest-numbered checkpoint; ``model_final`` only as fallback
        (a stale final from an interrupted earlier run must not shadow
        newer periodic checkpoints)."""
        cands = [d for d in os.listdir(self.dir)
                 if re.match(r"model_\d+$", d)]
        if cands:
            cands.sort(key=lambda d: int(d.split("_")[1]))
            return os.path.join(self.dir, cands[-1])
        if os.path.isdir(os.path.join(self.dir, "model_final")):
            return os.path.join(self.dir, "model_final")
        return None

    def load(self, path: Optional[str], like):
        """Restore into the structure of ``like`` (a template pytree)."""
        path = path or self.latest()
        if path is None:
            return None
        return self._ckptr.restore(os.path.abspath(path), like)


# ---------------------------------------------------------------------------
# PyTorch -> JAX conversion
# ---------------------------------------------------------------------------

def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def fold_frozen_bn(sd: dict, prefix: str):
    """maskrcnn FrozenBatchNorm2d (no eps): scale = w / sqrt(var),
    bias = b - mean * scale."""
    w = sd[prefix + ".weight"]
    b = sd[prefix + ".bias"]
    mean = sd[prefix + ".running_mean"]
    var = sd[prefix + ".running_var"]
    scale = w / np.sqrt(var)
    return {"scale": scale, "bias": b - mean * scale}


def import_torch_checkpoint(path_or_state, params_template):
    """Convert a reference .pth state dict into this framework's params.

    Handles the module-name mapping between the reference graph
    (``backbone.body/fpn``, ``rpn.head``, ``roi_heads.box/track``) and this
    framework's flax tree.  Unknown keys are reported, not fatal.
    """
    import torch

    if isinstance(path_or_state, (str, os.PathLike)):
        state = torch.load(path_or_state, map_location="cpu",
                           weights_only=False)
        state = state.get("model", state)
    else:
        state = path_or_state
    sd = {k.removeprefix("module."): np.asarray(v)
          for k, v in state.items() if hasattr(v, "shape")}

    flat = _flatten(params_template)
    out = dict(flat)
    used = set()

    def put(jkey: str, value: np.ndarray):
        if jkey not in flat:
            raise KeyError(f"no such param in template: {jkey}")
        if flat[jkey].shape != value.shape:
            raise ValueError(
                f"{jkey}: shape {value.shape} vs {flat[jkey].shape}")
        out[jkey] = value.astype(np.asarray(flat[jkey]).dtype)

    def conv(tkey: str, jprefix: str):
        put(jprefix + "/kernel", _conv_kernel(sd[tkey + ".weight"]))
        used.add(tkey + ".weight")
        if tkey + ".bias" in sd:
            put(jprefix + "/bias", sd[tkey + ".bias"])
            used.add(tkey + ".bias")

    def bn(tkey: str, jprefix: str):
        f = fold_frozen_bn(sd, tkey)
        put(jprefix + "/scale", f["scale"])
        put(jprefix + "/bias", f["bias"])
        for suf in (".weight", ".bias", ".running_mean", ".running_var"):
            used.add(tkey + suf)

    def dense(tkey: str, jprefix: str):
        put(jprefix + "/kernel", sd[tkey + ".weight"].T)
        used.add(tkey + ".weight")
        if tkey + ".bias" in sd:
            put(jprefix + "/bias", sd[tkey + ".bias"])
            used.add(tkey + ".bias")

    def gn(tkey: str, jprefix: str):
        put(jprefix + "/scale", sd[tkey + ".weight"])
        put(jprefix + "/bias", sd[tkey + ".bias"])
        used.add(tkey + ".weight")
        used.add(tkey + ".bias")

    # ---- body
    body = "backbone.body."
    if "params/body/stem_conv1/kernel" in flat:
        # ResNet body (maskrcnn resnet.py names: stem.conv1/bn1,
        # layer{s}.{b}.conv{1,2,3}/bn{1,2,3}, downsample.[0,1])
        conv(body + "stem.conv1", "params/body/stem_conv1")
        bn(body + "stem.bn1", "params/body/stem_bn1")
        for s in (1, 2, 3, 4):
            b = 0
            while f"{body}layer{s}.{b}.conv1.weight" in sd:
                tb = f"{body}layer{s}.{b}"
                jb = f"params/body/layer{s}_{b}"
                for c in (1, 2, 3):
                    conv(f"{tb}.conv{c}", f"{jb}/conv{c}")
                    bn(f"{tb}.bn{c}", f"{jb}/bn{c}")
                if f"{tb}.downsample.0.weight" in sd:
                    conv(f"{tb}.downsample.0", f"{jb}/downsample_conv")
                    bn(f"{tb}.downsample.1", f"{jb}/downsample_bn")
                b += 1
    elif "params/body/stem/s2d_base_conv/kernel" in flat:
        # model uses the space-to-depth stem: phase-decompose the stem
        # weights (exact; see models/dla.py stem_to_s2d)
        from ..models.dla import stem_to_s2d
        s2d = stem_to_s2d(
            _conv_kernel(sd[body + "base_layer.0.weight"]),
            fold_frozen_bn(sd, body + "base_layer.1"),
            _conv_kernel(sd[body + "level0.0.weight"]),
            fold_frozen_bn(sd, body + "level0.1"),
            _conv_kernel(sd[body + "level1.0.weight"]),
            fold_frozen_bn(sd, body + "level1.1"))
        for mod, payload in s2d.items():
            for leaf, val in payload.items():
                put(f"params/body/stem/{mod}/{leaf}", val)
        for t in ("base_layer.0.weight", "level0.0.weight",
                  "level1.0.weight"):
            used.add(body + t)
        for t in ("base_layer.1", "level0.1", "level1.1"):
            for suf in (".weight", ".bias", ".running_mean", ".running_var"):
                used.add(body + t + suf)
    else:
        conv(body + "base_layer.0", "params/body/base_conv")
        bn(body + "base_layer.1", "params/body/base_bn")
        for lvl in (0, 1):
            i = 0
            while f"{body}level{lvl}.{3 * i}.weight" in sd:
                conv(f"{body}level{lvl}.{3 * i}",
                     f"params/body/level{lvl}_conv{i}")
                bn(f"{body}level{lvl}.{3 * i + 1}",
                   f"params/body/level{lvl}_bn{i}")
                i += 1

    def map_block(tprefix: str, jprefix: str):
        for c in (1, 2, 3):
            if f"{tprefix}.conv{c}.weight" in sd:
                conv(f"{tprefix}.conv{c}", f"{jprefix}/conv{c}")
                bn(f"{tprefix}.bn{c}", f"{jprefix}/bn{c}")
        i = 0  # Bottle2neck scale convs (nn.ModuleList convs/bns)
        while f"{tprefix}.convs.{i}.weight" in sd:
            conv(f"{tprefix}.convs.{i}", f"{jprefix}/convs_{i}")
            bn(f"{tprefix}.bns.{i}", f"{jprefix}/bns_{i}")
            i += 1

    def map_tree(tprefix: str, jprefix: str):
        if f"{tprefix}.project.0.weight" in sd:
            conv(f"{tprefix}.project.0", f"{jprefix}/project_conv")
            bn(f"{tprefix}.project.1", f"{jprefix}/project_bn")
        if f"{tprefix}.root.conv.weight" in sd:  # leaf tree
            map_block(f"{tprefix}.tree1", f"{jprefix}/tree1")
            map_block(f"{tprefix}.tree2", f"{jprefix}/tree2")
            conv(f"{tprefix}.root.conv", f"{jprefix}/root/conv")
            bn(f"{tprefix}.root.bn", f"{jprefix}/root/bn")
        else:
            map_tree(f"{tprefix}.tree1", f"{jprefix}/tree1")
            map_tree(f"{tprefix}.tree2", f"{jprefix}/tree2")

    if "params/body/stem_conv1/kernel" not in flat:   # DLA trees only
        for lvl in (2, 3, 4, 5):
            map_tree(f"{body}level{lvl}", f"params/body/level{lvl}")

    # ---- FPN
    for i in (1, 2, 3, 4):
        conv(f"backbone.fpn.fpn_inner{i}", f"params/fpn/inner{i}")
        conv(f"backbone.fpn.fpn_layer{i}", f"params/fpn/layer{i}")

    # ---- RPN head
    conv("rpn.head.conv", "params/rpn/conv")
    conv("rpn.head.cls_logits", "params/rpn/cls_logits")
    conv("rpn.head.bbox_pred", "params/rpn/bbox_pred")

    # ---- box head
    # fc6 consumes the FLATTENED pooled features, whose memory order
    # differs between frameworks: torch flattens [C, res, res] (C-major),
    # flax flattens [res, res, C] (HWC).  Permute fc6's input dim
    # accordingly (caught by tests/test_reference_model_parity.py — a
    # plain transpose scrambles every real reference checkpoint).
    fx = "roi_heads.box.feature_extractor."

    def dense_fc6(tkey: str, jkey: str):
        wt = sd[tkey + ".weight"]                       # [out, C*res*res]
        in_j = flat[jkey + "/kernel"].shape[0]
        c = flat["params/fpn/layer1/kernel"].shape[-1]
        res = int(np.sqrt(in_j // c))
        assert res * res * c == in_j, (in_j, c)
        wt = wt.reshape(-1, c, res, res).transpose(0, 2, 3, 1)
        put(jkey + "/kernel", wt.reshape(wt.shape[0], -1).T)
        used.add(tkey + ".weight")
        put(jkey + "/bias", sd[tkey + ".bias"])
        used.add(tkey + ".bias")

    dense_fc6(fx + "fc6", "params/box/feature_extractor/fc6")
    dense(fx + "fc7", "params/box/feature_extractor/fc7")
    dense("roi_heads.box.predictor.cls_score", "params/box/predictor/cls_score")
    dense("roi_heads.box.predictor.bbox_pred", "params/box/predictor/bbox_pred")

    # ---- EMM predictor (make_conv3x3 towers: [conv, gn] sequentials)
    tp = "roi_heads.track.tracker.predictor."
    conv(tp + "cls_tower.0", "params/emm/predictor/cls_tower_conv")
    gn(tp + "cls_tower.1", "params/emm/predictor/cls_tower_gn")
    conv(tp + "reg_tower.0", "params/emm/predictor/reg_tower_conv")
    gn(tp + "reg_tower.1", "params/emm/predictor/reg_tower_gn")
    conv(tp + "cls.0", "params/emm/predictor/cls")
    conv(tp + "center.0", "params/emm/predictor/center")
    conv(tp + "reg.0", "params/emm/predictor/reg")

    leftovers = sorted(k for k in sd if k not in used
                       and "num_batches_tracked" not in k
                       and not k.startswith("fc."))
    return _unflatten(out), leftovers


def export_torch_checkpoint(params) -> dict:
    """Inverse of ``import_torch_checkpoint``: emit a reference-named
    PyTorch state dict (OIHW convs, transposed FCs, FrozenBN unfolded with
    running stats at identity).  Used for converter roundtrip testing and
    for handing weights back to the reference implementation."""
    flat = _flatten(params)
    sd: dict = {}

    def conv(tkey, jprefix):
        sd[tkey + ".weight"] = np.transpose(
            np.asarray(flat[jprefix + "/kernel"]), (3, 2, 0, 1))
        if jprefix + "/bias" in flat:
            sd[tkey + ".bias"] = np.asarray(flat[jprefix + "/bias"])

    def bn(tkey, jprefix):
        scale = np.asarray(flat[jprefix + "/scale"])
        bias = np.asarray(flat[jprefix + "/bias"])
        sd[tkey + ".weight"] = scale
        sd[tkey + ".bias"] = bias
        sd[tkey + ".running_mean"] = np.zeros_like(scale)
        sd[tkey + ".running_var"] = np.ones_like(scale)

    def dense(tkey, jprefix):
        sd[tkey + ".weight"] = np.asarray(flat[jprefix + "/kernel"]).T
        if jprefix + "/bias" in flat:
            sd[tkey + ".bias"] = np.asarray(flat[jprefix + "/bias"])

    def gn(tkey, jprefix):
        sd[tkey + ".weight"] = np.asarray(flat[jprefix + "/scale"])
        sd[tkey + ".bias"] = np.asarray(flat[jprefix + "/bias"])

    body = "backbone.body."
    if "params/body/stem_conv1/kernel" in flat:
        # ResNet body
        conv(body + "stem.conv1", "params/body/stem_conv1")
        bn(body + "stem.bn1", "params/body/stem_bn1")
        for s in (1, 2, 3, 4):
            b = 0
            while f"params/body/layer{s}_{b}/conv1/kernel" in flat:
                tb = f"{body}layer{s}.{b}"
                jb = f"params/body/layer{s}_{b}"
                for c in (1, 2, 3):
                    conv(f"{tb}.conv{c}", f"{jb}/conv{c}")
                    bn(f"{tb}.bn{c}", f"{jb}/bn{c}")
                if f"{jb}/downsample_conv/kernel" in flat:
                    conv(f"{tb}.downsample.0", f"{jb}/downsample_conv")
                    bn(f"{tb}.downsample.1", f"{jb}/downsample_bn")
                b += 1
    elif "params/body/stem/s2d_base_conv/kernel" in flat:
        from ..models.dla import s2d_to_stem
        s2d_tree = {}
        for mod in ("s2d_base_conv", "s2d_base_bn", "s2d_level0_conv",
                    "s2d_level0_bn", "s2d_level1_conv", "s2d_level1_bn"):
            s2d_tree[mod] = {
                leaf.rsplit("/", 1)[1]: np.asarray(flat[leaf])
                for leaf in flat if leaf.startswith(
                    f"params/body/stem/{mod}/")}
        c0 = s2d_tree["s2d_base_bn"]["scale"].shape[0] // 4
        c1 = s2d_tree["s2d_level1_bn"]["scale"].shape[0]
        std = s2d_to_stem(s2d_tree, c0, c1)
        # the S2D stem's function class is larger than the standard stem's
        # (extra phase taps + per-phase BN); a stem TRAINED in S2D form
        # generally cannot be represented exactly, and this export then
        # PROJECTS it (PARITY.md #7).  Quantify and warn so users don't
        # silently ship a degraded torch model — for exact export train
        # with TPU.S2D_STEM=False.
        from ..models.dla import stem_to_s2d
        rt = stem_to_s2d(std["base_conv"]["kernel"], std["base_bn"],
                         std["level0_conv0"]["kernel"], std["level0_bn0"],
                         std["level1_conv0"]["kernel"], std["level1_bn0"])
        num = den = 0.0
        for mod, payload in rt.items():
            for leaf, val in payload.items():
                orig = np.asarray(s2d_tree[mod][leaf])
                num += float(np.sum((orig - np.asarray(val)) ** 2))
                den += float(np.sum(orig ** 2))
        rel = (num / max(den, 1e-20)) ** 0.5
        if rel > 1e-3:
            import logging
            logging.getLogger(__name__).warning(
                "S2D stem projection is LOSSY (relative error %.3f): this "
                "model was trained with TPU.S2D_STEM=True and its stem "
                "cannot be represented in the reference parameterization. "
                "Exported torch weights will underperform; train with "
                "TPU.S2D_STEM=False for exact export.", rel)

        def put_std(tkey_conv, tkey_bn, mod_conv, mod_bn):
            sd[tkey_conv + ".weight"] = np.transpose(
                std[mod_conv]["kernel"], (3, 2, 0, 1))
            s = std[mod_bn]["scale"]
            sd[tkey_bn + ".weight"] = s
            sd[tkey_bn + ".bias"] = std[mod_bn]["bias"]
            sd[tkey_bn + ".running_mean"] = np.zeros_like(s)
            sd[tkey_bn + ".running_var"] = np.ones_like(s)

        put_std(body + "base_layer.0", body + "base_layer.1",
                "base_conv", "base_bn")
        put_std(body + "level0.0", body + "level0.1",
                "level0_conv0", "level0_bn0")
        put_std(body + "level1.0", body + "level1.1",
                "level1_conv0", "level1_bn0")
    else:
        conv(body + "base_layer.0", "params/body/base_conv")
        bn(body + "base_layer.1", "params/body/base_bn")
        for lvl in (0, 1):
            i = 0
            while f"params/body/level{lvl}_conv{i}/kernel" in flat:
                conv(f"{body}level{lvl}.{3 * i}",
                     f"params/body/level{lvl}_conv{i}")
                bn(f"{body}level{lvl}.{3 * i + 1}",
                   f"params/body/level{lvl}_bn{i}")
                i += 1

    def map_block(tprefix, jprefix):
        for c in (1, 2, 3):
            if f"{jprefix}/conv{c}/kernel" in flat:
                conv(f"{tprefix}.conv{c}", f"{jprefix}/conv{c}")
                bn(f"{tprefix}.bn{c}", f"{jprefix}/bn{c}")
        i = 0  # Bottle2neck scale convs
        while f"{jprefix}/convs_{i}/kernel" in flat:
            conv(f"{tprefix}.convs.{i}", f"{jprefix}/convs_{i}")
            bn(f"{tprefix}.bns.{i}", f"{jprefix}/bns_{i}")
            i += 1

    def map_tree(tprefix, jprefix):
        if f"{jprefix}/project_conv/kernel" in flat:
            conv(f"{tprefix}.project.0", f"{jprefix}/project_conv")
            bn(f"{tprefix}.project.1", f"{jprefix}/project_bn")
        if f"{jprefix}/root/conv/kernel" in flat:  # leaf tree
            map_block(f"{tprefix}.tree1", f"{jprefix}/tree1")
            map_block(f"{tprefix}.tree2", f"{jprefix}/tree2")
            conv(f"{tprefix}.root.conv", f"{jprefix}/root/conv")
            bn(f"{tprefix}.root.bn", f"{jprefix}/root/bn")
        else:
            map_tree(f"{tprefix}.tree1", f"{jprefix}/tree1")
            map_tree(f"{tprefix}.tree2", f"{jprefix}/tree2")

    if "params/body/stem_conv1/kernel" not in flat:   # DLA trees only
        for lvl in (2, 3, 4, 5):
            map_tree(f"{body}level{lvl}", f"params/body/level{lvl}")

    for i in (1, 2, 3, 4):
        conv(f"backbone.fpn.fpn_inner{i}", f"params/fpn/inner{i}")
        conv(f"backbone.fpn.fpn_layer{i}", f"params/fpn/layer{i}")

    conv("rpn.head.conv", "params/rpn/conv")
    conv("rpn.head.cls_logits", "params/rpn/cls_logits")
    conv("rpn.head.bbox_pred", "params/rpn/bbox_pred")

    fx = "roi_heads.box.feature_extractor."

    def dense_fc6(tkey, jkey):
        # inverse of the import-side fc6 permutation: flax flattens the
        # pooled features HWC, torch C-major
        k = np.asarray(flat[jkey + "/kernel"])           # [res*res*C, out]
        c = np.asarray(flat["params/fpn/layer1/kernel"]).shape[-1]
        res = int(np.sqrt(k.shape[0] // c))
        wt = k.T.reshape(-1, res, res, c).transpose(0, 3, 1, 2)
        sd[tkey + ".weight"] = wt.reshape(wt.shape[0], -1)
        sd[tkey + ".bias"] = np.asarray(flat[jkey + "/bias"])

    dense_fc6(fx + "fc6", "params/box/feature_extractor/fc6")
    dense(fx + "fc7", "params/box/feature_extractor/fc7")
    dense("roi_heads.box.predictor.cls_score",
          "params/box/predictor/cls_score")
    dense("roi_heads.box.predictor.bbox_pred",
          "params/box/predictor/bbox_pred")

    tp = "roi_heads.track.tracker.predictor."
    conv(tp + "cls_tower.0", "params/emm/predictor/cls_tower_conv")
    gn(tp + "cls_tower.1", "params/emm/predictor/cls_tower_gn")
    conv(tp + "reg_tower.0", "params/emm/predictor/reg_tower_conv")
    gn(tp + "reg_tower.1", "params/emm/predictor/reg_tower_gn")
    conv(tp + "cls.0", "params/emm/predictor/cls")
    conv(tp + "center.0", "params/emm/predictor/center")
    conv(tp + "reg.0", "params/emm/predictor/reg")
    return sd


def _flatten(tree, prefix=""):
    flat = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            flat.update(_flatten(v, f"{prefix}/{k}" if prefix else k))
    else:
        flat[prefix] = tree
    return flat


def _unflatten(flat: dict):
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree
