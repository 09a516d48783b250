"""Minimal yacs-style config node.

The reference drives all behavior from a yacs ``CfgNode`` singleton
(``/root/reference/siammot/configs/defaults.py:1-109``) merged with YAML
overlays and then frozen (``tools/train_net.py:121-122``).  This is a small,
dependency-free re-implementation with the same public surface
(attribute access, ``merge_from_file``, ``merge_from_list``, ``clone``,
``freeze``) so the reference's YAML configs translate 1:1.
"""

from __future__ import annotations

import ast
import copy
from typing import Any

import yaml

_FROZEN = "__frozen__"


class CfgNode(dict):
    """A dict with attribute access, freezing, and YAML merge support."""

    def __init__(self, init: dict | None = None):
        super().__init__()
        object.__setattr__(self, _FROZEN, False)
        if init:
            for k, v in init.items():
                self[k] = CfgNode(v) if isinstance(v, dict) else v

    # -- attribute protocol -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        if object.__getattribute__(self, _FROZEN):
            raise AttributeError(f"CfgNode is frozen; cannot set {name}")
        self[name] = CfgNode(value) if isinstance(value, dict) and not isinstance(value, CfgNode) else value

    def __setitem__(self, key, value):
        if object.__getattribute__(self, _FROZEN):
            raise AttributeError(f"CfgNode is frozen; cannot set {key}")
        super().__setitem__(key, value)

    # -- freeze / clone -----------------------------------------------------
    def freeze(self) -> None:
        object.__setattr__(self, _FROZEN, True)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.freeze()

    def defrost(self) -> None:
        object.__setattr__(self, _FROZEN, False)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.defrost()

    def is_frozen(self) -> bool:
        return object.__getattribute__(self, _FROZEN)

    def clone(self) -> "CfgNode":
        out = CfgNode()
        for k, v in self.items():
            out[k] = v.clone() if isinstance(v, CfgNode) else copy.deepcopy(v)
        return out

    # -- merging ------------------------------------------------------------
    def _merge_dict(self, other: dict) -> None:
        for k, v in other.items():
            if isinstance(v, dict):
                if k not in self or not isinstance(self[k], CfgNode):
                    super().__setitem__(k, CfgNode())
                self[k]._merge_dict(v)
            else:
                if isinstance(v, str):
                    # yacs-style: tuples / numbers may arrive as strings
                    v = _maybe_literal(v)
                if isinstance(v, list):
                    v = tuple(v)
                super().__setitem__(k, v)

    def merge_from_file(self, path: str) -> None:
        with open(path) as f:
            data = yaml.safe_load(f)
        if data:
            self._merge_dict(data)

    def merge_from_other_cfg(self, other: "CfgNode") -> None:
        self._merge_dict(other)

    def merge_from_list(self, opts: list) -> None:
        assert len(opts) % 2 == 0, f"override list must be key/value pairs, got {opts}"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            if isinstance(value, str):
                value = _maybe_literal(value)
            if isinstance(value, list):
                value = tuple(value)
            dict.__setitem__(node, parts[-1], value)

    def dump(self) -> str:
        def plain(node):
            return {k: plain(v) if isinstance(v, CfgNode) else (list(v) if isinstance(v, tuple) else v)
                    for k, v in node.items()}

        return yaml.safe_dump(plain(self), sort_keys=False)


def _maybe_literal(s: str) -> Any:
    try:
        return ast.literal_eval(s)
    except (ValueError, SyntaxError):
        return s
