"""Component registries.

Counterpart of ``/root/reference/siammot/utils/registry.py:1-4`` (maskrcnn
``Registry`` instances ``SIAMESE_TRACKER`` and ``TRACKER_SAMPLER`` that
make the motion model pluggable — EMM registers itself at
``track_core.py:14`` / ``target_sampler.py:289``).  The IMM config stubs
exist (``configs/defaults.py:65-69``) but, exactly like the reference
release, no IMM module ships.
"""

from __future__ import annotations


class Registry(dict):
    """Name -> factory with a decorator-style ``register``."""

    def register(self, name: str, obj=None):
        if obj is not None:
            self[name] = obj
            return obj

        def deco(fn):
            self[name] = fn
            return fn
        return deco

    def get(self, name: str):
        if name not in self:
            raise KeyError(
                f"{name!r} is not registered; available: {sorted(self)}")
        return self[name]


SIAMESE_TRACKER = Registry()
TRACKER_SAMPLER = Registry()
