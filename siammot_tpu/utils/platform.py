"""Platform selection fix-up.

This image's sitecustomize registers the axon TPU plugin and force-sets
``jax_platforms='axon,cpu'``, silently overriding the ``JAX_PLATFORMS``
env var.  CLIs call this once at startup so the env var means what it
says (e.g. ``JAX_PLATFORMS=cpu`` for smoke tests on machines whose chip
is busy).
"""

from __future__ import annotations

import os


def ensure_requested_platform():
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax
        jax.config.update("jax_platforms", want)
