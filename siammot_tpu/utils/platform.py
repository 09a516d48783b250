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
    import jax
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        jax.config.update("jax_platforms", want)
    # persistent compile cache: compiles go through a remote service on
    # the tunneled-TPU image and take minutes — cache them across runs
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
