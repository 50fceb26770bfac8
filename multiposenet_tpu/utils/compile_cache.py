"""Persistent XLA compile-cache setup shared by every entry point.

First compiles of the big graphs go through the axon remote helper and
take minutes; pointing jax at an on-disk compilation cache amortizes them
across processes.  Every benchmark/driver entry point calls
``enable_compile_cache()`` instead of hand-rolling the config update, so
the JAX_COMPILATION_CACHE_DIR env override behaves identically everywhere.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = "/tmp/jax_cache"


def enable_compile_cache(default_dir: str = DEFAULT_CACHE_DIR) -> str:
    """Enable the persistent jax compilation cache; returns the path used.

    ``JAX_COMPILATION_CACHE_DIR`` wins when set; otherwise ``default_dir``.
    Safe to call before or after first device use (jax only consults the
    setting at compile time); swallows config errors on jax versions
    without the option.
    """
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR", default_dir)
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", path)
    except Exception:
        pass
    return path
