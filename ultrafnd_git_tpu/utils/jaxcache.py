"""Persistent XLA compilation cache setup.

First-time compiles through the TPU tunnel are expensive (tens of seconds);
every entry point (CLI, bench, graft entry, tests) enables a persistent
on-disk cache so repeated runs reuse compiled executables.
"""
from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    cache_dir = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.expanduser("~/.cache/ultrafnd_jax")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
