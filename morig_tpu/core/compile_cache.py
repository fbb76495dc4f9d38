"""Persistent JAX compile cache setup, shared by every tool entry point.

The TPU tunnel on this class of host costs ~90 s per fresh lowering; cached
executables reload in seconds.  Kept out of library import paths on purpose —
only CLI/tool entry points opt in (CPU AOT cache entries are machine-feature
pinned and just spam warnings on reload, so smoke/CPU runs skip it).
"""
from __future__ import annotations

import os


def setup_compile_cache(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at `cache_dir` (default:
    $JAX_COMPILATION_CACHE_DIR or /root/.jax_cache).  Call before the first
    jit compilation; returns the directory used."""
    import jax

    d = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                    "/root/.jax_cache")
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return d
