"""Persistent XLA compile cache.

The tracking/mapping pipeline jits a family of shape buckets (frontend,
motion-only BA, neighbor-search batches, BA snapshots).  On a remote-compile
TPU each new bucket costs ~20-40 s; the persistent cache makes every rerun
(and every driver round) skip straight to execution.
"""

from __future__ import annotations

import os

def _default_dir() -> str:
    """Repo-local `.jax_cache` when the source tree is writable (dev
    checkout), else a per-user cache dir (installed package / read-only
    site-packages)."""
    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    if os.access(repo, os.W_OK):
        return os.path.join(repo, ".jax_cache")
    base = os.environ.get(
        "XDG_CACHE_HOME", os.path.join(os.path.expanduser("~"), ".cache")
    )
    return os.path.join(base, "bundleadjustment_tpu", "jax_cache")


def enable_persistent_cache(cache_dir: str | None = None) -> bool:
    """Point JAX's compilation cache at a writable directory.  Safe to call
    multiple times; returns False when the directory cannot be created or
    the JAX build lacks the compilation-cache config options.  (Backends
    that ignore the cache — e.g. remote-compile paths — simply compile as
    usual; that failure mode surfaces at compile time, not here.)"""
    import jax

    path = cache_dir or _default_dir()
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception:
        return False
