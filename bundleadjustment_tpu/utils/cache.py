"""Persistent XLA compile cache.

The tracking/mapping pipeline jits a family of shape buckets (frontend,
motion-only BA, neighbor-search batches, BA snapshots).  On a remote-compile
TPU each new bucket costs ~20-40 s; the persistent cache makes every rerun
(and every driver round) skip straight to execution.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_persistent_cache(cache_dir: str | None = None) -> bool:
    """Point JAX's compilation cache at a repo-local directory.  Safe to call
    multiple times; returns False where the platform doesn't support it."""
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", cache_dir or _DEFAULT_DIR
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception:
        return False
