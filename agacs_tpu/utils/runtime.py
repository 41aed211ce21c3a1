"""Process-level runtime setup shared by CLIs and bench.

  * persistent XLA compilation cache (first whisper-small compile is tens
    of seconds through the TPU tunnel; cached recompiles are ~instant)
  * helper to synchronize with device results — on this environment's
    remote TPU backend, `block_until_ready` does not actually wait, only a
    host fetch does, so timing code must use `fetch()`.
"""

from __future__ import annotations

import os

import numpy as np

import jax

_DONE = False


def setup(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    cache_dir = (
        cache_dir
        or os.environ.get("AGACS_JAX_CACHE")
        or os.path.expanduser("~/.cache/agacs_tpu/jax")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def fetch(tree) -> float:
    """Force completion of `tree`'s computation; returns one scalar."""
    leaf = jax.tree.leaves(tree)[0]
    return float(np.asarray(leaf).ravel()[0])
