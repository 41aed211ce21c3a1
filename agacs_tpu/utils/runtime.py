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
    # namespace by platform + forced-device topology: executables cached
    # by a virtual-CPU-mesh process (tests, multiprocess workers, the
    # multichip dryrun) must never be deserialized by a TPU process or a
    # different-topology CPU process — a mismatched entry aborts the
    # whole process inside XLA's deserializer (observed round 4:
    # repeatable 'Fatal Python error: Aborted' in
    # compilation_cache.get_executable_and_time during the test suite)
    import re

    plat = (os.environ.get("JAX_PLATFORMS") or "default").replace(",", "_")
    try:
        # If the backend is ALREADY live (multi-process workers call
        # jax.distributed.initialize before the CLI main), use the real
        # topology — two TPU processes with different device counts must
        # not share a namespace. Never INITIALIZE the backend here:
        # setup() runs before jax.distributed.initialize in single-process
        # CLIs, and an eager device_count() would break rendezvous.
        from jax._src import xla_bridge as _xb

        n_dev = jax.device_count() if _xb._backends else None
    except Exception:
        n_dev = None
    if n_dev is None:
        m = re.search(
            r"host_platform_device_count=(\d+)",
            os.environ.get("XLA_FLAGS", ""),
        )
        n_dev = int(m.group(1)) if m else 1
    cache_dir = os.path.join(cache_dir, f"{plat}_d{n_dev}")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def fetch(tree) -> float:
    """Force completion of `tree`'s computation; returns one scalar."""
    leaf = jax.tree.leaves(tree)[0]
    return float(np.asarray(leaf).ravel()[0])
