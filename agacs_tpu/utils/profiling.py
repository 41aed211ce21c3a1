"""Profiling utilities — replaces the reference's DeepSpeed FlopsProfiler
harness (`pyscripts/utils/profile_encoder.py`, `profile.sh`) and its
torch-autograd timing with XLA cost analysis + the JAX profiler.
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable

import jax


def cost_analysis(fn: Callable, *args, **kwargs) -> dict:
    """Compile `fn` and return XLA's cost analysis: flops, bytes accessed,
    plus parameter/output byte counts."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    costs = compiled.cost_analysis() or {}
    out = {
        "flops": float(costs.get("flops", 0.0)),
        "bytes_accessed": float(costs.get("bytes accessed", 0.0)),
    }
    try:
        out["peak_memory_bytes"] = int(compiled.memory_analysis().temp_size_in_bytes)
    except Exception:
        pass
    return out


def count_params(params: Any) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))


@contextlib.contextmanager
def trace(log_dir: str):
    """JAX profiler trace (view with TensorBoard / xprof) — the TPU
    replacement for torch.autograd.profiler (trainer.py:37)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
