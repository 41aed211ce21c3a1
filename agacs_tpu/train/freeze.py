"""Parameter-freezing presets as pytree masks.

The reference freezes by substring matching on torch parameter names
(`tasks/abs_task.py:1163-1222`). Here each preset is a predicate over the
'.'-joined pytree path, producing a boolean mask pytree (True = trainable)
consumed by the optimizer (updates are zeroed for frozen leaves).

Preset semantics (trainable-iff), matching the reference line for line:
  whisper_pe            : 'cs' in path            (note: the PE per-head
                          gate contains no 'cs' and thus stays frozen —
                          faithful to abs_task.py:1165-1168)
  adapter               : 'adapter' in path, plus 'estimated_c' params
  whisper_pe_adapter    : 'adapter' in path or 'cs' in path
  freeze_decoder_pe     : NOT ('decoder' in path and 'cs' not in path)
  freeze_decoder_adapter: NOT ('decoder' in path and 'adapter' not in path)
  all_param             : nothing trainable
  sidenetwork           : 'side' in path
  decoder_sidenetwork   : 'encoder_side' in path  (sic — the reference
                          keeps only the ENCODER side net trainable here,
                          abs_task.py:1205-1209)
  adapter_encoder       : encoder adapters only (decoder fully frozen)
"""

from __future__ import annotations

from typing import Callable

import jax


def _paths_mask(params, pred: Callable[[str], bool]):
    flat = jax.tree_util.tree_flatten_with_path(params)
    def name(path):
        return ".".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )
    leaves = [(name(p), v) for p, v in flat[0]]
    mask_leaves = [pred(n) for n, _ in leaves]
    return jax.tree_util.tree_unflatten(flat[1], mask_leaves)


PRESETS: dict[str, Callable[[str], bool]] = {
    "none": lambda n: True,
    "whisper_pe": lambda n: "cs" in n,
    "adapter": lambda n: "adapter" in n or "estimated_c" in n,
    "whisper_pe_adapter": lambda n: "adapter" in n or "cs" in n,
    "freeze_decoder_pe": lambda n: not ("decoder" in n and "cs" not in n),
    "freeze_decoder_adapter": lambda n: not ("decoder" in n and "adapter" not in n),
    "all_param": lambda n: False,
    "sidenetwork": lambda n: "side" in n,
    "decoder_sidenetwork": lambda n: "encoder_side" in n,
    "adapter_encoder": lambda n: ("encoder" in n and "adapter" in n),
}


def trainable_mask(params, preset: str | list[str] | None):
    """Boolean mask pytree (True = trainable) for a freeze preset name, or
    a list of path prefixes to freeze (the reference's generic fallback,
    abs_task.py:1220-1222).

    Leaves whose path contains 'running_' (BatchNorm buffers) are NEVER
    trainable under any preset — they are torch-style buffers, updated by
    recalibration, and must not receive optimizer weight decay."""

    def with_buffers(pred):
        return lambda n: pred(n) and "running_" not in n

    if preset in (None, "", []):
        return _paths_mask(params, with_buffers(lambda n: True))
    if isinstance(preset, str):
        if preset not in PRESETS:
            raise KeyError(f"unknown freeze preset {preset!r}; have {sorted(PRESETS)}")
        return _paths_mask(params, with_buffers(PRESETS[preset]))
    prefixes = tuple(preset)
    return _paths_mask(
        params,
        with_buffers(
            lambda n: not any(n == p or n.startswith(p + ".") for p in prefixes)
        ),
    )


def count_trainable(params, mask) -> tuple[int, int]:
    """(trainable_param_count, total_param_count) for logging."""
    sizes = jax.tree.map(lambda x: int(x.size), params)
    total = sum(jax.tree.leaves(sizes))
    trainable = sum(
        s for s, m in zip(jax.tree.leaves(sizes), jax.tree.leaves(mask)) if m
    )
    return trainable, total
