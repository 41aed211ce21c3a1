"""Optimizer + LR schedule (optax), matching the recipe configs.

  * warmup_lr — espnet WarmupLR (`schedulers/warmup_lr.py:11-50`):
      lr · warmup^0.5 · min(step^-0.5, step · warmup^-1.5)
    (Noam warmup without the model-dim factor; step is 1-based.)
  * AdamW with the reference defaults (train_asr_whisper_small_adapter_
    csloss_2stage_check.yaml:61-70: lr 1e-3, wd 0.01, betas (0.9, 0.99),
    eps 1e-6), gradient clipping by global norm (grad_clip 1.0,
    trainer.py:668), masked by the freeze preset.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


def warmup_lr(lr: float, warmup_steps: int = 25000) -> optax.Schedule:
    def schedule(count):
        step = jnp.asarray(count, jnp.float32) + 1.0  # espnet steps are 1-based
        return (
            lr
            * warmup_steps**0.5
            * jnp.minimum(step**-0.5, step * warmup_steps**-1.5)
        )

    return schedule


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    optim: str = "adamw"
    lr: float = 1.0e-3
    weight_decay: float = 0.01
    betas: tuple[float, float] = (0.9, 0.99)
    eps: float = 1.0e-6
    scheduler: str = "warmuplr"
    warmup_steps: int = 500
    grad_clip: float = 1.0


def build_optimizer(
    config: OptimConfig, trainable: "jax.tree" = None
) -> tuple[optax.GradientTransformation, optax.Schedule]:
    """Returns (tx, schedule). `trainable` is a bool mask pytree; frozen
    leaves get zero updates (and no optimizer-state growth via masking)."""
    if config.scheduler == "warmuplr":
        schedule = warmup_lr(config.lr, config.warmup_steps)
    elif config.scheduler in (None, "none", "constant"):
        schedule = optax.constant_schedule(config.lr)
    else:
        raise ValueError(f"unknown scheduler {config.scheduler}")

    if config.optim == "adamw":
        opt = optax.adamw(
            learning_rate=schedule,
            b1=config.betas[0],
            b2=config.betas[1],
            eps=config.eps,
            weight_decay=config.weight_decay,
        )
    elif config.optim == "adam":
        opt = optax.adam(schedule, b1=config.betas[0], b2=config.betas[1], eps=config.eps)
    else:
        raise ValueError(f"unknown optimizer {config.optim}")

    chain = []
    if trainable is not None:
        # zero frozen grads FIRST so (a) the global clip norm sees only
        # trainable grads (torch clips only requires_grad params,
        # trainer.py:668) and (b) optax.masked's pass-through updates for
        # frozen leaves are zero, not raw gradients.
        inv_mask = jax.tree.map(lambda m: not m, trainable)
        chain.append(optax.masked(optax.set_to_zero(), inv_mask))
    if config.grad_clip:
        chain.append(optax.clip_by_global_norm(config.grad_clip))
    chain.append(opt if trainable is None else optax.masked(opt, trainable))
    return optax.chain(*chain), schedule


class SkipNonfiniteState(NamedTuple):
    """State for `skip_nonfinite_by_gnorm`. The field name
    `total_notfinite` is part of the trainer contract
    (train/trainer.py reads it into stats["grad_nonfinite_total"])."""

    inner_state: Any
    total_notfinite: jax.Array


def skip_nonfinite_by_gnorm(tx: optax.GradientTransformation) -> optax.GradientTransformation:
    """Skip the whole optimizer update when the gradient NORM is not
    finite — the reference's exact criterion (`trainer.py:668-694`:
    clip_grad_norm_ then `if not isfinite(grad_norm): skip`).

    Replaces optax.apply_if_finite, which tests every gradient leaf
    separately: on the full-FT conformer/transducer steps those ~55
    per-leaf isfinite reductions cost ~7 ms/step (round-4 xplane).
    The global norm here CSEs with the one the clip stage and the
    trainer's stats already compute, so the check is ~free; on a
    non-finite step the updates are zeroed and the inner state is
    rolled back, exactly like apply_if_finite."""

    def init(params):
        return SkipNonfiniteState(tx.init(params), jnp.zeros((), jnp.int32))

    def update(grads, state, params=None):
        gnorm = optax.global_norm(grads)
        finite = jnp.isfinite(gnorm)
        # zero the grads on a bad step so nan/inf cannot poison the
        # inner update math whose outputs we discard
        safe = jax.tree.map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        updates, new_inner = tx.update(safe, state.inner_state, params)
        updates = jax.tree.map(
            lambda u: jnp.where(finite, u, jnp.zeros_like(u)), updates
        )
        new_inner = jax.tree.map(
            lambda n, o: jnp.where(finite, n, o), new_inner, state.inner_state
        )
        return updates, SkipNonfiniteState(
            new_inner, state.total_notfinite + (1 - finite.astype(jnp.int32))
        )

    return optax.GradientTransformation(init, update)
