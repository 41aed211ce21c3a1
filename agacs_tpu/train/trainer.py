"""Training loop: jitted step with grad accumulation, freeze masks,
non-finite-step skipping — the reference Trainer's semantics
(`espnet2/train/trainer.py:479-748`) as a single compiled function.

Mapping from the reference:
  GradScaler/AMP fp16        -> bf16 compute dtype, fp32 params/loss (no
                                scaler needed on TPU)
  loss.backward per microbatch, step every accum_grad (trainer.py:628-694)
                             -> lax.scan over the accum axis, mean grads,
                                one optimizer step
  grad clip 1.0 + nonfinite skip (trainer.py:668-694)
                             -> optax clip_by_global_norm + apply_if_finite
  DDP allreduce              -> GSPMD: batch sharded over mesh 'data' axis,
                                XLA inserts the gradient reductions
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from agacs_tpu.models import asr_model
from agacs_tpu.models.asr_model import ASRModelConfig
from agacs_tpu.train.freeze import trainable_mask
from agacs_tpu.train.optim import OptimConfig, build_optimizer


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array


def create_train_state(
    params: Any,
    tx: optax.GradientTransformation,
    rng: jax.Array,
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=rng,
    )


def build_tx(
    params: Any,
    optim_cfg: OptimConfig,
    freeze_preset: str | list | None = None,
    skip_nonfinite: bool = True,
) -> tuple[optax.GradientTransformation, Any]:
    """Optimizer with freeze mask + non-finite-update protection
    (trainer.py:679-694 'grad norm is nan. Skipping updating the model')."""
    mask = trainable_mask(params, freeze_preset)
    tx, _ = build_optimizer(optim_cfg, trainable=mask)
    if skip_nonfinite:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=10**6)
    return tx, mask


def cast_frozen_params(params: Any, mask: Any, dtype=jnp.bfloat16) -> Any:
    """Store frozen float32 leaves in `dtype` (bf16).

    Under a freeze preset the trunk is cast to the compute dtype at every
    use anyway (model code does `.astype(x.dtype)`), so bf16 STORAGE is
    the same rounding — but it halves the frozen weights' HBM reads each
    step and removes the cast work. Measured −4% step time for
    whisper-small adapters at B=8×15 s (docs/PERF.md). Trainable leaves
    keep fp32 masters (the optimizer state is built per-leaf by
    optax.masked, so frozen leaves have no moment buffers either way).
    Only meaningful when compute_dtype is bf16; no-op on non-f32 leaves.
    """
    return jax.tree.map(
        lambda p, m: p if m or p.dtype != jnp.float32 else p.astype(dtype),
        params, mask,
    )


def make_train_step(
    cfg: ASRModelConfig,
    tx: optax.GradientTransformation,
    accum_grad: int = 1,
    loss_fn: Callable | None = None,
    donate: bool = True,
    trainable_mask: Any = None,
):
    """Returns jitted step(state, batch) -> (state, stats).

    With accum_grad > 1 the batch's leading axis must be accum_grad
    (microbatches stacked): each leaf is (accum, B_micro, ...). Gradients
    are averaged over microbatches — same effective update as the
    reference's loss/accum_grad backward accumulation (trainer.py:628).

    `trainable_mask` (the build_tx mask) cuts the VJP at frozen leaves via
    stop_gradient so XLA never computes their weight grads at all — with
    remat + adapter-only tuning this removes ~250 MB/step of grad math that
    the optax zero-mask would otherwise only discard after the fact.
    """
    fwd = loss_fn or asr_model.forward

    def loss_and_stats(params, batch, rng):
        if trainable_mask is not None:
            params = jax.tree.map(
                lambda p, m: p if m else jax.lax.stop_gradient(p),
                params, trainable_mask,
            )
        loss, stats = fwd(params, cfg, batch, train=True, rng=rng)
        return loss, stats

    grad_fn = jax.value_and_grad(loss_and_stats, has_aux=True)

    def step(state: TrainState, batch) -> tuple[TrainState, dict]:
        rng, new_rng = jax.random.split(state.rng)

        if accum_grad == 1:
            (loss, stats), grads = grad_fn(state.params, batch, rng)
        else:
            rngs = jax.random.split(rng, accum_grad)

            def micro(carry, xs):
                mb, r = xs
                (_, st), g = grad_fn(state.params, mb, r)
                acc = jax.tree.map(jnp.add, carry, g)
                return acc, st

            zero = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )
            grads, stats = jax.lax.scan(micro, zero, (batch, rngs))
            grads = jax.tree.map(lambda g: g / accum_grad, grads)
            stats = jax.tree.map(lambda s: jnp.mean(s), stats)
            loss = stats["loss"]

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        stats = dict(stats)
        stats["grad_norm"] = gnorm
        if hasattr(new_opt, "total_notfinite"):
            # skipped-update counter (reference "grad norm is nan. Skipping
            # updating the model", trainer.py:679-694) — lets the epoch
            # loop abort when every step was invalid (trainer.py:450-456)
            stats["grad_nonfinite_total"] = new_opt.total_notfinite
        new_state = TrainState(
            step=state.step + 1, params=new_params, opt_state=new_opt, rng=new_rng
        )
        return new_state, stats

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(
    cfg: ASRModelConfig,
    loss_fn: Callable | None = None,
    return_preds: bool = False,
):
    """Eval step; with return_preds it also returns (argmax ids, ys_out)
    for the host-side ErrorCalculator (espnet_model.py:955-959)."""
    fwd = loss_fn or asr_model.forward

    @jax.jit
    def step(params, batch):
        if return_preds:
            _, stats, preds = fwd(
                params, cfg, batch, train=False, rng=None, return_preds=True
            )
            return stats, preds
        _, stats = fwd(params, cfg, batch, train=False, rng=None)
        return stats

    return step
