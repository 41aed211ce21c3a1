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
        from agacs_tpu.train.optim import skip_nonfinite_by_gnorm

        tx = skip_nonfinite_by_gnorm(tx)
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


# Linear weights eligible for frozen-trunk int8 quantization, by param-dict
# name: the whisper/conformer block projections. NOT adapters/side nets
# (trainable under their presets, tiny otherwise), NOT token_emb (logits
# quality), NOT the conv stem (ndim-3, a few GFLOP).
QUANT_LINEAR_KEYS = frozenset(
    {"query", "key", "value", "out", "fc1", "fc2", "query_cs", "key_cs"}
)


def quantize_frozen_linears(params: Any, mask: Any) -> Any:
    """Per-output-channel int8 quantization of FROZEN trunk linears.

    Replaces each frozen {"w": (..., in, out)} under a QUANT_LINEAR_KEYS
    name with {"w_q" int8, "w_s" f32[..., out]} (ops/int8_linear.py);
    `linear()` dispatches on key presence, so model code is untouched.
    Rebuild the optimizer/mask from the returned tree (the pytree
    structure changes). Trainable leaves and every non-linear param are
    passed through unchanged.
    """
    from agacs_tpu.ops.int8_linear import quantize_weight

    def rec(p, m, name):
        if isinstance(p, dict):
            if (
                name in QUANT_LINEAR_KEYS
                and "w" in p
                and hasattr(p["w"], "ndim")
                and p["w"].ndim >= 2
                and jnp.issubdtype(p["w"].dtype, jnp.floating)
                and not m["w"]
            ):
                w_q, w_s = quantize_weight(p["w"])
                out = {"w_q": w_q, "w_s": w_s}
                if "b" in p:
                    out["b"] = p["b"]
                return out
            return {k: rec(v, m[k], k) for k, v in p.items()}
        return p

    return rec(params, mask, "")


def dequantize_params(params: Any) -> Any:
    """Inverse of quantize_frozen_linears (for export/interop): every
    {"w_q", "w_s"} dict becomes {"w": f32 dequantized}."""
    from agacs_tpu.ops.int8_linear import dequantize_weight

    def rec(p):
        if isinstance(p, dict):
            if "w_q" in p:
                out = {"w": dequantize_weight(p["w_q"], p["w_s"])}
                if "b" in p:
                    out["b"] = p["b"]
                return out
            return {k: rec(v) for k, v in p.items()}
        return p

    return rec(params)


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

    `trainable_mask` (the build_tx mask) restricts the VJP to the
    trainable leaves: params are partitioned and only the trainable part
    is differentiated, so XLA never computes frozen weight grads at all —
    with remat + adapter-only tuning this removes ~250 MB/step of grad
    math that the optax zero-mask would otherwise only discard after the
    fact. (Partitioning rather than stop_gradient also keeps int8
    quantized-trunk leaves — `quantize_frozen_linears` — out of the
    autodiff machinery entirely: jax.grad rejects integer-dtype inputs.
    Frozen slots come back as f32 zeros so the optax chain is unchanged.)
    """
    fwd = loss_fn or asr_model.forward

    mask_leaves = (
        tuple(jax.tree.leaves(trainable_mask))
        if trainable_mask is not None else None
    )

    def grad_fn(params, batch, rng):
        """((loss, stats), full-tree grads), differentiating only the
        trainable leaves when a freeze mask is given."""
        if mask_leaves is None:
            def loss_and_stats(p):
                return fwd(p, cfg, batch, train=True, rng=rng)

            return jax.value_and_grad(loss_and_stats, has_aux=True)(params)

        leaves, treedef = jax.tree.flatten(params)

        def loss_and_stats(diff):
            it = iter(diff)
            full = treedef.unflatten(
                [next(it) if m else p for p, m in zip(leaves, mask_leaves)]
            )
            return fwd(full, cfg, batch, train=True, rng=rng)

        diff = [p for p, m in zip(leaves, mask_leaves) if m]
        loss_stats, dgrads = jax.value_and_grad(
            loss_and_stats, has_aux=True)(diff)
        it = iter(dgrads)
        grads = treedef.unflatten(
            [next(it) if m else jnp.zeros(p.shape, jnp.float32)
             for p, m in zip(leaves, mask_leaves)]
        )
        return loss_stats, grads

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
