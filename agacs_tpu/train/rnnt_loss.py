"""RNN-Transducer loss — a pure-JAX replacement for warprnnt.

The reference computes transducer loss with the warprnnt CUDA kernel
(`espnet2/asr/espnet_model.py:122-130` RNNTLoss(blank, fastemit_lambda=0),
fed by the full joint output (B, T, U+1, V) from
`espnet_model.py:980-1027`). A CUDA lattice walk does not map to TPU;
this formulation does:

The forward variable obeys
  alpha[t, u] = logaddexp(alpha[t-1, u] + blank[t-1, u],
                          alpha[t, u-1] + emit[t, u-1])
For a FIXED label row u, that is a first-order linear recurrence along
time in the log semiring:
  x_t = logaddexp(x_{t-1} + c_t, b_t)
with c_t = blank log-prob (horizontal step) and b_t = alpha[t, u-1] +
emit[t, u-1] (vertical input). Its closed form is
  x_t = C_t + logcumsumexp_t(b - C),   C_t = cumsum(c)
so each row is one cumulative sum plus one associative scan — both
parallel in T on the VPU. The whole loss is a lax.scan over the U+1
label rows (U ≈ 30 for speech), each row O(T) parallel work, instead of
the O(T·U) sequential lattice sweep. Gradients come from autodiff.

fastemit_lambda > 0 applies the FastEmit regularization (Yu et al. 2021)
with warprnnt's semantics — emission-arc gradients scaled by (1 + λ),
blank-arc gradients unchanged — via a forward-identity term
(x + λ·(x − stop_gradient(x))) on the emission log-probs, so the loss
VALUE matches λ=0 exactly while the gradient matches warprnnt.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _logcumsumexp(x: jax.Array, axis: int = -1) -> jax.Array:
    return jax.lax.associative_scan(jnp.logaddexp, x, axis=axis)


def rnnt_alpha(
    log_probs: jax.Array,
    targets: jax.Array,
    blank: int = 0,
    fastemit_lambda: float = 0.0,
) -> tuple[jax.Array, jax.Array]:
    """Forward lattice for one batch of joint log-probs.

    log_probs: (B, T, U+1, V) log-softmax of the joint network output
    targets:   (B, U) label ids (blank-padded beyond u_len)
    Returns (alpha (U+1, B, T), blank_lp (B, T, U+1)).
    """
    b, t_max, u_rows, _ = log_probs.shape
    u_max = u_rows - 1
    assert targets.shape == (b, u_max), (targets.shape, (b, u_max))

    blank_lp = log_probs[..., blank]  # (B, T, U+1)
    # emit[b, t, u] = lp[b, t, u, targets[b, u]] for u < U
    emit = jnp.take_along_axis(
        log_probs[:, :, :u_max, :], targets[:, None, :, None], axis=3
    )[..., 0]  # (B, T, U)
    return rnnt_alpha_from_blank_emit(
        blank_lp, emit, fastemit_lambda=fastemit_lambda
    )


def rnnt_alpha_from_blank_emit(
    blank_lp: jax.Array,
    emit: jax.Array,
    fastemit_lambda: float = 0.0,
) -> tuple[jax.Array, jax.Array]:
    """Forward lattice from the two log-prob planes the recursion actually
    reads — blank_lp (B, T, U+1) and emit (B, T, U) — so callers can
    produce them WITHOUT materializing the (B, T, U+1, V) joint
    (losses_from_encoder's T-chunked path, models/transducer_asr.py)."""
    b = blank_lp.shape[0]
    if fastemit_lambda:
        # FastEmit: emission-arc grads x(1+λ), value unchanged
        emit = emit + fastemit_lambda * (emit - jax.lax.stop_gradient(emit))

    # row 0: alpha[t, 0] = sum_{r<t} blank[r, 0]
    bl0 = blank_lp[..., 0]  # (B, T)
    row0 = jnp.concatenate(
        [jnp.zeros((b, 1), bl0.dtype), jnp.cumsum(bl0[:, :-1], axis=1)], axis=1
    )

    # rows 1..U under scan; xs rows are (U, B, T)
    em_rows = jnp.moveaxis(emit, 2, 0)
    bl_rows = jnp.moveaxis(blank_lp[..., 1:], 2, 0)

    def row(alpha_prev, xs):
        em_u, bl_u = xs  # (B, T) each
        bvec = alpha_prev + em_u
        c = jnp.concatenate(
            [jnp.zeros((b, 1), bl_u.dtype), jnp.cumsum(bl_u[:, :-1], axis=1)],
            axis=1,
        )
        alpha_u = c + _logcumsumexp(bvec - c, axis=1)
        return alpha_u, alpha_u

    _, rows = jax.lax.scan(row, row0, (em_rows, bl_rows))
    alpha = jnp.concatenate([row0[None], rows], axis=0)  # (U+1, B, T)
    return alpha, blank_lp


def rnnt_loss(
    logits: jax.Array,
    targets: jax.Array,
    t_lens: jax.Array,
    u_lens: jax.Array,
    blank: int = 0,
    fastemit_lambda: float = 0.0,
    reduction: str = "mean",
) -> jax.Array:
    """Negative log-likelihood of the RNNT lattice.

    logits:  (B, T, U+1, V) joint network outputs (pre-softmax)
    targets: (B, U) label ids, blank/any-padded beyond u_lens
    t_lens:  (B,) valid encoder frames;  u_lens: (B,) valid labels
    Matches warprnnt's conventions (blank id, per-sequence NLL summed over
    the lattice, 'mean' over the batch).
    """
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    alpha, blank_lp = rnnt_alpha(
        log_probs, targets, blank=blank, fastemit_lambda=fastemit_lambda
    )
    return _nll_from_alpha(alpha, blank_lp, t_lens, u_lens, reduction)


def rnnt_loss_from_blank_emit(
    blank_lp: jax.Array,
    emit: jax.Array,
    t_lens: jax.Array,
    u_lens: jax.Array,
    fastemit_lambda: float = 0.0,
    reduction: str = "mean",
) -> jax.Array:
    """rnnt_loss from precomputed blank/emit log-prob planes (see
    rnnt_alpha_from_blank_emit) — the memory-bounded entry point."""
    alpha, blank_lp = rnnt_alpha_from_blank_emit(
        blank_lp, emit, fastemit_lambda=fastemit_lambda
    )
    return _nll_from_alpha(alpha, blank_lp, t_lens, u_lens, reduction)


def _nll_from_alpha(alpha, blank_lp, t_lens, u_lens, reduction):
    bsz = blank_lp.shape[0]
    bi = jnp.arange(bsz)
    # a zero-length encoder sequence has no lattice path: clamp the index
    # (so t_lens==0 does not wrap to the last frame) and zero its NLL
    t_last = jnp.maximum(t_lens - 1, 0)
    # ll = alpha[u_len, b, t_len-1] + blank[b, t_len-1, u_len]
    ll = alpha[u_lens, bi, t_last] + blank_lp[bi, t_last, u_lens]
    nll = jnp.where(t_lens > 0, -ll, 0.0)

    if reduction == "mean":
        return jnp.mean(nll)
    if reduction == "sum":
        return jnp.sum(nll)
    return nll
