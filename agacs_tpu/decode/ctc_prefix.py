"""CTC prefix scoring for joint CTC/attention beam search.

Re-implements the scorer role of `espnet/nets/scorers/ctc.py:10`
(CTCPrefixScorer wrapping `ctc_prefix_score.py`): incremental
log p_CTC(prefix·c | X) over candidate next tokens, with the standard
blank/non-blank forward recursion:

  r_nb[t] : log P(prefix ends non-blank, consumed frames ≤ t)
  r_b[t]  : log P(prefix ends blank)
  phi[t]  = r_b[t] ⊕ (r_nb[t] if c != last else -inf)
  r_nb'[t] = (r_nb'[t-1] ⊕ phi[t-1]) + x[t, c]
  r_b'[t]  = (r_b'[t-1] ⊕ r_nb'[t-1]) + x[t, blank]
  ψ(prefix·c) = ⊕_t (phi[t-1] + x[t, c])      (eos: r_b[T] ⊕ r_nb[T])

Everything is jittable: scoring runs a `lax.scan` over frames for a fixed
candidate set (prune-then-score — callers pre-select candidates from the
attention scores instead of scoring all 51k tokens like the reference's
batched TH scorer does).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30


class CTCPrefixState(NamedTuple):
    r_nb: jax.Array  # (B, T) log prob prefix ends non-blank at frame t
    r_b: jax.Array  # (B, T)
    last: jax.Array  # (B,) last non-blank token of the prefix (-1 if empty)
    score: jax.Array  # (B,) current prefix score ψ


def ctc_prefix_init(logp: jax.Array, blank: int = 0) -> CTCPrefixState:
    """Initial state for the empty prefix. logp: (B, T, V) frame log-probs."""
    b, t, _ = logp.shape
    r_b = jnp.cumsum(logp[:, :, blank], axis=1)  # all-blank path
    r_nb = jnp.full((b, t), NEG_INF)
    return CTCPrefixState(
        r_nb=r_nb,
        r_b=r_b,
        last=jnp.full((b,), -1, jnp.int32),
        score=jnp.zeros((b,), jnp.float32),
    )


def ctc_prefix_score(
    logp: jax.Array,
    state: CTCPrefixState,
    cands: jax.Array,
    frame_lens: jax.Array | None = None,
    blank: int = 0,
) -> tuple[jax.Array, CTCPrefixState]:
    """Score candidate extensions and produce their successor states.

    Args:
      logp: (B, T, V) CTC frame log-probs.
      state: current per-hypothesis state (batch B).
      cands: (B, C) candidate token ids.
      frame_lens: (B,) valid frame counts (None = all T).

    Returns:
      scores: (B, C) ψ(prefix·c) total prefix scores (use
        scores - state.score[:, None] as the incremental scorer value, like
        espnet's `CTCPrefixScorer.score` does);
      new_state: CTCPrefixState with leading axis (B, C) on every field —
        select along C after pruning (e.g. via take_along_axis).
    """
    b, t, v = logp.shape
    c = cands.shape[1]

    x_c = jax.vmap(lambda lp, cd: lp[:, cd])(logp, cands)  # (B, T, C)
    x_blank = logp[:, :, blank]  # (B, T)

    same_as_last = cands == state.last[:, None]  # (B, C)
    phi = jnp.logaddexp(
        state.r_b[:, :, None],
        jnp.where(same_as_last[:, None, :], NEG_INF, state.r_nb[:, :, None]),
    )  # (B, T, C)

    if frame_lens is not None:
        valid = (jnp.arange(t)[None, :] < frame_lens[:, None])[:, :, None]
    else:
        valid = jnp.ones((b, t, 1), bool)

    # scan over frames
    def step(carry, inp):
        r_nb_prev, r_b_prev, psi = carry
        x_c_t, x_b_t, phi_prev, valid_t = inp
        r_nb_t = jnp.logaddexp(r_nb_prev, phi_prev) + x_c_t
        r_b_t = jnp.logaddexp(r_b_prev, r_nb_prev) + x_b_t[:, None]
        psi_new = jnp.logaddexp(psi, phi_prev + x_c_t)
        r_nb_t = jnp.where(valid_t, r_nb_t, r_nb_prev)
        r_b_t = jnp.where(valid_t, r_b_t, r_b_prev)
        psi_new = jnp.where(valid_t, psi_new, psi)
        return (r_nb_t, r_b_t, psi_new), (r_nb_t, r_b_t)

    # frame 0: phi_prev = "before any frame": prefix empty-so-far base case
    # r_nb'[0] = phi_{-1} + x[0,c] where phi_{-1} = 0 iff prefix is empty
    phi_m1 = jnp.broadcast_to(
        jnp.where(state.last[:, None] == -1, 0.0, NEG_INF), (b, c)
    )  # (B, C)
    phi_shift = jnp.concatenate([phi_m1[:, None, :], phi[:, :-1, :]], axis=1)

    init = (
        jnp.full((b, c), NEG_INF),
        jnp.full((b, c), NEG_INF),
        jnp.full((b, c), NEG_INF),
    )
    xs = (
        jnp.moveaxis(x_c, 1, 0),  # (T, B, C)
        jnp.moveaxis(x_blank, 1, 0),  # (T, B)
        jnp.moveaxis(phi_shift, 1, 0),  # (T, B, C)
        jnp.moveaxis(valid, 1, 0),  # (T, B, 1)
    )
    (_, _, psi), (r_nb_all, r_b_all) = jax.lax.scan(step, init, xs)

    new_state = CTCPrefixState(
        r_nb=jnp.moveaxis(r_nb_all, 0, 1),  # (B, T, C) -> select C later
        r_b=jnp.moveaxis(r_b_all, 0, 1),
        last=cands,
        score=psi,
    )
    return psi, new_state


def ctc_prefix_select(state: CTCPrefixState, idx: jax.Array) -> CTCPrefixState:
    """Keep one candidate per batch row: idx (B,) -> state with (B, ...)"""
    b = idx.shape[0]
    rows = jnp.arange(b)
    return CTCPrefixState(
        r_nb=state.r_nb[rows, :, idx].reshape(b, -1) if state.r_nb.ndim == 3 else state.r_nb,
        r_b=state.r_b[rows, :, idx].reshape(b, -1) if state.r_b.ndim == 3 else state.r_b,
        last=state.last[rows, idx],
        score=state.score[rows, idx],
    )


def ctc_eos_score(state: CTCPrefixState, frame_lens: jax.Array | None = None) -> jax.Array:
    """ψ(prefix·<eos>) = total CTC prob of the prefix = r_b[T] ⊕ r_nb[T]."""
    if frame_lens is None:
        return jnp.logaddexp(state.r_nb[..., -1], state.r_b[..., -1])
    idx = jnp.maximum(frame_lens - 1, 0)
    rnb = jnp.take_along_axis(state.r_nb, idx[:, None], axis=1)[:, 0]
    rb = jnp.take_along_axis(state.r_b, idx[:, None], axis=1)[:, 0]
    return jnp.logaddexp(rnb, rb)
