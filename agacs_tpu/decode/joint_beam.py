"""Joint CTC/attention beam search with optional LM shallow fusion — the
conformer-recipe decoding path (reference `espnet/nets/beam_search.py:30`
score composition with scorers {decoder, ctc, lm, length_bonus} and
CTC as a partial scorer with pre-beam pruning).

Score of extending hypothesis g with token c:

  s(g·c) = (1-λ)·log p_att(c|g,X) + λ·[ψ_ctc(g·c) − ψ_ctc(g)]
           + μ·log p_lm(c|g) + β

Flow per step (all jitted, dense (B, k) beams):
  1. attention decoder step (KV-cached) + optional LM step -> full scores
  2. pre-select `pre_beam` candidates per beam by the full scores
     (espnet pre_beam_ratio × beam, beam_search.py partial-scorer path)
  3. CTC-prefix-score only those candidates (decode/ctc_prefix.py)
  4. combine, top-k over beam×pre_beam, reorder caches + CTC states
  5. <eos> candidates take the CTC *final* score r_b[T] ⊕ r_nb[T]
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from agacs_tpu.decode.ctc_prefix import (
    CTCPrefixState,
    ctc_eos_score,
    ctc_prefix_init,
    ctc_prefix_score,
)

NEG_INF = -1.0e30


@partial(
    jax.jit,
    static_argnames=(
        "dec_cfg", "beam_size", "pre_beam", "max_steps", "sos", "eos",
        "ctc_weight", "lm_weight", "length_bonus", "lm_cfg",
    ),
)
def joint_beam_decode(
    dec_params,
    dec_cfg,
    memory: jax.Array,
    memory_lens: jax.Array,
    ctc_logp: jax.Array | None = None,
    ctc_frame_lens: jax.Array | None = None,
    lm_params=None,
    lm_cfg=None,
    beam_size: int = 5,
    pre_beam: int = 8,
    max_steps: int = 64,
    sos: int = 50258,
    eos: int = 50257,
    ctc_weight: float = 0.3,
    lm_weight: float = 0.0,
    length_bonus: float = 0.0,
):
    """Returns (tokens (B, max_steps+1), lengths (B,), scores (B,)).

    memory: (B, T_enc, d) encoder output; ctc_logp: (B, T_enc, V) CTC frame
    log-probs (None disables the CTC score); lm_*: optional LM fusion.
    """
    from agacs_tpu.models.conformer import (
        init_decoder_kv_cache,
        precompute_decoder_cross_kv,
        transformer_decode_step,
    )

    b, t_enc, _ = memory.shape
    k = beam_size
    c = pre_beam
    total = max_steps + 1
    use_ctc = ctc_logp is not None and ctc_weight > 0.0
    w_att = (1.0 - ctc_weight) if use_ctc else 1.0

    # replicate per beam
    def rep(x):
        return jnp.repeat(x, k, axis=0)

    mem_r = rep(memory)
    mlens_r = rep(memory_lens)
    cross_kv = precompute_decoder_cross_kv(dec_params, dec_cfg, mem_r)
    self_kv = init_decoder_kv_cache(dec_cfg, b * k, total)

    if use_ctc:
        ctc_logp_r = rep(ctc_logp)
        ctc_lens_r = rep(
            ctc_frame_lens if ctc_frame_lens is not None else memory_lens
        )
        ctc_state = ctc_prefix_init(ctc_logp_r)
    else:
        ctc_logp_r = ctc_lens_r = ctc_state = None

    use_lm = lm_params is not None and lm_weight > 0.0
    if use_lm:
        from agacs_tpu.models.lm import init_lm_kv_cache

        lm_kv = init_lm_kv_cache(lm_cfg, b * k, total)
    else:
        lm_kv = None

    tokens0 = jnp.full((b, k, total), eos, jnp.int32).at[:, :, 0].set(sos)
    scores0 = jnp.full((b, k), NEG_INF, jnp.float32).at[:, 0].set(0.0)
    finished0 = jnp.zeros((b, k), bool)

    def cond(carry):
        pos, *_, finished = carry
        return (pos < total - 1) & ~jnp.all(finished)

    def body(carry):
        pos, tokens, scores, self_kv, lm_kv, ctc_state, finished = carry
        cur = jax.lax.dynamic_index_in_dim(
            tokens.reshape(b * k, total), pos, axis=1, keepdims=False
        )
        logits, self_kv = transformer_decode_step(
            dec_params, dec_cfg, cur, pos, self_kv, cross_kv, mlens_r
        )
        logp = jax.nn.log_softmax(logits, -1)  # (B*k, V)
        full = w_att * logp
        if use_lm:
            from agacs_tpu.models.lm import lm_score_step_cached

            lm_lp, lm_kv = lm_score_step_cached(lm_params, lm_cfg, cur, pos, lm_kv)
            full = full + lm_weight * lm_lp

        # pre-select candidates per beam by the full score
        pre_scores, cands = jax.lax.top_k(full, c)  # (B*k, C)

        if use_ctc:
            psi, cand_state = ctc_prefix_score(
                ctc_logp_r, ctc_state, cands, frame_lens=ctc_lens_r
            )
            ctc_inc = psi - ctc_state.score[:, None]
            # eos candidates use the final CTC score of the CURRENT prefix
            eos_inc = ctc_eos_score(ctc_state, ctc_lens_r) - ctc_state.score
            ctc_inc = jnp.where(cands == eos, eos_inc[:, None], ctc_inc)
            cand_scores = pre_scores + ctc_weight * ctc_inc
        else:
            cand_state = None
            cand_scores = pre_scores

        cand_scores = cand_scores + length_bonus
        cand_scores = cand_scores.reshape(b, k, c)
        cands_bk = cands.reshape(b, k, c)

        # finished beams: only an eos continuation at zero incremental cost
        cand_scores = jnp.where(
            finished[:, :, None],
            jnp.where(
                jnp.arange(c)[None, None, :] == 0, 0.0, NEG_INF
            ),
            cand_scores,
        )
        cands_bk = jnp.where(
            finished[:, :, None], jnp.full_like(cands_bk, eos), cands_bk
        )

        totals = scores[:, :, None] + cand_scores  # (B, k, C)
        flat = totals.reshape(b, k * c)
        new_scores, top_idx = jax.lax.top_k(flat, k)
        parent = top_idx // c
        cand_idx = top_idx % c

        rows = jnp.arange(b)[:, None]
        nxt = cands_bk[rows, parent, cand_idx]
        tokens = tokens[rows, parent]
        finished = finished[rows, parent]

        flat_parent = (jnp.arange(b)[:, None] * k + parent).reshape(-1)
        flat_cand = cand_idx.reshape(-1)
        self_kv = jax.tree.map(lambda x: x[:, flat_parent], self_kv)
        if use_lm:
            lm_kv = jax.tree.map(lambda x: x[:, flat_parent], lm_kv)

        if use_ctc:
            sel_rows = flat_parent
            ctc_state = CTCPrefixState(
                r_nb=cand_state.r_nb[sel_rows, :, flat_cand],
                r_b=cand_state.r_b[sel_rows, :, flat_cand],
                last=cand_state.last[sel_rows, flat_cand],
                score=cand_state.score[sel_rows, flat_cand],
            )
            # frozen beams keep their previous CTC state irrelevant (eos-only)

        tokens = jax.lax.dynamic_update_slice(
            tokens, nxt[:, :, None], (0, 0, pos + 1)
        )
        finished = finished | (nxt == eos)
        return pos + 1, tokens, new_scores, self_kv, lm_kv, ctc_state, finished

    carry = (jnp.int32(0), tokens0, scores0, self_kv, lm_kv, ctc_state, finished0)
    _, tokens, scores, _, _, _, finished = jax.lax.while_loop(cond, body, carry)

    best = jnp.argmax(scores, axis=1)
    rows = jnp.arange(b)
    best_tokens = tokens[rows, best]
    is_eos = (best_tokens == eos) & (jnp.arange(total)[None, :] >= 1)
    first_eos = jnp.where(
        jnp.any(is_eos, axis=1), jnp.argmax(is_eos, axis=1), total - 1
    )
    return best_tokens, first_eos + 1, scores[rows, best]
