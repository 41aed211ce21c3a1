"""Batched, jitted transducer beam searches: TSD and ALSD.

The reference's `time_sync_decoding` (espnet2/asr/transducer/
beam_search_transducer.py:356-449, after Saon et al. 2020): per encoder
frame, hypotheses take up to `max_sym_exp` symbol expansions; blank
extensions accumulate into a pool where identical label sequences merge
by log-add; the next frame starts from the top-`beam` of the pool.
`align_length_sync_decoding` (:452-556) instead advances along the
alignment diagonal i = t + u, each hypothesis reading its own frame
t = i − |y|; blank extensions at the last frame collect into the final
pool. Both are implemented dense (see below) with the same building
blocks.

The reference walks ragged python hypothesis lists per utterance. Here
the whole search is dense: a hypothesis set is (beam, L) blank-padded
token tensors + scores + stacked decoder states, the per-frame pool is a
fixed (beam·max_sym_exp,) candidate block, duplicate merging is a
pairwise-equality matrix + masked logsumexp (identical sequences imply
identical decoder states, so keeping the first occurrence is exact), and
the frame loop is one `lax.scan`. A batch of utterances runs under
`jax.vmap` with per-utterance frame masking — one compiled program
decodes the whole batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from agacs_tpu.models.transducer import (
    TransducerConfig,
    init_decoder_state,
    joint,
    transducer_decoder_step,
)

NEG_INF = -1.0e30


def _merge_scores(tokens, n_tok, scores):
    """Merge duplicate sequences: keep the first occurrence with the
    logsumexp of its group's scores, kill the rest to NEG_INF."""
    same = (tokens[:, None, :] == tokens[None, :, :]).all(-1)
    same &= n_tok[:, None] == n_tok[None, :]
    alive = scores > NEG_INF / 2
    same &= alive[:, None] & alive[None, :]
    first = jnp.argmax(same, axis=1)  # lowest j with same[i, j] (i itself worst case)
    is_rep = (first == jnp.arange(tokens.shape[0])) & alive
    group = jnp.where(same, scores[None, :], NEG_INF)
    merged = jax.scipy.special.logsumexp(group, axis=1)
    return jnp.where(is_rep, merged, NEG_INF)


def _tsd_single(params, cfg: TransducerConfig, enc_out, t_len, beam, max_sym_exp,
                l_max):
    """TSD over one utterance: enc_out (T, D), returns
    (tokens (beam, l_max), n (beam,), scores (beam,)) best-first."""
    blank = cfg.blank_id
    t_max = enc_out.shape[0]
    # one blank-extension block per expansion round
    a_cap = beam * max_sym_exp

    # beam state: tokens blank-padded so dense equality works
    tokens0 = jnp.full((beam, l_max), blank, jnp.int32)
    n0 = jnp.zeros((beam,), jnp.int32)
    scores0 = jnp.full((beam,), NEG_INF).at[0].set(0.0)
    state0 = init_decoder_state(cfg, beam)
    dec0, state0 = transducer_decoder_step(
        params, cfg, jnp.full((beam,), blank, jnp.int32), state0
    )

    def frame(carry, xs):
        tokens, n_tok, scores, dec_out, state = carry
        enc_t, valid = xs

        # pool of blank-extended candidates accumulated over expansions
        a_tokens = jnp.full((a_cap, l_max), blank, jnp.int32)
        a_n = jnp.zeros((a_cap,), jnp.int32)
        a_scores = jnp.full((a_cap,), NEG_INF)
        a_dec = jnp.zeros((a_cap,) + dec_out.shape[1:], dec_out.dtype)
        a_state = jax.tree.map(
            lambda s: jnp.zeros(s.shape[:1] + (a_cap,) + s.shape[2:], s.dtype),
            state,
        )

        c = (tokens, n_tok, scores, dec_out, state)
        pool = (a_tokens, a_n, a_scores, a_dec, a_state)

        for v in range(max_sym_exp):
            tokens, n_tok, scores, dec_out, state = c
            a_tokens, a_n, a_scores, a_dec, a_state = pool
            logp = jax.nn.log_softmax(
                joint(params, cfg, enc_t[None], dec_out).astype(jnp.float32),
                axis=-1,
            )  # (beam, V)

            # blank-extend every live C hyp into pool slots [v*beam, ...)
            sl = slice(v * beam, (v + 1) * beam)
            a_tokens = a_tokens.at[sl].set(tokens)
            a_n = a_n.at[sl].set(n_tok)
            a_scores = a_scores.at[sl].set(scores + logp[:, blank])
            a_dec = a_dec.at[sl].set(dec_out)
            a_state = jax.tree.map(
                lambda a, s: a.at[:, sl].set(s), a_state, state
            )
            pool = (a_tokens, a_n, a_scores, a_dec, a_state)

            if v == max_sym_exp - 1:
                break

            # non-blank expansions: top-beam per hyp -> top-beam overall
            nb = logp.at[:, blank].set(NEG_INF)
            cand = scores[:, None] + nb  # (beam, V)
            # cap sequence growth at l_max
            cand = jnp.where((n_tok < l_max)[:, None], cand, NEG_INF)
            top_v, top_i = jax.lax.top_k(cand.reshape(-1), beam)
            parent = top_i // nb.shape[1]
            sym = (top_i % nb.shape[1]).astype(jnp.int32)

            new_tokens = tokens[parent]
            new_n = n_tok[parent]
            new_tokens = new_tokens.at[jnp.arange(beam), new_n].set(sym)
            new_n = new_n + 1
            parent_state = jax.tree.map(lambda s: s[:, parent], state)
            new_dec, new_state = transducer_decoder_step(
                params, cfg, sym, parent_state
            )
            c = (new_tokens, new_n, top_v, new_dec, new_state)

        # merge duplicates in the pool, take top-beam as the next frame's B
        a_tokens, a_n, a_scores, a_dec, a_state = pool
        merged = _merge_scores(a_tokens, a_n, a_scores)
        top_v, top_i = jax.lax.top_k(merged, beam)
        new_b = (
            a_tokens[top_i],
            a_n[top_i],
            top_v,
            a_dec[top_i],
            jax.tree.map(lambda s: s[:, top_i], a_state),
        )
        # frames beyond t_len: keep the previous beam untouched
        out = jax.tree.map(
            lambda new, old: jnp.where(valid, new, old), new_b, carry
        )
        return out, None

    xs = (enc_out, jnp.arange(t_max) < t_len)
    (tokens, n_tok, scores, _, _), _ = jax.lax.scan(
        frame, (tokens0, n0, scores0, dec0, state0), xs
    )
    order = jnp.argsort(-scores)
    return tokens[order], n_tok[order], scores[order]


@functools.partial(
    jax.jit, static_argnames=("cfg", "beam", "max_sym_exp", "l_max")
)
def tsd_beam_search(
    params,
    cfg: TransducerConfig,
    enc_out: jax.Array,
    enc_lens: jax.Array,
    beam: int = 5,
    max_sym_exp: int = 3,
    l_max: int | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Batched TSD: enc_out (B, T, D), enc_lens (B,) ->
    (tokens (B, beam, l_max), n (B, beam), scores (B, beam)), hypotheses
    best-first per utterance. l_max defaults to T (one symbol per frame
    average is the practical ceiling)."""
    l_max = int(l_max or enc_out.shape[1])
    fn = lambda e, t: _tsd_single(  # noqa: E731
        params, cfg, e, t, beam=beam, max_sym_exp=max_sym_exp, l_max=l_max
    )
    return jax.vmap(fn)(enc_out, enc_lens)


def _alsd_single(params, cfg: TransducerConfig, enc_out, t_len, beam, u_max,
                 l_max):
    """ALSD over one utterance: enc_out (T, D). Returns
    (tokens (beam, l_max), n (beam,), scores (beam,)) best-first from the
    final pool (blank extensions taken at the last frame).

    Deviation from the reference's list walk: candidates are merged
    (log-add over identical sequences) BEFORE the beam cut each step, and
    the final pool keeps a running merged top-beam rather than an
    unbounded list — both at least as selective as :548-549's
    top-then-recombine."""
    blank = cfg.blank_id
    t_max = enc_out.shape[0]
    a_cap = beam * (beam + 1)

    tokens0 = jnp.full((beam, l_max), blank, jnp.int32)
    n0 = jnp.zeros((beam,), jnp.int32)
    scores0 = jnp.full((beam,), NEG_INF).at[0].set(0.0)
    state0 = init_decoder_state(cfg, beam)
    dec0, state0 = transducer_decoder_step(
        params, cfg, jnp.full((beam,), blank, jnp.int32), state0
    )
    fin_tokens0 = tokens0
    fin_n0 = n0
    fin_scores0 = jnp.full((beam,), NEG_INF)

    def step(carry, i):
        (tokens, n_tok, scores, dec_out, state,
         fin_tokens, fin_n, fin_scores) = carry

        t = i - n_tok  # per-hypothesis frame on the alignment diagonal
        active = (t < t_len) & (scores > NEG_INF / 2)
        enc_t = jnp.take_along_axis(
            enc_out, jnp.clip(t, 0, t_max - 1)[:, None], axis=0
        )  # (beam, D)
        logp = jax.nn.log_softmax(
            joint(params, cfg, enc_t, dec_out).astype(jnp.float32), axis=-1
        )

        # candidates: beam blank extensions + beam*beam symbol extensions
        blank_scores = jnp.where(active, scores + logp[:, blank], NEG_INF)
        nb = logp.at[:, blank].set(NEG_INF)
        sym_scores = jnp.where(
            (active & (n_tok < l_max))[:, None], scores[:, None] + nb, NEG_INF
        )
        top_v, top_sym = jax.lax.top_k(sym_scores, beam)  # per-parent top-beam

        cand_tokens = jnp.concatenate(
            [
                tokens,
                jnp.repeat(tokens, beam, axis=0)
                .at[jnp.arange(beam * beam), jnp.repeat(n_tok, beam)]
                .set(top_sym.reshape(-1).astype(jnp.int32)),
            ]
        )
        cand_n = jnp.concatenate([n_tok, jnp.repeat(n_tok, beam) + 1])
        cand_scores = jnp.concatenate([blank_scores, top_v.reshape(-1)])
        cand_parent = jnp.concatenate(
            [jnp.arange(beam), jnp.repeat(jnp.arange(beam), beam)]
        )
        cand_sym = jnp.concatenate(
            [jnp.full((beam,), blank, jnp.int32),
             top_sym.reshape(-1).astype(jnp.int32)]
        )

        merged = _merge_scores(cand_tokens, cand_n, cand_scores)
        best_v, best_i = jax.lax.top_k(merged, beam)
        sel_parent = cand_parent[best_i]
        sel_sym = cand_sym[best_i]
        sel_tokens = cand_tokens[best_i]
        sel_n = cand_n[best_i]

        parent_state = jax.tree.map(lambda s: s[:, sel_parent], state)
        parent_dec = dec_out[sel_parent]
        new_dec, new_state = transducer_decoder_step(
            params, cfg, sel_sym, parent_state
        )
        is_sym = sel_sym != blank
        dec_next = jnp.where(is_sym[:, None], new_dec, parent_dec)
        state_next = jax.tree.map(
            lambda ns, ps: jnp.where(is_sym[None, :, None], ns, ps),
            new_state, parent_state,
        )

        # blank extensions taken at the LAST frame enter the final pool
        fin_cand = jnp.where(t == t_len - 1, blank_scores, NEG_INF)
        pool_tokens = jnp.concatenate([fin_tokens, tokens])
        pool_n = jnp.concatenate([fin_n, n_tok])
        pool_scores = jnp.concatenate([fin_scores, fin_cand])
        pool_merged = _merge_scores(pool_tokens, pool_n, pool_scores)
        fv, fi = jax.lax.top_k(pool_merged, beam)
        carry = (sel_tokens, sel_n, best_v, dec_next, state_next,
                 pool_tokens[fi], pool_n[fi], fv)
        return carry, None

    u_cap = min(u_max, l_max)
    steps = jnp.arange(t_max + u_cap)
    carry0 = (tokens0, n0, scores0, dec0, state0,
              fin_tokens0, fin_n0, fin_scores0)
    carry, _ = jax.lax.scan(step, carry0, steps)
    _, _, b_scores, _, _, fin_tokens, fin_n, fin_scores = carry
    # reference: return final if any, else B — blend by score validity
    have_final = jnp.max(fin_scores) > NEG_INF / 2
    tokens = jnp.where(have_final, fin_tokens, carry[0])
    n_tok = jnp.where(have_final, fin_n, carry[1])
    scores = jnp.where(have_final, fin_scores, b_scores)
    order = jnp.argsort(-scores)
    return tokens[order], n_tok[order], scores[order]


@functools.partial(
    jax.jit, static_argnames=("cfg", "beam", "u_max", "l_max")
)
def alsd_beam_search(
    params,
    cfg: TransducerConfig,
    enc_out: jax.Array,
    enc_lens: jax.Array,
    beam: int = 5,
    u_max: int = 50,
    l_max: int | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Batched ALSD: enc_out (B, T, D), enc_lens (B,) ->
    (tokens (B, beam, l_max), n (B, beam), scores (B, beam)) best-first.
    u_max caps label length like the reference's u_max=min(u_max, T-1)."""
    l_max = int(l_max or min(u_max, enc_out.shape[1]))
    fn = lambda e, t: _alsd_single(  # noqa: E731
        params, cfg, e, t, beam=beam, u_max=u_max, l_max=l_max
    )
    return jax.vmap(fn)(enc_out, enc_lens)
