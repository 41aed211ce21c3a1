"""Generic scorer-composed beam search — one dense, jitted core for both
model families (reference `espnet/nets/beam_search.py:30` +
`batch_beam_search.py:29` + `espnet2/bin/asr_inference.py:139-174`).

Score of extending hypothesis g with token c:

  s(g·c) = (1-λ)·log p_att(c|g,X) + λ·[ψ_ctc(g·c) − ψ_ctc(g)]
           + μ·log p_lm(c|g) + β      (λ=ctc_weight, μ=lm_weight, β=penalty)

Faithful semantics (fixing round-1's finished-in-place dense beams):
  * ended hypotheses move to a per-utterance top-k ENDED register and are
    removed from the running beams (post_process, beam_search.py:472-483)
    — finished beams never crowd out live ones;
  * at the step cap, <eot> is appended to all running hypotheses and they
    join the ended pool with unchanged scores ("adding <eos> in the last
    position", beam_search.py:463-468);
  * end detection (maxlenratio=0 semantics): stop once M=3 consecutive
    steps produce no ending within D_end=-10 of the best ended score
    (e2e_asr_common.py:100 end_detect, Eq. 50 of the hybrid CTC/attn
    paper). Batched: a stopped row's registers freeze; the loop exits
    when every row has stopped or hit the cap.
  * CTC is a partial scorer with pre-beam pruning (pre_beam candidates by
    the full att+lm score, beam_search.py pre_beam_ratio), eot candidates
    take the CTC *final* prefix score;
  * minlenratio is intentionally absent: the reference computes minlen
    but never enforces it during search (beam_search.py:371 is used only
    by a vestigial empty-nbest retry at :400-405, unreachable here since
    the cap-append always yields an ended hypothesis);
  * the hyp primer (asr_inference.py:319-331) is forced token-by-token at
    zero score; it advances decoder and LM caches but NOT the CTC prefix
    state (deviation: the reference's CTCPrefixScore never folds primer
    tokens 1..n-1 into its state either — it silently treats the last
    primer token as the whole prefix; here the primer is cleanly excluded).

Hypotheses live in dense (B, beam, L) tensors; the decoder is abstracted
as a `step_fn(cur_tokens (N,), pos, state) -> (logits (N, V), state)` so
whisper (`decode/beam.py`) and conformer (`decode/joint_beam.py`) share
this loop. Caches reorder via the caller's `reorder_state_fn` (per-layer
tuple buffers gather axis 0; ancestry-indexed caches reorder only their
row map); the default is an axis-1 gather for stacked (L, N, ...) states.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30
END_DETECT_M = 3
END_DETECT_D = -10.0


def composed_beam_decode(
    step_fn,
    dec_state0,
    batch: int,
    vocab: int,
    beam_size: int,
    primer: tuple[int, ...],
    max_steps: int,
    eot: int,
    max_pos: int,
    length_bonus: float = 0.0,
    ctc_weight: float = 0.0,
    ctc_logp: jax.Array | None = None,
    ctc_frame_lens: jax.Array | None = None,
    pre_beam: int = 0,
    lm_step_fn=None,
    lm_state0=None,
    lm_weight: float = 0.0,
    ngram_step_fn=None,
    ngram_weight: float = 0.0,
    use_end_detect: bool = True,
    loop: str = "while",
    reorder_state_fn=None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (tokens (B, n_primer+max_steps+1), lengths (B,), scores (B,)).

    step_fn/lm_step_fn see flat (B*beam,) token vectors; their states must
    reorder correctly under `tree.map(lambda x: x[:, parent])`. `max_pos`
    caps the loop at the decoder context (n_text_ctx-1 positions).
    reorder_state_fn(state, flat_parent) overrides the decoder-state
    reorder — used by ancestry-indexed KV caches that redirect reads via
    an index map instead of physically gathering the cache buffers.
    ctc_logp: (B, T, V) frame log-probs; enables the CTC partial scorer
    together with ctc_weight > 0.

    loop: "while" exits as soon as every utterance stops; "scan" always
    runs to the step cap with stopped rows frozen — identical results.
    On this TPU backend scan is the fast form: a while_loop's dynamic
    trip count blocks XLA from pipelining the full-vocab matmuls across
    steps (docs/PERF.md round-2 while-vs-scan finding), so prefer scan
    whenever the cap is close to the real hypothesis length.
    """
    from agacs_tpu.decode.ctc_prefix import (
        CTCPrefixState,
        ctc_eos_score,
        ctc_prefix_init,
        ctc_prefix_score,
    )

    b, k, v = batch, beam_size, vocab
    n_primer = len(primer)
    # layout: primer | max_steps searched tokens | one appended <eot> slot
    total = n_primer + max_steps + 1
    limit = min(n_primer + max_steps - 1, max_pos)
    use_ctc = ctc_logp is not None and ctc_weight > 0.0
    use_lm = lm_step_fn is not None and lm_weight > 0.0
    use_ngram = ngram_step_fn is not None and ngram_weight > 0.0
    w_att = (1.0 - ctc_weight) if use_ctc else 1.0
    # espnet pre_beam_ratio=1.5 default (beam_search.py:497)
    c = pre_beam if pre_beam > 0 else int(1.5 * k) + 1

    def rep(x):
        return jnp.repeat(x, k, axis=0)

    if use_ctc:
        ctc_logp_r = rep(ctc_logp)
        ctc_lens_r = rep(
            ctc_frame_lens
            if ctc_frame_lens is not None
            else jnp.full((b,), ctc_logp.shape[1], jnp.int32)
        )
        ctc_state0 = ctc_prefix_init(ctc_logp_r)
    else:
        ctc_logp_r = ctc_lens_r = ctc_state0 = None

    tokens0 = jnp.full((b, k, total), eot, jnp.int32)
    tokens0 = tokens0.at[:, :, :n_primer].set(jnp.asarray(primer, jnp.int32))

    # ---- primer prefill, statically unrolled: force tokens 0..n_primer-2
    # through the decoder/LM caches at zero score (asr_inference.py:319-331
    # hyp primer). Keeping this out of the search loop removes the
    # in-primer lax.cond from the hot path; the loop starts at
    # pos = n_primer-1, whose logits select the first searched token.
    dec_state0_p = dec_state0
    lm_state0_p = lm_state0
    for p in range(n_primer - 1):
        cur_p = jnp.full((b * k,), primer[p], jnp.int32)
        _, dec_state0_p = step_fn(cur_p, p, dec_state0_p)
        if use_lm:
            _, lm_state0_p = lm_step_fn(cur_p, p, lm_state0_p)

    carry0 = {
        "pos": jnp.int32(n_primer - 1),
        "tokens": tokens0,
        "scores": jnp.full((b, k), NEG_INF, jnp.float32).at[:, 0].set(0.0),
        "dec": dec_state0_p,
        "lm": lm_state0_p,
        "ctc": ctc_state0,
        "ended_scores": jnp.full((b, k), NEG_INF, jnp.float32),
        "ended_tokens": jnp.full((b, k, total), eot, jnp.int32),
        "ended_lens": jnp.zeros((b, k), jnp.int32),
        "best_ended": jnp.full((b,), NEG_INF, jnp.float32),
        "dry_count": jnp.zeros((b,), jnp.int32),
        "stopped": jnp.zeros((b,), bool),
    }

    def cond(carry):
        return (carry["pos"] < limit) & ~jnp.all(carry["stopped"])

    def body(carry):
        pos, tokens, scores = carry["pos"], carry["tokens"], carry["scores"]
        cur = jax.lax.dynamic_index_in_dim(
            tokens.reshape(b * k, total), pos, axis=1, keepdims=False
        )
        logits, dec_state = step_fn(cur, pos, carry["dec"])
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)  # (N, V)
        full = w_att * logp
        lm_state = carry["lm"]
        if use_lm:
            lm_lp, lm_state = lm_step_fn(cur, pos, lm_state)
            full = full + lm_weight * lm_lp
        if use_ngram:
            # stateless scorer over the token buffer (models/ngram.py)
            full = full + ngram_weight * ngram_step_fn(
                tokens.reshape(b * k, total), pos
            )

        def search_step(_):
            ctc_state = carry["ctc"]
            if use_ctc:
                pre_scores, cands = jax.lax.top_k(full, c)  # (N, C)
                psi, cand_state = ctc_prefix_score(
                    ctc_logp_r, ctc_state, cands, frame_lens=ctc_lens_r
                )
                ctc_inc = psi - ctc_state.score[:, None]
                eos_inc = ctc_eos_score(ctc_state, ctc_lens_r) - ctc_state.score
                ctc_inc = jnp.where(cands == eot, eos_inc[:, None], ctc_inc)
                cand_scores = pre_scores + ctc_weight * ctc_inc
                n_cand = c
                cands_bk = cands.reshape(b, k, n_cand)
            else:
                cand_state = None
                cand_scores = full
                n_cand = v
                cands_bk = None  # candidate index IS the token id

            cand_scores = cand_scores + length_bonus
            totals = scores[:, :, None] + cand_scores.reshape(b, k, n_cand)

            active = ~carry["stopped"]
            rows = jnp.arange(b)[:, None]

            # ---- step's global top-k (BeamSearch.search): only selected
            # candidates can end a hypothesis — an eot outside the top-k
            # is pruned, not ended (this is what makes end detection see
            # "dry" steps)
            flat_totals = totals.reshape(b, k * n_cand)
            sel_scores, sel_idx = jax.lax.top_k(flat_totals, k)
            sel_parent = sel_idx // n_cand
            sel_cand = sel_idx % n_cand
            sel_tok = (
                sel_cand.astype(jnp.int32)
                if cands_bk is None
                else cands_bk[rows, sel_parent, sel_cand]
            )
            ended_cand = jnp.where(
                (sel_tok == eot) & active[:, None], sel_scores, NEG_INF
            )  # (B, k)

            # ---- ended merge: selected eot candidates join the ended pool
            pool = jnp.concatenate([carry["ended_scores"], ended_cand], axis=1)
            ended_scores, pool_idx = jax.lax.top_k(pool, k)
            from_old = pool_idx < k
            old_idx = jnp.minimum(pool_idx, k - 1)
            new_sel = jnp.minimum(pool_idx - k, k - 1)
            new_parent = sel_parent[rows, new_sel]
            newly_tokens = jax.lax.dynamic_update_slice(
                tokens[rows, new_parent],
                jnp.full((b, k, 1), eot, jnp.int32),
                (0, 0, pos + 1),
            )
            ended_tokens = jnp.where(
                from_old[:, :, None],
                carry["ended_tokens"][rows, old_idx],
                newly_tokens,
            )
            ended_lens = jnp.where(
                from_old, carry["ended_lens"][rows, old_idx], pos + 2
            )

            # ---- end detection (Eq. 50): M dry steps below best - D
            best_this = jnp.max(ended_cand, axis=1)
            best_ended = jnp.maximum(carry["best_ended"], best_this)
            has_any = best_ended > NEG_INF / 2
            dry = has_any & (best_this - best_ended < END_DETECT_D)
            dry_count = jnp.where(dry, carry["dry_count"] + 1, 0)
            if use_end_detect:
                stopped = carry["stopped"] | (dry_count >= END_DETECT_M)
            else:
                stopped = carry["stopped"]

            # ---- live beams = the selected non-eot candidates. Selected
            # eot candidates leave DEAD slots (score NEG_INF): the running
            # set shrinks exactly like the reference's remained_hyps
            # (post_process, beam_search.py:472-483).
            sel_dead = sel_tok == eot
            new_scores = jnp.where(sel_dead, NEG_INF, sel_scores)
            parent = sel_parent
            cand_idx = sel_cand
            nxt = sel_tok
            tokens_new = tokens[rows, parent]
            tokens_new = jax.lax.dynamic_update_slice(
                tokens_new, nxt[:, :, None], (0, 0, pos + 1)
            )

            flat_parent = (jnp.arange(b)[:, None] * k + parent).reshape(-1)
            if reorder_state_fn is not None:
                dec_new = reorder_state_fn(dec_state, flat_parent)
            else:
                dec_new = jax.tree.map(lambda x: x[:, flat_parent], dec_state)
            lm_new = (
                # LM caches are per-layer tuples with batch on axis 0
                jax.tree.map(lambda x: x[flat_parent], lm_state)
                if use_lm
                else lm_state
            )
            if use_ctc:
                flat_cand = cand_idx.reshape(-1)
                ctc_new = CTCPrefixState(
                    r_nb=cand_state.r_nb[flat_parent, :, flat_cand],
                    r_b=cand_state.r_b[flat_parent, :, flat_cand],
                    last=cand_state.last[flat_parent, flat_cand],
                    score=cand_state.score[flat_parent, flat_cand],
                )
            else:
                ctc_new = ctc_state

            # "no hypothesis. Finish decoding." (beam_search.py:389-391):
            # a row whose live slots are all dead stops searching
            stopped = stopped | (jnp.max(new_scores, axis=1) <= NEG_INF / 2)

            # freeze registers of stopped rows
            keep = carry["stopped"]

            def sel(new, old):
                extra = (1,) * (new.ndim - 1)
                return jnp.where(keep.reshape((b,) + extra), old, new)

            return {
                "pos": pos + 1,
                "tokens": sel(tokens_new, tokens),
                "scores": sel(new_scores, scores),
                "dec": dec_new,
                "lm": lm_new,
                "ctc": ctc_new,
                "ended_scores": sel(ended_scores, carry["ended_scores"]),
                "ended_tokens": sel(ended_tokens, carry["ended_tokens"]),
                "ended_lens": sel(ended_lens, carry["ended_lens"]),
                "best_ended": sel(best_ended, carry["best_ended"]),
                "dry_count": sel(dry_count, carry["dry_count"]),
                "stopped": stopped,
            }

        return search_step(None)

    if loop == "scan":
        n_scan = max(0, int(limit) - (n_primer - 1))
        out, _ = jax.lax.scan(
            lambda c, _: (body(c), None), carry0, None, length=n_scan
        )
    else:
        out = jax.lax.while_loop(cond, body, carry0)

    # "adding <eos> in the last position": merge live beams (eot appended,
    # score unchanged) into the ended pool, then pick the best ended. Rows
    # stopped by end detection DISCARD their running hyps (the reference
    # breaks out before post_process appends eos, beam_search.py:385-391).
    pos = out["pos"]
    live_tokens = jax.lax.dynamic_update_slice(
        out["tokens"],
        jnp.full((b, k, 1), eot, jnp.int32),
        (0, 0, pos + 1),
    )
    live_lens = pos + 2
    live_scores = jnp.where(out["stopped"][:, None], NEG_INF, out["scores"])
    pool_scores = jnp.concatenate([out["ended_scores"], live_scores], axis=1)
    pool_tokens = jnp.concatenate([out["ended_tokens"], live_tokens], axis=1)
    pool_lens = jnp.concatenate(
        [out["ended_lens"], jnp.full((b, k), live_lens, jnp.int32)], axis=1
    )
    best = jnp.argmax(pool_scores, axis=1)
    rows = jnp.arange(b)
    return pool_tokens[rows, best], pool_lens[rows, best], pool_scores[rows, best]
