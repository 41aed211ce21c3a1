"""N-step constrained (NSC) and modified adaptive expansion (mAES)
transducer beam searches.

Reference: espnet2/asr/transducer/beam_search_transducer.py —
`nsc_beam_search` (:557-719, after arXiv 2002.03577) and
`modified_adaptive_expansion_search` (:720-885, after IEEE 9250505),
plus the helpers `is_prefix`/`subtract`/`select_k_expansions`
(espnet/nets/pytorch_backend/transducer/utils.py:93-176) and
`prefix_search` (:185-220).

Like `models.transducer.default_beam_search`, these keep the reference's
ragged hypothesis semantics on the host and batch every decoder/joint
evaluation across the hypothesis set through the per-config jitted
primitives. Hypotheses carry their per-position decoder outputs
(`dec_outs[m]` = output after m tokens) so the prefix search can
re-score prefix extensions the same way the reference does.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

import jax.numpy as jnp

from agacs_tpu.models.transducer import (
    TransducerConfig,
    _beam_step_fns,
    init_decoder_state,
)


@dataclasses.dataclass
class _Hyp:
    score: float
    toks: tuple
    dec_outs: list  # [m] = (1, H) decoder output after m tokens
    state: Any      # stacked decoder state, leaves (L, 1, H)


def _is_prefix(x: tuple, pref: tuple) -> bool:
    return len(pref) < len(x) and x[: len(pref)] == pref


def _batch_logp(joint_fn, enc_t, hyps):
    dec = jnp.concatenate([h.dec_outs[-1] for h in hyps])
    return np.asarray(joint_fn(enc_t, dec))


def _batch_step(params, step_fn, hyps, tokens):
    """One decoder step for each (hyp, token) pair; returns per-hyp
    ((1, H) dec_out, state)."""
    import jax

    toks = jnp.asarray(tokens, jnp.int32)
    state = jax.tree.map(
        lambda *leaves: jnp.concatenate(leaves, axis=1),
        *[h.state for h in hyps],
    )
    dec, new_state = step_fn(toks, state)
    outs = []
    for i in range(len(hyps)):
        outs.append((
            dec[i : i + 1],
            jax.tree.map(lambda s: s[:, i : i + 1], new_state),
        ))
    return outs


def _prefix_search(hyps, enc_t, joint_fn, prefix_alpha):
    """In-place prefix re-scoring (beam_search_transducer.py:185-220):
    when hyp_i's sequence is a short prefix of hyp_j's, fold the
    probability of reaching hyp_j through hyp_i into hyp_j's score."""
    hyps = sorted(hyps, key=lambda h: len(h.toks), reverse=True)
    for j, hyp_j in enumerate(hyps[:-1]):
        for hyp_i in hyps[j + 1:]:
            li, lj = len(hyp_i.toks), len(hyp_j.toks)
            if not (_is_prefix(hyp_j.toks, hyp_i.toks)
                    and (lj - li) <= prefix_alpha):
                continue
            logp = np.asarray(joint_fn(enc_t, hyp_i.dec_outs[-1])[0])
            curr = hyp_i.score + float(logp[hyp_j.toks[li]])
            for k in range(li + 1, lj):
                logp_k = np.asarray(joint_fn(enc_t, hyp_j.dec_outs[k])[0])
                curr += float(logp_k[hyp_j.toks[k]])
            hyp_j.score = float(np.logaddexp(hyp_j.score, curr))
    return hyps


def _init_hyp(params, cfg, step_fn):
    state0 = init_decoder_state(cfg, 1)
    dec0, state0 = step_fn(
        jnp.full((1,), cfg.blank_id, jnp.int32), state0
    )
    return _Hyp(score=0.0, toks=(), dec_outs=[dec0], state=state0)


def nsc_beam_search(
    params,
    cfg: TransducerConfig,
    enc_out: np.ndarray,
    beam_size: int = 5,
    nstep: int = 1,
    prefix_alpha: int = 1,
) -> list[tuple[float, list[int]]]:
    """N-step constrained beam search for one utterance; enc_out (T, D).
    Returns [(score, tokens)] best-first (sort_nbest, score_norm=False)."""
    step_fn, joint_fn = _beam_step_fns(cfg)
    step = lambda t, s: step_fn(params, t, s)  # noqa: E731
    jointp = lambda e, d: joint_fn(params, e, d)  # noqa: E731
    blank = cfg.blank_id
    beam_k = min(beam_size, cfg.vocab_size - 1)

    kept = [_init_hyp(params, cfg, step)]
    for t in range(enc_out.shape[0]):
        enc_t = jnp.asarray(enc_out[t])[None]
        hyps = _prefix_search(kept, enc_t, jointp, prefix_alpha)
        s_pool: list[_Hyp] = []
        v_pool: list[_Hyp] = []
        for n in range(nstep):
            logp = _batch_logp(jointp, enc_t, hyps)
            for i, hyp in enumerate(hyps):
                s_pool.append(dataclasses.replace(
                    hyp, score=hyp.score + float(logp[i, blank]),
                    dec_outs=hyp.dec_outs[:],
                ))
                nb = np.delete(np.arange(cfg.vocab_size), blank)
                order = nb[np.argsort(-logp[i, nb])][:beam_k]
                for k in order:
                    v_pool.append(_Hyp(
                        score=hyp.score + float(logp[i, k]),
                        toks=hyp.toks + (int(k),),
                        dec_outs=hyp.dec_outs[:],
                        state=hyp.state,
                    ))
            v_pool.sort(key=lambda h: -h.score)
            # subtract: drop extensions whose sequence already exists in hyps
            seen = {h.toks for h in hyps}
            v_pool = [v for v in v_pool if v.toks not in seen][:beam_size]
            if not v_pool:
                break
            stepped = _batch_step(
                params, step, v_pool, [v.toks[-1] for v in v_pool]
            )
            if n < nstep - 1:
                for v, (d, st) in zip(v_pool, stepped):
                    v.dec_outs.append(d)
                    v.state = st
                hyps = v_pool[:]
                v_pool = []
                # accumulated S stays; V of intermediate steps becomes hyps
            else:
                dec_new = jnp.concatenate([d for d, _ in stepped])
                logp_b = np.asarray(jointp(enc_t, dec_new))
                for i, (v, (d, st)) in enumerate(zip(v_pool, stepped)):
                    if nstep != 1:
                        v.score += float(logp_b[i, blank])
                    v.dec_outs.append(d)
                    v.state = st
        kept = sorted(s_pool + v_pool, key=lambda h: -h.score)[:beam_size]
    return [(h.score, list(h.toks)) for h in kept]


def _select_k_expansions(hyps, logp, max_candidates, gamma, blank):
    """Prune-by-value expansion selection (transducer/utils.py:137-176):
    per hypothesis keep the top max_candidates expansions whose score is
    within gamma of that hypothesis's best expansion."""
    out = []
    for i, hyp in enumerate(hyps):
        order = np.argsort(-logp[i])[:max_candidates]
        cand = [(int(k), hyp.score + float(logp[i, k])) for k in order]
        best = max(c[1] for c in cand)
        out.append([c for c in cand if c[1] >= best - gamma])
    return out


def maes_beam_search(
    params,
    cfg: TransducerConfig,
    enc_out: np.ndarray,
    beam_size: int = 5,
    nstep: int = 2,
    prefix_alpha: int = 1,
    expansion_gamma: float = 2.3,
    expansion_beta: int = 2,
) -> list[tuple[float, list[int]]]:
    """Modified adaptive expansion search for one utterance; enc_out
    (T, D). nstep is forced to >= 2 like the reference (:127)."""
    step_fn, joint_fn = _beam_step_fns(cfg)
    step = lambda t, s: step_fn(params, t, s)  # noqa: E731
    jointp = lambda e, d: joint_fn(params, e, d)  # noqa: E731
    blank = cfg.blank_id
    nstep = max(nstep, 2)
    max_candidates = beam_size + expansion_beta
    assert cfg.vocab_size >= max_candidates, (
        f"beam_size+expansion_beta ({max_candidates}) must be <= vocab "
        f"({cfg.vocab_size})"
    )

    kept = [_init_hyp(params, cfg, step)]
    for t in range(enc_out.shape[0]):
        enc_t = jnp.asarray(enc_out[t])[None]
        hyps = _prefix_search(kept, enc_t, jointp, prefix_alpha)
        dup_check = {h.toks for h in hyps}
        list_b: list[_Hyp] = []
        for n in range(nstep):
            logp = _batch_logp(jointp, enc_t, hyps)
            k_exp = _select_k_expansions(
                hyps, logp, max_candidates, expansion_gamma, blank
            )
            list_exp: list[_Hyp] = []
            for i, hyp in enumerate(hyps):
                for k, new_score in k_exp[i]:
                    if k == blank:
                        list_b.append(dataclasses.replace(
                            hyp, score=new_score, dec_outs=hyp.dec_outs[:],
                        ))
                    elif hyp.toks + (k,) not in dup_check:
                        list_exp.append(_Hyp(
                            score=new_score,
                            toks=hyp.toks + (k,),
                            dec_outs=hyp.dec_outs[:],
                            state=hyp.state,
                        ))
            if not list_exp:
                kept = sorted(list_b, key=lambda h: -h.score)[:beam_size]
                break
            stepped = _batch_step(
                params, step, list_exp, [h.toks[-1] for h in list_exp]
            )
            if n < nstep - 1:
                for h, (d, st) in zip(list_exp, stepped):
                    h.dec_outs.append(d)
                    h.state = st
                hyps = list_exp[:]
            else:
                dec_new = jnp.concatenate([d for d, _ in stepped])
                logp_b = np.asarray(jointp(enc_t, dec_new))
                for i, (h, (d, st)) in enumerate(zip(list_exp, stepped)):
                    h.score += float(logp_b[i, blank])
                    h.dec_outs.append(d)
                    h.state = st
                kept = sorted(
                    list_b + list_exp, key=lambda h: -h.score
                )[:beam_size]
    return [(h.score, list(h.toks)) for h in kept]
