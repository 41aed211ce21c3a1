"""Whisper-track beam search — full scorer composition over KV-cached
`whisper_decode_step`.

Replicates the reference Speech2Text's scorer set
(`espnet2/bin/asr_inference.py:139-174,258-290`: decoder, ctc, lm,
length_bonus with weights {1-λ, λ, μ, β}) and the BeamSearch loop
semantics (`espnet/nets/beam_search.py:346-483`: ended-hypothesis pool,
eos-append at maxlen, end detection) via the shared dense core in
`decode/composed_beam.py`. The hyp primer is the dual-language prompt
`[50258, 50260, 50259, 50359, 50363]` (asr_inference.py:319-331).

maxlen semantics: the caller passes max_steps = encoder frame count when
maxlenratio == 0 (`beam_search.py:365-371`); the decoder context cap (448,
whisper_decoder.py:197-198) bounds it here.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from agacs_tpu.decode.composed_beam import composed_beam_decode
from agacs_tpu.decode.greedy import WHISPER_CS_PRIMER
from agacs_tpu.models.whisper import (
    WhisperConfig,
    init_self_kv_cache,
    precompute_cross_kv,
    whisper_decode_step,
)

NEG_INF = -1.0e30


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "beam_size", "primer", "max_steps", "eot", "length_bonus",
        "ctc_weight", "lm_cfg", "lm_weight", "ngram_weight", "pre_beam",
        "use_end_detect", "loop", "ancestry",
    ),
)
def beam_decode(
    params,
    cfg: WhisperConfig,
    enc_out: jax.Array,
    beam_size: int = 5,
    primer: tuple[int, ...] = WHISPER_CS_PRIMER,
    max_steps: int = 200,
    eot: int = 50257,
    length_bonus: float = 0.0,
    ctc_weight: float = 0.0,
    ctc_logp: jax.Array | None = None,
    ctc_frame_lens: jax.Array | None = None,
    lm_params=None,
    lm_cfg=None,
    lm_weight: float = 0.0,
    ngram_lm=None,
    ngram_weight: float = 0.0,
    pre_beam: int = 0,
    use_end_detect: bool = True,
    loop: str = "while",
    ancestry: bool = True,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (tokens (B, n_primer+max_steps+1), lengths (B,), scores (B,))
    for the best ended hypothesis per utterance.

    ctc_logp: (B, T_enc, V) frame log-probs from the CTC head (enables the
    CTC partial scorer when ctc_weight > 0); lm_*: shallow fusion.
    ancestry: keep the self-KV caches unreordered across beam selection
    and track parentage in an index map resolved inside attention (exact
    same results; removes the per-step cache gather, the dominant HBM
    term after the cross-KV sharing — docs/PERF.md round-3). Ignored for
    side-network configs, whose ladder caches keep the physical reorder.
    """
    b = enc_out.shape[0]
    k = beam_size
    n_primer = len(primer)
    max_ctx = min(cfg.n_text_ctx, n_primer + max_steps)

    if cfg.side_network is None:
        # beams share each utterance's cross K/V (no per-beam repeat):
        # the cross-attention reads are the dominant HBM term of beam
        # decode at T_enc=750, and this cuts them by the beam factor
        cross_kv = precompute_cross_kv(params, cfg, enc_out)
        groups = k
    else:
        # the side-ladder caches are keyed per decoding row; keep the
        # repeated layout there
        cross_kv = precompute_cross_kv(params, cfg, jnp.repeat(enc_out, k, axis=0))
        groups = 1
    use_ancestry = ancestry and groups > 1
    self_kv = init_self_kv_cache(
        cfg, batch=b * k, max_len=max_ctx, ancestry=use_ancestry
    )
    if use_ancestry:
        # rows are never physically moved; only the ancestry map follows
        # the surviving hypotheses
        def reorder_fn(state, flat_parent):
            out = dict(state)
            out["anc"] = state["anc"][:, flat_parent]
            return out
    else:
        # physical gather (oracle / side-network path): trunk k/v/k_cs
        # and the side-ladder caches are all per-layer tuples with
        # batch on axis 0
        def reorder_fn(state, flat_parent):
            out = {}
            for key, val in state.items():
                if isinstance(val, tuple):
                    out[key] = tuple(x[flat_parent] for x in val)
                else:
                    out[key] = val[:, flat_parent]
            return out

    def step(cur, pos, kv):
        return whisper_decode_step(
            params, cfg, cur, pos, kv, cross_kv, beam_groups=groups
        )

    lm_step = lm_state0 = None
    if lm_params is not None and lm_weight > 0.0:
        from agacs_tpu.models.lm import init_lm_kv_cache, lm_score_step_cached

        lm_state0 = init_lm_kv_cache(lm_cfg, b * k, max_ctx)

        def lm_step(cur, pos, kv):
            return lm_score_step_cached(lm_params, lm_cfg, cur, pos, kv)

    ngram_step = None
    if ngram_lm is not None and ngram_weight > 0.0:
        from agacs_tpu.models.ngram import ngram_score_step

        def ngram_step(tokens, pos):
            return ngram_score_step(ngram_lm, tokens, pos)

    return composed_beam_decode(
        step, self_kv,
        batch=b, vocab=cfg.n_vocab, beam_size=k, primer=tuple(primer),
        max_steps=max_steps, eot=eot, max_pos=max_ctx - 1,
        length_bonus=length_bonus,
        ctc_weight=ctc_weight, ctc_logp=ctc_logp,
        ctc_frame_lens=ctc_frame_lens, pre_beam=pre_beam,
        lm_step_fn=lm_step, lm_state0=lm_state0, lm_weight=lm_weight,
        ngram_step_fn=ngram_step, ngram_weight=ngram_weight,
        use_end_detect=use_end_detect, loop=loop,
        reorder_state_fn=reorder_fn,
    )
