"""Joint CTC/attention beam search with optional LM shallow fusion — the
conformer-recipe decoding path (reference `espnet/nets/beam_search.py:30`
score composition with scorers {decoder, ctc, lm, length_bonus} and CTC
as a partial scorer with pre-beam pruning).

Score of extending hypothesis g with token c:

  s(g·c) = (1-λ)·log p_att(c|g,X) + λ·[ψ_ctc(g·c) − ψ_ctc(g)]
           + μ·log p_lm(c|g) + β

The loop itself (pre-beam, ended-hypothesis pool, eos-append at maxlen,
end detection, cache reordering) is the shared dense core in
`decode/composed_beam.py`; this wrapper binds the conformer/transformer
decoder stepper (`models/conformer.py` transformer_decode_step) and the
KV-cached LM stepper.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from agacs_tpu.decode.composed_beam import composed_beam_decode

NEG_INF = -1.0e30


@partial(
    jax.jit,
    static_argnames=(
        "dec_cfg", "beam_size", "pre_beam", "max_steps", "sos", "eos",
        "ctc_weight", "lm_weight", "length_bonus", "lm_cfg", "use_end_detect",
        "loop",
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
    use_end_detect: bool = True,
    loop: str = "while",
):
    """Returns (tokens (B, max_steps+2), lengths (B,), scores (B,)).

    memory: (B, T_enc, d) encoder output; ctc_logp: (B, T_enc, V) CTC frame
    log-probs (None disables the CTC score); lm_*: optional LM fusion.
    """
    from agacs_tpu.models.conformer import (
        init_decoder_kv_cache,
        precompute_decoder_cross_kv,
        transformer_decode_step,
    )

    b = memory.shape[0]
    k = beam_size
    total = max_steps + 1  # decoder input positions: sos + max_steps

    mem_r = jnp.repeat(memory, k, axis=0)
    mlens_r = jnp.repeat(memory_lens, k, axis=0)
    cross_kv = precompute_decoder_cross_kv(dec_params, dec_cfg, mem_r)
    self_kv = init_decoder_kv_cache(dec_cfg, b * k, total)

    def step(cur, pos, kv):
        return transformer_decode_step(
            dec_params, dec_cfg, cur, pos, kv, cross_kv, mlens_r
        )

    def reorder_fn(state, flat_parent):
        # decoder caches are per-layer tuples with batch on axis 0
        return jax.tree.map(lambda x: x[flat_parent], state)

    lm_step = lm_state0 = None
    if lm_params is not None and lm_weight > 0.0:
        from agacs_tpu.models.lm import init_lm_kv_cache, lm_score_step_cached

        lm_state0 = init_lm_kv_cache(lm_cfg, b * k, total)

        def lm_step(cur, pos, kv):
            return lm_score_step_cached(lm_params, lm_cfg, cur, pos, kv)

    return composed_beam_decode(
        step, self_kv,
        batch=b, vocab=dec_cfg.vocab_size, beam_size=k, primer=(sos,),
        max_steps=max_steps, eot=eos, max_pos=total - 1,
        length_bonus=length_bonus,
        ctc_weight=ctc_weight, ctc_logp=ctc_logp,
        ctc_frame_lens=ctc_frame_lens, pre_beam=pre_beam,
        lm_step_fn=lm_step, lm_state0=lm_state0, lm_weight=lm_weight,
        use_end_detect=use_end_detect, loop=loop,
        reorder_state_fn=reorder_fn,
    )
