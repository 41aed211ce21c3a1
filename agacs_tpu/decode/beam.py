"""Batched beam search with KV caches, fully jitted.

Replicates the score composition of the reference BeamSearch/BatchBeamSearch
(`espnet/nets/beam_search.py:30`, `batch_beam_search.py:29`) for the
scorers the Whisper recipes use:

  score(hyp) = Σ_t log p_decoder(y_t)  +  length_bonus · |hyp|
  (decode_asr_whisper.yaml: beam_size 1, ctc_weight 0.0, penalty 0 —
   CTC prefix scoring is a separate scorer, see decode/ctc_prefix.py)

Differences from the reference, by design:
  * hypotheses live in dense (B, beam, L) tensors with a finished mask —
    no ragged python lists; the whole search is one XLA program;
  * the decoder is evaluated through `whisper_decode_step` with per-beam
    KV caches gathered on reorder (the reference re-forwards the full
    prefix per step, batch_beam_search.py:143-163 → whisper_decoder
    forward_one_step);
  * ended hypotheses emit only <|endoftext|> with log-prob 0, the standard
    dense-beam equivalent of moving them to `ended_hyps`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

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
    static_argnames=("cfg", "beam_size", "primer", "max_steps", "eot", "length_bonus"),
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
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (tokens (B, total), lengths (B,), scores (B,)) for the best
    hypothesis per utterance."""
    b, t_enc, d = enc_out.shape
    n_primer = len(primer)
    total = n_primer + max_steps
    max_ctx = min(cfg.n_text_ctx, total)
    k = beam_size

    # replicate encoder state per beam: (B*k, ...)
    enc_rep = jnp.repeat(enc_out, k, axis=0)
    cross_kv = precompute_cross_kv(params, cfg, enc_rep)
    self_kv = init_self_kv_cache(cfg, batch=b * k, max_len=max_ctx)

    tokens0 = jnp.zeros((b, k, total), jnp.int32)
    tokens0 = tokens0.at[:, :, :n_primer].set(jnp.asarray(primer, jnp.int32))
    # only beam 0 is live initially (identical prefixes would duplicate)
    scores0 = jnp.full((b, k), NEG_INF, jnp.float32).at[:, 0].set(0.0)
    finished0 = jnp.zeros((b, k), bool)

    def cond(carry):
        pos, *_ , finished = carry
        return (pos < min(total - 1, max_ctx - 1)) & ~jnp.all(finished)

    def body(carry):
        pos, tokens, scores, self_kv, finished = carry
        cur = jax.lax.dynamic_index_in_dim(
            tokens.reshape(b * k, total), pos, axis=1, keepdims=False
        )
        logits, self_kv = whisper_decode_step(
            params, cfg, cur, pos, self_kv, cross_kv
        )
        logp = jax.nn.log_softmax(logits, axis=-1).reshape(b, k, -1)
        v = logp.shape[-1]

        in_primer = pos + 1 < n_primer

        # ended beams: only eot continuation, at zero incremental cost
        eot_only = jnp.full((b, k, v), NEG_INF).at[:, :, eot].set(0.0)
        logp = jnp.where(finished[:, :, None], eot_only, logp)

        cand = scores[:, :, None] + logp + length_bonus * (
            ~finished[:, :, None]
        ).astype(jnp.float32)

        def expand_normal(_):
            flat = cand.reshape(b, k * v)
            top_scores, top_idx = jax.lax.top_k(flat, k)
            return top_scores, top_idx // v, top_idx % v

        def expand_primer(_):
            # force the next primer token on every live beam
            forced = jnp.asarray(primer, jnp.int32)[jnp.minimum(pos + 1, n_primer - 1)]
            nxt = jnp.full((b, k), forced, jnp.int32)
            parent = jnp.tile(jnp.arange(k)[None, :], (b, 1))
            return scores, parent, nxt

        new_scores, parent, nxt = jax.lax.cond(
            in_primer, expand_primer, expand_normal, None
        )

        # reorder hypotheses + caches by parent beam
        batch_idx = jnp.arange(b)[:, None]
        tokens = tokens[batch_idx, parent]
        finished = finished[batch_idx, parent]
        flat_parent = (jnp.arange(b)[:, None] * k + parent).reshape(-1)
        self_kv = jax.tree.map(lambda c: c[:, flat_parent], self_kv)

        tokens = jax.lax.dynamic_update_slice(
            tokens, nxt[:, :, None], (0, 0, pos + 1)
        )
        finished = finished | (~in_primer & (nxt == eot))
        return pos + 1, tokens, new_scores, self_kv, finished

    _, tokens, scores, _, finished = jax.lax.while_loop(
        cond, body, (jnp.int32(0), tokens0, scores0, self_kv, finished0)
    )

    best = jnp.argmax(scores, axis=1)
    batch_idx = jnp.arange(b)
    best_tokens = tokens[batch_idx, best]
    best_scores = scores[batch_idx, best]

    is_eot = (best_tokens == eot) & (jnp.arange(total)[None, :] >= n_primer)
    first_eot = jnp.where(
        jnp.any(is_eot, axis=1), jnp.argmax(is_eot, axis=1), total - 1
    )
    return best_tokens, first_eot + 1, best_scores
