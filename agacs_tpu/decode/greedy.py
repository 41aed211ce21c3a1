"""Batched greedy decoding with a real KV cache under `lax.while_loop`.

The reference decodes via BeamSearch(beam_size=1) and re-forwards the FULL
prefix through all decoder blocks every step with no cache
(`whisper_decoder.py:192-194` "cache implementation is ignored for now for
simplicity & correctness" → O(L²·layers) per utterance). Here each step is
one `whisper_decode_step` (O(L) with preallocated caches), the whole loop
is one compiled XLA program, and utterances decode in batch.

The hypothesis primer is the dual-language prompt
`[50258, 50260, 50259, 50359, 50363]` (asr_inference.py:319-331).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from agacs_tpu.models.whisper import (
    WhisperConfig,
    init_self_kv_cache,
    precompute_cross_kv,
    whisper_decode_step,
)

WHISPER_CS_PRIMER = (50258, 50260, 50259, 50359, 50363)


@partial(jax.jit, static_argnames=("cfg", "primer", "max_steps", "eot", "loop"))
def greedy_decode(
    params,
    cfg: WhisperConfig,
    enc_out: jax.Array,
    primer: tuple[int, ...] = WHISPER_CS_PRIMER,
    max_steps: int = 200,
    eot: int = 50257,
    loop: str = "scan",
) -> tuple[jax.Array, jax.Array]:
    """Greedy decode a batch of encoded utterances.

    Args:
      enc_out: (B, T_enc, d) encoder output.
      primer: forced prompt token ids.
      max_steps: generated-token cap (the reference caps the decoder
        context at 448, whisper_decoder.py:197-198).
      loop: "scan" (default) always runs the full step count with masked
        updates — the static trip count lets XLA pipeline the decoder
        step (measured ~40x per-step gains for full-vocab matmuls vs
        while_loops, docs/PERF.md); "while" exits as soon as every
        utterance hits eot, which only wins when max_steps is far above
        real hypothesis lengths.

    Returns:
      tokens: (B, len(primer) + max_steps) int32; positions after each
        utterance's first <|endoftext|> are filled with eot.
      lengths: (B,) total valid length including primer and the eot.
    """
    b = enc_out.shape[0]
    n_primer = len(primer)
    total = n_primer + max_steps
    max_ctx = min(cfg.n_text_ctx, total)

    cross_kv = precompute_cross_kv(params, cfg, enc_out)
    self_kv = init_self_kv_cache(cfg, batch=b, max_len=max_ctx)

    tokens0 = jnp.zeros((b, total), jnp.int32)
    tokens0 = tokens0.at[:, :n_primer].set(jnp.asarray(primer, jnp.int32))

    def cond(carry):
        pos, tokens, self_kv, finished = carry
        return (pos < min(total - 1, max_ctx - 1)) & ~jnp.all(finished)

    def body(carry):
        pos, tokens, self_kv, finished = carry
        cur = jax.lax.dynamic_index_in_dim(tokens, pos, axis=1, keepdims=False)
        logits, self_kv = whisper_decode_step(
            params, cfg, cur, pos, self_kv, cross_kv
        )
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        # inside the primer, the next token is forced; once finished, pad eot
        in_primer = pos + 1 < n_primer
        forced = jax.lax.dynamic_index_in_dim(
            tokens0, jnp.minimum(pos + 1, n_primer - 1), axis=1, keepdims=False
        )
        nxt = jnp.where(in_primer, forced, nxt)
        nxt = jnp.where(finished, eot, nxt)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, pos + 1))
        finished = finished | (~in_primer & (nxt == eot))
        return pos + 1, tokens, self_kv, finished

    finished0 = jnp.zeros((b,), bool)
    if loop == "scan":
        def scan_body(carry, pos):
            pos_, tokens, self_kv, finished = body((pos, *carry))
            return (tokens, self_kv, finished), None

        (tokens, _, finished), _ = jax.lax.scan(
            scan_body, (tokens0, self_kv, finished0),
            jnp.arange(min(total - 1, max_ctx - 1), dtype=jnp.int32),
        )
    else:
        _, tokens, _, finished = jax.lax.while_loop(
            cond, body, (jnp.int32(0), tokens0, self_kv, finished0)
        )

    is_eot = (tokens == eot) & (
        jnp.arange(total)[None, :] >= n_primer
    )
    first_eot = jnp.where(
        jnp.any(is_eot, axis=1), jnp.argmax(is_eot, axis=1), total - 1
    )
    lengths = first_eot + 1
    return tokens, lengths
