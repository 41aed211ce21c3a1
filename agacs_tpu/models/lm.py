"""Transformer language model — `espnet2/lm/transformer_lm.py` equivalent
(used by the conformer+LM baseline recipe for shallow fusion).

Causal transformer over token ids; same stacked-layer scan style as the
other models. `lm_score_step` provides the incremental scoring interface
for beam-search fusion (scorer role of espnet's TransformerLM.batch_score).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

from agacs_tpu.models.conformer import (
    _attn,
    _ffn,
    _ln,
    _lin,
    _mha,
    _ffn_fwd2,
    sinusoidal_pe,
)
from agacs_tpu.models.whisper import layer_norm, linear
from agacs_tpu.ops import decode_attn
from agacs_tpu.train.losses import IGNORE_ID


@dataclasses.dataclass(frozen=True)
class TransformerLMConfig:
    vocab_size: int = 51865
    d_model: int = 512
    attention_heads: int = 8
    linear_units: int = 2048
    num_blocks: int = 16
    compute_dtype: Any = jnp.float32
    sos: int = 50258
    eos: int = 50257


def init_lm_params(rng: jax.Array, cfg: TransformerLMConfig) -> dict:
    ks = jax.random.split(rng, 3)
    d = cfg.d_model

    def block(k):
        kk = jax.random.split(k, 2)
        return {
            "attn": _attn(kk[0], d),
            "attn_ln": _ln(d),
            "ffn": _ffn(kk[1], d, cfg.linear_units),
            "ffn_ln": _ln(d),
        }

    return {
        "embed": jax.random.normal(ks[0], (cfg.vocab_size, d), jnp.float32) * 0.02,
        "blocks": jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[block(k) for k in jax.random.split(ks[1], cfg.num_blocks)],
        ),
        "after_ln": _ln(d),
        "output": _lin(ks[2], d, cfg.vocab_size),
    }


def lm_forward(params: dict, cfg: TransformerLMConfig, tokens: jax.Array) -> jax.Array:
    """(B, T) ids -> (B, T, V) fp32 logits (causal)."""
    b, t = tokens.shape
    d = cfg.d_model
    x = params["embed"][tokens].astype(cfg.compute_dtype) * math.sqrt(d)
    x = x + jnp.asarray(sinusoidal_pe(t, d)).astype(x.dtype)
    causal = jnp.tril(jnp.ones((t, t), bool))[None, None]

    def body(h, bp):
        hn = layer_norm(h, bp["attn_ln"])
        h = h + _mha(bp["attn"], hn, hn, causal, cfg.attention_heads)
        h = h + _ffn_fwd2(bp["ffn"], layer_norm(h, bp["ffn_ln"]))
        return h, 0

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = layer_norm(x, params["after_ln"])
    return linear(x, params["output"]).astype(jnp.float32)


def lm_loss(params: dict, cfg: TransformerLMConfig, batch: dict,
            train: bool = True, rng=None):
    """Next-token CE over text batches (espnet2/lm/espnet_model.py)."""
    text = batch["text"]  # (B, T), -1 padded
    b, t = text.shape
    ys_in = jnp.concatenate(
        [jnp.full((b, 1), cfg.sos, text.dtype), jnp.where(text == IGNORE_ID, cfg.eos, text)],
        axis=1,
    )[:, :-1]
    logits = lm_forward(params, cfg, ys_in)
    tgt = text
    mask = tgt != IGNORE_ID
    tgt_safe = jnp.where(mask, tgt, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tgt_safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(mask, nll, 0.0)
    n_tokens = jnp.maximum(jnp.sum(mask), 1)
    loss = jnp.sum(nll) / n_tokens
    stats = {"loss": loss, "ppl": jnp.exp(loss)}
    return loss, stats


def lm_score_step(params: dict, cfg: TransformerLMConfig, prefix: jax.Array) -> jax.Array:
    """(B, T) prefix -> (B, V) next-token log-probs (beam-fusion scorer)."""
    logits = lm_forward(params, cfg, prefix)
    return jax.nn.log_softmax(logits[:, -1], axis=-1)


def init_lm_kv_cache(cfg: TransformerLMConfig, batch: int, max_len: int) -> dict:
    # per-layer tuples of separate (B, max_len, d) d-minor buffers, the
    # same AR-cache redesign as whisper's init_self_kv_cache: each
    # layer's row dynamic_update_slice updates in place (one-consumer
    # version chain) and the qk dot reads the whole buffer in its
    # stored layout (docs/PERF.md round-3 tuple-cache section).
    max_len = decode_attn.pad_time(max_len)  # Pallas tile alignment

    def bufs():
        return tuple(
            jnp.zeros((batch, max_len, cfg.d_model), cfg.compute_dtype)
            for _ in range(cfg.num_blocks)
        )

    return {"k": bufs(), "v": bufs()}


def lm_score_step_cached(
    params: dict,
    cfg: TransformerLMConfig,
    tokens: jax.Array,
    pos: jax.Array,
    kv: dict,
) -> tuple[jax.Array, dict]:
    """One cached AR step: tokens (B,), pos scalar -> ((B, V) log-probs,
    new kv). The O(1)-per-step scorer for beam fusion."""
    d = cfg.d_model
    n_head = cfg.attention_heads
    dk = d // n_head
    b = tokens.shape[0]
    max_len = kv["k"][0].shape[1]

    x = params["embed"][tokens].astype(cfg.compute_dtype) * math.sqrt(d)
    pe = jnp.asarray(sinusoidal_pe(max_len, d))
    x = (x + jax.lax.dynamic_slice_in_dim(pe, pos, 1, 0).astype(x.dtype))[:, None, :]
    key_mask_th = (jnp.arange(max_len) <= pos)[None, :, None]  # (1, T, 1)

    # STATIC layer loop over per-layer tuple buffers: write-first row
    # DUS, block-diagonal-q dense qk (one matmul against the d-minor
    # cache, no head split), broadcast-multiply-reduce output — same
    # redesign as whisper_decode_step / transformer_decode_step
    # (docs/PERF.md round-3).
    head_block = (
        (jnp.arange(d) // dk)[:, None] == jnp.arange(n_head)[None, :]
    ).astype(cfg.compute_dtype)
    use_kernel = decode_attn.use_decode_kernel()
    kv_k, kv_v = list(kv["k"]), list(kv["v"])
    h = x
    for l in range(cfg.num_blocks):
        bp = jax.tree.map(lambda a: a[l], params["blocks"])
        hn = layer_norm(h, bp["attn_ln"])
        kv_k[l] = jax.lax.dynamic_update_slice(
            kv_k[l], linear(hn, bp["attn"]["k"]), (0, pos, 0)
        )
        kv_v[l] = jax.lax.dynamic_update_slice(
            kv_v[l], linear(hn, bp["attn"]["v"]), (0, pos, 0)
        )
        q = linear(hn, bp["attn"]["q"])
        if use_kernel:
            # fused Pallas cache attention (ops/decode_attn.py)
            att = decode_attn.decode_cache_attention(
                q[:, 0] * (dk ** -0.5), kv_k[l], kv_v[l], pos, n_head
            )[:, None, :]
        else:
            qb = q[:, 0][:, :, None] * head_block[None]  # (B, d, h)
            score = jnp.einsum("btd,bdh->bth", kv_k[l], qb).astype(
                jnp.float32
            ) / math.sqrt(dk)
            score = jnp.where(key_mask_th, score, -jnp.inf)
            w = jax.nn.softmax(score, -2).astype(h.dtype)  # (B, T, h)
            v_g = kv_v[l].reshape(b, max_len, n_head, dk)
            att = (w[..., None] * v_g).sum(axis=1).reshape(b, 1, d)
        h = h + linear(att, bp["attn"]["out"])
        h = h + _ffn_fwd2(bp["ffn"], layer_norm(h, bp["ffn_ln"]))

    x = layer_norm(h, params["after_ln"])
    logits = linear(x[:, 0], params["output"]).astype(jnp.float32)
    return jax.nn.log_softmax(logits, -1), {
        "k": tuple(kv_k), "v": tuple(kv_v)
    }
