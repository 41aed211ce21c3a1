"""Conformer encoder + Transformer decoder — the baseline recipe track.

Re-designs `espnet2/asr/encoder/conformer_encoder.py:48` (rel-pos self-attn,
macaron FFN, conv module, swish, conv2d subsampling) and
`espnet2/asr/decoder/transformer_decoder.py:232` as pure functions over
stacked-layer pytrees under `lax.scan`, with explicit padding masks.

Matches the SEAME recipe config (`conf/tuning/train_asr_conformer.yaml`):
d=256, heads=4, ffn 2048, 12 blocks, conv kernel 15, rel_pos/rel_selfattn,
macaron, conv2d subsampling (T/4); decoder: 6 blocks, sinusoidal PE.

The conv module's normalization is selectable via `conv_norm`: "layer"
(TPU-native default — batch-stat plumbing is a poor fit for a pure-functional
step, and LN-conformers are standard practice) or "batch", which replicates
espnet's BatchNorm1d exactly (`espnet/nets/pytorch_backend/conformer/
convolution.py`) including running-stat carry and the recalibration probe
(`collect_bn_batch_stats` / `apply_bn_stats`); parity-tested vs the torch
oracle in tests/test_conformer.py.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from agacs_tpu.models.whisper import layer_norm, linear
from agacs_tpu.ops import decode_attn, relpos_flash

Params = Any


@dataclasses.dataclass(frozen=True)
class ConformerConfig:
    input_size: int = 80
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 12
    cnn_module_kernel: int = 15
    macaron_style: bool = True
    use_cnn_module: bool = True
    dropout_rate: float = 0.1
    # "layer" (TPU-native default) or "batch" (exact espnet
    # ConvolutionModule BatchNorm1d parity — see _conv_module)
    conv_norm: str = "layer"
    # unroll the block loop (static per-layer buffers instead of scanned
    # stacked-param dynamic slices) — same lever as whisper's
    # unroll_layers (docs/PERF.md round-3 encoder-stall forensics);
    # costs a longer compile, pays off for long training runs
    unroll_layers: bool = False
    compute_dtype: Any = jnp.float32


@dataclasses.dataclass(frozen=True)
class TransformerDecoderConfig:
    vocab_size: int = 51865
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    d_model: int = 256
    compute_dtype: Any = jnp.float32


def swish(x):
    return x * jax.nn.sigmoid(x)


def dropout(rng: jax.Array | None, x: jax.Array, rate: float) -> jax.Array:
    """Inverted dropout; identity when rng is None (eval) or rate == 0."""
    if rng is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


# ---------------------------------------------------------------------------
# positional encodings
# ---------------------------------------------------------------------------


def sinusoidal_pe(length: int, d: int) -> np.ndarray:
    pos = np.arange(length, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float64) * -(math.log(10000.0) / d))
    pe = np.zeros((length, d))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe.astype(np.float32)


def rel_positional_encoding(t: int, d: int) -> np.ndarray:
    """(2T-1, d): positions T-1 .. 0 .. -(T-1) (espnet RelPositionalEncoding,
    embedding.py: pe_positive flipped ++ pe_negative[1:])."""
    pos = np.arange(t, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float64) * -(math.log(10000.0) / d))
    pe_pos = np.zeros((t, d))
    pe_pos[:, 0::2] = np.sin(pos * div)
    pe_pos[:, 1::2] = np.cos(pos * div)
    pe_neg = np.zeros((t, d))
    pe_neg[:, 0::2] = np.sin(-pos * div)
    pe_neg[:, 1::2] = np.cos(-pos * div)
    return np.concatenate([pe_pos[::-1], pe_neg[1:]], axis=0).astype(np.float32)


def _rel_shift(x: jax.Array) -> jax.Array:
    """(B, h, T, 2T-1) -> (B, h, T, T) Transformer-XL relative shift
    (espnet RelPositionMultiHeadedAttention.rel_shift)."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(b, h, 2 * t, t)
    x = x[:, :, 1:].reshape(b, h, t, 2 * t - 1)
    return x[..., :t]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _xavier(rng, d_in, d_out):
    bound = math.sqrt(6.0 / (d_in + d_out))
    return jax.random.uniform(rng, (d_in, d_out), jnp.float32, -bound, bound)


def _lin(rng, d_in, d_out, bias=True):
    k1, k2 = jax.random.split(rng)
    p = {"w": _xavier(k1, d_in, d_out)}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def _ln(d):
    return {"w": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)}


def _ffn(rng, d, units):
    k1, k2 = jax.random.split(rng)
    return {"fc1": _lin(k1, d, units), "fc2": _lin(k2, units, d)}


def _attn(rng, d, rel=False, n_head=4):
    ks = jax.random.split(rng, 7)
    p = {
        "q": _lin(ks[0], d, d),
        "k": _lin(ks[1], d, d),
        "v": _lin(ks[2], d, d),
        "out": _lin(ks[3], d, d),
    }
    if rel:
        dk = d // n_head
        p["pos"] = _lin(ks[4], d, d, bias=False)
        p["pos_bias_u"] = jax.random.normal(ks[5], (n_head, dk), jnp.float32) * 0.02
        p["pos_bias_v"] = jax.random.normal(ks[6], (n_head, dk), jnp.float32) * 0.02
    return p


def init_conformer_params(rng: jax.Array, cfg: ConformerConfig) -> Params:
    ks = jax.random.split(rng, 4)
    d = cfg.output_size
    f = cfg.input_size
    f_sub = ((f - 1) // 2 - 1) // 2

    def block(k):
        kk = jax.random.split(k, 8)
        p = {
            "ff1": _ffn(kk[0], d, cfg.linear_units),
            "ff1_ln": _ln(d),
            "attn": _attn(kk[1], d, rel=True, n_head=cfg.attention_heads),
            "attn_ln": _ln(d),
            "ff2": _ffn(kk[2], d, cfg.linear_units),
            "ff2_ln": _ln(d),
            "final_ln": _ln(d),
        }
        if cfg.use_cnn_module:
            k1, k2, k3 = jax.random.split(kk[3], 3)
            p["conv"] = {
                "pw1": _lin(k1, d, 2 * d),
                "dw": jax.random.normal(k2, (cfg.cnn_module_kernel, 1, d), jnp.float32)
                * 0.02,
                "dw_b": jnp.zeros((d,), jnp.float32),
                "norm": _ln(d),
                "pw2": _lin(k3, d, d),
            }
            if cfg.conv_norm == "batch":
                # torch BatchNorm1d buffers ("running_" paths are never
                # optimizer-updated — train/freeze.py excludes them)
                p["conv"]["running_mean"] = jnp.zeros((d,), jnp.float32)
                p["conv"]["running_var"] = jnp.ones((d,), jnp.float32)
            p["conv_ln"] = _ln(d)
        return p

    return {
        "subsample": {
            "conv1": {
                "w": jax.random.normal(ks[0], (3, 3, 1, d), jnp.float32)
                * math.sqrt(2.0 / 9),
                "b": jnp.zeros((d,), jnp.float32),
            },
            "conv2": {
                "w": jax.random.normal(ks[1], (3, 3, d, d), jnp.float32)
                * math.sqrt(2.0 / (9 * d)),
                "b": jnp.zeros((d,), jnp.float32),
            },
            "out": _lin(ks[2], d * f_sub, d),
        },
        "blocks": jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[block(k) for k in jax.random.split(ks[3], cfg.num_blocks)],
        ),
        "after_ln": _ln(d),
    }


# ---------------------------------------------------------------------------
# conformer encoder forward
# ---------------------------------------------------------------------------


def _conv2d_subsample(p: Params, x: jax.Array, ilens: jax.Array):
    """(B, T, F) -> (B, T', d), T' = ((T-1)//2 - 1)//2 (subsampling.py
    Conv2dSubsampling: two 3x3 stride-2 VALID convs + linear)."""
    h = x[..., None]  # (B, T, F, 1)
    h = jax.lax.conv_general_dilated(
        h, p["conv1"]["w"].astype(h.dtype), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["conv1"]["b"].astype(h.dtype)
    h = jax.nn.relu(h)
    h = jax.lax.conv_general_dilated(
        h, p["conv2"]["w"].astype(h.dtype), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["conv2"]["b"].astype(h.dtype)
    h = jax.nn.relu(h)
    b, t2, f2, d = h.shape
    h = linear(h.transpose(0, 1, 3, 2).reshape(b, t2, d * f2), p["out"])
    olens = ((ilens - 1) // 2 - 1) // 2
    return h, olens


def _rel_attn(p: Params, x: jax.Array, pos: jax.Array, key_mask: jax.Array, n_head: int):
    b, t, d = x.shape
    dk = d // n_head

    from agacs_tpu.models.whisper import fused_linears

    q, k, v = fused_linears(x, [p["q"], p["k"], p["v"]])  # packed (B, T, d)
    pe = linear(pos, {"w": p["pos"]["w"]})  # (2T-1, d)
    # per-head bias add in packed layout: (h, dk) -> (d,) concatenated
    qu = q + p["pos_bias_u"].reshape(d).astype(q.dtype)
    qv = q + p["pos_bias_v"].reshape(d).astype(q.dtype)

    if relpos_flash.supports(t, d, n_head, q.dtype):
        # packed flash kernel: no head-split transposes, no HBM (T, T)
        # score tensors, rel_shift as an in-VMEM lane rotate
        # (ops/relpos_flash.py; docs/PERF.md round-5)
        mask = jnp.where(key_mask, 0.0, relpos_flash.NEG_MASK).astype(
            jnp.float32
        )
        out = relpos_flash.relpos_mha(
            qu, qv, k, v, relpos_flash.pad_pe(pe, t), mask, n_head,
            relpos_flash.interpret_requested(),
        )
        return linear(out, p["out"])

    def heads(y):
        return y.reshape(b, t, n_head, dk).transpose(0, 2, 1, 3)

    peh = pe.reshape(2 * t - 1, n_head, dk).transpose(1, 0, 2)  # (h, 2T-1, dk)
    ac = jnp.einsum("bhqd,bhkd->bhqk", heads(qu), heads(k))
    bd = _rel_shift(jnp.einsum("bhqd,hpd->bhqp", heads(qv), peh))
    score = (ac + bd).astype(jnp.float32) / math.sqrt(dk)
    score = jnp.where(key_mask[:, None, None, :], score, -jnp.inf)
    w = jax.nn.softmax(score, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, heads(v))
    return linear(out.transpose(0, 2, 1, 3).reshape(b, t, d), p["out"])


BN_EPS = 1e-5  # torch.nn.BatchNorm1d default


def _conv_module(p: Params, x: jax.Array, valid: jax.Array, kernel: int,
                 conv_norm: str = "layer", train: bool = False):
    """pointwise -> GLU -> depthwise(k) -> norm -> swish -> pointwise;
    padded positions zeroed so the depthwise conv can't leak across them.

    conv_norm="batch" replicates espnet's BatchNorm1d
    (`espnet/nets/pytorch_backend/conformer/convolution.py`) exactly:
    biased batch statistics over ALL (B, T) positions in training —
    including padding, the reference's own quirk — and `running_mean` /
    `running_var` buffers at eval. Buffers are refreshed by
    `collect_bn_stats` / `apply_bn_stats` (post-epoch recalibration, the
    functional stand-in for torch's per-step EMA; the trainer wires it).

    Returns (out, (mean, var)) — the batch stats are zeros/ones outside
    batch-norm training so the scan carry shape is static."""
    d = x.shape[-1]
    x = x * valid[..., None].astype(x.dtype)
    h = linear(x, p["pw1"])  # (B, T, 2d)
    a, g = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(g)  # GLU
    h = h * valid[..., None].astype(h.dtype)
    pad = (kernel - 1) // 2
    h = jax.lax.conv_general_dilated(
        h, p["dw"].astype(h.dtype), (1,), ((pad, pad),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=h.shape[-1],
    ) + p["dw_b"].astype(h.dtype)
    if conv_norm == "batch":
        hf = h.astype(jnp.float32)
        if train:
            mean = jnp.mean(hf, axis=(0, 1))
            var = jnp.var(hf, axis=(0, 1))  # biased, like torch train mode
        else:
            mean = p["running_mean"]
            var = p["running_var"]
        n = p["norm"]
        hf = (hf - mean) * jax.lax.rsqrt(var + BN_EPS)
        hf = hf * n["w"] + n["b"]
        h = hf.astype(h.dtype)
        stats = (mean, var) if train else (jnp.zeros((d,)), jnp.ones((d,)))
    else:
        h = layer_norm(h, p["norm"])
        stats = (jnp.zeros((d,), jnp.float32), jnp.ones((d,), jnp.float32))
    h = swish(h)
    return linear(h, p["pw2"]), stats


def conformer_encode(
    params: Params, cfg: ConformerConfig, feats: jax.Array, ilens: jax.Array,
    rng: jax.Array | None = None,
    interctc_layers: tuple[int, ...] = (),
    collect_bn_stats: bool = False,
) -> tuple[jax.Array, jax.Array] | tuple[jax.Array, jax.Array, list]:
    """(B, T, F) features -> (B, T/4, d), olens. `rng` enables dropout on
    every residual branch (train_asr_conformer.yaml: dropout_rate 0.1,
    espnet EncoderLayer semantics); None = eval.

    `interctc_layers`: 1-based layer indices whose outputs are also
    returned (intermediate CTC taps, conformer_encoder.py
    interctc_layer_idx) — returns (out, olens, [(idx, h_idx), ...])."""
    x, olens = _conv2d_subsample(params["subsample"], feats.astype(cfg.compute_dtype), ilens)
    t = x.shape[1]
    d = cfg.output_size
    x = x * math.sqrt(d)  # xscale (embedding.py)
    pos = jnp.asarray(rel_positional_encoding(t, d)).astype(x.dtype)
    valid = jnp.arange(t)[None, :] < olens[:, None]

    rng_c = rng if rng is not None else jax.random.PRNGKey(0)
    use_dropout = rng is not None and cfg.dropout_rate > 0.0

    def body(carry, bp):
        h, r = carry
        r, r1, r2, r3, r4 = jax.random.split(r, 5)
        rs = (r1, r2, r3, r4) if use_dropout else (None, None, None, None)
        drop = cfg.dropout_rate
        if cfg.macaron_style:
            h = h + 0.5 * dropout(
                rs[0], _ffn_fwd(bp["ff1"], layer_norm(h, bp["ff1_ln"])), drop
            )
        h = h + dropout(
            rs[1],
            _rel_attn(
                bp["attn"], layer_norm(h, bp["attn_ln"]), pos, valid,
                cfg.attention_heads,
            ),
            drop,
        )
        bn_stats = (jnp.zeros((d,), jnp.float32), jnp.ones((d,), jnp.float32))
        if cfg.use_cnn_module:
            conv_out, bn_stats = _conv_module(
                bp["conv"], layer_norm(h, bp["conv_ln"]), valid,
                cfg.cnn_module_kernel, conv_norm=cfg.conv_norm,
                train=rng is not None,
            )
            h = h + dropout(rs[2], conv_out, drop)
        h = h + 0.5 * dropout(
            rs[3], _ffn_fwd(bp["ff2"], layer_norm(h, bp["ff2_ln"])), drop
        )
        h = layer_norm(h, bp["final_ln"])
        # only stack what the caller asked for: the unconditional (L, B,
        # T, d) layer-output stack cost ~12 ms/step of dynamic-update-
        # slice + copy churn at 16x15 s (round-4 xplane) when neither
        # interCTC nor BN collection was active
        out = ()
        if interctc_layers:
            out += (h,)
        if collect_bn_stats:
            out += (bn_stats,)
        return (h, r), out

    if cfg.unroll_layers:
        carry = (x, rng_c)
        stacked = []
        for i in range(cfg.num_blocks):
            bp = jax.tree.map(lambda a: a[i], params["blocks"])
            carry, out = body(carry, bp)
            stacked.append(out)
        x, _ = carry
        if stacked and stacked[0]:
            # leaf-wise layer stacking, same layout as lax.scan's ys
            outs = jax.tree.map(lambda *xs: jnp.stack(xs), *stacked)
        else:
            outs = ()
    else:
        (x, _), outs = jax.lax.scan(body, (x, rng_c), params["blocks"])
    x = layer_norm(x, params["after_ln"])
    if collect_bn_stats:
        bn_stats = outs[-1]
        return x, olens, bn_stats
    if interctc_layers:
        layer_outs = outs[0]
        inter = [(li, layer_outs[li - 1]) for li in interctc_layers]
        return x, olens, inter
    return x, olens


def collect_bn_batch_stats(
    params: Params, cfg: ConformerConfig, feats: jax.Array, ilens: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Per-block conv BatchNorm batch statistics ((L, d) mean, (L, d) var)
    of one batch — the recalibration probe. Runs the encoder with
    train-mode batch stats but NO dropout (rng is None would flip the
    norm to eval, so a throwaway key with dropout_rate forced off)."""
    import dataclasses as _dc

    cfg0 = _dc.replace(cfg, dropout_rate=0.0)
    _, _, stats = conformer_encode(
        params, cfg0, feats, ilens, rng=jax.random.PRNGKey(0),
        collect_bn_stats=True,
    )
    return stats


def apply_bn_stats(params: Params, mean: jax.Array, var: jax.Array) -> Params:
    """Write averaged (L, d) batch stats into the blocks'
    running_mean/running_var buffers — the functional replacement for
    torch BatchNorm's per-step EMA (momentum 0.1): recalibrate from a few
    training batches after each epoch (BN recalibration à la SWA)."""
    import copy

    out = copy.copy(params)
    out["blocks"] = dict(params["blocks"])
    out["blocks"]["conv"] = dict(params["blocks"]["conv"])
    out["blocks"]["conv"]["running_mean"] = jnp.asarray(mean, jnp.float32)
    out["blocks"]["conv"]["running_var"] = jnp.asarray(var, jnp.float32)
    return out


def _ffn_fwd(p: Params, x: jax.Array) -> jax.Array:
    return linear(swish(linear(x, p["fc1"])), p["fc2"])


# ---------------------------------------------------------------------------
# transformer decoder
# ---------------------------------------------------------------------------


def init_transformer_decoder_params(rng: jax.Array, cfg: TransformerDecoderConfig) -> Params:
    ks = jax.random.split(rng, 4)
    d = cfg.d_model

    def block(k):
        kk = jax.random.split(k, 3)
        return {
            "self_attn": _attn(kk[0], d),
            "self_ln": _ln(d),
            "src_attn": _attn(kk[1], d),
            "src_ln": _ln(d),
            "ffn": _ffn(kk[2], d, cfg.linear_units),
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


def _mha(p, xq, xkv, mask, n_head):
    b, tq, d = xq.shape
    tk = xkv.shape[1]
    dk = d // n_head

    def heads(y, t):
        return y.reshape(b, t, n_head, dk).transpose(0, 2, 1, 3)

    q = heads(linear(xq, p["q"]), tq)
    k = heads(linear(xkv, p["k"]), tk)
    v = heads(linear(xkv, p["v"]), tk)
    score = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) / math.sqrt(dk)
    score = jnp.where(mask, score, -jnp.inf)
    w = jax.nn.softmax(score, axis=-1).astype(v.dtype)
    w = jnp.where(jnp.isnan(w), 0.0, w)  # fully-masked rows (pad queries)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    return linear(out.transpose(0, 2, 1, 3).reshape(b, tq, d), p["out"])


def transformer_decode(
    params: Params,
    cfg: TransformerDecoderConfig,
    tokens: jax.Array,
    memory: jax.Array,
    memory_lens: jax.Array,
    token_lens: jax.Array | None = None,
) -> jax.Array:
    """Teacher-forced forward -> (B, T, vocab) fp32 logits."""
    b, t = tokens.shape
    d = cfg.d_model
    x = params["embed"][tokens].astype(cfg.compute_dtype) * math.sqrt(d)
    x = x + jnp.asarray(sinusoidal_pe(t, d)).astype(x.dtype)

    causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
    if token_lens is not None:
        tok_valid = (jnp.arange(t)[None, :] < token_lens[:, None])[:, None, None, :]
        causal = causal & tok_valid
    mem_valid = (
        jnp.arange(memory.shape[1])[None, :] < memory_lens[:, None]
    )[:, None, None, :]
    mem = memory.astype(x.dtype)

    def body(h, bp):
        hn = layer_norm(h, bp["self_ln"])
        h = h + _mha(bp["self_attn"], hn, hn, causal, cfg.attention_heads)
        h = h + _mha(bp["src_attn"], layer_norm(h, bp["src_ln"]), mem, mem_valid, cfg.attention_heads)
        h = h + _ffn_fwd2(bp["ffn"], layer_norm(h, bp["ffn_ln"]))
        return h, 0

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = layer_norm(x, params["after_ln"])
    return linear(x, params["output"]).astype(jnp.float32)


def _ffn_fwd2(p, x):
    return linear(jax.nn.relu(linear(x, p["fc1"])), p["fc2"])


# ---------------------------------------------------------------------------
# incremental (KV-cached) transformer decoder for beam search
# ---------------------------------------------------------------------------


def init_decoder_kv_cache(cfg: TransformerDecoderConfig, batch: int, max_len: int):
    # per-layer tuples of separate (B, max_len, d) buffers so the row
    # dynamic_update_slice updates in place and the qk dot reads whole
    # buffers (same redesign as whisper's init_self_kv_cache;
    # docs/PERF.md round-3)
    max_len = decode_attn.pad_time(max_len)  # Pallas tile alignment

    def bufs():
        return tuple(
            jnp.zeros((batch, max_len, cfg.d_model), cfg.compute_dtype)
            for _ in range(cfg.num_blocks)
        )

    return {"k": bufs(), "v": bufs()}


def precompute_decoder_cross_kv(params: Params, cfg: TransformerDecoderConfig,
                                memory: jax.Array):
    """Per-layer TUPLES of head-split (B, h, T_mem, dk) cross K/V — read
    directly inside the AR loop with nothing per-step to slice or
    transpose (same redesign as whisper's precompute_cross_kv)."""
    mem = memory.astype(cfg.compute_dtype)
    n_head = cfg.attention_heads
    dk = cfg.d_model // n_head
    b, t = mem.shape[:2]

    def split(y):
        return y.reshape(b, t, n_head, dk).transpose(0, 2, 1, 3)

    ks, vs = [], []
    for l in range(cfg.num_blocks):
        bp = jax.tree.map(lambda a: a[l], params["blocks"])
        ks.append(split(linear(mem, bp["src_attn"]["k"])))
        vs.append(split(linear(mem, bp["src_attn"]["v"])))
    return {"k": tuple(ks), "v": tuple(vs)}


def transformer_decode_step(
    params: Params,
    cfg: TransformerDecoderConfig,
    tokens: jax.Array,
    pos: jax.Array,
    self_kv,
    cross_kv,
    memory_lens: jax.Array,
):
    """One AR step: tokens (B,), pos scalar -> (logits (B, V) fp32, new kv)."""
    d = cfg.d_model
    n_head = cfg.attention_heads
    dk = d // n_head
    b = tokens.shape[0]
    max_len = self_kv["k"][0].shape[1]

    x = params["embed"][tokens].astype(cfg.compute_dtype) * math.sqrt(d)
    pe = jnp.asarray(sinusoidal_pe(max_len, d))
    x = (x + jax.lax.dynamic_slice_in_dim(pe, pos, 1, 0).astype(x.dtype))[:, None, :]

    key_mask_th = (jnp.arange(max_len) <= pos)[None, :, None]  # (1, T, 1)
    t_mem = cross_kv["k"][0].shape[2]
    mem_mask = (jnp.arange(t_mem)[None, :] < memory_lens[:, None])[:, None, None, :]

    def heads(y, t):
        return y.reshape(b, t, n_head, dk).transpose(0, 2, 1, 3)

    # STATIC layer loop over per-layer cache buffers with write-first
    # row updates, block-diagonal-q self-attention (one dense matmul
    # against the d-minor cache, no head split) and a
    # broadcast-multiply-reduce output — the same cache-layout redesign
    # as whisper_decode_step (docs/PERF.md round-3).
    head_block = (
        (jnp.arange(d) // dk)[:, None] == jnp.arange(n_head)[None, :]
    ).astype(cfg.compute_dtype)
    use_kernel = decode_attn.use_decode_kernel()
    kv_k, kv_v = list(self_kv["k"]), list(self_kv["v"])
    h = x
    for l in range(cfg.num_blocks):
        bp = jax.tree.map(lambda a: a[l], params["blocks"])

        hn = layer_norm(h, bp["self_ln"])
        q = linear(hn, bp["self_attn"]["q"])
        kv_k[l] = jax.lax.dynamic_update_slice(
            kv_k[l], linear(hn, bp["self_attn"]["k"]), (0, pos, 0)
        )
        kv_v[l] = jax.lax.dynamic_update_slice(
            kv_v[l], linear(hn, bp["self_attn"]["v"]), (0, pos, 0)
        )
        if use_kernel:
            # fused Pallas cache attention (ops/decode_attn.py; same
            # kernel as whisper_decode_step — docs/PERF.md round-3)
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
        h = h + linear(att, bp["self_attn"]["out"])

        hn = layer_norm(h, bp["src_ln"])
        qc = heads(linear(hn, bp["src_attn"]["q"]), 1)
        score = jnp.einsum(
            "bhqd,bhkd->bhqk", qc, cross_kv["k"][l]
        ).astype(jnp.float32) / math.sqrt(dk)
        score = jnp.where(mem_mask, score, -jnp.inf)
        w = jax.nn.softmax(score, -1).astype(h.dtype)
        att = jnp.einsum("bhqk,bhkd->bhqd", w, cross_kv["v"][l])
        h = h + linear(att.transpose(0, 2, 1, 3).reshape(b, 1, d), bp["src_attn"]["out"])

        h = h + _ffn_fwd2(bp["ffn"], layer_norm(h, bp["ffn_ln"]))

    x = layer_norm(h, params["after_ln"])
    return linear(x[:, 0], params["output"]).astype(jnp.float32), {
        "k": tuple(kv_k), "v": tuple(kv_v)
    }
