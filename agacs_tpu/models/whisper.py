"""Whisper encoder/decoder as pure functions over a params pytree, TPU-first.

Re-designs the reference's modified Whisper (`espnet/whisper/whisper/model.py`)
for JAX/XLA:

  * params are plain nested dicts of jnp arrays; per-layer parameters are
    STACKED along a leading axis and the transformer stack runs under
    `jax.lax.scan` (one compiled block body, fast compiles, easy remat);
  * instead of returning full (B, h, T, T) pre-softmax score maps like the
    reference (`model.py:109`), the decoder emits only the two
    language-token score COLUMNS the CS machinery actually reads
    (`espnet2/asr/espnet_model.py:506` slices `[..., 1:3]`) — O(T) not O(T²)
    per head — plus per-row log-sum-exp so post-softmax column
    probabilities are recoverable;
  * parameter-efficient-tuning variants are config flags: bottleneck
    adapters (`model.py:181-194`), gated dual-QK "PE" attention
    (`model.py:111-179`), ladder side networks (`model.py:349-484`);
  * layer norm and softmax run in fp32 regardless of compute dtype,
    matching the reference's `LayerNorm(x.float())` / `qk.float()`.

Layouts are channel-last (B, T, C) — TPU-native for the conv stem.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from agacs_tpu.ops import decode_attn

Params = Any  # nested dict pytree of jnp arrays


@dataclasses.dataclass(frozen=True)
class SideNetworkConfig:
    """Ladder side network (reference `model.py:349-484`)."""

    n_dim: int = 192
    n_head: int = 4
    layers: tuple[int, ...] = (0, 2, 4, 6, 8, 10)


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    """ModelDimensions (reference `model.py:16-27`) + PET variant flags."""

    n_mels: int = 80
    n_audio_ctx: int = 1500
    n_audio_state: int = 768
    n_audio_head: int = 12
    n_audio_layer: int = 12
    n_vocab: int = 51865
    n_text_ctx: int = 448
    n_text_state: int = 768
    n_text_head: int = 12
    n_text_layer: int = 12
    # PET variants. `adapter`/`pe_attention` apply to both stacks; the
    # reference configures them PER COMPONENT (encoder_conf.adapter vs
    # decoder_conf.adapter, e.g. the tmecs "pedecoder"/"adapter_decoder"
    # variants) — the *_encoder/*_decoder overrides select that (None =
    # inherit the global flag).
    adapter: bool = False
    pe_attention: bool = False
    adapter_encoder: bool | None = None
    adapter_decoder: bool | None = None
    pe_encoder: bool | None = None
    pe_decoder: bool | None = None
    side_network: SideNetworkConfig | None = None
    # numerics
    compute_dtype: Any = jnp.float32
    # attention dispatch: "auto" = Pallas flash kernels on TPU (einsum on
    # CPU / for the PE variant / when probability columns are requested),
    # "einsum" = always reference-numerics path, "flash" = force kernels.
    attention_backend: str = "auto"
    # rematerialize block activations in backward (jax.checkpoint around
    # each scanned block): profiling showed the un-rematted backward saves
    # ~2 GB of fp32 attention scores + residuals per whisper-small step —
    # recomputing beats that HBM traffic on v5e. "full" recomputes
    # everything; "dots" saves matmul outputs (less recompute, more memory);
    # "none"/False disables.
    # "dots_nb" saves weight-matmul outputs and recomputes only the
    # attention internals: measured +16%/+12%/+6% over "full" at
    # B8x15s/B16x15s/B32x5s on v5e (docs/PERF.md round-2 table)
    remat: str | bool = "dots_nb"
    # serving: store the precomputed cross-attention K/V int8 with
    # per-channel f32 scales — halves the dominant HBM term of AR decode
    # (the per-step cross-KV stream; docs/PERF.md round-3). Dequant is
    # folded into the fused decode kernel; ignored off the kernel path.
    cross_kv_int8: bool = False
    # Unroll the layer loop instead of lax.scan for the teacher-forced
    # paths. scan+remat stacks every saved residual into (L, ...) buffers
    # via dynamic-update-slice and re-reads them with dynamic-slice —
    # ~15 ms/step of pure data movement at B=8x15 s (xplane: the
    # bitcast_dynamic-update-slice fusions). Unrolled, saved residuals
    # stay as separate buffers and param reads are static slices. Costs
    # compile time (~12x body count).
    #
    # Accepts False (scan both stacks), True (unroll both), or
    # "encoder"/"decoder" (unroll only that stack). "encoder" is the
    # measured sweet spot for training: the encoder backward scan is
    # 46.9 ms of the 105.5 ms B=16x15 s step, ~13 ms of which is a
    # ~1.08 ms/layer sync-flag stall on a 6 KB bias slice plus
    # stacked-param slice DMA traffic (xplane round-3 forensics,
    # docs/PERF.md). unroll_layers="encoder": 103.4 -> 91.4 ms/step
    # (MFU 0.44 -> 0.49) at a one-off 118 s compile; "decoder" alone
    # was measured a wash (-2 ms for a 319 s compile).
    unroll_layers: bool | str = False

    def part(self, which: str) -> "WhisperConfig":
        """Effective config for 'encoder' or 'decoder' blocks: resolves the
        per-component PET overrides into the plain adapter/pe flags."""
        if which == "encoder":
            a = self.adapter if self.adapter_encoder is None else self.adapter_encoder
            p = self.pe_attention if self.pe_encoder is None else self.pe_encoder
        else:
            a = self.adapter if self.adapter_decoder is None else self.adapter_decoder
            p = self.pe_attention if self.pe_decoder is None else self.pe_decoder
        if a == self.adapter and p == self.pe_attention:
            return self
        return dataclasses.replace(self, adapter=a, pe_attention=p)

    @property
    def d_audio_head(self) -> int:
        return self.n_audio_state // self.n_audio_head

    @property
    def d_text_head(self) -> int:
        return self.n_text_state // self.n_text_head


# OpenAI model-size presets (reference `whisper/__init__.py` _MODELS family).
WHISPER_PRESETS: dict[str, dict] = {
    "tiny": dict(n_audio_state=384, n_audio_head=6, n_audio_layer=4,
                 n_text_state=384, n_text_head=6, n_text_layer=4),
    "base": dict(n_audio_state=512, n_audio_head=8, n_audio_layer=6,
                 n_text_state=512, n_text_head=8, n_text_layer=6),
    "small": dict(n_audio_state=768, n_audio_head=12, n_audio_layer=12,
                  n_text_state=768, n_text_head=12, n_text_layer=12),
    "medium": dict(n_audio_state=1024, n_audio_head=16, n_audio_layer=24,
                   n_text_state=1024, n_text_head=16, n_text_layer=24),
    "large": dict(n_audio_state=1280, n_audio_head=20, n_audio_layer=32,
                  n_text_state=1280, n_text_head=20, n_text_layer=32),
    # not a real OpenAI size: a minimal config for fast CPU tests (the
    # multi-process suite compiles the full train step in every worker)
    "test": dict(n_audio_state=64, n_audio_head=2, n_audio_layer=2,
                 n_text_state=64, n_text_head=2, n_text_layer=2),
}


def make_config(model: str = "small", **overrides) -> WhisperConfig:
    return WhisperConfig(**{**WHISPER_PRESETS[model], **overrides})


# ---------------------------------------------------------------------------
# primitive layers
# ---------------------------------------------------------------------------


def layer_norm(x: jax.Array, p: Params, eps: float = 1e-5) -> jax.Array:
    """fp32 layer norm, output cast back to input dtype (model.py:30-32)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["w"] + p["b"]).astype(x.dtype)


def linear(x: jax.Array, p: Params) -> jax.Array:
    """x @ w (+ b). Weights stored (in, out) — transposed from torch.

    When the param dict carries an int8-quantized weight ({"w_q", "w_s"}
    from `trainer.quantize_frozen_linears`) the matmul runs on the MXU's
    int8 path instead (ops/int8_linear.py)."""
    if "w_q" in p:
        from agacs_tpu.ops.int8_linear import int8_linear

        return int8_linear(x, p)
    y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def fused_linears(x: jax.Array, ps: list) -> list:
    """Several linears over the SAME input as ONE matmul on the lane-
    concatenated weights (q/k/v projections, cross k/v).

    XLA does not merge separate dots sharing an LHS, so the unfused form
    reads the activation from HBM once per projection; on the int8 trunk
    it also re-quantizes it once per projection (the round-4 stall
    budget's abs_reduce_fusion class). The fused form reads and
    row-quantizes x ONCE and runs one better-shaped (d, n·d) MXU pass —
    numerically identical (same per-channel scales; the row scale of x
    is per-row, weight-independent). Falls back to per-projection calls
    when the params mix quantized and dense weights."""
    import os

    if all("w_q" in p for p in ps):
        from agacs_tpu.ops import int8_serve
        from agacs_tpu.ops.int8_linear import int8_matmul

        w_cat = jnp.concatenate([p["w_q"] for p in ps], axis=-1)
        s_cat = jnp.concatenate([p["w_s"] for p in ps], axis=-1)
        if int8_serve.thin_rows(x) and int8_serve.fits(w_cat):
            y = int8_serve.w8a16_matmul(
                x, w_cat, s_cat, int8_serve.interpret_requested()
            )
        else:
            y = checkpoint_name(int8_matmul(x, w_cat, s_cat),
                                "int8_linear_out")
    elif (all("w_q" not in p for p in ps)
          and os.environ.get("AGACS_FUSE_QKV_BF16", "0") in ("1", "true")):
        # measured default OFF for dense weights: the per-step f32->bf16
        # concat+cast costs more than the saved activation reads
        # (whisper bf16 16x15 s: fused 91.6 vs unfused 89.6 ms; conformer
        # neutral at 57.3-57.4 — docs/PERF.md round-5). The int8 branch
        # above stays fused: its concat is int8 (4x smaller) and the
        # shared row-quant win is real.
        w_cat = jnp.concatenate([p["w"] for p in ps], axis=-1)
        y = jnp.dot(x, w_cat.astype(x.dtype))
    else:
        return [linear(x, p) for p in ps]
    outs = []
    off = 0
    for p in ps:
        d = (p["w_q"] if "w_q" in p else p["w"]).shape[-1]
        part = y[..., off:off + d]
        if "b" in p:
            part = part + p["b"].astype(part.dtype)
        outs.append(part)
        off += d
    return outs


def gelu(x: jax.Array) -> jax.Array:
    # torch F.gelu default = exact erf formulation
    return jax.nn.gelu(x, approximate=False)


def conv1d(x: jax.Array, p: Params, stride: int) -> jax.Array:
    """Channel-last 1-D conv, kernel (3, in, out), SAME-style padding=1.

    Computed as shifted MATMULS, not lax.conv: y[t] = Σ_j x[t-1+j]·W[j]
    is three MXU matmuls plus fused shifts/adds, with stride 2 splitting
    x into even/odd phases so the matmuls run on half-length inputs
    (same FLOPs as the conv). Measured perf-neutral vs XLA's conv
    lowering at the 8×15 s train shape (61.3 vs 61.0 ms/step — the
    trace's "convolution" category is attention einsums, not the stem);
    kept because the matmul form needs no conv lowering at all and
    parity-tests exactly against lax.conv."""
    w = p["w"].astype(x.dtype)  # (3, cin, cout)
    b = p["b"].astype(x.dtype)
    assert w.shape[0] == 3, w.shape
    t = x.shape[1]

    def shift_fwd(m):  # out[t] = m[t-1]
        return jnp.pad(m[:, :-1], ((0, 0), (1, 0), (0, 0)))

    if stride == 1:
        y = (
            shift_fwd(jnp.dot(x, w[0]))
            + jnp.dot(x, w[1])
            + jnp.pad(jnp.dot(x[:, 1:], w[2]), ((0, 0), (0, 1), (0, 0)))
        )
        return y + b
    assert stride == 2, stride
    out_len = (t + 1) // 2
    if t % 2:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 0)))
    x_e = x[:, 0::2]
    x_o = x[:, 1::2]
    # y[s] = x[2s-1]·W0 + x[2s]·W1 + x[2s+1]·W2
    y = shift_fwd(jnp.dot(x_o, w[0])) + jnp.dot(x_e, w[1]) + jnp.dot(x_o, w[2])
    return y[:, :out_len] + b


def sinusoids(length: int, channels: int, max_timescale: float = 10000.0) -> np.ndarray:
    """Sinusoidal positions (model.py:53-59); a constant, not a parameter."""
    assert channels % 2 == 0
    log_inc = math.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-log_inc * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------


def _maybe_remat(fn, remat):
    if remat in (False, None, "none", "mlp"):
        return fn  # "mlp" checkpoints inside the block instead
    if remat == "dots":
        return jax.checkpoint(fn, policy=jax.checkpoint_policies.dots_saveable)
    if remat == "dots_nb":
        # save weight-matmul outputs (contractions with no batch dims),
        # recompute the O(T²) attention internals — less backward
        # recompute than "full" at far less memory than "dots". The
        # packed flash kernel's output is additionally named saveable:
        # without it the whole fwd kernel re-runs in backward just to
        # regenerate the (B, T, D) residual `o` (ops/flash_train.py).
        # int8_linear_out: quantized trunk linears are custom_vjp calls,
        # opaque to the dots policy — name-save their bf16 outputs so the
        # saved set matches the bf16 trunk's (ops/int8_linear.py).
        return jax.checkpoint(
            fn,
            policy=jax.checkpoint_policies.save_from_both_policies(
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                jax.checkpoint_policies.save_only_these_names(
                    "flash_attn_out", "int8_linear_out"),
            ),
        )
    return jax.checkpoint(fn)


def _unroll_for(cfg, which: str) -> bool:
    """Resolve cfg.unroll_layers (bool or "encoder"/"decoder") for a stack."""
    u = cfg.unroll_layers
    return u is True or u == which


def _scan_blocks(body, x, blocks, unroll: bool):
    """lax.scan over stacked layer params, or an unrolled Python loop with
    identical (carry, stacked_ys) semantics (cfg.unroll_layers)."""
    if not unroll:
        return jax.lax.scan(body, x, blocks)
    n = jax.tree_util.tree_leaves(blocks)[0].shape[0]
    ys = []
    for i in range(n):
        x, y = body(x, jax.tree.map(lambda a: a[i], blocks))
        ys.append(y)
    return x, jax.tree.map(lambda *zs: jnp.stack(zs), *ys)


def _split_heads(x: jax.Array, n_head: int) -> jax.Array:
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def mha(
    p: Params,
    x: jax.Array,
    xa: jax.Array | None = None,
    causal: bool = False,
    n_head: int = 12,
    lang_cols: tuple[int, int] | None = None,
    pe: bool = False,
    full_scores: bool = False,
    need_probs: bool = False,
    backend: str = "auto",
) -> tuple[jax.Array, dict]:
    """Multi-head attention matching reference `qkv_attention` numerics.

    scale = d_head**-0.25 applied to BOTH q and k; softmax in fp32; causal
    mask added as -inf pre-softmax (model.py:93-109).

    Returns (output, aux) where aux contains, when `lang_cols=(lo, hi)`:
      qk_cols: (B, h, T, hi-lo) pre-softmax scores for key columns [lo, hi)
               INCLUDING the -inf causal entries (what the shipped CS loss
               consumes, espnet_model.py:463-530);
      p_cols:  same slice post-softmax (what head counting / the PE variant
               consume).
    For the PE variant (pe=True), scores are the gated mix
    softmax((1-g)·qk + g·qk_cs) (model.py:156-179) and qk_cols/p_cols are
    taken from the mixed scores. With `full_scores=True`, aux additionally
    carries the full (B, h, T, T) score matrix ("qk_full": pre-softmax for
    standard attention, post-softmax for PE — exactly what the reference
    blocks return) for the attention_map.md debugging workflow.

    Dispatch: when neither PE nor full scores nor post-softmax columns are
    needed, the output goes through the fused flash path
    (ops/attention.fused_mha) and qk_cols — the ONLY thing the shipped CS
    loss reads — is computed analytically as a (T, |cols|) matmul against
    the two language-token keys, so no (T, T) score tensor ever
    materializes.
    """
    kv_in = x if xa is None else xa
    if xa is None:
        # one matmul + one activation (row-)quant for all three
        # projections (docs/PERF.md round-5 fused-QKV lever)
        q, k, v = fused_linears(x, [p["query"], p["key"], p["value"]])
    else:
        q = linear(x, p["query"])
        k, v = fused_linears(xa, [p["key"], p["value"]])

    d_head = q.shape[-1] // n_head
    scale = d_head ** -0.25

    if not pe and not full_scores:
        from agacs_tpu.ops.attention import (
            fused_mha,
            packed_mha_eligible,
            streaming_lse,
        )

        # Packed whole-KV Pallas kernel: consumes q/k/v in their natural
        # (B, T, D) layout — no head-split/merge transposes, no HBM score
        # tensors in fwd OR bwd (ops/flash_train.py). The training hot
        # path (encoder self-attention, T=250-1000).
        if packed_mha_eligible(q, k, n_head, causal, backend):
            from agacs_tpu.ops.flash_train import packed_flash_mha

            out = linear(packed_flash_mha(q, k, v, n_head), p["out"])
            aux = {}
            if lang_cols is not None:
                lo, hi = lang_cols
                qh = _split_heads(q, n_head) * scale
                kh = _split_heads(k, n_head) * scale
                aux["qk_cols"] = jnp.einsum(
                    "bhqd,bhkd->bhqk", qh, kh[:, :, lo:hi]
                ).astype(jnp.float32)
                if need_probs:
                    lse = streaming_lse(qh, kh, causal=False)
                    aux["p_cols"] = jnp.exp(aux["qk_cols"] - lse[..., None])
            return out, aux

        qh = _split_heads(q, n_head) * scale
        kh = _split_heads(k, n_head) * scale
        vh = _split_heads(v, n_head)

        out = fused_mha(qh, kh, vh, causal=causal, sm_scale=1.0, backend=backend)
        out = linear(_merge_heads(out), p["out"])
        aux = {}
        if lang_cols is not None:
            lo, hi = lang_cols
            qk_cols = jnp.einsum(
                "bhqd,bhkd->bhqk", qh, kh[:, :, lo:hi]
            ).astype(jnp.float32)
            if causal:
                t_q = qh.shape[2]
                col_ids = jnp.arange(lo, hi)[None, :]
                masked = col_ids > jnp.arange(t_q)[:, None]  # key col > query row
                qk_cols = jnp.where(masked[None, None], -jnp.inf, qk_cols)
            aux["qk_cols"] = qk_cols
            if need_probs:
                # post-softmax columns from the analytic scores + a
                # streaming logsumexp — no (T, T) map materializes
                lse = streaming_lse(qh, kh, causal=causal)
                aux["p_cols"] = jnp.exp(qk_cols - lse[..., None])
        return out, aux

    qh = _split_heads(q, n_head) * scale
    kh = _split_heads(k, n_head) * scale
    vh = _split_heads(v, n_head)

    qk = jnp.einsum("bhqd,bhkd->bhqk", qh, kh).astype(jnp.float32)
    if pe:
        q_cs = _split_heads(linear(x, p["query_cs"]), n_head) * scale
        k_cs = _split_heads(linear(kv_in, p["key_cs"]), n_head) * scale
        qk_cs = jnp.einsum("bhqd,bhkd->bhqk", q_cs, k_cs).astype(jnp.float32)
        g = jax.nn.sigmoid(p["gate"].astype(jnp.float32)).reshape(1, n_head, 1, 1)
        qk = (1.0 - g) * qk + g * qk_cs

    if causal:
        t_q, t_k = qk.shape[-2], qk.shape[-1]
        causal_mask = jnp.triu(jnp.full((t_q, t_k), -jnp.inf, jnp.float32), k=1)
        qk = qk + causal_mask

    w = jax.nn.softmax(qk, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", w.astype(vh.dtype), vh)
    out = linear(_merge_heads(out), p["out"])

    aux: dict = {}
    if lang_cols is not None:
        lo, hi = lang_cols
        aux["qk_cols"] = qk[..., lo:hi]
        aux["p_cols"] = w[..., lo:hi]
    if full_scores:
        aux["qk_full"] = w if pe else qk
    return out, aux


def adapter_fwd(p: Params, x: jax.Array) -> jax.Array:
    """Bottleneck adapter with residual (model.py:181-194)."""
    return x + linear(gelu(linear(x, p["down"])), p["up"])


def mlp_fwd(p: Params, x: jax.Array) -> jax.Array:
    if "w_q" in p["fc1"] and "w_q" in p["fc2"]:
        from agacs_tpu.ops import int8_mlp

        d = p["fc1"]["w_q"].shape[0]
        h = p["fc1"]["w_q"].shape[1]
        rows = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
        # fat rows only: a decode step's <=32 rows would pad to the
        # kernel's 256-row block (51x wasted MXU work)
        if rows >= int8_mlp.TR and int8_mlp.supports(d, h):
            # fused megakernel: hidden activations stay in VMEM
            # (ops/int8_mlp.py; docs/PERF.md round-5)
            return int8_mlp.int8_mlp(x, p["fc1"], p["fc2"])
    return linear(gelu(linear(x, p["fc1"])), p["fc2"])


def residual_block(
    p: Params,
    x: jax.Array,
    xa: jax.Array | None,
    causal: bool,
    n_head: int,
    cfg: WhisperConfig,
    lang_cols: tuple[int, int] | None = None,
    full_scores: bool = False,
    need_probs: bool = False,
    cross_scores: bool = False,
) -> tuple[jax.Array, dict]:
    """ResidualAttentionBlock (model.py:195-248): self-attn [+adapter+ln]
    [+cross-attn] + mlp [+adapter+ln]. Returns (x, self-attn aux; with
    cross_scores also aux['cross_qk'] — the pre-softmax cross-attention
    scores word-level timing consumes, timing.py:205)."""
    attn_out, aux = mha(
        p["attn"], layer_norm(x, p["attn_ln"]), None,
        causal=causal, n_head=n_head, lang_cols=lang_cols,
        pe=cfg.pe_attention, full_scores=full_scores, need_probs=need_probs,
        backend=cfg.attention_backend,
    )
    x = x + attn_out
    if cfg.adapter:
        x = adapter_fwd(p["adapter_attn"], x)
        x = layer_norm(x, p["adapter_attn_ln"])
    if xa is not None:
        cross_out, cross_aux = mha(
            p["cross_attn"], layer_norm(x, p["cross_attn_ln"]), xa,
            causal=False, n_head=n_head, pe=False,
            full_scores=cross_scores,
            backend=cfg.attention_backend,
        )
        x = x + cross_out
        if cross_scores:
            aux["cross_qk"] = cross_aux["qk_full"]
    mlp = mlp_fwd
    if cfg.remat == "mlp":
        # selective remat: recompute only the 4x-wide MLP in backward;
        # attention memory is handled by the flash kernel's custom VJP
        mlp = jax.checkpoint(mlp_fwd)
    x = x + mlp(p["mlp"], layer_norm(x, p["mlp_ln"]))
    if cfg.adapter:
        x = adapter_fwd(p["adapter_mlp"], x)
        x = layer_norm(x, p["adapter_mlp_ln"])
    return x, aux


# ---------------------------------------------------------------------------
# initialization
# ---------------------------------------------------------------------------


def _init_linear(rng, d_in, d_out, bias=True):
    k1, k2 = jax.random.split(rng)
    bound = 1.0 / math.sqrt(d_in)
    p = {"w": jax.random.uniform(k1, (d_in, d_out), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(k2, (d_out,), jnp.float32, -bound, bound)
    return p


def _init_ln(d):
    return {"w": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)}


def _init_attn(rng, d, n_head, pe=False):
    ks = jax.random.split(rng, 7)
    p = {
        "query": _init_linear(ks[0], d, d),
        "key": _init_linear(ks[1], d, d, bias=False),
        "value": _init_linear(ks[2], d, d),
        "out": _init_linear(ks[3], d, d),
    }
    if pe:
        # per-head learnable gate, uniform(0,1) init (model.py:121-122)
        p["query_cs"] = _init_linear(ks[4], d, d)
        p["key_cs"] = _init_linear(ks[5], d, d, bias=False)
        p["gate"] = jax.random.uniform(ks[6], (n_head,), jnp.float32, 0.0, 1.0)
    return p


def _init_block(rng, d, n_head, cfg: WhisperConfig, cross: bool):
    ks = jax.random.split(rng, 8)
    p = {
        "attn": _init_attn(ks[0], d, n_head, pe=cfg.pe_attention),
        "attn_ln": _init_ln(d),
        "mlp": {"fc1": _init_linear(ks[1], d, 4 * d), "fc2": _init_linear(ks[2], 4 * d, d)},
        "mlp_ln": _init_ln(d),
    }
    if cross:
        p["cross_attn"] = _init_attn(ks[3], d, n_head)
        p["cross_attn_ln"] = _init_ln(d)
    if cfg.adapter:
        bdim = d // 4
        p["adapter_attn"] = {"down": _init_linear(ks[4], d, bdim), "up": _init_linear(ks[5], bdim, d)}
        p["adapter_attn_ln"] = _init_ln(d)
        p["adapter_mlp"] = {"down": _init_linear(ks[6], d, bdim), "up": _init_linear(ks[7], bdim, d)}
        p["adapter_mlp_ln"] = _init_ln(d)
    return p


def _stack_blocks(blocks: list[Params]) -> Params:
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)


def init_whisper_params(rng: jax.Array, cfg: WhisperConfig) -> Params:
    """Random init (tests / from-scratch). Pretrained weights come via
    `agacs_tpu.models.checkpoint.load_torch_whisper`."""
    ks = jax.random.split(rng, 8)
    d_a, d_t = cfg.n_audio_state, cfg.n_text_state

    enc_blocks = [
        _init_block(k, d_a, cfg.n_audio_head, cfg.part("encoder"), cross=False)
        for k in jax.random.split(ks[0], cfg.n_audio_layer)
    ]
    dec_blocks = [
        _init_block(k, d_t, cfg.n_text_head, cfg.part("decoder"), cross=True)
        for k in jax.random.split(ks[1], cfg.n_text_layer)
    ]
    params = {
        "encoder": {
            "conv1": {
                "w": jax.random.normal(ks[2], (3, cfg.n_mels, d_a), jnp.float32)
                / math.sqrt(3 * cfg.n_mels),
                "b": jnp.zeros((d_a,), jnp.float32),
            },
            "conv2": {
                "w": jax.random.normal(ks[3], (3, d_a, d_a), jnp.float32)
                / math.sqrt(3 * d_a),
                "b": jnp.zeros((d_a,), jnp.float32),
            },
            "blocks": _stack_blocks(enc_blocks),
            "ln_post": _init_ln(d_a),
        },
        "decoder": {
            "token_emb": jax.random.normal(ks[4], (cfg.n_vocab, d_t), jnp.float32) * 0.02,
            "pos_emb": jax.random.normal(ks[5], (cfg.n_text_ctx, d_t), jnp.float32) * 0.01,
            "blocks": _stack_blocks(dec_blocks),
            "ln": _init_ln(d_t),
        },
    }
    if cfg.side_network is not None:
        params["encoder_side"] = _init_encoder_side(ks[6], cfg)
        params["decoder_side"] = _init_decoder_side(ks[7], cfg)
    return params


def _init_encoder_side(rng, cfg: WhisperConfig):
    sc = cfg.side_network
    ks = jax.random.split(rng, 6)
    n_side = len(sc.layers)
    side_cfg = dataclasses.replace(
        cfg, adapter=False, pe_attention=False,
        adapter_encoder=None, adapter_decoder=None, pe_encoder=None, pe_decoder=None,
    )
    blocks = [
        _init_block(k, sc.n_dim, sc.n_head, side_cfg, cross=False)
        for k in jax.random.split(ks[0], n_side)
    ]
    return {
        "downsample_input": _init_linear(ks[1], cfg.n_audio_state, sc.n_dim),
        "downsample_layers": _stack_blocks(
            [_init_linear(k, cfg.n_audio_state, sc.n_dim) for k in jax.random.split(ks[2], n_side)]
        ),
        "gates": jax.random.uniform(ks[3], (n_side,), jnp.float32, -1.0, 1.0),
        "blocks": _stack_blocks(blocks),
        "upsample_output": _init_linear(ks[4], sc.n_dim, cfg.n_audio_state),
        "ln_post": _init_ln(cfg.n_audio_state),
        "gate_output": jax.random.uniform(ks[5], (1,), jnp.float32, -1.0, 1.0),
    }


def _init_decoder_side(rng, cfg: WhisperConfig):
    sc = cfg.side_network
    ks = jax.random.split(rng, 6)
    n_side = len(sc.layers)
    side_cfg = dataclasses.replace(
        cfg, adapter=False, pe_attention=False,
        adapter_encoder=None, adapter_decoder=None, pe_encoder=None, pe_decoder=None,
    )
    blocks = [
        _init_block(k, sc.n_dim, sc.n_head, side_cfg, cross=True)
        for k in jax.random.split(ks[0], n_side)
    ]
    return {
        "downsample_input": _init_linear(ks[1], cfg.n_text_state, sc.n_dim),
        "downsample_encoder_input": _init_linear(ks[2], cfg.n_text_state, sc.n_dim),
        "downsample_layers": _stack_blocks(
            [_init_linear(k, cfg.n_text_state, sc.n_dim) for k in jax.random.split(ks[3], n_side)]
        ),
        "gates": jax.random.uniform(ks[4], (n_side,), jnp.float32, -1.0, 1.0),
        "blocks": _stack_blocks(blocks),
        "upsample_output": _init_linear(ks[5], sc.n_dim, cfg.n_text_state),
        "ln": _init_ln(cfg.n_text_state),
    }


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def whisper_encode(params: Params, cfg: WhisperConfig, mel: jax.Array) -> jax.Array:
    """Audio encoder (model.py:251-290 / whisper_encoder.py:137-222).

    mel: (B, T_frames, n_mels) channel-last log-mel. Frames beyond
    n_audio_ctx*2 are cropped (>30 s inputs, whisper_encoder.py:163-167).
    Returns (B, T_out, d) with T_out = min(ceil(T/2), n_audio_ctx).
    """
    enc = params["encoder"]
    x = mel.astype(cfg.compute_dtype)
    x = gelu(conv1d(x, enc["conv1"], stride=1))
    x = gelu(conv1d(x, enc["conv2"], stride=2))

    max_pos = cfg.n_audio_ctx
    if x.shape[1] > max_pos:
        x = x[:, :max_pos, :]
    pos = jnp.asarray(sinusoids(max_pos, cfg.n_audio_state))[: x.shape[1]]
    x = x + pos.astype(x.dtype)

    side = cfg.side_network
    x_embed = x  # post-posemb trunk input, feeds the side ladder

    enc_cfg = cfg.part("encoder")

    def block_fn(h, layer_params):
        h, _ = residual_block(
            layer_params, h, None, causal=False, n_head=cfg.n_audio_head,
            cfg=enc_cfg,
        )
        return h

    block_fn = _maybe_remat(block_fn, cfg.remat)

    def body(carry, layer_params):
        h = block_fn(carry, layer_params)
        return h, (h if side is not None else 0)

    x, layer_outs = _scan_blocks(body, x, enc["blocks"], _unroll_for(cfg, "encoder"))

    out = layer_norm(x, enc["ln_post"])

    if side is not None:
        # ladder side network fused with gated trunk taps
        # (whisper_encoder.py:172-205)
        sp = params["encoder_side"]
        side_cfg = dataclasses.replace(
        cfg, adapter=False, pe_attention=False,
        adapter_encoder=None, adapter_decoder=None, pe_encoder=None, pe_decoder=None,
    )
        h_side = linear(x_embed, sp["downsample_input"])
        for i, layer_idx in enumerate(side.layers):
            trunk_h = layer_outs[layer_idx]
            down = linear(trunk_h, jax.tree.map(lambda a: a[i], sp["downsample_layers"]))
            g = jax.nn.sigmoid(sp["gates"][i]).astype(down.dtype)
            h_side = (1.0 - g) * down + g * h_side
            h_side, _ = residual_block(
                jax.tree.map(lambda a: a[i], sp["blocks"]), h_side, None,
                causal=False, n_head=side.n_head, cfg=side_cfg,
            )
        h_side = linear(h_side, sp["upsample_output"])
        h_side = layer_norm(h_side, sp["ln_post"])
        g_out = jax.nn.sigmoid(sp["gate_output"][0]).astype(out.dtype)
        out = (1.0 - g_out) * out + g_out * h_side
    return out


def encoder_olens(ilens_frames: jax.Array, cfg: WhisperConfig) -> jax.Array:
    """Output lengths after the stride-2 conv stem (whisper_encoder.py:206-216):
    olens = 1 + (ilens - 3 + 2) // 2, clamped at n_audio_ctx."""
    return jnp.minimum(1 + (ilens_frames - 1) // 2, cfg.n_audio_ctx)


# ---------------------------------------------------------------------------
# decoder (training / full-sequence forward)
# ---------------------------------------------------------------------------


def whisper_decode(
    params: Params,
    cfg: WhisperConfig,
    tokens: jax.Array,
    audio_feats: jax.Array,
    src_layer: int = 0,
    collect_lang_cols: bool = False,
    lang_cols: tuple[int, int] = (1, 3),
    collect_full_maps: bool = False,
    need_probs: bool = False,
    collect_cross_maps: bool = False,
) -> tuple[jax.Array, dict]:
    """Teacher-forced decoder forward (whisper_decoder.py:89-170).

    Args:
      tokens: (B, T) int32 input ids (already sos-prefixed).
      audio_feats: (B, T_audio, d) encoder output.
      src_layer: 0-based first layer whose self-attn columns are collected
        (reference `src_layer - 1`, whisper_decoder.py:81; configs use
        src_layer: 1 → all 12 layers).
      collect_lang_cols: if True, aux contains
        qk_cols / p_cols: (n_layers - src_layer, B, h, T, 2) stacked in layer
        order — the reference's `torch.stack(attention_scores)` layout
        (whisper_decoder.py:168) restricted to the two language columns.

    Returns:
      logits (B, T, n_vocab) fp32, aux dict.
    """
    dec = params["decoder"]
    t = tokens.shape[1]
    x = dec["token_emb"][tokens] + dec["pos_emb"][:t]
    x = x.astype(cfg.compute_dtype)
    xa = audio_feats.astype(cfg.compute_dtype)

    cols = lang_cols if collect_lang_cols else None
    dec_cfg = cfg.part("decoder")

    def block_fn(h, layer_params):
        h, aux = residual_block(
            layer_params, h, xa, causal=True, n_head=cfg.n_text_head,
            cfg=dec_cfg, lang_cols=cols, full_scores=collect_full_maps,
            need_probs=need_probs, cross_scores=collect_cross_maps,
        )
        out = 0
        if cols or collect_full_maps or collect_cross_maps:
            out = (
                aux.get("qk_cols", 0),
                aux.get("p_cols", 0),
                aux.get("qk_full", 0),
                aux.get("cross_qk", 0),
            )
        return h, out

    block_fn = _maybe_remat(block_fn, cfg.remat)

    def body(carry, layer_params):
        return block_fn(carry, layer_params)

    x, layer_aux = _scan_blocks(body, x, dec["blocks"], _unroll_for(cfg, "decoder"))

    if cfg.side_network is not None:
        # the side ladder replaces the trunk output head
        # (whisper_decoder.py:160-163: upsample + side ln instead of trunk ln)
        x = _decoder_side_fwd(params, cfg, tokens, xa)
    else:
        x = layer_norm(x, dec["ln"])

    logits = jnp.dot(x, dec["token_emb"].T.astype(x.dtype)).astype(jnp.float32)
    if dec["token_emb"].shape[0] > cfg.n_vocab:
        # token_emb rows padded to a multiple of the tp model axis
        # (parallel/mesh.py pad_vocab_rows); drop the pad logit columns
        logits = logits[..., : cfg.n_vocab]

    aux: dict = {}
    if cols or collect_full_maps or collect_cross_maps:
        qk_cols, p_cols, qk_full, cross_qk = layer_aux
        if cols:
            aux["qk_cols"] = qk_cols[src_layer:]
            if need_probs or dec_cfg.pe_attention:
                aux["p_cols"] = p_cols[src_layer:]
        if collect_full_maps:
            # (L, B, h, T, T) in reference stacking order
            # (whisper_decoder.py:168 torch.stack(attention_scores))
            aux["maps"] = qk_full[src_layer:]
        if collect_cross_maps:
            # (L, B, h, T_text, T_audio) pre-softmax cross-attn scores
            aux["cross_maps"] = cross_qk
    return logits, aux


def _decoder_side_fwd(params, cfg, tokens, xa):
    """Decoder ladder-side forward; recomputes trunk per-layer outputs.

    Note: the reference threads side activations inside the same loop; with
    scan we re-run the trunk capturing intermediates (cheap relative to
    training backward; side-network recipes freeze the trunk anyway).
    """
    dec = params["decoder"]
    side = cfg.side_network
    sp = params["decoder_side"]
    t = tokens.shape[1]
    x = dec["token_emb"][tokens] + dec["pos_emb"][:t]
    x = x.astype(cfg.compute_dtype)

    dec_cfg = cfg.part("decoder")

    def body(carry, layer_params):
        h = carry
        h, _ = residual_block(
            layer_params, h, xa, causal=True, n_head=cfg.n_text_head, cfg=dec_cfg
        )
        return h, h

    _, layer_outs = _scan_blocks(body, x, dec["blocks"], _unroll_for(cfg, "decoder"))

    side_cfg = dataclasses.replace(
        cfg, adapter=False, pe_attention=False,
        adapter_encoder=None, adapter_decoder=None, pe_encoder=None, pe_decoder=None,
    )
    h_side = linear(x, sp["downsample_input"])
    xa_side = linear(xa, sp["downsample_encoder_input"])
    for i, layer_idx in enumerate(side.layers):
        down = linear(layer_outs[layer_idx], jax.tree.map(lambda a: a[i], sp["downsample_layers"]))
        g = jax.nn.sigmoid(sp["gates"][i]).astype(down.dtype)
        h_side = (1.0 - g) * down + g * h_side
        h_side, _ = residual_block(
            jax.tree.map(lambda a: a[i], sp["blocks"]), h_side, xa_side,
            causal=True, n_head=side.n_head, cfg=side_cfg,
        )
    h_side = linear(h_side, sp["upsample_output"])
    return layer_norm(h_side, sp["ln"])


# ---------------------------------------------------------------------------
# decoder (incremental, KV-cached) — the reference recomputes the full prefix
# every step (whisper_decoder.py:192-194, "cache implementation is ignored");
# here decoding is O(T) per step with preallocated static-shape caches.
# ---------------------------------------------------------------------------


def _quantize_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-channel int8 quantization of a (B, T, d) buffer:
    returns (int8 values, (d,) f32 scales). Channel maxima are taken over
    the whole batch, so one scale vector serves every row."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=(0, 1)) / 127.0, 1e-8)
    q = jnp.clip(jnp.round(xf / s), -127.0, 127.0).astype(jnp.int8)
    return q, s


def precompute_cross_kv(params: Params, cfg: WhisperConfig, audio_feats: jax.Array) -> Params:
    """Per-layer cross-attention K/V from encoder output, computed once.

    Returns dict with k/v as per-layer TUPLES of head-split
    (B, n_head, T_audio, d_head) arrays; k is pre-scaled by
    d_head**-0.25. Per-layer tuples rather than one stacked
    (L, B, T, d) array: the AR decode loop reads layer l's buffers
    directly from the closure — a stacked array gets re-sliced and
    re-head-split INSIDE the loop every step (two 12-output kLoop
    fusions copying 2·L·9.2 MB, measured 16% of beam-decode device
    time at B=8; docs/PERF.md round-3)."""
    xa = audio_feats.astype(cfg.compute_dtype)
    dec_cfg = cfg.part("decoder")
    n_head = dec_cfg.n_text_head
    scale = dec_cfg.d_text_head ** -0.25
    blocks = params["decoder"]["blocks"]
    int8 = bool(cfg.cross_kv_int8)
    ks, vs = [], []
    kp, vp = [], []
    ksc, vsc = [], []
    t_audio = xa.shape[1]
    align = decode_attn.TIME_ALIGN_I8 if int8 else decode_attn.TIME_ALIGN
    pad = decode_attn.pad_time(t_audio, align) - t_audio
    for l in range(dec_cfg.n_text_layer):
        ca = jax.tree.map(lambda a: a[l], blocks)["cross_attn"]
        k_lin = linear(xa, ca["key"])
        v_lin = linear(xa, ca["value"])
        ks.append(_split_heads(k_lin, n_head) * scale)
        vs.append(_split_heads(v_lin, n_head))
        # packed (B, Tp, d) layout for the fused decode-attention kernel:
        # k UNSCALED (the kernel's query carries the full d_head**-0.5),
        # time padded to the tile. Each decode program touches only one
        # of the two layouts, so XLA dead-code-eliminates the other
        # inside jitted decodes. cross_kv_int8 stores these quantized
        # per-channel (the kernel folds the dequant scales in for free).
        k_p = jnp.pad(k_lin, ((0, 0), (0, pad), (0, 0)))
        v_p = jnp.pad(v_lin, ((0, 0), (0, pad), (0, 0)))
        if int8:
            k_p, s_k = _quantize_kv(k_p)
            v_p, s_v = _quantize_kv(v_p)
            ksc.append(s_k)
            vsc.append(s_v)
        kp.append(k_p)
        vp.append(v_p)
    out = {
        "k": tuple(ks), "v": tuple(vs),
        "k_packed": tuple(kp), "v_packed": tuple(vp),
    }
    if int8:
        out["k_scale"] = tuple(ksc)
        out["v_scale"] = tuple(vsc)

    if cfg.side_network is not None:
        # side ladder: memory is downsampled once, then each side block
        # has its own cross K/V (whisper_decoder.py:210 downsample_encoder_input)
        sp = params["decoder_side"]
        side = cfg.side_network
        s_head = side.n_head
        s_scale = (side.n_dim // side.n_head) ** -0.25
        xa_side = linear(xa, sp["downsample_encoder_input"])
        ks, vs = [], []
        kp, vp = [], []
        n_side = len(side.layers)
        for i in range(n_side):
            ca = jax.tree.map(lambda a: a[i], sp["blocks"]["cross_attn"])
            k_lin = linear(xa_side, ca["key"])
            v_lin = linear(xa_side, ca["value"])
            ks.append(_split_heads(k_lin, s_head) * s_scale)
            vs.append(_split_heads(v_lin, s_head))
            # packed layout for the fused decode kernel (see k_packed)
            kp.append(jnp.pad(k_lin, ((0, 0), (0, pad), (0, 0))))
            vp.append(jnp.pad(v_lin, ((0, 0), (0, pad), (0, 0))))
        out["side_k"] = tuple(ks)
        out["side_v"] = tuple(vs)
        out["side_k_packed"] = tuple(kp)
        out["side_v_packed"] = tuple(vp)
    return out


def init_self_kv_cache(
    cfg: WhisperConfig,
    batch: int,
    max_len: int | None = None,
    ancestry: bool = False,
) -> Params:
    max_len = max_len or cfg.n_text_ctx
    # time axis padded to the bf16 sublane tile so the Pallas decode
    # kernel can collapse (beam, T, d) -> (beam*T, d); padded rows sit
    # beyond any reachable pos and are masked like every t > pos
    max_len = decode_attn.pad_time(max_len)
    # k/v/k_cs are per-layer TUPLES of (batch, max_len, d) buffers, all
    # d-minor — NOT one stacked (L, ...) array. Separate buffers keep
    # the per-step row dynamic_update_slice in place (every stacked or
    # head-split layout XLA picked for the combined buffer made the row
    # write a full-buffer copy — 12×0.118 ms/step, 36% of beam device
    # time) and let the qk dot read each layer's cache whole, with no
    # per-layer slice materialization (docs/PERF.md round-3).
    def bufs():
        return tuple(
            jnp.zeros((batch, max_len, cfg.n_text_state), cfg.compute_dtype)
            for _ in range(cfg.n_text_layer)
        )

    cache = {"k": bufs(), "v": bufs()}
    if cfg.part("decoder").pe_attention:
        cache["k_cs"] = bufs()
    if ancestry:
        # anc[0, i, t] = physical cache row holding position t of row i's
        # hypothesis. Beam search reorders THIS map instead of gathering
        # the (L, N, max_len, d) k/v buffers (decode/composed_beam.py);
        # attention resolves it as a dense one-hot mix over each
        # utterance's beam rows — no gathers, no cache-wide copies.
        cache["anc"] = jnp.broadcast_to(
            jnp.arange(batch, dtype=jnp.int32)[None, :, None],
            (1, batch, max_len),
        )
    if cfg.side_network is not None:
        def side_bufs():
            return tuple(
                jnp.zeros(
                    (batch, max_len, cfg.side_network.n_dim),
                    cfg.compute_dtype,
                )
                for _ in cfg.side_network.layers
            )

        cache["side_k"] = side_bufs()
        cache["side_v"] = side_bufs()
    return cache


def whisper_decode_step(
    params: Params,
    cfg: WhisperConfig,
    tokens: jax.Array,
    pos: jax.Array,
    self_kv: Params,
    cross_kv: Params,
    beam_groups: int = 1,
) -> tuple[jax.Array, Params]:
    """One AR decode step with KV cache.

    Args:
      tokens: (N,) int32 current-step token ids.
      pos: scalar int32 current position (0-based).
      self_kv: {"k","v"} per-layer tuples of (N, max_len, d) cache
        buffers (from `init_self_kv_cache`); positions >= pos are
        ignored via masking.
      cross_kv: from `precompute_cross_kv`.
      beam_groups: >1 when N = B·beam rows share B encoder outputs —
        cross_kv then has batch B (NOT repeated per beam) and the cross
        attention groups queries, reading each utterance's cross K/V
        once per step instead of `beam` times (the dominant HBM term of
        beam decode at T_enc=750).

    The layer loop is a STATIC Python loop, not lax.scan: scanning over
    stacked caches forces XLA to copy every layer's full (N, max_len, d)
    cache slice each step just to write one row (xs/ys buffers cannot
    alias — measured 32% of beam-decode device time). Each layer's k/v
    cache is its OWN (N, max_len, d) buffer (not a slice of a stacked
    (L, ...) array): the row dynamic_update_slice then aliases in place
    (stacked/head-split layouts made it a full-buffer copy, 36% of beam
    device time) and the qk dot reads the whole buffer with no per-layer
    slice materialization. Writes are WRITE-FIRST: the fresh row lands
    BEFORE that layer's attention reads, so every buffer version has a
    strict write→read→next-write consumer chain (docs/PERF.md round-3).

    Returns (logits (N, n_vocab) fp32, updated self_kv).
    """
    dec = params["decoder"]
    cfg = cfg.part("decoder")
    n = tokens.shape[0]
    max_len = self_kv["k"][0].shape[1]
    n_head = cfg.n_text_head
    d_head = cfg.d_text_head
    scale = d_head ** -0.25
    d = cfg.n_text_state

    if "token_emb_q" in dec:
        # serving-quantized checkpoint (ops/int8_serve.py): dequantize
        # the few looked-up embedding rows
        emb = (
            dec["token_emb_q"][tokens].astype(jnp.float32)
            * dec["token_emb_s"][tokens][:, None]
        )
    else:
        emb = dec["token_emb"][tokens]
    x = emb + jax.lax.dynamic_slice_in_dim(dec["pos_emb"], pos, 1, 0)
    x = x.astype(cfg.compute_dtype)[:, None, :]  # (N, 1, d)

    # key-position validity mask: positions 0..pos inclusive
    pos_ids = jnp.arange(max_len)
    key_mask = (pos_ids <= pos)[None, None, None, :]  # (1,1,1,max_len)
    # mask for the (.., T, h)-shaped self-attn logits below
    key_mask_th = (pos_ids <= pos)[None, :, None]  # (1, max_len, 1)

    # block-diagonal query expansion: the per-head qk dot is computed as
    # ONE dense matmul per layer, qk[n,t,h] = Σ_d k[n,t,d]·qb[n,d,h] with
    # qb[n,d,h] = q[n,d]·s²·[head(d)=h]. No (N,T,H,dh)→(N,H,T,dh) operand
    # transpose of the cache, no head batching: the cache keeps its
    # written layout and the extra H× dot FLOPs ride the MXU for free
    # (docs/PERF.md round-3 layout forensics).
    head_block = (
        (jnp.arange(d) // d_head)[:, None] == jnp.arange(n_head)[None, :]
    ).astype(cfg.compute_dtype) * (d_head ** -0.25)

    x_embed = x
    blocks = params["decoder"]["blocks"]
    kv_k, kv_v = list(self_kv["k"]), list(self_kv["v"])
    kv_kcs = self_kv.get("k_cs")
    kv_kcs = list(kv_kcs) if kv_kcs is not None else None
    # ancestry-indexed cache reads (beam search): rows are never
    # physically reordered; anc[0, i, t] names the row whose k/v holds
    # position t of row i's hypothesis, and attention mixes the group's
    # rows with the exact one-hot of that map (1.0·x + 0.0·y is exact,
    # so numerics match the gather form bit-for-bit).
    anc = self_kv.get("anc")
    use_anc = anc is not None and beam_groups > 1
    if anc is not None:
        # this step's rows live at their own physical rows; recorded
        # BEFORE the layer loop so the one-hot resolves position pos to
        # each row's own fresh k/v. The beam reorder then propagates the
        # map to the surviving hypotheses.
        anc = jax.lax.dynamic_update_slice(
            anc, jnp.arange(n, dtype=jnp.int32).reshape(1, n, 1), (0, 0, pos)
        )
    # grouped kernel blocks must fit VMEM (beam x padded-context x
    # 2-or-3 caches) either single-block or time-chunked; otherwise keep
    # the XLA formulation
    use_kernel = decode_attn.use_decode_kernel() and (
        beam_groups <= 1
        or decode_attn.kernel_viable(
            3 if cfg.pe_attention else 2, beam_groups, max_len, d
        )
    )
    anc_flat = None
    if use_anc:
        bg_a = n // beam_groups
        anc_flat = anc[0] % beam_groups  # (N, max_len) local row index
        if not use_kernel:
            anc_local = anc_flat.reshape(bg_a, beam_groups, max_len)
            a_sel = jax.nn.one_hot(anc_local, beam_groups, dtype=jnp.float32)
            # (bg, q_beam, max_len, j_beam)
    trunk_outs = []
    h = x
    for l in range(cfg.n_text_layer):
        layer_params = jax.tree.map(lambda a: a[l], blocks)

        # --- self-attention: write this layer's k/v row IN PLACE, then
        # attend over the updated cache. Write-first makes the layer's
        # reads (and every later layer's write, transitively) depend on
        # the row write, so each buffer version has one ordered consumer
        # chain and the row DUS aliases instead of copying the cache.
        p_attn = layer_params["attn"]
        y = layer_norm(h, layer_params["attn_ln"])
        q = linear(y, p_attn["query"])
        kv_k[l] = jax.lax.dynamic_update_slice(
            kv_k[l], linear(y, p_attn["key"]), (0, pos, 0)
        )
        kv_v[l] = jax.lax.dynamic_update_slice(
            kv_v[l], linear(y, p_attn["value"]), (0, pos, 0)
        )
        if cfg.pe_attention:
            # second key cache for the gated dual-QK mix (model.py:156-179)
            kv_kcs[l] = jax.lax.dynamic_update_slice(
                kv_kcs[l], linear(y, p_attn["key_cs"]), (0, pos, 0)
            )

        if use_kernel:
            # fused Pallas cache attention: qk, PE gate mix, mask,
            # softmax, and the value reduction in one kernel that
            # streams k/v through VMEM once in their stored layout
            # (ops/decode_attn.py; docs/PERF.md round-3)
            kw = {}
            if cfg.pe_attention:
                kw = dict(
                    q_cs=linear(y, p_attn["query_cs"])[:, 0] * (scale * scale),
                    k_cs=kv_kcs[l],
                    gate=jax.nn.sigmoid(p_attn["gate"].astype(jnp.float32)),
                )
            o = decode_attn.decode_cache_attention(
                q[:, 0] * (scale * scale), kv_k[l], kv_v[l], pos, n_head,
                anc_local=anc_flat if use_anc else None,
                beam=beam_groups if use_anc else 1, **kw,
            )[:, None, :]
        else:
            def _block_qk(q_row, cache_l):
                # qb: (N, d, h) block-diagonal scaled query
                qb = (q_row[:, 0] * scale)[:, :, None] * head_block[None]
                if use_anc:
                    kg = cache_l.reshape(bg_a, beam_groups, max_len, d)
                    qbg = qb.reshape(bg_a, beam_groups, d, n_head)
                    qk_all = jnp.einsum("bjtd,bqdh->bjtqh", kg, qbg).astype(
                        jnp.float32
                    )
                    # one-hot ancestry select over the group's physical rows
                    return jnp.einsum("bjtqh,bqtj->bqth", qk_all, a_sel)
                return jnp.einsum(
                    "ntd,ndh->nth", cache_l, qb
                ).astype(jnp.float32)

            qk = _block_qk(q, kv_k[l])  # (.., T, h) logits
            if cfg.pe_attention:
                qk_cs = _block_qk(linear(y, p_attn["query_cs"]), kv_kcs[l])
                g = jax.nn.sigmoid(p_attn["gate"].astype(jnp.float32))
                g = g.reshape((1,) * (qk.ndim - 1) + (n_head,))
                qk = (1.0 - g) * qk + g * qk_cs
            mask_th = key_mask_th if not use_anc else key_mask_th[None]
            qk = jnp.where(mask_th, qk, -jnp.inf)
            w = jax.nn.softmax(qk, axis=-2)  # softmax over key positions
            # output projection as a broadcast-multiply-reduce over the
            # d-minor v cache: o[n,d] = Σ_t w[n,t,head(d)]·v[n,t,d]. A pure
            # loop fusion — no head-split of the cache, no dot, so layout
            # assignment keeps v d-minor and the row write stays in place.
            if use_anc:
                # fold the ancestry one-hot into the weights, then reduce
                # over (physical row j, position t); v is broadcast over the
                # query beam q (beam× reads, but no transposes/copies). The
                # d→(h, dh) split of v is a minor-dim bitcast; only the tiny
                # output is reshaped.
                wsel = (
                    w[:, :, None, :, :]
                    * a_sel.transpose(0, 1, 3, 2)[..., None]
                ).astype(cfg.compute_dtype)  # (bg, q, j, T, h)
                v_g = kv_v[l].reshape(
                    bg_a, beam_groups, max_len, n_head, d_head
                )
                o = (wsel[..., None] * v_g[:, None]).sum(axis=(2, 3))
                o = o.reshape(n, 1, d)
            else:
                w_b = w.astype(cfg.compute_dtype)  # (N, T, H)
                v_g = kv_v[l].reshape(n, max_len, n_head, d_head)
                o = (w_b[..., None] * v_g).sum(axis=1).reshape(n, 1, d)
        attn = linear(o, p_attn["out"])
        h = h + attn
        if cfg.adapter:
            h = adapter_fwd(layer_params["adapter_attn"], h)
            h = layer_norm(h, layer_params["adapter_attn_ln"])

        # --- cross-attention with precomputed K/V ---
        p_cross = layer_params["cross_attn"]
        y = layer_norm(h, layer_params["cross_attn_ln"])
        qc_lin = linear(y, p_cross["query"])  # (N, 1, d)
        # pre-split, pre-scaled (B, h, T, dh) buffers straight from
        # precompute_cross_kv — nothing per-step to slice or transpose
        kc = cross_kv["k"][l]
        vc = cross_kv["v"][l]
        quant_kw = (
            dict(
                k_scale=cross_kv["k_scale"][l],
                v_scale=cross_kv["v_scale"][l],
            )
            if "k_scale" in cross_kv
            else {}
        )
        if beam_groups > 1 and use_kernel and "k_packed" in cross_kv and (
            decode_attn.shared_kernel_fits(
                cross_kv["k_packed"][l].shape[1], d,
                cross_kv["k_packed"][l].dtype.itemsize,
            )
        ):
            # beam rows share their utterance's cross-KV: the shared-cache
            # kernel reads each (Tp, d) block ONCE for all beam queries —
            # the per-step cross-KV stream is the HBM floor of beam decode
            # (docs/PERF.md round-3), and int8 storage halves it again
            t_audio = kc.shape[2]
            oc = decode_attn.decode_shared_cache_attention(
                qc_lin[:, 0] * (scale * scale),
                cross_kv["k_packed"][l], cross_kv["v_packed"][l],
                jnp.int32(t_audio - 1), n_head, beam_groups, **quant_kw,
            )
            cross = linear(oc[:, None, :], p_cross["out"])
        elif beam_groups > 1:
            bg = n // beam_groups
            # (bg, beam, h, 1, dh) queries vs shared (bg, h, T, dh) keys
            qcg = qc_lin.reshape(bg, beam_groups, n_head, d_head)
            qcg = qcg.transpose(0, 2, 1, 3) * scale  # (bg, h, beam, dh)
            qkc = jnp.einsum("bhkd,bhtd->bhkt", qcg, kc).astype(jnp.float32)
            wc = jax.nn.softmax(qkc, axis=-1).astype(vc.dtype)
            oc = jnp.einsum("bhkt,bhtd->bhkd", wc, vc)  # (bg, h, beam, dh)
            oc = oc.transpose(0, 2, 1, 3).reshape(n, 1, d)
            cross = linear(oc, p_cross["out"])
        elif use_kernel and "k_packed" in cross_kv:
            # ungrouped rows (greedy / rescoring): the per-row q-length-1
            # einsums below lower to VPU multiply-reduce fusions (measured
            # 57 ms/step at 8x15 s — 44% of greedy device time); the fused
            # kernel runs the same masked cache attention on the MXU over
            # the packed (B, Tp, d) layout. pos masks the Tp - T_enc pad.
            t_audio = kc.shape[2]
            oc = decode_attn.decode_cache_attention(
                qc_lin[:, 0] * (scale * scale),
                cross_kv["k_packed"][l], cross_kv["v_packed"][l],
                jnp.int32(t_audio - 1), n_head, **quant_kw,
            )
            cross = linear(oc[:, None, :], p_cross["out"])
        else:
            qc = _split_heads(qc_lin, n_head) * scale
            qkc = jnp.einsum("bhqd,bhkd->bhqk", qc, kc).astype(jnp.float32)
            wc = jax.nn.softmax(qkc, axis=-1).astype(vc.dtype)
            cross = linear(
                _merge_heads(jnp.einsum("bhqk,bhkd->bhqd", wc, vc)),
                p_cross["out"],
            )
        h = h + cross

        h = h + mlp_fwd(layer_params["mlp"], layer_norm(h, layer_params["mlp_ln"]))
        if cfg.adapter:
            h = adapter_fwd(layer_params["adapter_mlp"], h)
            h = layer_norm(h, layer_params["adapter_mlp_ln"])
        trunk_outs.append(h)

    x = h
    new_kv = {"k": tuple(kv_k), "v": tuple(kv_v)}
    if anc is not None:
        new_kv["anc"] = anc
    if cfg.pe_attention:
        new_kv["k_cs"] = tuple(kv_kcs)

    if cfg.side_network is not None:
        # ladder side network replaces the trunk output head
        # (whisper_decoder.py:208-236), with its own KV caches
        x, side_new = _side_decode_step(
            params, cfg, x_embed, trunk_outs, pos, self_kv, cross_kv, key_mask
        )
        new_kv.update(side_new)
    else:
        x = layer_norm(x, dec["ln"])
    if "logits_w_q" in dec:
        # W8A16 logits head: the 80 MB bf16 embedding stream halves
        # (ops/int8_serve.py; padded vocab columns sliced off before any
        # argmax can see them)
        from agacs_tpu.ops import int8_serve

        logits = int8_serve.w8a16_matmul(
            x[:, 0, :], dec["logits_w_q"], dec["logits_w_s"],
            int8_serve.interpret_requested(),
        ).astype(jnp.float32)[..., : cfg.n_vocab]
    else:
        logits = jnp.dot(
            x[:, 0, :], dec["token_emb"].T.astype(x.dtype)
        ).astype(jnp.float32)
        if dec["token_emb"].shape[0] > cfg.n_vocab:
            # tp-padded vocab rows (parallel/mesh.py pad_vocab_rows)
            logits = logits[..., : cfg.n_vocab]
    return logits, new_kv


def _side_decode_step(params, cfg, x_embed, trunk_outs, pos, self_kv, cross_kv, key_mask):
    """One cached step through the decoder side ladder. trunk_outs:
    (L, B, 1, d) per-layer trunk outputs from this step's scan."""
    side = cfg.side_network
    sp = params["decoder_side"]
    n_head = side.n_head
    scale = (side.n_dim // side.n_head) ** -0.25

    h_side = linear(x_embed, sp["downsample_input"])
    # per-layer tuple buffers with write-first row updates, like the
    # trunk loop (docs/PERF.md round-3); the fused Pallas kernel reads
    # each ladder cache in its stored (B, Tp, n_dim) layout on TPU
    use_kernel = decode_attn.use_decode_kernel()
    side_k, side_v = list(self_kv["side_k"]), list(self_kv["side_v"])
    for i, layer_idx in enumerate(side.layers):
        bp = jax.tree.map(lambda a: a[i], sp["blocks"])
        down = linear(trunk_outs[layer_idx], jax.tree.map(lambda a: a[i], sp["downsample_layers"]))
        g = jax.nn.sigmoid(sp["gates"][i]).astype(down.dtype)
        h = (1.0 - g) * down + g * h_side

        # self-attention with cache
        y = layer_norm(h, bp["attn_ln"])
        side_k[i] = jax.lax.dynamic_update_slice(
            side_k[i], linear(y, bp["attn"]["key"]), (0, pos, 0)
        )
        side_v[i] = jax.lax.dynamic_update_slice(
            side_v[i], linear(y, bp["attn"]["value"]), (0, pos, 0)
        )
        q_lin = linear(y, bp["attn"]["query"])
        if use_kernel:
            att = decode_attn.decode_cache_attention(
                q_lin[:, 0] * (scale * scale), side_k[i], side_v[i], pos,
                n_head,
            )[:, None, :]
        else:
            qh = _split_heads(q_lin, n_head) * scale
            kh = _split_heads(side_k[i], n_head) * scale
            vh = _split_heads(side_v[i], n_head)
            qk = jnp.einsum("bhqd,bhkd->bhqk", qh, kh).astype(jnp.float32)
            qk = jnp.where(key_mask, qk, -jnp.inf)
            w = jax.nn.softmax(qk, -1).astype(vh.dtype)
            att = _merge_heads(jnp.einsum("bhqk,bhkd->bhqd", w, vh))
        h = h + linear(att, bp["attn"]["out"])

        # cross-attention over the downsampled memory (precomputed K/V)
        y = layer_norm(h, bp["cross_attn_ln"])
        qc_lin = linear(y, bp["cross_attn"]["query"])
        if use_kernel and "side_k_packed" in cross_kv:
            # q-length-1 einsums lower to VPU multiply-reduce fusions;
            # the fused kernel keeps the read on the MXU (same fix as
            # the trunk cross-attention — docs/PERF.md round-3)
            t_audio = cross_kv["side_k"][i].shape[2]
            oc = decode_attn.decode_cache_attention(
                qc_lin[:, 0] * (scale * scale),
                cross_kv["side_k_packed"][i], cross_kv["side_v_packed"][i],
                jnp.int32(t_audio - 1), n_head,
            )[:, None, :]
        else:
            qc = _split_heads(qc_lin, n_head) * scale
            kc = cross_kv["side_k"][i]  # pre-split, pre-scaled (B, h, T, dh)
            vc = cross_kv["side_v"][i]
            qkc = jnp.einsum("bhqd,bhkd->bhqk", qc, kc).astype(jnp.float32)
            wc = jax.nn.softmax(qkc, -1).astype(vc.dtype)
            oc = _merge_heads(jnp.einsum("bhqk,bhkd->bhqd", wc, vc))
        h = h + linear(oc, bp["cross_attn"]["out"])

        h = h + mlp_fwd(bp["mlp"], layer_norm(h, bp["mlp_ln"]))
        h_side = h

    out = layer_norm(linear(h_side, sp["upsample_output"]), sp["ln"])
    return out, {"side_k": tuple(side_k), "side_v": tuple(side_v)}
