"""Hybrid CTC/attention ASR model with attention-guided CS adaptation.

The functional equivalent of the reference `ESPnetASRModel`
(`espnet2/asr/espnet_model.py:40,534-710`) for the Whisper path:

  speech -> log-mel (+SpecAug in training) -> encoder
         -> teacher-forced decoder (+language score columns)
         -> label-smoothed CE (+ CTC branch) (+ CS loss)
  loss = ctc_w·ctc + (1-ctc_w)·att            (espnet_model.py:679-684)
  if cs_weight: loss = cs_weight·cs + loss_att (espnet_model.py:694 — note
  the reference OVERWRITES the ctc mix in that case; replicated.)

Everything here is jit/pjit-safe; the only host-side preprocessing is the
per-token language labels (batch["cs_labels"]) produced by the data
pipeline via `adapt.attention_target_labels`.

Batch layout:
  speech:          (B, S) float32 waveform, zero-padded
  speech_lengths:  (B,) int32 valid samples
  text:            (B, T) int32 converter ids (prompt+text+eot), -1 padded
  text_lengths:    (B,) int32
  cs_labels:       (B, T+1) int8 labels aligned with ys_in (sos-prefixed);
                   optional unless cs_weight != 0
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from agacs_tpu.adapt.cs_loss import (
    REFERENCE_50PCT_HEAD_MASK,
    cs_attention_loss,
    cs_lid_ce_loss,
)
from agacs_tpu.models.whisper import (
    WhisperConfig,
    encoder_olens,
    whisper_decode,
    whisper_encode,
)
from agacs_tpu.ops.logmel import WhisperAudioConfig, log_mel_spectrogram
from agacs_tpu.ops.specaug import SpecAugConfig, specaug
from agacs_tpu.train.losses import (
    IGNORE_ID,
    add_sos_eos,
    ctc_loss,
    label_smoothing_loss,
    th_accuracy,
)


@dataclasses.dataclass(frozen=True)
class ASRModelConfig:
    whisper: WhisperConfig
    ctc_weight: float = 0.0
    interctc_weight: float = 0.0
    cs_weight: float = 0.0
    # "attention" = the shipped column-MSE loss (espnet_model.py:463-530);
    # "lid_ce" = the alternative label-smoothed CE over full attention rows
    # (espnet_model.py:364-461, dead code in the reference). lid_ce needs
    # full (T, T) maps and lid-mode cs_labels
    # (attention_target_labels(mode="lid_ce")).
    cs_loss_type: str = "attention"
    c_val_attention: float = 0.6
    head_percentage: float = 100.0
    lsm_weight: float = 0.1
    length_normalized_loss: bool = False
    src_layer: int = 1  # 1-based, like the YAML configs
    sos: int = 50258
    eos: int = 50257
    ignore_id: int = IGNORE_ID
    use_specaug: bool = True
    # learnable target attention value (decoder estimate_c,
    # whisper_decoder.py:85-86 / freeze preset abs_task.py:1175-1177)
    estimate_c: bool = False
    specaug: SpecAugConfig = SpecAugConfig()
    audio: WhisperAudioConfig = WhisperAudioConfig()
    # (L, h) 0/1 head mask for the CS loss; tuple-of-tuples for hashability.
    # Defaults to the reference's shipped 50% mask (espnet_model.py:514-527);
    # first-class path: adapt.head_selection.select_heads output.
    head_mask: tuple | None = None

    def __post_init__(self):
        if (
            self.cs_weight != 0.0
            and self.cs_loss_type == "lid_ce"
            and self.whisper.part("decoder").pe_attention
        ):
            # lid_ce reads PRE-softmax logits from aux["maps"], but the
            # pe_attention decoder emits the post-softmax mixed
            # probability map there (models/whisper.py qkv_attention
            # 'w if pe else qk') — log_softmax over probabilities would
            # be silently wrong, so reject the combination up front.
            raise ValueError(
                "cs_loss_type 'lid_ce' is incompatible with a pe_attention "
                "decoder: the PE map collection is post-softmax; use "
                "cs_loss_type 'attention' (p_cols) with PE decoders"
            )
        if self.interctc_weight != 0.0:
            # interCTC taps exist on the conformer encoder
            # (models/conformer_asr.py); the whisper encoder has none.
            # The reference handles interCTC generically
            # (espnet_model.py:597-640) — until that lands here, reject
            # instead of silently ignoring the weight.
            raise ValueError(
                "interctc_weight != 0 is not supported on the whisper path; "
                "use the conformer model family (ConformerASRConfig)"
            )

    def head_mask_array(self) -> np.ndarray:
        if self.head_mask is not None:
            return np.asarray(self.head_mask, np.float32)
        n_l, n_h = self.whisper.n_text_layer, self.whisper.n_text_head
        if (n_l, n_h) == (12, 12):
            return REFERENCE_50PCT_HEAD_MASK
        return np.ones((n_l, n_h), np.float32)


def init_asr_params(rng: jax.Array, cfg: ASRModelConfig) -> dict:
    """Whisper params + (optional) CTC projection head over encoder output
    (reference `espnet2/asr/ctc.py:6`: Linear(enc_dim, vocab))."""
    from agacs_tpu.models.whisper import init_whisper_params

    k1, k2 = jax.random.split(rng)
    params = init_whisper_params(k1, cfg.whisper)
    if cfg.estimate_c:
        params["estimated_c_val"] = jnp.asarray([cfg.c_val_attention], jnp.float32)
    if cfg.ctc_weight != 0.0 or cfg.interctc_weight != 0.0:
        d = cfg.whisper.n_audio_state
        params["ctc"] = {
            "w": jax.random.normal(k2, (d, cfg.whisper.n_vocab), jnp.float32)
            / np.sqrt(d),
            "b": jnp.zeros((cfg.whisper.n_vocab,), jnp.float32),
        }
    return params


def encode(
    params: Any,
    cfg: ASRModelConfig,
    speech: jax.Array,
    speech_lengths: jax.Array,
    train: bool = False,
    rng: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Frontend + SpecAug + encoder (espnet_model.py:723-788 whisper path).

    Returns (encoder_out (B, T_enc, d), encoder_out_lens (B,))."""
    feats, feat_lens = log_mel_spectrogram(speech, speech_lengths, cfg.audio)
    if train and cfg.use_specaug and rng is not None:
        feats = specaug(rng, feats, cfg.specaug)
    enc = whisper_encode(params, cfg.whisper, feats)
    return enc, encoder_olens(feat_lens, cfg.whisper)


def forward(
    params: Any,
    cfg: ASRModelConfig,
    batch: dict,
    train: bool = True,
    rng: jax.Array | None = None,
    return_preds: bool = False,
) -> tuple[jax.Array, dict]:
    """Full training forward. Returns (loss, stats dict of scalars);
    with return_preds also (argmax ids, ys_out) for the eval-epoch
    ErrorCalculator (espnet_model.py:955-959)."""
    speech = batch["speech"]
    text = batch["text"]

    enc_out, enc_lens = encode(
        params, cfg, speech, batch["speech_lengths"], train=train, rng=rng
    )

    ys_in, ys_out = add_sos_eos(text, cfg.sos, cfg.eos, cfg.ignore_id)

    collect = cfg.cs_weight != 0.0
    lid_ce = collect and cfg.cs_loss_type == "lid_ce"
    logits, aux = whisper_decode(
        params,
        cfg.whisper,
        ys_in,
        enc_out,
        src_layer=cfg.src_layer - 1,
        collect_lang_cols=collect and not lid_ce,
        collect_full_maps=lid_ce,
    )

    loss_att = label_smoothing_loss(
        logits, ys_out, cfg.lsm_weight, cfg.ignore_id, cfg.length_normalized_loss
    )
    acc = th_accuracy(logits, ys_out, cfg.ignore_id)
    stats = {"loss_att": loss_att, "acc": acc}

    if cfg.ctc_weight != 0.0:
        from agacs_tpu.ops import vocab_lse

        text_lens = jnp.sum(text != cfg.ignore_id, axis=-1)
        if vocab_lse.use_streaming():
            from agacs_tpu.train.losses import ctc_loss_streaming

            loss_ctc = ctc_loss_streaming(
                enc_out, params["ctc"]["w"], params["ctc"]["b"],
                enc_lens, text, text_lens,
            )
        else:
            ctc_logits = jnp.dot(
                enc_out, params["ctc"]["w"].astype(enc_out.dtype)
            ) + params["ctc"]["b"].astype(enc_out.dtype)
            loss_ctc = ctc_loss(
                ctc_logits.astype(jnp.float32), enc_lens,
                jnp.where(text == cfg.ignore_id, 0, text), text_lens,
            )
        stats["loss_ctc"] = loss_ctc
        loss = cfg.ctc_weight * loss_ctc + (1.0 - cfg.ctc_weight) * loss_att
    else:
        loss = loss_att

    if cfg.cs_weight != 0.0:
        # qk_cols only carries layers >= src_layer-1 (whisper_decoder.py:
        # 89-170 collects maps from src_layer on); slice the (L, h) mask to
        # match so custom src_layer configs broadcast correctly.
        head_mask = jnp.asarray(cfg.head_mask_array())[cfg.src_layer - 1 :]
        c_val = (
            params["estimated_c_val"][0] if cfg.estimate_c else cfg.c_val_attention
        )
        if lid_ce:
            ys_in_lens = jnp.sum(text != cfg.ignore_id, axis=-1) + 1
            loss_cs = cs_lid_ce_loss(
                aux["maps"], batch["cs_labels"], ys_in_lens, head_mask,
                lsm_weight=cfg.lsm_weight,
            )
        else:
            loss_cs = cs_attention_loss(
                aux["qk_cols"]
                if not cfg.whisper.part("decoder").pe_attention
                else aux["p_cols"],
                batch["cs_labels"],
                head_mask,
                c_val,
                layer_offset=cfg.src_layer - 1,
            )
        # reference overwrites the ctc mix here (espnet_model.py:694)
        loss = cfg.cs_weight * loss_cs + loss_att
        stats["loss_cs"] = loss_cs

    stats["loss"] = loss
    if return_preds:
        return loss, stats, (jnp.argmax(logits, axis=-1), ys_out)
    return loss, stats


def nll(
    params: Any,
    cfg: ASRModelConfig,
    encoder_out: jax.Array,
    ys_pad: jax.Array,
) -> jax.Array:
    """Per-utterance negative log-likelihood of the attention decoder
    (espnet_model.py:809-845): teacher-forced forward, unsmoothed CE per
    token, ignore positions zeroed, summed per utterance. Returns (B,)."""
    ys_in, ys_out = add_sos_eos(ys_pad, cfg.sos, cfg.eos, cfg.ignore_id)
    logits, _ = whisper_decode(params, cfg.whisper, ys_in, encoder_out)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ignore = ys_out == cfg.ignore_id
    tgt = jnp.where(ignore, 0, ys_out)
    tok_nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.sum(jnp.where(ignore, 0.0, tok_nll), axis=-1)


def batchify_nll(
    params: Any,
    cfg: ASRModelConfig,
    encoder_out: jax.Array,
    ys_pad: jax.Array,
    batch_size: int = 100,
) -> jax.Array:
    """nll over micro-batches to bound memory (espnet_model.py:847-892)."""
    total = encoder_out.shape[0]
    if total <= batch_size:
        return nll(params, cfg, encoder_out, ys_pad)
    out = []
    for start in range(0, total, batch_size):
        end = min(start + batch_size, total)
        out.append(nll(params, cfg, encoder_out[start:end], ys_pad[start:end]))
    return jnp.concatenate(out)
