"""Hybrid CTC/attention conformer ASR model — the baseline recipe track
(`conf/tuning/train_asr_conformer.yaml`): DefaultFrontend -> SpecAug ->
Conformer encoder -> {CTC head, Transformer decoder} with
loss = ctc_w·ctc + (1-ctc_w)·att (espnet_model.py:684).

Token space: the conformer recipe uses its own char/BPE token list, but
this build reuses the Whisper token ids end-to-end so data pipelines and
scoring interop; sos/eos default to the Whisper specials.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from agacs_tpu.models.conformer import (
    ConformerConfig,
    TransformerDecoderConfig,
    conformer_encode,
    init_conformer_params,
    init_transformer_decoder_params,
    transformer_decode,
)
from agacs_tpu.ops.frontend_default import DefaultFrontendConfig, default_frontend
from agacs_tpu.ops.specaug import SpecAugConfig, specaug
from agacs_tpu.train.losses import (
    IGNORE_ID,
    add_sos_eos,
    ctc_loss,
    ctc_loss_streaming,
    label_smoothing_loss,
    th_accuracy,
)


@dataclasses.dataclass(frozen=True)
class ConformerASRConfig:
    encoder: ConformerConfig = ConformerConfig()
    decoder: TransformerDecoderConfig = TransformerDecoderConfig()
    frontend: DefaultFrontendConfig = DefaultFrontendConfig()
    # path to collect_stats feats_stats.npz when frontend.normalize ==
    # "global_mvn" (layers/global_mvn.py stats file role); loaded into
    # params["mvn"] by init_conformer_asr_params
    mvn_stats_path: str | None = None
    ctc_weight: float = 0.3
    # intermediate CTC (espnet_model.py:597-640 + conformer interctc_layer_idx):
    # loss_ctc = (1-w)·ctc_final + w·mean(ctc_layer for layer in taps)
    interctc_weight: float = 0.0
    interctc_layers: tuple[int, ...] = ()
    lsm_weight: float = 0.1
    length_normalized_loss: bool = False
    use_specaug: bool = True
    specaug: SpecAugConfig = SpecAugConfig()
    sos: int = 50258
    eos: int = 50257
    ignore_id: int = IGNORE_ID

    def __post_init__(self):
        v = self.decoder.vocab_size
        if not (0 <= self.sos < v and 0 <= self.eos < v):
            # out-of-range specials index past the embedding table and
            # surface only as a silent nan loss — fail loudly instead
            raise ValueError(
                f"sos/eos ({self.sos}/{self.eos}) must lie inside the "
                f"decoder vocab (size {v}); set sos=/eos= for non-whisper "
                "token lists"
            )


def init_conformer_asr_params(rng: jax.Array, cfg: ConformerASRConfig) -> dict:
    k1, k2, k3 = jax.random.split(rng, 3)
    d = cfg.encoder.output_size
    params = {
        "encoder": init_conformer_params(k1, cfg.encoder),
        "decoder": init_transformer_decoder_params(k2, cfg.decoder),
        "ctc": {
            "w": jax.random.normal(k3, (d, cfg.decoder.vocab_size), jnp.float32)
            / jnp.sqrt(d),
            "b": jnp.zeros((cfg.decoder.vocab_size,), jnp.float32),
        },
    }
    if cfg.frontend.normalize == "global_mvn":
        import numpy as np

        if cfg.mvn_stats_path:
            stats = np.load(cfg.mvn_stats_path)
            mean, std = stats["mean"], stats["std"]
        else:  # identity stats until collect_stats output is provided
            mean = np.zeros((cfg.frontend.n_mels,), np.float32)
            std = np.ones((cfg.frontend.n_mels,), np.float32)
        params["mvn"] = {
            "mean": jnp.asarray(mean, jnp.float32),
            "std": jnp.asarray(std, jnp.float32),
        }
    return params


def _featurize(params, cfg, speech, speech_lengths):
    """Frontend + optional global MVN (shared by encode and the BN
    calibration probe)."""
    import dataclasses as _dc

    fe_cfg = cfg.frontend
    if fe_cfg.normalize == "global_mvn":
        # MVN applied here with corpus stats; frontend skips its own
        fe_cfg = _dc.replace(fe_cfg, normalize=None)
    feats, flens = default_frontend(speech, speech_lengths, fe_cfg)
    if cfg.frontend.normalize == "global_mvn":
        from agacs_tpu.ops.frontend_default import global_mvn

        feats = global_mvn(
            feats, flens, params["mvn"]["mean"], params["mvn"]["std"]
        )
    return feats, flens


def encode(params, cfg: ConformerASRConfig, speech, speech_lengths,
           train=False, rng=None):
    feats, flens = _featurize(params, cfg, speech, speech_lengths)
    drop_rng = None
    if train and rng is not None:
        rng, drop_rng = jax.random.split(rng)
        if cfg.use_specaug:
            feats = specaug(rng, feats, cfg.specaug)
    return conformer_encode(
        params["encoder"], cfg.encoder, feats, flens, rng=drop_rng
    )


def bn_calibration_stats(params, cfg: ConformerASRConfig, speech,
                         speech_lengths):
    """Per-block conv-BatchNorm batch stats ((L, d) mean, (L, d) var) for
    one raw-speech batch — no specaug, no dropout. The trainer averages
    these over a few batches after each epoch and writes them into the
    running buffers (conformer.apply_bn_stats)."""
    from agacs_tpu.models.conformer import collect_bn_batch_stats

    feats, flens = _featurize(params, cfg, speech, speech_lengths)
    return collect_bn_batch_stats(params["encoder"], cfg.encoder, feats, flens)


def forward(params, cfg: ConformerASRConfig, batch, train=True, rng=None,
            return_preds=False):
    use_inter = cfg.interctc_weight > 0.0 and cfg.interctc_layers
    if use_inter:
        feats_rng = rng
        import dataclasses as _dc

        fe_cfg = cfg.frontend
        if fe_cfg.normalize == "global_mvn":
            fe_cfg = _dc.replace(fe_cfg, normalize=None)
        feats, flens = default_frontend(
            batch["speech"], batch["speech_lengths"], fe_cfg
        )
        if cfg.frontend.normalize == "global_mvn":
            from agacs_tpu.ops.frontend_default import global_mvn

            feats = global_mvn(feats, flens, params["mvn"]["mean"], params["mvn"]["std"])
        drop_rng = None
        if train and feats_rng is not None:
            feats_rng, drop_rng = jax.random.split(feats_rng)
            if cfg.use_specaug:
                feats = specaug(feats_rng, feats, cfg.specaug)
        enc_out, enc_lens, inter = conformer_encode(
            params["encoder"], cfg.encoder, feats, flens, rng=drop_rng,
            interctc_layers=tuple(cfg.interctc_layers),
        )
    else:
        enc_out, enc_lens = encode(
            params, cfg, batch["speech"], batch["speech_lengths"], train, rng
        )
        inter = []
    text = batch["text"]
    ys_in, ys_out = add_sos_eos(text, cfg.sos, cfg.eos, cfg.ignore_id)
    ys_in_lens = jnp.sum(text != cfg.ignore_id, axis=-1) + 1

    logits = transformer_decode(
        params["decoder"], cfg.decoder, ys_in, enc_out, enc_lens, ys_in_lens
    )
    loss_att = label_smoothing_loss(
        logits, ys_out, cfg.lsm_weight, cfg.ignore_id, cfg.length_normalized_loss
    )
    acc = th_accuracy(logits, ys_out, cfg.ignore_id)
    stats = {"loss_att": loss_att, "acc": acc}

    if cfg.ctc_weight > 0.0:
        text_lens = jnp.sum(text != cfg.ignore_id, axis=-1)
        labels_safe = jnp.where(text == cfg.ignore_id, 0, text)

        from agacs_tpu.ops import vocab_lse

        if vocab_lse.use_streaming():
            # streaming head: (B, T, V) logits never reach HBM
            # (ops/vocab_lse.py; −21 ms/step at the bench shape,
            # docs/PERF.md round-5). Value-parity tested vs the dense
            # path in tests/test_vocab_lse.py.
            def head_loss(h):
                return ctc_loss_streaming(
                    h, params["ctc"]["w"], params["ctc"]["b"],
                    enc_lens, text, text_lens,
                )
        else:
            def head_loss(h):
                logits = (
                    jnp.dot(h, params["ctc"]["w"].astype(h.dtype))
                    + params["ctc"]["b"].astype(h.dtype)
                ).astype(jnp.float32)
                return ctc_loss(logits, enc_lens, labels_safe, text_lens)

        loss_ctc = head_loss(enc_out)
        stats["loss_ctc"] = loss_ctc
        if inter:
            # shared CTC head over intermediate taps (espnet_model.py:597-640)
            inter_losses = [head_loss(h) for _, h in inter]
            loss_inter = sum(inter_losses) / len(inter_losses)
            for (li, _), l_i in zip(inter, inter_losses):
                stats[f"loss_interctc_layer{li}"] = l_i
            loss_ctc = (
                1.0 - cfg.interctc_weight
            ) * loss_ctc + cfg.interctc_weight * loss_inter
        loss = cfg.ctc_weight * loss_ctc + (1.0 - cfg.ctc_weight) * loss_att
    else:
        loss = loss_att

    stats["loss"] = loss
    if return_preds:
        return loss, stats, (jnp.argmax(logits, axis=-1), ys_out)
    return loss, stats
