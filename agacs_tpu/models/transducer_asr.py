"""Transducer ASR model family: DefaultFrontend -> SpecAug -> Conformer
encoder -> {RNNT decoder + joint network} (+ optional auxiliary CTC).

Functional equivalent of the reference's transducer branch
(`espnet2/asr/espnet_model.py:117-130,642-668,980-1027`):
  loss = loss_transducer + ctc_weight * loss_ctc        (:655-657)
with get_transducer_task_io (:`espnet2/asr_transducer/utils.py:127-190`):
  decoder_in = blank-prefixed labels, target = labels,
  t_len = encoder lens, u_len = label lens.
The warprnnt criterion is replaced by the lattice-scan rnnt_loss
(train/rnnt_loss.py) and decoding by models/transducer.py search.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from agacs_tpu.models.conformer import ConformerConfig
from agacs_tpu.models.conformer_asr import ConformerASRConfig
from agacs_tpu.models.conformer_asr import encode as _conformer_encode
from agacs_tpu.models.conformer_asr import init_conformer_asr_params
from agacs_tpu.models.transducer import (
    TransducerConfig,
    init_transducer_params,
    joint_lattice,
    transducer_decoder,
)
from agacs_tpu.ops.frontend_default import DefaultFrontendConfig
from agacs_tpu.ops.specaug import SpecAugConfig
from agacs_tpu.train.losses import IGNORE_ID, ctc_loss
from agacs_tpu.train.rnnt_loss import rnnt_loss


@dataclasses.dataclass(frozen=True)
class TransducerASRConfig:
    encoder: ConformerConfig = ConformerConfig()
    decoder: TransducerConfig = TransducerConfig(vocab_size=51865)
    frontend: DefaultFrontendConfig = DefaultFrontendConfig()
    mvn_stats_path: str | None = None
    # auxiliary CTC mixed as loss_transducer + ctc_weight*loss_ctc
    # (espnet_model.py:655-657; NOT the attention-branch interpolation)
    ctc_weight: float = 0.0
    fastemit_lambda: float = 0.0
    use_specaug: bool = True
    specaug: SpecAugConfig = SpecAugConfig()
    ignore_id: int = IGNORE_ID

    def _conformer_view(self) -> ConformerASRConfig:
        """Reuse the conformer family's frontend+encoder plumbing."""
        return ConformerASRConfig(
            encoder=self.encoder,
            frontend=self.frontend,
            mvn_stats_path=self.mvn_stats_path,
            ctc_weight=1.0 if self.ctc_weight > 0 else 0.0,
            use_specaug=self.use_specaug,
            specaug=self.specaug,
        )


def init_transducer_asr_params(rng: jax.Array, cfg: TransducerASRConfig) -> dict:
    k1, k2 = jax.random.split(rng)
    base = init_conformer_asr_params(k1, cfg._conformer_view())
    params = {"encoder": base["encoder"]}
    if "mvn" in base:
        params["mvn"] = base["mvn"]
    if cfg.ctc_weight > 0.0:
        params["ctc"] = base["ctc"]
    params["transducer"] = init_transducer_params(
        k2, cfg.decoder, encoder_size=cfg.encoder.output_size
    )
    return params


def encode(params, cfg: TransducerASRConfig, speech, speech_lengths,
           train=False, rng=None):
    return _conformer_encode(
        params, cfg._conformer_view(), speech, speech_lengths, train, rng
    )


def forward(params, cfg: TransducerASRConfig, batch, train=True, rng=None,
            return_preds=False):
    enc_rng = dec_rng = None
    if rng is not None:
        enc_rng, dec_rng = jax.random.split(rng)
    enc_out, enc_lens = encode(
        params, cfg, batch["speech"], batch["speech_lengths"], train, enc_rng
    )

    text = batch["text"]
    blank = cfg.decoder.blank_id
    u_lens = jnp.sum(text != cfg.ignore_id, axis=-1)
    targets = jnp.where(text == cfg.ignore_id, blank, text).astype(jnp.int32)
    # decoder_in: blank-prefixed labels (get_transducer_task_io)
    decoder_in = jnp.concatenate(
        [jnp.full((text.shape[0], 1), blank, jnp.int32), targets], axis=1
    )

    dec_out = transducer_decoder(
        params["transducer"], cfg.decoder, decoder_in, train=train, rng=dec_rng
    )
    logits = joint_lattice(
        params["transducer"], cfg.decoder,
        enc_out.astype(jnp.float32), dec_out.astype(jnp.float32),
    )
    loss_trans = rnnt_loss(
        logits, targets, enc_lens, u_lens,
        blank=blank, fastemit_lambda=cfg.fastemit_lambda,
    )
    stats = {"loss_transducer": loss_trans}

    if cfg.ctc_weight > 0.0:
        ctc_logits = (
            jnp.dot(enc_out, params["ctc"]["w"].astype(enc_out.dtype))
            + params["ctc"]["b"].astype(enc_out.dtype)
        ).astype(jnp.float32)
        loss_ctc = ctc_loss(ctc_logits, enc_lens, targets, u_lens)
        stats["loss_ctc"] = loss_ctc
        loss = loss_trans + cfg.ctc_weight * loss_ctc
    else:
        loss = loss_trans

    stats["loss"] = loss
    if return_preds:
        # teacher-forced next-symbol argmax along the lattice diagonal is
        # not meaningful for transducers; expose greedy ids via search
        return loss, stats, None
    return loss, stats
