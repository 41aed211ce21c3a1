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

from agacs_tpu.models.conformer import ConformerConfig, TransformerDecoderConfig
from agacs_tpu.models.conformer_asr import ConformerASRConfig
from agacs_tpu.models.conformer_asr import encode as _conformer_encode
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
    # T-chunked joint/loss: bound peak memory to (B, chunk, U+1, V) by
    # computing the joint + log-softmax + blank/emit gathers per encoder-
    # frame chunk under a rematerialized scan instead of materializing the
    # full (B, T, U+1, V) lattice (26 GB f32 at B=8 x 15 s x the whisper
    # vocab — more HBM than a v5e chip). None = single full joint (fine
    # for small vocab/short T); the loss value/grads are identical
    # (tests/test_transducer.py chunked-parity).
    joint_chunk_t: int | None = None

    def _conformer_view(self) -> ConformerASRConfig:
        """Reuse the conformer family's frontend+encoder plumbing. The
        decoder config only matters for the CTC head width, which must be
        the TRANSDUCER vocab (the default TransformerDecoderConfig vocab
        would size the aux head wrong for BPE vocabs)."""
        return ConformerASRConfig(
            encoder=self.encoder,
            decoder=TransformerDecoderConfig(
                vocab_size=self.decoder.vocab_size,
                # minimal: this decoder is never instantiated/used
                num_blocks=1, linear_units=1, d_model=self.encoder.output_size,
            ),
            frontend=self.frontend,
            mvn_stats_path=self.mvn_stats_path,
            ctc_weight=1.0 if self.ctc_weight > 0 else 0.0,
            use_specaug=self.use_specaug,
            specaug=self.specaug,
            # the transducer family never uses attention-decoder specials;
            # keep them inside the vocab so the config validator passes
            sos=self.decoder.blank_id, eos=self.decoder.blank_id,
        )


def init_transducer_asr_params(rng: jax.Array, cfg: TransducerASRConfig) -> dict:
    """Encoder (+MVN) + transducer decoder/joint (+aux CTC head). The
    conformer family's attention decoder is NOT initialized."""
    import numpy as np

    from agacs_tpu.models.conformer import init_conformer_params

    k1, k2, k3 = jax.random.split(rng, 3)
    params = {"encoder": init_conformer_params(k1, cfg.encoder)}
    if cfg.frontend.normalize == "global_mvn":
        # corpus stats from collect_stats, identity until provided
        # (conformer_asr.init_conformer_asr_params mvn block)
        if cfg.mvn_stats_path:
            stats = np.load(cfg.mvn_stats_path)
            mean, std = stats["mean"], stats["std"]
        else:
            mean = np.zeros((cfg.frontend.n_mels,), np.float32)
            std = np.ones((cfg.frontend.n_mels,), np.float32)
        params["mvn"] = {
            "mean": jnp.asarray(mean, jnp.float32),
            "std": jnp.asarray(std, jnp.float32),
        }
    if cfg.ctc_weight > 0.0:
        d, v = cfg.encoder.output_size, cfg.decoder.vocab_size
        params["ctc"] = {
            "w": jax.random.normal(k3, (d, v), jnp.float32) / jnp.sqrt(d),
            "b": jnp.zeros((v,), jnp.float32),
        }
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
    loss, stats = losses_from_encoder(
        params, cfg, batch, enc_out, enc_lens, train=train, rng=dec_rng
    )
    if return_preds:
        # teacher-forced next-symbol argmax along the lattice diagonal is
        # not meaningful for transducers; expose greedy ids via search
        return loss, stats, None
    return loss, stats


def losses_from_encoder(params, cfg: TransducerASRConfig, batch, enc_out,
                        enc_lens, train=True, rng=None):
    """RNNT (+aux CTC) losses given precomputed encoder output."""
    dec_rng = rng
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
    from agacs_tpu.ops import vocab_lse

    if vocab_lse.use_streaming() and cfg.decoder.vocab_size >= 1024:
        from agacs_tpu.train.rnnt_loss import rnnt_loss_from_blank_emit

        blank_lp, emit = _blank_emit_streaming(
            params["transducer"], cfg.decoder, enc_out, dec_out,
            targets, blank,
        )
        loss_trans = rnnt_loss_from_blank_emit(
            blank_lp, emit, enc_lens, u_lens,
            fastemit_lambda=cfg.fastemit_lambda,
        )
    elif cfg.joint_chunk_t:
        from agacs_tpu.train.rnnt_loss import rnnt_loss_from_blank_emit

        blank_lp, emit = _blank_emit_chunked(
            params["transducer"], cfg.decoder,
            enc_out.astype(jnp.float32), dec_out.astype(jnp.float32),
            targets, blank, cfg.joint_chunk_t,
        )
        loss_trans = rnnt_loss_from_blank_emit(
            blank_lp, emit, enc_lens, u_lens,
            fastemit_lambda=cfg.fastemit_lambda,
        )
    else:
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
        from agacs_tpu.ops import vocab_lse

        if vocab_lse.use_streaming():
            from agacs_tpu.train.losses import ctc_loss_streaming

            loss_ctc = ctc_loss_streaming(
                enc_out, params["ctc"]["w"], params["ctc"]["b"],
                enc_lens, targets, u_lens,
            )
        else:
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
    return loss, stats


def eval_step_with_greedy(params, cfg: TransducerASRConfig, batch,
                          max_symbols: int):
    """One fused eval pass: encoder runs ONCE, feeding both the RNNT/CTC
    losses and the batched greedy search for CER/WER (the
    ErrorCalculatorTransducer role, espnet_model.py:131-147). Returns
    (stats, (tokens, n_emitted))."""
    from agacs_tpu.models.transducer import greedy_search_scan

    enc_out, enc_lens = encode(
        params, cfg, batch["speech"], batch["speech_lengths"], train=False
    )
    _, stats = losses_from_encoder(
        params, cfg, batch, enc_out, enc_lens, train=False, rng=None
    )
    tokens, n = greedy_search_scan(
        params["transducer"], cfg.decoder, enc_out, enc_lens,
        max_symbols=max_symbols,
    )
    return stats, (tokens, n)


def _blank_emit_streaming(tparams, dcfg, enc_out, dec_out, targets, blank):
    """blank_lp (B, T, U+1) and emit (B, T, U) log-probs with the
    (B, T, U+1, V) joint LOGITS never reaching HBM.

    The joint-space activations h = act(lin_enc(enc)+lin_dec(dec)) ARE
    materialized — (B, T, U+1, j) bf16 is ~80 MB at the bench shape, vs
    26 GB for the f32 logits lattice — and the V-dimension reduction
    runs through the streaming lse kernel (ops/vocab_lse.py). The
    blank/target logits are exact matmuls against the gathered output
    columns; log-probs follow as z − lse. Same decomposition the chunked
    path feeds rnnt_loss_from_blank_emit with, minus the lattice
    materialization AND minus the reference path's f32 joint cast (the
    h matmuls run bf16 like the rest of training; parity in
    tests/test_vocab_lse.py).
    """
    from agacs_tpu.models.transducer import _act
    from agacs_tpu.ops import vocab_lse

    jp = tparams["joint"]
    b, t, _ = enc_out.shape
    u1 = dec_out.shape[1]
    u_max = targets.shape[1]
    cd = jnp.bfloat16
    encp = (
        enc_out.astype(cd) @ jp["lin_enc"]["w"].astype(cd)
        + jp["lin_enc"]["b"].astype(cd)
    )  # (B, T, j)
    decp = dec_out.astype(cd) @ jp["lin_dec"]["w"].astype(cd)  # (B, U+1, j)
    h = _act(dcfg.joint_activation)(
        encp[:, :, None, :] + decp[:, None, :, :]
    )  # (B, T, U+1, j) bf16
    jdim = h.shape[-1]
    w_out = jp["lin_out"]["w"].astype(cd)  # (j, V)
    b_out = jp["lin_out"]["b"].astype(jnp.float32)
    lse = vocab_lse.streaming_lse(
        h.reshape(b * t * u1, jdim), w_out, b_out,
        vocab_lse.interpret_requested(),
    ).reshape(b, t, u1)

    z_blank = (
        jnp.einsum("btuj,j->btu", h, w_out[:, blank],
                   preferred_element_type=jnp.float32)
        + b_out[blank]
    )
    w_tgt = jnp.take(w_out.T, targets, axis=0)  # (B, U, j)
    z_emit = (
        jnp.einsum("btuj,buj->btu", h[:, :, :u_max], w_tgt,
                   preferred_element_type=jnp.float32)
        + b_out[targets][:, None, :]
    )
    return z_blank - lse, z_emit - lse[:, :, :u_max]


def _blank_emit_chunked(tparams, dcfg, enc_out, dec_out, targets, blank,
                        chunk):
    """blank_lp (B, T, U+1) and emit (B, T, U) log-probs via a
    rematerialized scan over T-chunks of the joint network.

    Peak memory is one (B, chunk, U+1, V) chunk instead of the full
    lattice; jax.checkpoint makes the backward pass recompute each
    chunk's joint instead of keeping its log-softmax residuals."""
    b, t, _ = enc_out.shape
    u_max = targets.shape[1]
    pad = (-t) % chunk
    enc_p = jnp.pad(enc_out, ((0, 0), (0, pad), (0, 0)))
    n = (t + pad) // chunk
    # (n, B, chunk, D): scan iterates chunks
    enc_c = jnp.moveaxis(
        enc_p.reshape(b, n, chunk, enc_p.shape[-1]), 1, 0
    )

    @jax.checkpoint
    def body(carry, e_chunk):
        logits = joint_lattice(tparams, dcfg, e_chunk, dec_out)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        bl = lp[..., blank]  # (B, chunk, U+1)
        em = jnp.take_along_axis(
            lp[:, :, :u_max, :], targets[:, None, :, None], axis=3
        )[..., 0]  # (B, chunk, U)
        return carry, (bl, em)

    _, (bls, ems) = jax.lax.scan(body, None, enc_c)
    blank_lp = jnp.moveaxis(bls, 0, 1).reshape(b, t + pad, u_max + 1)[:, :t]
    emit = jnp.moveaxis(ems, 0, 1).reshape(b, t + pad, u_max)[:, :t]
    return blank_lp, emit
