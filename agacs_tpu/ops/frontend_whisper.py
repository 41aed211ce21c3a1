"""Whisper-encoder-as-frontend — `espnet2/asr/frontend/whisper.py:11-132`
(WhisperFrontend): use a (typically frozen) Whisper encoder's output as the
feature sequence for another downstream model.
"""

from __future__ import annotations

import jax

from agacs_tpu.models.whisper import WhisperConfig, encoder_olens, whisper_encode
from agacs_tpu.ops.logmel import log_mel_spectrogram


def whisper_frontend(
    params,
    cfg: WhisperConfig,
    speech: jax.Array,
    speech_lengths: jax.Array,
    freeze: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """(B, S) waveform -> (B, T_enc, d_audio) features, olens.

    freeze=True (the reference's freeze_weights default) stops gradients
    into the whisper encoder."""
    feats, flens = log_mel_spectrogram(speech, speech_lengths)
    out = whisper_encode(params, cfg, feats)
    if freeze:
        out = jax.lax.stop_gradient(out)
    return out, encoder_olens(flens, cfg)
