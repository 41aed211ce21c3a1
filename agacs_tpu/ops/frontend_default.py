"""DefaultFrontend for the conformer track: STFT -> power -> log-mel
(+ MVN normalization).

Reference: `espnet2/asr/frontend/default.py:17` =
`layers/stft.py` (torch.stft, hann 512, hop 128, center, onesided)
-> power -> `layers/log_mel.py` (librosa slaney mel, natural log with
+1e-20 floor, pad positions zeroed) and
`layers/utterance_mvn.py` / `layers/global_mvn.py`.

Same matmul-DFT construction as the Whisper frontend (ops/logmel.py) —
MXU-friendly, static shapes. Note the frame count here KEEPS torch.stft's
last frame (1 + T//hop); only the whisper path drops it.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp

from agacs_tpu.ops.logmel import hann_window, mel_filterbank


@dataclasses.dataclass(frozen=True)
class DefaultFrontendConfig:
    fs: int = 16000
    n_fft: int = 512
    hop_length: int = 128
    win_length: int | None = None  # None -> n_fft
    n_mels: int = 80
    fmin: float = 0.0
    fmax: float | None = None
    normalize: str | None = "utterance_mvn"  # ASRTask default (tasks/asr.py)


def default_frontend(
    audio: jax.Array,
    ilens: jax.Array,
    config: DefaultFrontendConfig = DefaultFrontendConfig(),
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> tuple[jax.Array, jax.Array]:
    """(B, T) waveform -> (feats (B, F, n_mels) float32, olens (B,)).

    olens = ilens // hop + 1 (torch.stft center=True frame count,
    layers/stft.py). Pad frames are zeroed like make_pad_mask fill.
    """
    if audio.ndim == 1:
        audio = audio[None, :]
    n_fft, hop = config.n_fft, config.hop_length
    win = config.win_length or n_fft
    n_frames = audio.shape[1] // hop + 1

    from agacs_tpu.ops.stft import stft_power

    power = stft_power(
        audio, n_fft, hop, win_length=win, n_frames=n_frames, precision=precision
    )

    mel_t = jnp.asarray(
        mel_filterbank(config.fs, n_fft, config.n_mels, config.fmin, config.fmax).T
    )
    mel = jnp.dot(power, mel_t, precision=precision)
    feats = jnp.log(mel + 1e-20)

    olens = ilens // hop + 1
    mask = (jnp.arange(n_frames)[None, :] < olens[:, None])[..., None]
    feats = jnp.where(mask, feats, 0.0)

    if config.normalize == "utterance_mvn":
        feats = utterance_mvn(feats, olens)
    return feats, olens


def utterance_mvn(
    feats: jax.Array, olens: jax.Array, norm_vars: bool = False, eps: float = 1.0e-20
) -> jax.Array:
    """Per-utterance mean (and optional var) normalization over valid
    frames (`layers/utterance_mvn.py:88`, defaults norm_means=True,
    norm_vars=False)."""
    mask = (jnp.arange(feats.shape[1])[None, :] < olens[:, None])[..., None]
    n = jnp.maximum(olens[:, None, None].astype(jnp.float32), 1.0)
    mean = jnp.sum(jnp.where(mask, feats, 0.0), axis=1, keepdims=True) / n
    out = jnp.where(mask, feats - mean, 0.0)
    if norm_vars:
        var = jnp.sum(jnp.where(mask, (feats - mean) ** 2, 0.0), axis=1, keepdims=True) / n
        out = out * jax.lax.rsqrt(jnp.maximum(var, eps))
    return out


def global_mvn(
    feats: jax.Array, olens: jax.Array, mean: jax.Array, std: jax.Array
) -> jax.Array:
    """GlobalMVN with precomputed corpus stats (`layers/global_mvn.py`)."""
    mask = (jnp.arange(feats.shape[1])[None, :] < olens[:, None])[..., None]
    return jnp.where(mask, (feats - mean) / jnp.maximum(std, 1e-20), 0.0)
