"""Whisper-compatible log-mel spectrogram frontend, TPU-native.

Replicates the numerics of the reference frontend
(`espnet/espnet2/asr/encoder/whisper_encoder.py:105-135`, which wraps
`torch.stft` + the Whisper mel filterbank from `whisper/audio.py:12-23`):

  * hann(400) periodic window, hop 160, n_fft 400, center=True, reflect pad
  * last STFT frame dropped, power spectrum, 80-bin slaney mel filterbank
  * log10 clamped at 1e-10, floored at per-utterance max - 8, then (x+4)/4
  * output frame count = n_samples // hop

Instead of an FFT, the STFT is computed as two dense matmuls against
precomputed DFT cos/sin bases — frames (B*F, 400) @ basis (400, 201).
On TPU this maps straight onto the MXU and XLA fuses the window multiply,
square, and mel projection around it; n_fft=400 is far too small for an
FFT to win. Everything is static-shape and jit-friendly.

Output layout is (B, frames, n_mels) — channel-last, the TPU-native layout
for the downstream conv stack (the torch reference uses (B, n_mels, frames)).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
N_MELS = 80
CHUNK_LENGTH = 30
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE  # 480000
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000


@dataclasses.dataclass(frozen=True)
class WhisperAudioConfig:
    sample_rate: int = SAMPLE_RATE
    n_fft: int = N_FFT
    hop_length: int = HOP_LENGTH
    n_mels: int = N_MELS


def hann_window(n: int) -> np.ndarray:
    """Periodic Hann window, matching torch.hann_window(n)."""
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa htk=False), linear below 1 kHz."""
    f = np.asarray(f, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = f >= min_log_hz
    mels = np.where(log_region, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = m >= min_log_mel
    freqs = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    sample_rate: int = SAMPLE_RATE,
    n_fft: int = N_FFT,
    n_mels: int = N_MELS,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> np.ndarray:
    """Slaney-normalized mel filterbank (n_mels, n_fft//2+1), float32.

    Matches librosa.filters.mel(sr, n_fft, n_mels=n_mels, htk=False) and
    hence both the `mel_filters.npz` asset the reference Whisper ships
    (`whisper/audio.py`) and the DefaultFrontend LogMel
    (`espnet2/layers/log_mel.py:49`).
    """
    fmax = sample_rate / 2.0 if fmax is None else fmax
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_bins)
    mel_min = _hz_to_mel_slaney(np.array(fmin))
    mel_max = _hz_to_mel_slaney(np.array(fmax))
    mel_pts = np.linspace(mel_min, mel_max, n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # slaney normalization: each filter integrates to ~1 over Hz
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def log_mel_spectrogram(
    audio: jax.Array,
    ilens: jax.Array | None = None,
    config: WhisperAudioConfig = WhisperAudioConfig(),
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> tuple[jax.Array, jax.Array | None]:
    """Whisper log-mel features.

    Args:
      audio: (B, T) float waveform at 16 kHz (padded batch).
      ilens: (B,) valid sample counts, or None.
      config: frontend hyperparameters.
      precision: matmul precision for the DFT/mel contractions (HIGHEST keeps
        fp32 parity with the torch reference; relax for speed if tolerable).

    Returns:
      (feats, olens): feats (B, T//hop, n_mels) float32; olens (B,) = ilens//hop
      (None if ilens is None). The per-utterance "max - 8" floor is computed
      over the padded feature map, exactly like the reference.
    """
    if audio.ndim == 1:
        audio = audio[None, :]
    n_fft, hop = config.n_fft, config.hop_length
    # torch.stft(center=True) yields 1 + T//hop frames; whisper drops the last.
    n_frames = audio.shape[1] // hop

    from agacs_tpu.ops.stft import stft_power

    power = stft_power(
        audio, n_fft, hop, n_frames=n_frames, precision=precision
    )  # (B, F, n_bins)

    mel_t = jnp.asarray(mel_filterbank(config.sample_rate, n_fft, config.n_mels).T)
    mel_spec = jnp.dot(power, mel_t, precision=precision)  # (B, F, n_mels)

    log_spec = jnp.log10(jnp.maximum(mel_spec, 1e-10))
    per_utt_max = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, per_utt_max - 8.0)
    log_spec = (log_spec + 4.0) / 4.0

    olens = None if ilens is None else ilens // hop
    return log_spec, olens
