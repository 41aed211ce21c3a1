"""Log-mel frontend parity tests.

Oracle: a torch implementation written to the reference's recipe
(`espnet2/asr/encoder/whisper_encoder.py:105-135`: torch.stft hann/400/160,
drop last frame, |.|^2, slaney mel, log10 clamp, max-8 floor, (x+4)/4),
plus the shipped `mel_filters.npz` asset for the filterbank itself.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from agacs_tpu.ops.logmel import (
    WhisperAudioConfig,
    hann_window,
    log_mel_spectrogram,
    mel_filterbank,
)

REF_MEL_NPZ = "/root/reference/espnet/whisper/whisper/assets/mel_filters.npz"


def _torch_oracle(audio_np, n_fft=400, hop=160, n_mels=80):
    import torch

    audio = torch.from_numpy(audio_np)
    window = torch.hann_window(n_fft)
    stft = torch.stft(audio, n_fft, hop, window=window, return_complex=True)
    magnitudes = stft[..., :-1].abs() ** 2
    filters = torch.from_numpy(mel_filterbank(16000, n_fft, n_mels))
    mel_spec = filters @ magnitudes
    log_spec = torch.clamp(mel_spec, min=1e-10).log10()
    log_spec = torch.maximum(
        log_spec,
        log_spec.view(audio.shape[0], -1).max(dim=-1)[0][:, None, None] - 8.0,
    )
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec.numpy()  # (B, n_mels, F)


def test_mel_filterbank_matches_reference_asset():
    ours = mel_filterbank(16000, 400, 80)
    ref = np.load(REF_MEL_NPZ)["mel_80"]
    assert ours.shape == ref.shape == (80, 201)
    np.testing.assert_allclose(ours, ref, atol=2e-7)


def test_hann_window_periodic():
    import torch

    np.testing.assert_allclose(
        hann_window(400), torch.hann_window(400).numpy(), atol=1e-6
    )


@pytest.mark.parametrize("t_samples", [16000, 48000 + 37])
def test_logmel_matches_torch_stft(t_samples):
    rng = np.random.RandomState(0)
    audio = (rng.randn(2, t_samples) * 0.1).astype(np.float32)

    ref = _torch_oracle(audio)  # (B, n_mels, F)
    ours, olens = log_mel_spectrogram(
        jnp.asarray(audio), jnp.array([t_samples, t_samples // 2])
    )
    ours = np.asarray(ours).transpose(0, 2, 1)  # (B, n_mels, F)

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-4)
    assert olens.tolist() == [t_samples // 160, (t_samples // 2) // 160]


def test_logmel_jit_and_frame_count():
    audio = jnp.zeros((1, 480000), jnp.float32)
    feats, _ = jax.jit(lambda a: log_mel_spectrogram(a)[0])(audio), None
    assert feats.shape == (1, 3000, 80)


def test_logmel_silence_floor():
    # all-zero audio: mel=0 -> clamped to 1e-10 -> log10 = -10, max -10,
    # floor max-8 -> all equal -> (x+4)/4 = (-10+4)/4 = -1.5
    feats, _ = log_mel_spectrogram(jnp.zeros((1, 16000), jnp.float32))
    np.testing.assert_allclose(np.asarray(feats), -1.5, atol=1e-5)
