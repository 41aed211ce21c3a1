"""RIR/noise augmentation (data/augment.py) vs the reference semantics.

The reference preprocessor module can't be imported wholesale here (its
import chain needs soundfile), so the pure-numpy pieces (`framing`,
`detect_non_silence`, `preprocessor.py:31-125`) are AST-extracted and
exec'd as a genuine oracle; the RIR/noise mixing is checked by physics
(SNR of the mix, power preservation) and by the documented shape/wrap
semantics (`preprocessor.py:221-281`).
"""

import ast
import os
import wave

import numpy as np
import pytest

from agacs_tpu.data.augment import (
    SpeechAugment,
    augment_from_dict,
    detect_non_silence,
)

REF = "/root/reference/espnet/espnet2/train/preprocessor.py"


def _write_wav(path, x, sr=16000):
    x16 = np.clip(np.asarray(x) * 32767.0, -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x16.tobytes())


@pytest.fixture()
def tone():
    rng = np.random.RandomState(0)
    t = np.arange(16000) / 16000.0
    x = 0.3 * np.sin(2 * np.pi * 440 * t)
    x[:4000] = 0.0  # leading silence
    x += 1e-4 * rng.randn(16000)
    return x.astype(np.float64)


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
def test_detect_non_silence_matches_reference(tone):
    import scipy.signal

    tree = ast.parse(open(REF).read())
    wanted = {"framing", "detect_non_silence"}
    mod = ast.Module(
        body=[
            n for n in tree.body
            if isinstance(n, ast.FunctionDef) and n.name in wanted
        ],
        type_ignores=[],
    )
    ns = {"np": np, "scipy": scipy}
    exec(compile(mod, REF, "exec"), ns)
    for sig in (tone, tone[None, :], np.zeros(5000), np.ones(100)):
        ref = ns["detect_non_silence"](sig)
        got = detect_non_silence(sig)
        np.testing.assert_array_equal(got, ref)


def test_noise_snr(tmp_path, tone):
    rng = np.random.RandomState(1)
    noise = (0.05 * rng.randn(16000)).astype(np.float64)
    npath = str(tmp_path / "noise.wav")
    _write_wav(npath, noise)
    scp = tmp_path / "noise.scp"
    scp.write_text(f"n1 {npath}\n")
    aug = SpeechAugment(noise_scp=str(scp), noise_db_range="10", seed=3)
    out = aug(tone.astype(np.float32))
    assert out.shape == tone.shape
    added = out.astype(np.float64) - tone
    # SNR of the mix: speech power over NON-SILENT samples vs noise power
    p_speech = (tone[detect_non_silence(tone[None, :])[0]] ** 2).mean()
    snr_db = 10 * np.log10(p_speech / (added**2).mean())
    # 16-bit quantization of the noise file perturbs the scale slightly
    assert abs(snr_db - 10.0) < 0.5, snr_db


def test_noise_wrap_short_and_crop_long(tmp_path, tone):
    rng = np.random.RandomState(2)
    for frames in (3000, 50000):  # shorter and longer than 16000
        npath = str(tmp_path / f"n{frames}.wav")
        _write_wav(npath, 0.05 * rng.randn(frames))
        scp = tmp_path / f"n{frames}.scp"
        scp.write_text(f"{npath}\n")  # single-column scp form
        aug = SpeechAugment(
            noise_scp=str(scp), noise_db_range="5_15", seed=4
        )
        out = aug(tone.astype(np.float32))
        assert out.shape == tone.shape
        assert not np.allclose(out, tone.astype(np.float32))


def test_rir_delta_preserves_signal(tmp_path, tone):
    # delta impulse response: convolution is identity, power renorm ~1
    delta = np.zeros(800)
    delta[0] = 1.0
    rpath = str(tmp_path / "rir.wav")
    _write_wav(rpath, delta)
    scp = tmp_path / "rir.scp"
    scp.write_text(f"r1 {rpath}\n")
    aug = SpeechAugment(rir_scp=str(scp), seed=5)
    out = aug(tone.astype(np.float32))
    np.testing.assert_allclose(out, tone, atol=2e-3)


def test_rir_echo_keeps_power(tmp_path, tone):
    rir = np.zeros(1600)
    rir[0], rir[799] = 1.0, 0.6  # direct path + one echo
    rpath = str(tmp_path / "rir.wav")
    _write_wav(rpath, rir / 1.6)
    scp = tmp_path / "rir.scp"
    scp.write_text(f"r1 {rpath}\n")
    aug = SpeechAugment(rir_scp=str(scp), seed=6)
    out = aug(tone.astype(np.float32)).astype(np.float64)
    p_in = (tone[detect_non_silence(tone[None, :])[0]] ** 2).mean()
    p_out = (out[detect_non_silence(out[None, :])[0]] ** 2).mean()
    np.testing.assert_allclose(p_out, p_in, rtol=1e-3)
    assert out.shape == tone.shape


def test_volume_normalize(tone):
    aug = SpeechAugment(volume_normalize=0.5)
    out = aug(tone.astype(np.float32))
    np.testing.assert_allclose(np.max(np.abs(out)), 0.5, rtol=1e-5)


def test_apply_prob_zero_is_identity(tmp_path, tone):
    npath = str(tmp_path / "noise.wav")
    _write_wav(npath, 0.05 * np.random.RandomState(0).randn(16000))
    scp = tmp_path / "noise.scp"
    scp.write_text(f"n1 {npath}\n")
    aug = SpeechAugment(
        noise_scp=str(scp), noise_apply_prob=0.0, seed=7
    )
    out = aug(tone.astype(np.float32))
    np.testing.assert_allclose(out, tone.astype(np.float32), atol=1e-7)


def test_augment_from_dict():
    assert augment_from_dict({}) is None
    assert augment_from_dict({"rir_scp": None, "noise_scp": None}) is None
    a = augment_from_dict({"speech_volume_normalize": 0.9})
    assert a is not None and a.volume_normalize == 0.9
    with pytest.raises(ValueError):
        SpeechAugment(noise_db_range="1_2_3")
