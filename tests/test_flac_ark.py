"""FLAC codec + extended-kaldi-ark IO, validated on the reference's own
shipped clip (`code_util/nc41m-46nc41mbp_0101-047421-047682.flac`), plus
the real-clip golden decode: audio -> log-mel -> encoder -> greedy tokens
matching the reference torch model token-for-token (BASELINE config 1).
"""

import hashlib
import os

import numpy as np
import pytest

import jax.numpy as jnp

from agacs_tpu.data import flac as F
from agacs_tpu.data import kaldi_ark as K
from agacs_tpu.data.io import read_wav, wav_num_samples

REF_CLIP = "/root/reference/code_util/nc41m-46nc41mbp_0101-047421-047682.flac"


@pytest.fixture(scope="module")
def ref_clip_bytes():
    with open(REF_CLIP, "rb") as f:
        return f.read()


def test_reference_clip_native_decode_md5(ref_clip_bytes):
    info = F.flac_info(ref_clip_bytes)
    assert info["sample_rate"] == 16000
    assert info["channels"] == 1
    assert info["bps"] == 16
    # decode_flac raises on MD5 mismatch — passing IS the golden check
    pcm, sr = F.decode_flac(ref_clip_bytes)
    assert sr == 16000 and pcm.shape == (info["total_samples"], 1)
    assert hashlib.md5(pcm.astype("<i2").tobytes()).digest() == info["md5"]


def test_reference_clip_python_fallback_bitexact(ref_clip_bytes):
    info = F.flac_info(ref_clip_bytes)
    native, _ = F.decode_flac(ref_clip_bytes)
    py = F._decode_py(ref_clip_bytes, info)
    np.testing.assert_array_equal(native, py)


@pytest.mark.parametrize("channels", [1, 2])
def test_encode_decode_roundtrip(channels):
    rng = np.random.RandomState(7)
    t = np.arange(9000) / 16000.0
    x = 0.3 * np.sin(2 * np.pi * 313 * t) + 0.02 * rng.randn(len(t))
    if channels == 2:
        x = np.stack([x, -0.5 * x], axis=1)
    pcm16 = F.float_to_pcm16(x)
    blob = F.encode_flac(pcm16, 16000)
    assert len(blob) < pcm16.nbytes  # actually compresses
    dec, sr = F.decode_flac(blob)  # verifies embedded MD5
    np.testing.assert_array_equal(dec, pcm16.reshape(-1, channels))
    # cross-check with the pure-python decoder
    np.testing.assert_array_equal(F._decode_py(blob, F.flac_info(blob)), dec)


def test_ark_write_read_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    utts = {f"u{i}": F.float_to_pcm16(0.1 * rng.randn(4000 + 777 * i))
            for i in range(3)}
    with K.ArkWriter(str(tmp_path), name="wav", fmt="flac") as w:
        scp = {u: w.write(u, pcm, 16000) for u, pcm in utts.items()}
    for u, pcm in utts.items():
        audio, sr = K.read_ark_audio(scp[u])
        assert sr == 16000
        np.testing.assert_allclose(audio, pcm.astype(np.float32) / 32768.0,
                                   atol=1.0 / 32768.0)
        assert K.ark_num_samples(scp[u]) == len(pcm)
        # io-level dispatch used by the dataset
        audio2, _ = read_wav(scp[u])
        np.testing.assert_array_equal(audio, audio2)
        assert wav_num_samples(scp[u]) == len(pcm)
    # sequential scan finds every entry at the right offset
    ark = os.path.join(str(tmp_path), "data_wav.ark")
    entries = dict(K.iter_ark(ark))
    assert entries == scp


def test_ark_wav_format(tmp_path):
    pcm = F.float_to_pcm16(0.2 * np.sin(np.arange(5000) / 30.0))
    with K.ArkWriter(str(tmp_path), name="wav", fmt="wav") as w:
        value = w.write("utt", pcm, 16000)
    audio, sr = K.read_ark_audio(value)
    assert sr == 16000
    np.testing.assert_allclose(audio * 32768.0, pcm, atol=1.5)
    assert K.ark_num_samples(value) == len(pcm)


def test_flac_file_io(tmp_path):
    x = 0.1 * np.sin(np.arange(7000) / 20.0).astype(np.float32)
    p = str(tmp_path / "a.flac")
    F.write_flac(p, x, 16000)
    y, sr = read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(y, x, atol=2.0 / 32768.0)
    assert wav_num_samples(p) == 7000


def test_format_data_cli(tmp_path):
    """Synthetic data dir -> flac.ark dump -> dataset-level read."""
    from agacs_tpu.bin.format_data import main as format_main
    from agacs_tpu.data.io import write_scp, write_wav

    data_dir = tmp_path / "data"
    rng = np.random.RandomState(1)
    wavs = {}
    for i in range(3):
        x = (0.1 * rng.randn(3200 + 800 * i)).astype(np.float32)
        p = str(data_dir / f"u{i}.wav")
        write_wav(p, x, 16000)
        wavs[f"u{i}"] = (p, x)
    write_scp(str(data_dir / "wav.scp"), {u: p for u, (p, _) in wavs.items()})
    write_scp(str(data_dir / "text"), {u: "hello" for u in wavs})
    write_scp(str(data_dir / "utt2spk"), {u: "spk" for u in wavs})

    out = tmp_path / "dump"
    format_main(["--data_dir", str(data_dir), "--outdir", str(out),
                 "--audio_format", "flac.ark"])
    from agacs_tpu.data.io import read_scp

    scp = read_scp(str(out / "wav.scp"))
    nums = read_scp(str(out / "utt2num_samples"))
    assert set(scp) == set(wavs)
    for u, (_, x) in wavs.items():
        audio, sr = read_wav(scp[u])
        assert sr == 16000 and int(nums[u]) == len(x)
        np.testing.assert_allclose(audio, x, atol=2.5 / 32768.0)
    assert (out / "text").exists() and (out / "utt2spk").exists()


def test_real_clip_greedy_parity_vs_torch_oracle(ref_clip_bytes):
    """BASELINE config 1 (as far as this env allows): the reference's own
    FLAC clip through OUR decoder + log-mel + whisper encoder + KV-cached
    greedy decode, vs the reference torch model (seeded tiny weights,
    reference torch.stft mel) — token-for-token equality."""
    import torch

    from agacs_tpu.decode.greedy import greedy_decode
    from agacs_tpu.models.checkpoint import params_from_state_dict
    from agacs_tpu.models.whisper import WhisperConfig, whisper_encode
    from agacs_tpu.ops.logmel import log_mel_spectrogram, mel_filterbank
    from reference_oracle import make_torch_model, torch_decoder_forward

    pcm, sr = F.decode_flac(ref_clip_bytes)
    audio = F.pcm_to_float(pcm, 16)[: 40 * 160]  # 40 mel frames -> 20 ctx
    assert sr == 16000

    # --- torch side: reference mel recipe (whisper_encoder.py:105-135)
    at = torch.from_numpy(audio[None])
    stft = torch.stft(at, 400, 160, window=torch.hann_window(400),
                      return_complex=True)
    mag = stft[..., :-1].abs() ** 2
    filters = torch.from_numpy(mel_filterbank(16000, 400, 80))
    mel = torch.clamp(filters @ mag, min=1e-10).log10()
    mel = torch.maximum(mel, mel.max() - 8.0)
    mel_t = ((mel + 4.0) / 4.0)

    model = make_torch_model(seed=3)
    cfg = WhisperConfig(
        n_mels=80, n_audio_ctx=20, n_audio_state=64, n_audio_head=4,
        n_audio_layer=2, n_vocab=100, n_text_ctx=16, n_text_state=64,
        n_text_head=4, n_text_layer=2,
    )
    params = params_from_state_dict(model.state_dict(), cfg)

    primer, eot, max_steps = (3, 5), 0, 9
    with torch.no_grad():
        enc_t = model.encoder(mel_t.float())
    toks = list(primer)
    for _ in range(max_steps):
        logits, _ = torch_decoder_forward(
            model, torch.tensor([toks]), enc_t)
        nxt = int(logits[0, -1].argmax())
        toks.append(nxt)
        if nxt == eot:
            break
    ref_tokens = toks

    # --- jax side: our full pipeline from the same raw samples
    feats, _ = log_mel_spectrogram(
        jnp.asarray(audio[None]), jnp.asarray([len(audio)]))
    np.testing.assert_allclose(
        np.asarray(feats)[0].T, mel_t[0].numpy(), atol=2e-4, rtol=2e-4)
    enc_j = whisper_encode(params, cfg, feats)
    np.testing.assert_allclose(
        np.asarray(enc_j), enc_t.numpy(), atol=2e-3, rtol=2e-3)
    tokens, lengths = greedy_decode(
        params, cfg, enc_j, primer=primer, max_steps=max_steps, eot=eot)
    got = np.asarray(tokens)[0, : int(lengths[0])].tolist()
    if got and got[-1] != eot and ref_tokens[-1] != eot:
        pass  # both hit the step cap
    assert got == ref_tokens, (got, ref_tokens)


@pytest.mark.parametrize("n", [0, 1, 7, 4095, 4096, 4097, 8192])
def test_encode_decode_boundary_lengths(n):
    """Block-boundary lengths (4096-block frames) round-trip exactly."""
    rng = np.random.RandomState(n or 1)
    pcm = (rng.randn(n) * 3000).astype(np.int16)
    blob = F.encode_flac(pcm, 16000)
    dec, sr = F.decode_flac(blob)
    assert sr == 16000
    np.testing.assert_array_equal(dec.reshape(-1), pcm)


def test_decode_rejects_corruption():
    pcm = (np.random.RandomState(0).randn(5000) * 3000).astype(np.int16)
    blob = bytearray(F.encode_flac(pcm, 16000))
    with pytest.raises(F.FlacError):
        F.decode_flac(b"RIFFnotflac")
    # flip PCM-affecting bits in a frame body: MD5 self-check catches it
    blob[len(blob) // 2] ^= 0xFF
    with pytest.raises(F.FlacError):
        F.decode_flac(bytes(blob))


def test_decode_truncated_raises():
    pcm = (np.random.RandomState(1).randn(9000) * 3000).astype(np.int16)
    blob = F.encode_flac(pcm, 16000)
    with pytest.raises(F.FlacError, match="truncated|malformed"):
        F.decode_flac(blob[: len(blob) // 2])
