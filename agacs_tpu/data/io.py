"""Kaldi-style data-dir IO: wav.scp / text / utt2spk readers, WAV audio.

Keeps the reference's FILE FORMATS (wav.scp, text, token_list, .trn —
SURVEY §7 design stance) so data dirs interop, without any Kaldi binaries
(`tools/Makefile` clones Kaldi in the reference; here pure Python).

Audio backends: PCM/float WAV via the stdlib (scipy-compatible), .npy
float arrays, FLAC via the native codec (`native/flac.cpp`),
extended-kaldi-ark entries ('path:offset' — the reference's dump format,
`asr.sh:529`, `espnet2/train/dataset.py:189`) via `data/kaldi_ark.py`,
and NIST SPHERE via `data/sph.py` (the sph2pipe role, `tools/Makefile`).
"""

from __future__ import annotations

import io
import os
import struct
import wave

import numpy as np


def read_scp(path: str) -> dict[str, str]:
    """'<utt_id> <value...>' lines -> ordered dict (wav.scp, text, ...)."""
    out: dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            parts = line.split(maxsplit=1)
            out[parts[0]] = parts[1] if len(parts) > 1 else ""
    return out


def write_scp(path: str, entries: dict[str, str]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        for k, v in entries.items():
            f.write(f"{k} {v}\n")


def _is_ark_entry(path: str) -> bool:
    p, _, off = path.rpartition(":")
    return bool(p) and off.isdigit()


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """Returns (float32 mono waveform in [-1, 1], sample_rate).

    Dispatches on the wav.scp value: .npy / .flac / 'ark:offset' / WAV.
    """
    if path.endswith(".npy"):
        arr = np.load(path)
        return arr.astype(np.float32), 16000
    if _is_ark_entry(path):
        from agacs_tpu.data.kaldi_ark import read_ark_audio

        return read_ark_audio(path)
    if path.endswith(".flac"):
        from agacs_tpu.data.flac import read_flac

        return read_flac(path)
    if path.endswith(".sph"):
        from agacs_tpu.data.sph import read_sph

        return read_sph(path)
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        ch = w.getnchannels()
        raw = w.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width} in {path}")
    if ch > 1:
        data = data.reshape(-1, ch).mean(axis=1)
    return data, sr


def write_wav(path: str, data: np.ndarray, sr: int = 16000) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pcm = np.clip(np.asarray(data, np.float32), -1.0, 1.0)
    pcm16 = (pcm * 32767.0).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm16.tobytes())


def wav_num_samples(path: str) -> int:
    """Fast duration probe without decoding (shape collection — replaces
    the reference's collect-stats stage for speech shapes, asr.sh:1030)."""
    if path.endswith(".npy"):
        with open(path, "rb") as f:
            version = np.lib.format.read_magic(f)
            shape, _, _ = np.lib.format._read_array_header(f, version)
        return int(np.prod(shape))
    if _is_ark_entry(path):
        from agacs_tpu.data.kaldi_ark import ark_num_samples

        return ark_num_samples(path)
    if path.endswith(".flac"):
        from agacs_tpu.data.flac import flac_info

        with open(path, "rb") as f:
            return flac_info(f.read(65536))["total_samples"]
    if path.endswith(".sph"):
        from agacs_tpu.data.sph import sph_num_samples

        return sph_num_samples(path)
    with wave.open(path, "rb") as w:
        return w.getnframes()
