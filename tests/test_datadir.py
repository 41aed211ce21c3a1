"""Tests for the Kaldi-utils equivalents (data/datadir.py, bin/data_dir.py)
and the SPHERE reader (data/sph.py — the sph2pipe role)."""

import os
import struct

import numpy as np
import pytest

from agacs_tpu.data import datadir
from agacs_tpu.data.io import read_scp, read_wav, wav_num_samples, write_scp


def _mkdir(tmp_path, name, utts, spk=None, segments=None):
    d = tmp_path / name
    d.mkdir(parents=True, exist_ok=True)
    write_scp(str(d / "wav.scp"), {u: f"/audio/{u}.wav" for u in sorted(utts)})
    write_scp(str(d / "text"), {u: f"hello {u}" for u in sorted(utts)})
    if spk:
        u2s = {u: spk(u) for u in sorted(utts)}
        write_scp(str(d / "utt2spk"), u2s)
        write_scp(str(d / "spk2utt"), datadir.utt2spk_to_spk2utt(u2s))
    if segments:
        write_scp(str(d / "segments"), segments)
    return str(d)


def test_validate_ok_and_fix(tmp_path):
    utts = [f"spk{i % 3}-utt{i:02d}" for i in range(9)]
    d = _mkdir(tmp_path, "ok", utts, spk=lambda u: u.split("-")[0])
    assert datadir.validate_data_dir(d) == []

    # break it: drop an utt from text only, unsort wav.scp
    text = read_scp(os.path.join(d, "text"))
    text.pop(utts[0])
    write_scp(os.path.join(d, "text"), text)
    wav = read_scp(os.path.join(d, "wav.scp"))
    items = list(wav.items())[::-1]
    with open(os.path.join(d, "wav.scp"), "w") as f:
        for k, v in items:
            f.write(f"{k} {v}\n")
    problems = datadir.validate_data_dir(d)
    assert any("not sorted" in p for p in problems)
    assert any("mismatch" in p for p in problems)

    kept = datadir.fix_data_dir(d)
    assert kept == len(utts) - 1
    assert datadir.validate_data_dir(d) == []
    # spk2utt was regenerated consistently
    u2s = read_scp(os.path.join(d, "utt2spk"))
    assert datadir.spk2utt_to_utt2spk(
        read_scp(os.path.join(d, "spk2utt"))
    ) == u2s


def test_validate_segments(tmp_path):
    segs = {
        "utt1": "rec1 0.0 1.5",
        "utt2": "rec1 1.5 3.0",
        "utt3": "recX 0.0 1.0",  # unknown recording
    }
    d = tmp_path / "seg"
    d.mkdir()
    write_scp(str(d / "wav.scp"), {"rec1": "/audio/rec1.wav"})
    write_scp(str(d / "text"), {u: "hi" for u in sorted(segs)})
    write_scp(str(d / "segments"), segs)
    problems = datadir.validate_data_dir(str(d))
    assert any("unknown recording" in p for p in problems)

    kept = datadir.fix_data_dir(str(d))
    # fix drops utterances whose recording is missing (kaldi filters
    # segments against wav.scp before intersecting)
    assert kept == 2
    segs2 = read_scp(str(d / "segments"))
    assert set(segs2) == {"utt1", "utt2"}
    assert datadir.validate_data_dir(str(d)) == []


def test_validate_segments_malformed(tmp_path):
    """Non-numeric / short segments lines are reported as problems, not
    raised as ValueError/IndexError (ADVICE r2)."""
    segs = {
        "utt1": "rec1 0.0 1.5",
        "utt2": "rec1 zero 3.0",   # non-numeric start
        "utt3": "rec1",            # too few fields
    }
    d = tmp_path / "segbad"
    d.mkdir()
    write_scp(str(d / "wav.scp"), {"rec1": "/audio/rec1.wav"})
    write_scp(str(d / "text"), {u: "hi" for u in sorted(segs)})
    write_scp(str(d / "segments"), segs)
    problems = datadir.validate_data_dir(str(d))
    assert sum("malformed" in p for p in problems) == 2
    # fix_data_dir must also not crash on the short line
    datadir.fix_data_dir(str(d))


def test_split_speaker_disjoint(tmp_path):
    utts = [f"s{i % 4}-u{i:02d}" for i in range(20)]
    d = _mkdir(tmp_path, "split", utts, spk=lambda u: u.split("-")[0])
    dirs = datadir.split_data_dir(d, 3)
    assert len(dirs) == 3
    spk_sets = []
    all_utts = []
    for sd in dirs:
        u2s = read_scp(os.path.join(sd, "utt2spk"))
        assert datadir.validate_data_dir(sd) == []
        spk_sets.append(set(u2s.values()))
        all_utts.extend(u2s)
    # partition of the utterances, speakers disjoint across shards
    assert sorted(all_utts) == sorted(utts)
    for i in range(3):
        for j in range(i + 1, 3):
            assert not (spk_sets[i] & spk_sets[j])


def test_split_contiguous_without_spk(tmp_path):
    utts = [f"u{i:02d}" for i in range(7)]
    d = _mkdir(tmp_path, "nospk", utts)
    dirs = datadir.split_data_dir(d, 2)
    sizes = [len(read_scp(os.path.join(sd, "wav.scp"))) for sd in dirs]
    assert sorted(sizes) == [3, 4]
    with pytest.raises(ValueError):
        datadir.split_data_dir(d, 100)


def test_subset_modes(tmp_path):
    utts = [f"u{i:02d}" for i in range(10)]
    d = _mkdir(tmp_path, "sub", utts)
    n = datadir.subset_data_dir(d, str(tmp_path / "first3"), 3, mode="first")
    assert n == 3
    got = list(read_scp(str(tmp_path / "first3" / "wav.scp")))
    assert got == utts[:3]
    datadir.subset_data_dir(d, str(tmp_path / "rand4"), 4, mode="random", seed=7)
    r1 = list(read_scp(str(tmp_path / "rand4" / "wav.scp")))
    datadir.subset_data_dir(d, str(tmp_path / "rand4b"), 4, mode="random", seed=7)
    assert r1 == list(read_scp(str(tmp_path / "rand4b" / "wav.scp")))  # seeded


def test_filter_and_conversions():
    entries = {"a": "1", "b": "2", "c": "3"}
    assert datadir.filter_keys(entries, ["c", "a"]) == {"a": "1", "c": "3"}
    u2s = {"u1": "s1", "u2": "s0", "u3": "s1"}
    s2u = datadir.utt2spk_to_spk2utt(u2s)
    assert s2u == {"s0": "u2", "s1": "u1 u3"}
    assert datadir.spk2utt_to_utt2spk(s2u) == dict(sorted(u2s.items()))


def test_data_dir_cli(tmp_path, capsys):
    from agacs_tpu.bin.data_dir import main

    utts = [f"s{i % 2}-u{i}" for i in range(6)]
    d = _mkdir(tmp_path, "cli", utts, spk=lambda u: u.split("-")[0])
    assert main(["validate", d]) == 0
    text = read_scp(os.path.join(d, "text"))
    text.pop(utts[0])
    write_scp(os.path.join(d, "text"), text)
    assert main(["validate", d]) == 1
    assert main(["fix", d]) == 0
    assert main(["validate", d]) == 0
    assert main(["split", d, "2"]) == 0
    assert main(["subset", d, str(tmp_path / "s2"), "2"]) == 0
    out = str(tmp_path / "s2u")
    assert main(["utt2spk-to-spk2utt", os.path.join(d, "utt2spk"), "-o", out]) == 0
    assert read_scp(out) == datadir.utt2spk_to_spk2utt(
        read_scp(os.path.join(d, "utt2spk"))
    )


# ---------------------------------------------------------------- SPHERE


def _write_sph(path, pcm16, rate=16000, byte_format="01", coding="pcm",
               channels=1, n_bytes=2):
    header_lines = [
        f"sample_count -i {pcm16.size // channels}",
        f"sample_rate -i {rate}",
        f"channel_count -i {channels}",
        f"sample_n_bytes -i {n_bytes}",
        f"sample_byte_format -s{len(byte_format)} {byte_format}",
        f"sample_coding -s{len(coding)} {coding}",
        "end_head",
    ]
    body = "\n".join(header_lines).encode("ascii")
    header = b"NIST_1A\n" + b"   1024\n" + body
    header = header + b" " * (1024 - len(header))
    if coding == "pcm" and n_bytes == 2:
        payload = pcm16.astype(
            np.dtype(np.int16).newbyteorder("<" if byte_format == "01" else ">")
        ).tobytes()
    else:
        payload = pcm16.tobytes()
    with open(path, "wb") as f:
        f.write(header + payload)


def test_sph_pcm_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    pcm = (rng.randn(1600) * 8000).astype(np.int16)
    for bf in ("01", "10"):
        p = str(tmp_path / f"a_{bf}.sph")
        _write_sph(p, pcm, byte_format=bf)
        audio, rate = read_wav(p)
        assert rate == 16000
        np.testing.assert_allclose(audio, pcm.astype(np.float32) / 32768.0)
        assert wav_num_samples(p) == 1600


def test_sph_stereo_downmix(tmp_path):
    left = np.full(100, 1000, np.int16)
    right = np.full(100, 3000, np.int16)
    inter = np.empty(200, np.int16)
    inter[0::2], inter[1::2] = left, right
    p = str(tmp_path / "st.sph")
    _write_sph(p, inter, channels=2)
    audio, _ = read_wav(p)
    np.testing.assert_allclose(audio, np.full(100, 2000.0) / 32768.0)


def test_sph_ulaw(tmp_path):
    from agacs_tpu.data.sph import _ULAW

    codes = np.arange(256, dtype=np.uint8)
    p = str(tmp_path / "u.sph")
    _write_sph(p, codes, coding="ulaw", n_bytes=1, byte_format="1")
    audio, _ = read_wav(p)
    np.testing.assert_allclose(audio, _ULAW[codes].astype(np.float32) / 32768.0)
    # G.711 mu-law spot values: code 0xFF decodes to 0; full swing is
    # +/-32124 (the 16-bit-scaled table, matching sph2pipe's output);
    # the table is antisymmetric between the sign halves
    assert _ULAW[0xFF] == 0
    assert int(_ULAW.max()) == 32124 and int(_ULAW.min()) == -32124
    np.testing.assert_array_equal(_ULAW[:128], -_ULAW[128:])


def test_sph_shorten_rejected(tmp_path):
    pcm = np.zeros(16, np.int16)
    p = str(tmp_path / "sh.sph")
    _write_sph(p, pcm, coding="pcm,embedded-shorten-v2.00")
    with pytest.raises(ValueError, match="shorten"):
        read_wav(p)


def test_alaw_table_reference_values(tmp_path):
    from agacs_tpu.data.sph import _ALAW

    # Sun/CCITT alaw2linear spot values: code 0x55 unmasks to 0x00
    # (sign clear -> negative, seg 0, mant 0) = -8; 0xD5 unmasks to 0x80
    # (sign set -> positive) = +8; full swing +/-32256
    assert _ALAW[0x55] == -8 and _ALAW[0xD5] == 8
    assert int(_ALAW.max()) == 32256 and int(_ALAW.min()) == -32256
    # antisymmetric between sign halves under the 0x55 mask
    codes = np.arange(256, dtype=np.uint8)
    np.testing.assert_array_equal(_ALAW[codes], -_ALAW[codes ^ 0x80])

    p = str(tmp_path / "a.sph")
    _write_sph(p, codes, coding="alaw", n_bytes=1, byte_format="1")
    audio, _ = read_wav(p)
    np.testing.assert_allclose(audio, _ALAW[codes].astype(np.float32) / 32768.0)
