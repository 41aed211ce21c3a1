"""SEAME prep, speed perturb, attention-map dump, stats/vocab CLIs."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from agacs_tpu.data.io import write_scp, write_wav
from agacs_tpu.data.perturb import perturb_data_dir, speed_perturb
from agacs_tpu.data.seame import (
    classify_utterance,
    insert_space_between_mandarin,
    normalize_text,
    prepare_data_dir,
)


@pytest.fixture(scope="module")
def ref_preprocess():
    """Import the reference preprocess.py as an oracle."""
    spec = importlib.util.spec_from_file_location(
        "ref_preprocess",
        "/root/reference/espnet/egs2/seame/asr1/local/preprocess.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


SAMPLES = [
    "Hello, 我们去 SHOPPING 吧!",
    "(ppl) we had ppc 不错 ppo ppl",
    "ｈｅｌｌｏ ＷＯＲＬＤ 你好",
    "text with <unl> and < unk > tags",
    "【重要】 这个~很·好",
    "multi   spaces\tand\x00control",
]


@pytest.mark.parametrize("text", SAMPLES)
def test_normalize_matches_reference(ref_preprocess, text):
    assert normalize_text(text) == ref_preprocess.normalize_text(text)


@pytest.mark.parametrize("text", ["我们abc你好", "x", "", "好"])
def test_insert_space_matches_reference(ref_preprocess, text):
    assert insert_space_between_mandarin(text) == (
        ref_preprocess.insert_space_between_mandarin(text)
    )


def test_classify_utterance():
    assert classify_utterance("我们 go") == "cs"
    assert classify_utterance("hello world") == "en"
    assert classify_utterance("你 好") == "man"


def test_prepare_data_dir(tmp_path):
    records = [
        ("spkA-utt1", "/x/a.wav", "Hello, 我们?"),
        ("spkB-utt2", "/x/b.wav", "(ppl)"),  # normalizes to <noise>
    ]
    prepare_data_dir(records, str(tmp_path))
    from agacs_tpu.data.io import read_scp

    text = read_scp(str(tmp_path / "text"))
    assert text["spkA-utt1"] == "hello 我 们"
    u2s = read_scp(str(tmp_path / "utt2spk"))
    assert u2s["spkA-utt1"] == "spkA"


def test_speed_perturb_lengths():
    x = np.random.RandomState(0).randn(16000).astype(np.float32)
    for f in (0.9, 1.1):
        y = speed_perturb(x, f)
        assert abs(len(y) - 16000 / f) < 20


def test_perturb_data_dir(tmp_path):
    d = tmp_path / "data"
    write_wav(str(d / "u1.wav"), np.zeros(8000, np.float32))
    write_scp(str(d / "wav.scp"), {"u1": str(d / "u1.wav")})
    write_scp(str(d / "text"), {"u1": "hi"})
    out = tmp_path / "sp"
    perturb_data_dir(str(d), str(out))
    from agacs_tpu.data.io import read_scp, read_wav

    wav = read_scp(str(out / "wav.scp"))
    assert set(wav) == {"u1", "sp0.9-u1", "sp1.1-u1"}
    y, _ = read_wav(wav["sp0.9-u1"])
    assert abs(len(y) - 8000 / 0.9) < 20


def test_full_attention_maps():
    from agacs_tpu.models.whisper import WhisperConfig, init_whisper_params, whisper_decode

    cfg = WhisperConfig(
        n_mels=80, n_audio_ctx=16, n_audio_state=64, n_audio_head=4,
        n_audio_layer=2, n_vocab=1000, n_text_ctx=16, n_text_state=64,
        n_text_head=4, n_text_layer=2,
    )
    params = init_whisper_params(jax.random.PRNGKey(0), cfg)
    enc = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 64))
    toks = jnp.array([[1, 2, 3, 4, 5]])
    _, aux = whisper_decode(
        params, cfg, toks, enc, collect_full_maps=True, collect_lang_cols=True
    )
    assert aux["maps"].shape == (2, 1, 4, 5, 5)
    # maps sliced at cols 1:3 == qk_cols
    np.testing.assert_allclose(
        np.asarray(aux["maps"])[..., 1:3], np.asarray(aux["qk_cols"]), atol=1e-6
    )
    # causal -inf present
    assert np.isneginf(np.asarray(aux["maps"])[0, 0, 0, 0, 1])


def test_collect_stats_and_vocab(tmp_path):
    from agacs_tpu.bin import collect_stats, export_vocabulary

    d = tmp_path / "data"
    rng = np.random.RandomState(0)
    write_wav(str(d / "u1.wav"), rng.randn(16000).astype(np.float32) * 0.1)
    write_scp(str(d / "wav.scp"), {"u1": str(d / "u1.wav")})
    write_scp(str(d / "text"), {"u1": "hi 你"})
    out = collect_stats.main(
        ["--data_dir", str(d), "--output_dir", str(tmp_path / "stats")]
    )
    assert out["mean"].shape == (80,)
    stats = np.load(str(tmp_path / "stats" / "feats_stats.npz"))
    assert stats["count"] > 0
    shape_lines = open(tmp_path / "stats" / "speech_shape").read().strip()
    assert shape_lines == "u1 16000"

    n = export_vocabulary.main(["--output", str(tmp_path / "tokens.txt")])
    assert n == 51865
    lines = open(tmp_path / "tokens.txt", encoding="utf-8").read().splitlines()
    assert len(lines) == 51865
    assert lines[50258] == "<|startoftranscript|>"
    assert lines[50363] == "<|notimestamps|>"


def test_pack_unpack_roundtrip(tmp_path):
    """bin/pack: stage-14 model packing (espnet2.bin.pack role)."""
    import numpy as np

    from agacs_tpu.bin import pack

    exp = tmp_path / "exp"
    exp.mkdir()
    (exp / "config.yaml").write_text("encoder: whisper\n")
    np.savez(exp / "valid.acc.ave.params.npz", w=np.zeros(3))
    (exp / "train_history.json").write_text("{}")

    out = tmp_path / "packed.tgz"
    pack.main([
        "pack",
        "--train_config", str(exp / "config.yaml"),
        "--model_file", str(exp / "valid.acc.ave.params.npz"),
        "--option", str(exp / "train_history.json"),
        "--outpath", str(out),
    ])
    assert out.exists()

    dest = tmp_path / "unpacked"
    got = pack.main(["unpack", "--archive", str(out), "--outdir", str(dest)])
    assert got["asr_train_config"].endswith("exp/config.yaml")
    assert os.path.exists(got["asr_train_config"])
    assert os.path.exists(got["asr_model_file"])
    data = np.load(got["asr_model_file"])
    assert data["w"].shape == (3,)
