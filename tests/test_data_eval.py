"""Data pipeline + scoring tests (mini synthetic corpus)."""

import os

import numpy as np
import pytest

from agacs_tpu.data import ASRDataset, collate_batch, num_elements_batches, read_scp
from agacs_tpu.data.io import read_wav, wav_num_samples, write_scp, write_wav
from agacs_tpu.data.sampler import bucket_length, round_batches_to_grid
from agacs_tpu.eval import (
    ErrorStats,
    align_counts,
    mixed_tokens,
    read_trn,
    score_report,
    split_language,
    write_trn,
)
from agacs_tpu.eval.scoring import _align_py, _native_lib


@pytest.fixture(scope="module")
def mini_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("mini")
    rng = np.random.RandomState(0)
    texts = {
        "utt1": "我们 go shopping 了",
        "utt2": "hello 你好 world",
        "utt3": "这样 ok 吗",
        "utt4": "sure 没 问题",
    }
    wavs = {}
    for i, utt in enumerate(texts):
        n = 16000 + i * 4000
        path = str(root / f"{utt}.wav")
        write_wav(path, rng.randn(n).astype(np.float32) * 0.1)
        wavs[utt] = path
    write_scp(str(root / "wav.scp"), wavs)
    write_scp(str(root / "text"), texts)
    return str(root)


def test_wav_roundtrip(tmp_path):
    x = np.sin(np.linspace(0, 100, 16000)).astype(np.float32) * 0.5
    p = str(tmp_path / "a.wav")
    write_wav(p, x)
    y, sr = read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(x, y, atol=1e-4)
    assert wav_num_samples(p) == 16000


def test_dataset(mini_corpus):
    ds = ASRDataset(mini_corpus)
    assert len(ds) == 4
    item = ds["utt1"]
    assert item["text"][0:4].tolist() == [50260, 50259, 50359, 50363]
    assert item["text"][-1] == 50257
    assert len(item["cs_labels"]) == len(item["text"]) + 1
    assert item["speech"].dtype == np.float32


def test_dataset_duration_filter(mini_corpus):
    ds = ASRDataset(mini_corpus, min_samples=18000)
    assert len(ds) == 3  # utt1 (16000) filtered out


def test_sampler_packing():
    lengths = {f"u{i}": 1000 * (i + 1) for i in range(10)}
    batches = num_elements_batches(lengths, batch_bins=20000)
    # every batch respects the padded budget
    for b in batches:
        mx = max(lengths[u] for u in b)
        assert mx * len(b) <= 20000
    assert sorted(u for b in batches for u in b) == sorted(lengths)


def test_sampler_b_grid():
    """b_grid rounds every batch (except the tail) to the grid, keeps all
    utterances exactly once, and preserves the length-sorted order."""
    rng = np.random.RandomState(0)
    lengths = {f"u{i:03d}": int(rng.randint(8000, 480000))
               for i in range(137)}
    batches = num_elements_batches(lengths, batch_bins=4_000_000, b_grid=8)
    flat = [u for b in batches for u in b]
    assert sorted(flat) == sorted(lengths)
    for b in batches[:-1]:
        assert len(b) % 8 == 0, [len(x) for x in batches]
    # order preserved == global descending length order
    lens = [lengths[u] for u in flat]
    assert lens == sorted(lens, reverse=True)

    # degenerate: fewer utts than one grid -> single off-grid batch
    small = num_elements_batches({"a": 10, "b": 20}, 10**9, b_grid=8)
    assert small == [["b", "a"]]

    # direct post-pass
    rounded = round_batches_to_grid([["a", "b", "c"], ["d", "e"]], 2)
    assert rounded == [["a", "b"], ["c", "d"], ["e"]]


def test_fixed_shape_batches():
    """The closed-shape sampler: every batch's (B, S_bucket) comes from
    the geometric bucket of its longest utterance; padded numel never
    exceeds batch_bins (when bins/S >= b_grid); all utts kept once."""
    from agacs_tpu.data.sampler import (
        fixed_shape_batches,
        geometric_s_buckets,
    )

    rng = np.random.RandomState(7)
    lengths = {f"u{i:03d}": int(rng.randint(16000, 480000))
               for i in range(300)}
    bins = 4_000_000
    batches = fixed_shape_batches(lengths, bins, b_grid=8)
    assert sorted(u for b in batches for u in b) == sorted(lengths)
    buckets = geometric_s_buckets()
    shapes = set()
    for b in batches:
        mx = max(lengths[u] for u in b)
        s = next(s for s in buckets if mx <= s)
        assert len(b) * s <= bins
        shapes.add((len(b), s))
    # closed set: far fewer shapes than batches
    assert len(shapes) <= len(buckets) + 2, shapes
    for b in batches[:-1]:
        assert len(b) % 8 == 0


def test_collate(mini_corpus):
    ds = ASRDataset(mini_corpus)
    batch = collate_batch([ds[u] for u in ds.utt_ids], speech_grid=8000)
    b, s = batch["speech"].shape
    assert b == 4 and s % 8000 == 0
    assert batch["text"].shape[1] % 8 == 0
    assert (batch["speech_lengths"] <= s).all()
    assert batch["cs_labels"].shape[1] == batch["text"].shape[1] + 1
    # padding is -1 / zeros
    assert batch["text"][0, batch["text_lengths"][0] :].max() == -1


def test_bucket_length():
    assert bucket_length(15999, 16000) == 16000
    assert bucket_length(16001, 16000) == 32000
    assert bucket_length(10**9, 16000, max_len=480000) == 480000


def test_align_counts_basic():
    c, s, d, i = align_counts("a b c d".split(), "a x c".split())
    assert (c, s, d, i) == (2, 1, 1, 0)
    c, s, d, i = align_counts("a b".split(), "a b c".split())
    assert (c, s, d, i) == (2, 0, 0, 1)


def test_native_matches_python():
    rng = np.random.RandomState(0)
    if _native_lib() is None:
        pytest.skip("native aligner unavailable")
    for _ in range(20):
        ref = [str(x) for x in rng.randint(0, 5, rng.randint(0, 12))]
        hyp = [str(x) for x in rng.randint(0, 5, rng.randint(0, 12))]
        got = align_counts(ref, hyp)
        vocab = {}
        r = [vocab.setdefault(t, len(vocab)) for t in ref]
        h = [vocab.setdefault(t, len(vocab)) for t in hyp]
        assert got == _align_py(r, h)


def test_mixed_tokens_and_split():
    t = "我们 go shopping 了"
    assert mixed_tokens(t) == ["我", "们", "go", "shopping", "了"]
    eng, man = split_language(t)
    assert eng == "go shopping"
    assert man == "我们了"


def test_score_report_perfect_and_errors():
    refs = {"u1": "我们 go shopping 了", "u2": "hello 你好"}
    hyps = dict(refs)
    rep = score_report(refs, hyps)
    assert rep["mer"]["err"] == 0.0
    assert rep["english_wer"]["err"] == 0.0
    assert rep["mandarin_cer"]["err"] == 0.0

    hyps["u1"] = "我们 going shopping"  # 1 sub (go), 1 del (了)
    rep = score_report(refs, hyps)
    assert rep["mer"]["sub"] == 1 and rep["mer"]["del"] == 1
    assert rep["english_wer"]["sub"] == 1
    assert rep["mandarin_cer"]["del"] == 1


def test_trn_roundtrip(tmp_path):
    utts = {"u1": "我们 go", "u2": "hello 你"}
    p = str(tmp_path / "hyp.trn")
    write_trn(p, utts)
    back = read_trn(p)
    assert back["u1"] == "我 们 go"
    assert back["u2"] == "hello 你"


def test_collect_num_samples_single_process(tmp_path):
    """Shape collection matches direct probing (single-process path) and
    prefers cached utt2num_samples entries."""
    from agacs_tpu.data.dataset import ASRDataset
    from agacs_tpu.data.io import write_scp, write_wav
    from agacs_tpu.data.shapes import collect_num_samples

    rng = np.random.RandomState(0)
    wavs, texts = {}, {}
    for i in range(4):
        p = str(tmp_path / f"u{i}.wav")
        write_wav(p, (0.1 * rng.randn(4000 + 500 * i)).astype(np.float32))
        wavs[f"u{i}"] = p
        texts[f"u{i}"] = "hi"
    write_scp(str(tmp_path / "wav.scp"), wavs)
    write_scp(str(tmp_path / "text"), texts)
    ds = ASRDataset(str(tmp_path), min_samples=0)
    lens = collect_num_samples(ds)
    assert lens == {f"u{i}": 4000 + 500 * i for i in range(4)}

    # with a shape file, no probing is needed (values come from the file)
    write_scp(str(tmp_path / "utt2num_samples"),
              {f"u{i}": str(4000 + 500 * i) for i in range(4)})
    ds2 = ASRDataset(str(tmp_path), min_samples=0)
    assert collect_num_samples(ds2) == lens
