"""SEAME corpus-layout prep driver on a synthetic mini-corpus: raw
checkout layout (FLAC recordings + phaseII transcripts + dev-set repo)
-> speaker-split data dirs consumed end-to-end by ASRDataset (segments
slicing included). Ports of `egs2/seame/asr1/local/preprocess.py`."""

import os

import numpy as np
import pytest

from agacs_tpu.data import flac as F
from agacs_tpu.data.seame import prepare_seame_corpus

SR = 16000


def _tone(freq, seconds, seed=0):
    t = np.arange(int(seconds * SR)) / SR
    rng = np.random.RandomState(seed)
    return (0.2 * np.sin(2 * np.pi * freq * t)
            + 0.01 * rng.randn(len(t))).astype(np.float32)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Two conversation recordings + one interview recording; utterances
    follow the SEAME transcript convention (ms timestamps, tab-separated
    phaseII rows). Recording NI01MAX_0101 is in the dev-man list."""
    root = tmp_path_factory.mktemp("seame")
    corpus = root / "SEAME"
    repo = root / "SEAME-dev-set"

    recs = {
        ("conversation", "NC01FBX_0101"): 8.0,
        ("conversation", "NC02MAY_0101"): 8.0,
        ("interview", "NI01MAX_0101"): 8.0,
    }
    for i, ((atp, rec), dur) in enumerate(recs.items()):
        adir = corpus / atp / "audio"
        adir.mkdir(parents=True, exist_ok=True)
        F.write_flac(str(adir / f"{rec}.flac"), _tone(220 + 40 * i, dur, i), SR)

    # phaseII transcripts: idx \t start_ms \t end_ms \t lang \t text
    rows = {
        "NC01FBX_0101": [
            (500, 2500, "我们 go to school 了"),
            (3000, 5200, "okay 那个 project 很难"),
            (5500, 7500, "(ppl) 好 的 thanks"),
        ],
        "NC02MAY_0101": [
            (200, 2000, "today 我 很 busy"),
            (2500, 4400, "没有 problem lah"),
            (5000, 7000, "he 说 tomorrow 再 来"),
        ],
        "NI01MAX_0101": [
            (100, 2100, "interview 开始 了"),
            (2600, 4600, "my name is 小明"),
            (5100, 7100, "谢谢 everyone"),
        ],
    }
    for (atp, rec) in recs:
        tdir = corpus / atp / "transcript" / "phaseII"
        tdir.mkdir(parents=True, exist_ok=True)
        with open(tdir / f"{rec}.txt", "w", encoding="utf-8") as f:
            for s, e, text in rows[rec]:
                f.write(f"{rec}\t{s}\t{e}\tCS\t{text}\n")

    # dev-set repo: train recordings list + dev_man ids (10-ms units)
    (repo / "train").mkdir(parents=True)
    with open(repo / "train" / "wav_file.txt", "w") as f:
        f.write("data/conversation/NC01FBX_0101/audio.wav\n")
        f.write("data/conversation/NC02MAY_0101/audio.wav\n")
    (repo / "dev_man").mkdir(parents=True)
    with open(repo / "dev_man" / "text", "w") as f:
        # speaker-prefixed ids, times in the 5-digit 10-ms convention
        f.write("ni01m-ni01max_0101-00010-00210 interview text\n")
        f.write("ni01m-ni01max_0101-00260-00460 more text\n")
    (repo / "dev_sge").mkdir(parents=True)
    with open(repo / "dev_sge" / "text", "w") as f:
        f.write("ni01m-ni01max_0101-00510-00710 third utt\n")

    out = root / "data"
    stats = prepare_seame_corpus(str(corpus), str(repo), str(out), num_val=1)
    return out, stats


def test_split_assignment(corpus):
    out, stats = corpus
    # 6 conversation utts -> 5 train + 1 valid; 3 interview -> 2 devman, 1 devsge
    assert stats["train"]["n_utts"] == 5
    assert stats["valid"]["n_utts"] == 1
    assert stats["devman"]["n_utts"] == 2
    assert stats["devsge"]["n_utts"] == 1

    # speaker-disjoint: dev speakers never in train
    def spks(split):
        with open(out / split / "utt2spk") as f:
            return {l.split()[1] for l in f if l.strip()}

    assert spks("devman") == {"ni01m"}
    assert spks("train") & spks("devman") == set()


def test_split_determinism(corpus, tmp_path):
    """Same inputs -> identical valid carve-out (seed 531)."""
    out, _ = corpus
    with open(out / "valid" / "list") as f:
        first = f.read()
    assert first.strip()  # non-empty, stable under the fixed seed


def test_text_normalization_outputs(corpus):
    out, _ = corpus
    texts = {}
    with open(out / "train" / "text", encoding="utf-8") as f:
        for line in f:
            u, t = line.rstrip("\n").split(" ", 1)
            texts[u] = t
    joined = " ".join(texts.values())
    # hanzi space-wrapped, (ppl) -> <noise>, all lowercased
    assert "我 们" in joined or "我" in joined
    assert "<noise>" in joined
    assert joined == joined.lower()

    # Mandarin char inventory + BPE side outputs exist and are consistent
    with open(out / "train" / "token.man.1", encoding="utf-8") as f:
        vocab = [l for l in f.read().split("\n") if l]
    assert all(len(c) == 1 for c in vocab)
    with open(out / "train" / "text.eng.bpe", encoding="utf-8") as f:
        eng = f.read()
    assert "school" in eng and not any(c in eng for c in vocab)


def test_segments_and_dataset_end_to_end(corpus):
    """The prepared dir loads through ASRDataset: segments slice the long
    recordings, durations match the transcript times."""
    from agacs_tpu.data.dataset import ASRDataset

    out, _ = corpus
    ds = ASRDataset(str(out / "train"), min_samples=0)
    assert len(ds) == 5
    u = ds.utt_ids[0]
    item = ds[u]
    # segment duration: end-start from the utt id (10-ms units)
    _, _, s, e = u.split("-")
    want = int(round((float(e) - float(s)) / 100 * SR))
    assert abs(len(item["speech"]) - want) <= 1
    assert item["text"][-1] == 50257  # eot-terminated token ids
    assert ds.num_samples(u) == len(item["speech"])


def test_devman_matches_by_time_tolerance(corpus):
    out, _ = corpus
    with open(out / "devman" / "list") as f:
        ids = [l.strip() for l in f if l.strip()]
    assert ids == sorted(ids)
    assert all(i.startswith("ni01m-") for i in ids)


def test_format_segments_to_flac_ark(corpus, tmp_path):
    """Stage-3 equivalent: the segments-based prep output formats to an
    utterance-level flac.ark dump that ASRDataset reads directly."""
    from agacs_tpu.bin.format_data import main as format_main
    from agacs_tpu.data.dataset import ASRDataset

    out, _ = corpus
    dump = tmp_path / "dump_train"
    rep = format_main([
        "--data_dir", str(out / "train"), "--outdir", str(dump),
        "--audio_format", "flac.ark",
    ])
    assert rep["n_utts"] == 5
    assert (dump / "data_wav.ark").exists()

    ds_seg = ASRDataset(str(out / "train"))
    ds_ark = ASRDataset(str(dump))
    assert sorted(ds_ark.utt_ids) == sorted(ds_seg.utt_ids)
    u = ds_seg.utt_ids[0]
    a, b = ds_seg[u]["speech"], ds_ark[u]["speech"]
    assert len(a) == len(b)
    np.testing.assert_allclose(a, b, atol=2.0 / 32768.0)


def test_perturb_over_ark_dir(corpus, tmp_path):
    """Recipe flow: segments-prep -> flac.ark format -> speed perturb
    (perturb reads ark entries transparently)."""
    from agacs_tpu.bin.format_data import main as format_main
    from agacs_tpu.data.dataset import ASRDataset
    from agacs_tpu.data.perturb import perturb_data_dir

    out, _ = corpus
    dump = tmp_path / "train_fmt"
    format_main(["--data_dir", str(out / "train"), "--outdir", str(dump),
                 "--audio_format", "flac.ark"])
    sp = tmp_path / "train_sp"
    perturb_data_dir(str(dump), str(sp), factors=(0.9, 1.0))
    ds = ASRDataset(str(sp), min_samples=0)
    base = ASRDataset(str(dump), min_samples=0)
    assert len(ds) == 2 * len(base)
    u = base.utt_ids[0]
    slow = ds[f"sp0.9-{u}"]["speech"]
    orig = base[u]["speech"]
    assert abs(len(slow) - len(orig) / 0.9) < 0.02 * len(orig)
