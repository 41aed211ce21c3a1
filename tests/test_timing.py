"""Word-level timing: DTW (native C++ vs literal python DP vs the
reference's own dtw_cpu on random matrices), median filter vs torch
oracle, word splitting, and end-to-end monotonic word timings on a tiny
model (whisper timing.py:19-255; the Triton kernel's capability)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from agacs_tpu.decode.timing import (
    WordTiming,
    _dtw_py,
    _split_to_word_tokens,
    dtw,
    find_word_alignment,
    median_filter,
)


def test_dtw_native_matches_python_and_reference():
    rng = np.random.RandomState(0)
    for n, m in [(5, 8), (12, 30), (1, 7), (9, 1)]:
        x = rng.randn(n, m).astype(np.float32)
        ti_c, tj_c = dtw(x)
        ti_p, tj_p = _dtw_py(x)
        np.testing.assert_array_equal(ti_c, ti_p)
        np.testing.assert_array_equal(tj_c, tj_p)
        # path validity: monotonic, endpoints, unit steps
        assert ti_c[0] == 0 and tj_c[0] == 0
        assert ti_c[-1] == n - 1 and tj_c[-1] == m - 1
        assert (np.diff(ti_c) >= 0).all() and (np.diff(tj_c) >= 0).all()
        assert ((np.diff(ti_c) + np.diff(tj_c)) >= 1).all()

    # literal reference oracle (timing.py:83-106), importable read-only
    import sys

    sys.path.insert(0, "/root/reference/espnet/whisper")
    try:
        import types

        if "numba" not in sys.modules:
            fake = types.ModuleType("numba")
            fake.jit = lambda *a, **k: (lambda f: f)
            sys.modules["numba"] = fake
        from whisper.timing import dtw_cpu

        x = rng.randn(10, 25).astype(np.float64)
        ref = dtw_cpu(x)
        ti, tj = dtw(x.astype(np.float32))
        np.testing.assert_array_equal(ti, ref[0])
        np.testing.assert_array_equal(tj, ref[1])
    finally:
        sys.path.remove("/root/reference/espnet/whisper")


def test_dtw_diagonal_preference():
    """A clean diagonal cost valley must produce the diagonal path."""
    n = 6
    x = np.ones((n, n), np.float32)
    np.fill_diagonal(x, 0.0)
    ti, tj = dtw(x)
    np.testing.assert_array_equal(ti, tj)


def test_median_filter_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    x = rng.randn(3, 4, 21).astype(np.float32)
    got = median_filter(x, 7)
    xp = F.pad(torch.from_numpy(x), (3, 3, 0, 0), mode="reflect")
    want = xp.unfold(-1, 7, 1).sort()[0][..., 3].numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_split_to_word_tokens():
    from agacs_tpu.text import WhisperTokenizer

    tok = WhisperTokenizer()
    ids = tok.tokenizer_encode if False else None
    text = " hello world 你好"
    toks = []
    for t in tok.text2tokens(text):
        toks.append(tok.token_to_id(t))
    words, word_tokens = _split_to_word_tokens(toks, tok)
    assert "".join(words) == text
    joined = [w.strip() for w in words if w.strip()]
    assert "hello" in joined and "world" in joined
    # CJK chars split into separate words
    assert "你" in joined and "好" in joined
    assert sum(len(t) for t in word_tokens) == len(toks)


def test_find_word_alignment_end_to_end():
    from agacs_tpu.models.whisper import (
        WhisperConfig, init_whisper_params, whisper_encode,
    )
    from agacs_tpu.text import WhisperTokenizer

    cfg = WhisperConfig(
        n_mels=80, n_audio_ctx=100, n_audio_state=64, n_audio_head=4,
        n_audio_layer=2, n_vocab=51865, n_text_ctx=48, n_text_state=64,
        n_text_head=4, n_text_layer=2,
    )
    params = init_whisper_params(jax.random.PRNGKey(0), cfg)
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, 200, 80)) * 0.3
    enc = whisper_encode(params, cfg, mel)
    tok = WhisperTokenizer()
    text_tokens = [tok.token_to_id(t) for t in tok.text2tokens(" we go 好")]

    timings = find_word_alignment(
        params, cfg, tok, text_tokens, enc, num_frames=100
    )
    assert timings and all(isinstance(w, WordTiming) for w in timings)
    assert "".join(w.word for w in timings).startswith(" we go")
    for w in timings:
        assert 0.0 <= w.start <= w.end <= 100 / 50 + 1e-6
        assert 0.0 <= w.probability <= 1.0
    starts = [w.start for w in timings]
    assert starts == sorted(starts)


def test_merge_punctuations():
    from agacs_tpu.decode.timing import WordTiming, merge_punctuations

    a = [
        WordTiming(" ¿", [1], 0.0, 0.1, 0.5),
        WordTiming(" hola", [2], 0.1, 0.5, 0.9),
        WordTiming("?", [3], 0.5, 0.6, 0.8),
        WordTiming(" ok", [4], 0.6, 1.0, 0.7),
    ]
    out = merge_punctuations(a)
    assert [w.word for w in out] == [" ¿ hola?", " ok"]
    assert out[0].tokens == [1, 2, 3]
    assert out[0].start == 0.0 and out[0].end == 0.6
