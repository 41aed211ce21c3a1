"""Long-form transcription: timestamp decoding rules, language detection,
30-second windowed seek (decode/transcribe.py; the stock whisper
`transcribe.py`/`decoding.py` capability that the reference fork breaks —
no torch oracle exists for it, so the rules are verified structurally)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from agacs_tpu.decode.transcribe import (
    CHUNK_SAMPLES,
    detect_language,
    greedy_decode_timestamps,
    no_speech_probs,
    transcribe,
)
from agacs_tpu.models.whisper import (
    WhisperConfig,
    init_whisper_params,
    whisper_encode,
)
from agacs_tpu.text.tokenizer import LANGUAGES, SpecialTokens

SP = SpecialTokens()
CFG = WhisperConfig(
    n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4,
    n_audio_layer=2, n_vocab=51865, n_text_ctx=48, n_text_state=64,
    n_text_head=4, n_text_layer=2,
)


@pytest.fixture(scope="module")
def setup():
    params = init_whisper_params(jax.random.PRNGKey(4), CFG)
    mel = jax.random.normal(jax.random.PRNGKey(5), (2, 100, 80)) * 0.3
    enc = whisper_encode(params, CFG, mel)
    return params, enc


def test_timestamp_rules_hold(setup):
    params, enc = setup
    primer = jnp.asarray(
        [[SP.sot, SP.lang_id("zh"), SP.transcribe]] * 2, jnp.int32
    )
    tokens, lengths, sum_lp = greedy_decode_timestamps(
        params, CFG, enc, primer, max_steps=20
    )
    tokens, lengths = np.asarray(tokens), np.asarray(lengths)
    assert np.isfinite(np.asarray(sum_lp)).all()
    for i in range(2):
        seq = tokens[i, 3 : lengths[i]].tolist()
        assert seq, "no tokens sampled"
        # rule 1: no special tokens ever sampled
        assert all(not (SP.eot < t < SP.timestamp_begin) for t in seq)
        assert SP.no_timestamps not in seq
        # rule 2: first sampled token is an early timestamp
        assert SP.timestamp_begin <= seq[0] <= SP.timestamp_begin + 50
        # rule 4: timestamps never decrease
        ts = [t for t in seq if t >= SP.timestamp_begin]
        assert ts == sorted(ts)
        # rule 3: a timestamp pair is never followed by another timestamp,
        # and text never directly follows a lone timestamp mid-sequence
        for j in range(1, len(seq) - 1):
            lone_ts = (seq[j] >= SP.timestamp_begin
                       and seq[j - 1] < SP.timestamp_begin)
            if lone_ts:
                assert seq[j + 1] >= SP.timestamp_begin or seq[j + 1] == SP.eot


def test_detect_language_and_no_speech(setup):
    params, enc = setup
    langs, probs = detect_language(params, CFG, enc)
    assert len(langs) == 2 and all(l in LANGUAGES for l in langs)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)
    nsp = no_speech_probs(params, CFG, enc)
    assert ((0 <= nsp) & (nsp <= 1)).all()


def test_transcribe_long_form():
    """65 s of audio -> multiple windows, monotonic segment times, and the
    seek loop always terminates."""
    params = init_whisper_params(jax.random.PRNGKey(4), CFG)
    rng = np.random.RandomState(0)
    audio = (0.05 * rng.randn(65 * 16000)).astype(np.float32)

    out = transcribe(params, CFG, audio, language="zh", max_steps=12,
                     no_speech_threshold=1.1,   # never skip (random model)
                     temperature=(0.0,), logprob_threshold=None)
    assert out["language"] == "zh"
    assert isinstance(out["text"], str)
    segs = out["segments"]
    for s in segs:
        assert 0.0 <= s.start <= s.end <= 66.0
    starts = [s.start for s in segs]
    assert starts == sorted(starts)


def test_transcribe_detects_language():
    params = init_whisper_params(jax.random.PRNGKey(4), CFG)
    audio = np.zeros(2 * 16000, np.float32)
    out = transcribe(params, CFG, audio, max_steps=8,
                     no_speech_threshold=1.1,
                     temperature=(0.0,), logprob_threshold=None)
    assert out["language"] in LANGUAGES


def test_temperature_fallback_and_word_timestamps():
    """Failing thresholds escalate the temperature ladder (sampled decode
    differs from greedy); word_timestamps attaches DTW word timings."""
    params = init_whisper_params(jax.random.PRNGKey(4), CFG)
    rng = np.random.RandomState(1)
    audio = (0.05 * rng.randn(4 * 16000)).astype(np.float32)

    greedy = transcribe(params, CFG, audio, language="zh", max_steps=10,
                        no_speech_threshold=1.1,
                        temperature=(0.0,), logprob_threshold=None)
    # impossible logprob gate: every temperature fails, ladder runs to 1.0
    hot = transcribe(params, CFG, audio, language="zh", max_steps=10,
                     no_speech_threshold=1.1,
                     temperature=(0.0, 1.0), logprob_threshold=0.0)
    g = [t for s in greedy["segments"] for t in s.tokens]
    h = [t for s in hot["segments"] for t in s.tokens]
    assert g != h  # temperature-1.0 sampling diverges from greedy

    out = transcribe(params, CFG, audio, language="zh", max_steps=10,
                     no_speech_threshold=1.1, temperature=(0.0,),
                     logprob_threshold=None, word_timestamps=True)
    words = [w for s in out["segments"] for w in s.words]
    assert words
    for w in words:
        assert 0.0 <= w.start <= w.end


def test_bucket_prompt_truncation():
    from agacs_tpu.decode.transcribe import _bucket_prompt

    assert _bucket_prompt(list(range(6))) == []
    assert _bucket_prompt(list(range(10))) == list(range(2, 10))  # last 8
    assert _bucket_prompt(list(range(50))) == list(range(18, 50))  # last 32
    assert _bucket_prompt(list(range(300))) == list(range(77, 300))  # 223
    assert _bucket_prompt(list(range(16))) == list(range(16))


def test_initial_prompt_enters_context_and_not_output(monkeypatch):
    """Stock prompt semantics (transcribe.py:198-200, decoding.py:591-599):
    the initial prompt's tokens ride in the <|startofprev|> window of the
    primer, are NOT part of the emitted text, and with
    condition_on_previous_text the second window's primer carries the
    first window's text tokens."""
    # `agacs_tpu.decode.transcribe` the attribute is the FUNCTION (the
    # package re-exports it), so fetch the module via importlib
    import importlib

    tr = importlib.import_module("agacs_tpu.decode.transcribe")

    params = init_whisper_params(jax.random.PRNGKey(4), CFG)
    audio = (np.random.RandomState(0).randn(CHUNK_SAMPLES * 2)
             .astype(np.float32) * 0.1)

    primers = []
    orig = tr.greedy_decode_timestamps

    def spy(params, cfg, enc, primer, **kw):
        primers.append(np.asarray(primer)[0].tolist())
        return orig(params, cfg, enc, primer, **kw)

    monkeypatch.setattr(tr, "greedy_decode_timestamps", spy)
    out = tr.transcribe(
        params, CFG, audio, language="zh",
        temperature=(0.0,), logprob_threshold=None,
        no_speech_threshold=1.1,  # never skip
        initial_prompt="hello context window of many words here that definitely spans more than sixteen bpe tokens for the bucket",
        max_steps=8,
    )

    prompt_ids = []
    from agacs_tpu.text import WhisperTokenizer

    tok = WhisperTokenizer()
    prompt_ids = tok.encode(
        " " + "hello context window of many words here that definitely spans more than sixteen bpe tokens for the bucket".strip()
    )
    first = primers[0]
    # first primer: [sot_prev] + bucketed prompt tail + [sot, lang, task]
    assert first[0] == SP.sot_prev
    assert first[-3:] == [SP.sot, SP.lang_id("zh"), SP.transcribe]
    ctx = first[1:-3]
    assert ctx and ctx == prompt_ids[len(prompt_ids) - len(ctx):]
    # prompt text is not emitted
    assert "hello context window" not in out["text"]

    # a later window's context is fed from DECODED text when anything was
    # decoded (or stays at the initial prompt if the first window emitted
    # nothing) — in either case the sot sequence stays at the tail
    assert all(p[-3:] == first[-3:] for p in primers)

    # condition_on_previous_text=False: later windows have NO context
    primers.clear()
    tr.transcribe(
        params, CFG, audio, language="zh",
        temperature=(0.0,), logprob_threshold=None,
        no_speech_threshold=1.1, condition_on_previous_text=False,
        max_steps=8,
    )
    assert all(p[0] == SP.sot for p in primers[1:])


def test_per_window_beam_mode():
    """beam_size > 1 routes windows through the composed beam in stock's
    without_timestamps mode: segments carry window-level times and text
    tokens only."""
    params = init_whisper_params(jax.random.PRNGKey(4), CFG)
    rng = np.random.RandomState(2)
    audio = (0.05 * rng.randn(4 * 16000)).astype(np.float32)

    out = transcribe(params, CFG, audio, language="zh", max_steps=8,
                     no_speech_threshold=1.1, temperature=(0.0,),
                     logprob_threshold=None, beam_size=2)
    assert isinstance(out["text"], str)
    for s in out["segments"]:
        assert 0.0 <= s.start <= s.end <= 30.0
        # without_timestamps: no timestamp tokens in the emitted segments
        assert all(t < SP.timestamp_begin for t in s.tokens
                   if t < SP.eot or t >= SP.timestamp_begin)
