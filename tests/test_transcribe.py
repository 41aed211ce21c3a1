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
