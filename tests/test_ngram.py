"""Hashed n-gram scorer (stupid backoff) vs a literal python oracle, plus
beam-fusion wiring (espnet scorers 'ngram' slot, asr_inference.py:160-168)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from agacs_tpu.models.ngram import (
    load_ngram,
    ngram_score_step,
    save_ngram,
    train_ngram,
)

V = 30
SOS = 1


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.RandomState(0)
    seqs = []
    for _ in range(200):
        n = rng.randint(3, 12)
        # skewed distribution so higher-order n-grams repeat
        seqs.append(list(rng.choice([3, 4, 5, 6, 7, 8, 9], size=n,
                                    p=[0.3, 0.25, 0.2, 0.1, 0.07, 0.05, 0.03])))
    return seqs


def _oracle_score(seqs, order, alpha, ctx, token, vocab):
    """Literal stupid backoff with add-1-smoothed unigram floor."""
    from collections import Counter

    grams = [Counter() for _ in range(order)]
    for seq in seqs:
        s = [SOS] + list(seq)
        for i in range(1, len(s)):
            for o in range(order):
                if i - o < 0:
                    break
                grams[o][tuple(s[i - o : i + 1])] += 1

    def score(ctx, t, level):
        o = len(ctx)
        if o == 0:
            uni = np.ones(vocab)
            for (tok,), c in grams[0].items():
                uni[tok] += c
            return np.log(uni[t] / uni.sum()) + np.log(alpha) * level
        g = tuple(ctx) + (t,)
        if grams[o][g] > 0:
            denom = sum(c for gg, c in grams[o].items() if gg[:-1] == tuple(ctx))
            return np.log(grams[o][g] / denom) + np.log(alpha) * level
        return score(ctx[1:], t, level + 1)

    return score(ctx, token, 0)


def test_ngram_matches_oracle(corpus):
    lm = train_ngram(corpus, V, order=3, alpha=0.4, sos=SOS)

    # two hypotheses with different contexts, mid-sequence position
    tokens = np.full((2, 10), 0, np.int32)
    tokens[0, :4] = [SOS, 3, 4, 5]
    tokens[1, :4] = [SOS, 9, 9, 9]  # rare context -> backoff path
    pos = jnp.int32(3)
    scores = np.asarray(ngram_score_step(lm, jnp.asarray(tokens), pos))
    assert scores.shape == (2, V)

    for row, ctx in ((0, (4, 5)), (1, (9, 9))):
        for t in (3, 6, 9, 25):
            want = _oracle_score(corpus, 3, 0.4, ctx, t, V)
            np.testing.assert_allclose(scores[row, t], want, rtol=1e-5,
                                       err_msg=f"row={row} t={t}")


def test_ngram_start_of_sequence_backoff(corpus):
    """pos=0: only unigram/bigram context exists; no crash, valid probs."""
    lm = train_ngram(corpus, V, order=3, sos=SOS)
    tokens = np.full((1, 8), 0, np.int32)
    tokens[0, 0] = SOS
    scores = np.asarray(ngram_score_step(lm, jnp.asarray(tokens), jnp.int32(0)))
    assert np.isfinite(scores).all()
    # bigram (SOS, t) should dominate over backed-off unigram for common t
    want = _oracle_score(corpus, 3, 0.4, (SOS,), 3, V)
    np.testing.assert_allclose(scores[0, 3], want, rtol=1e-5)


def test_ngram_roundtrip(tmp_path, corpus):
    lm = train_ngram(corpus, V, order=3, sos=SOS)
    p = str(tmp_path / "ngram.npz")
    save_ngram(p, lm)
    lm2 = load_ngram(p)
    tokens = jnp.asarray(np.array([[SOS, 3, 4, 5, 0, 0]], np.int32))
    a = np.asarray(ngram_score_step(lm, tokens, jnp.int32(3)))
    b = np.asarray(ngram_score_step(lm2, tokens, jnp.int32(3)))
    np.testing.assert_array_equal(a, b)


def test_ngram_fusion_changes_beam(corpus):
    from agacs_tpu.decode.beam import beam_decode
    from agacs_tpu.models.whisper import WhisperConfig, init_whisper_params, whisper_encode

    cfg = WhisperConfig(
        n_mels=80, n_audio_ctx=10, n_audio_state=64, n_audio_head=4,
        n_audio_layer=1, n_vocab=V, n_text_ctx=16, n_text_state=64,
        n_text_head=4, n_text_layer=1,
    )
    params = init_whisper_params(jax.random.PRNGKey(0), cfg)
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, 20, 80))
    enc = whisper_encode(params, cfg, mel)
    lm = train_ngram(corpus, V, order=3, sos=SOS)

    _, _, s0 = beam_decode(params, cfg, enc, beam_size=2, primer=(SOS,),
                           max_steps=5, eot=2, use_end_detect=False)
    _, _, s1 = beam_decode(params, cfg, enc, beam_size=2, primer=(SOS,),
                           max_steps=5, eot=2, ngram_lm=lm, ngram_weight=0.5,
                           use_end_detect=False)
    assert not np.allclose(np.asarray(s0), np.asarray(s1))
