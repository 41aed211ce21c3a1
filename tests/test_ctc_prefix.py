"""CTC prefix scorer vs brute-force path enumeration."""

import itertools

import numpy as np
import pytest

import jax.numpy as jnp

from agacs_tpu.decode.ctc_prefix import (
    ctc_eos_score,
    ctc_prefix_init,
    ctc_prefix_score,
    ctc_prefix_select,
)

BLANK = 0


def brute_force_prefix_prob(logp: np.ndarray, prefix: list[int]) -> float:
    """P(collapsed output starts with `prefix`) by enumerating all paths."""
    t, v = logp.shape
    p = np.exp(logp)
    total = 0.0
    for path in itertools.product(range(v), repeat=t):
        # collapse
        out = []
        prev = -1
        for s in path:
            if s != prev and s != BLANK:
                out.append(s)
            prev = s
        if out[: len(prefix)] == prefix:
            prob = 1.0
            for ti, s in enumerate(path):
                prob *= p[ti, s]
            total += prob
    return total


def brute_force_exact_prob(logp: np.ndarray, seq: list[int]) -> float:
    t, v = logp.shape
    p = np.exp(logp)
    total = 0.0
    for path in itertools.product(range(v), repeat=t):
        out = []
        prev = -1
        for s in path:
            if s != prev and s != BLANK:
                out.append(s)
            prev = s
        if out == seq:
            prob = 1.0
            for ti, s in enumerate(path):
                prob *= p[ti, s]
            total += prob
    return total


@pytest.fixture(scope="module")
def logp():
    rng = np.random.RandomState(0)
    x = rng.randn(1, 4, 3).astype(np.float32)
    x = x - np.log(np.exp(x).sum(-1, keepdims=True))  # normalize
    return x


def test_first_token_scores(logp):
    state = ctc_prefix_init(jnp.asarray(logp))
    cands = jnp.asarray([[1, 2]])
    scores, _ = ctc_prefix_score(jnp.asarray(logp), state, cands)
    for i, c in enumerate([1, 2]):
        expect = brute_force_prefix_prob(logp[0], [c])
        np.testing.assert_allclose(float(np.exp(scores[0, i])), expect, rtol=1e-4)


def test_two_token_scores_including_repeat(logp):
    state = ctc_prefix_init(jnp.asarray(logp))
    # take token 1 first
    scores1, st1 = ctc_prefix_score(jnp.asarray(logp), state, jnp.asarray([[1, 2]]))
    st = ctc_prefix_select(st1, jnp.asarray([0]))  # chose '1'
    assert int(st.last[0]) == 1

    scores2, _ = ctc_prefix_score(jnp.asarray(logp), st, jnp.asarray([[1, 2]]))
    # prefix [1,1] requires an intervening blank; prefix [1,2] doesn't
    for i, c in enumerate([1, 2]):
        expect = brute_force_prefix_prob(logp[0], [1, c])
        np.testing.assert_allclose(float(np.exp(scores2[0, i])), expect, rtol=1e-4)


def test_eos_score_is_exact_sequence_prob(logp):
    state = ctc_prefix_init(jnp.asarray(logp))
    _, st1 = ctc_prefix_score(jnp.asarray(logp), state, jnp.asarray([[1]]))
    st = ctc_prefix_select(st1, jnp.asarray([0]))
    got = float(np.exp(ctc_eos_score(st)))
    expect = brute_force_exact_prob(logp[0], [1])
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_frame_lens_mask(logp):
    # scoring with frame_lens=3 equals scoring a 3-frame input
    state4 = ctc_prefix_init(jnp.asarray(logp))
    s_masked, _ = ctc_prefix_score(
        jnp.asarray(logp), state4, jnp.asarray([[1]]), frame_lens=jnp.asarray([3])
    )
    logp3 = logp[:, :3]
    state3 = ctc_prefix_init(jnp.asarray(logp3))
    s3, _ = ctc_prefix_score(jnp.asarray(logp3), state3, jnp.asarray([[1]]))
    np.testing.assert_allclose(np.asarray(s_masked), np.asarray(s3), rtol=1e-5)
