"""Head-counting evidence vs the reference torch model (VERDICT #7).

The reference's literal criterion compares pre-softmax sums containing
-inf causal entries (espnet_model.py:285-310) and thus can never fire;
this framework counts on the POST-softmax distribution
(adapt/head_selection.py docstring). These tests evidence that choice:
  1. on identical weights + batches, the torch model's softmaxed
     attention maps produce the SAME counts and head ranking as the JAX
     counter's column-only path;
  2. the criterion actually fires (nonzero counts on real-ish inputs) —
     the literal -inf comparison fires on nothing;
  3. the shipped artifact `attention_count_whispernoft_new.pkl`
     (110/144 nonzero heads) loads and `select_heads` reproduces the
     reference's 110-head pool and 50%-selection count.
"""

import os
import pickle

import numpy as np
import pytest

import jax.numpy as jnp

from agacs_tpu.adapt.head_selection import count_language_heads, select_heads
from agacs_tpu.models.checkpoint import params_from_state_dict
from agacs_tpu.models.whisper import WhisperConfig, whisper_decode
from reference_oracle import make_torch_model, torch_decoder_forward

PKL = "/root/reference/espnet/egs2/seame/asr1/attention_count_whispernoft_new.pkl"

CFG = WhisperConfig(
    n_mels=80, n_audio_ctx=20, n_audio_state=64, n_audio_head=4,
    n_audio_layer=2, n_vocab=100, n_text_ctx=16, n_text_state=64,
    n_text_head=4, n_text_layer=2,
)


@pytest.fixture(scope="module")
def oracle_setup():
    import torch

    model = make_torch_model(seed=13)
    # sharpen self-attention (x8 embeddings -> x64 logits) so heads peak,
    # and repeat one token at positions 1..3 so query-key self-similarity
    # concentrates mass on the "language columns" 1-2: a freshly
    # initialized model attends ~uniformly and the >50%-mass criterion
    # would fire on nothing
    with torch.no_grad():
        model.decoder.token_embedding.weight.mul_(8.0)
    params = params_from_state_dict(model.state_dict(), CFG)
    rng = np.random.RandomState(3)
    mel = rng.randn(4, 80, 40).astype(np.float32)
    tokens = np.stack([
        [3, 5, 5, 5],
        [1, 8, 8, 8],
        [9, 2, 2, 2],
        [7, 4, 4, 4],
    ]).astype(np.int64)
    with torch.no_grad():
        enc = model.encoder(torch.from_numpy(mel))
    return model, params, tokens, enc


def _torch_prob_counts(model, tokens, enc):
    """The prob-based criterion evaluated on the torch side from FULL
    softmaxed attention maps: Σ mass on cols 1:3 > Σ mass elsewhere."""
    import torch

    _, maps = torch_decoder_forward(model, torch.from_numpy(tokens), enc)
    probs = torch.softmax(maps.float(), dim=-1)  # (L, B, h, T, T)
    lang = probs[..., 1:3].sum(dim=(-1, -2))  # (L, B, h)
    rest = probs.sum(dim=(-1, -2)) - lang
    return (lang > rest).int().sum(dim=1).numpy()  # (L, h)


def test_counter_parity_vs_torch_probabilities(oracle_setup):
    model, params, tokens, enc = oracle_setup
    want = _torch_prob_counts(model, tokens, enc)

    _, aux = whisper_decode(
        params, CFG, jnp.asarray(tokens.astype(np.int32)),
        jnp.asarray(enc.numpy()), collect_lang_cols=True, need_probs=True,
    )
    got = np.asarray(count_language_heads(aux["p_cols"]))
    np.testing.assert_array_equal(got, want)
    assert want.sum() > 0  # the criterion fires on this model

    # identical head ranking on both sides
    np.testing.assert_array_equal(
        np.argsort(-got.reshape(-1), kind="stable"),
        np.argsort(-want.reshape(-1), kind="stable"),
    )


def test_prob_criterion_fires_literal_one_never_does(oracle_setup):
    model, params, tokens, enc = oracle_setup
    import torch

    _, maps = torch_decoder_forward(model, torch.from_numpy(tokens), enc)
    # literal reference criterion on pre-softmax scores with -inf causal
    # entries: both sums are -inf, the comparison never fires
    lang = maps[..., 1:3].sum(dim=(-1, -2))
    rest = maps.sum(dim=(-1, -2)) - lang
    literal = (lang > rest).int().sum(dim=1).numpy()
    assert literal.sum() == 0

    prob = _torch_prob_counts(model, tokens, enc)
    assert prob.sum() > 0  # the shipped pkl's 6M total cannot come from 0


@pytest.mark.skipif(not os.path.exists(PKL), reason="reference pkl absent")
def test_shipped_pkl_interop():
    """The reference artifact loads into our counts format; select_heads
    reproduces the documented pool (110/144 nonzero heads, 100% -> 110
    selected, 50% -> 55) and the counts total matches SURVEY §2.8."""
    with open(PKL, "rb") as f:
        d = pickle.load(f)
    counts = np.zeros((12, 12), np.int64)
    for li, heads in d.items():
        for hi, c in heads.items():
            counts[int(li) - 1, int(hi) - 1] = int(c)
    assert int((counts > 0).sum()) == 110
    assert int(counts.sum()) == 6028379

    full = select_heads(counts, head_percentage=100.0)
    assert int(full.sum()) == 110
    half = select_heads(counts, head_percentage=50.0)
    assert int(half.sum()) == 55
    # selection is count-ranked: every selected head outranks unselected
    sel_min = counts[half.astype(bool)].min()
    unsel_max = counts[(~half.astype(bool)) & (counts > 0)].max()
    assert sel_min >= unsel_max or int((counts == sel_min).sum()) > 1


def _literal_topk_counts(maps: np.ndarray, k: int = 2) -> np.ndarray:
    """Literal numpy transcription of the reference's OLD formulation
    (espnet_model.py:312-363 check_attention_language): per-row top-k
    column ids -> frequency dict (np.unique = ascending keys) -> stable
    sort by count desc -> head qualifies iff cols 1 AND 2 are in the top
    k keys."""
    n_l, b, n_h, t, _ = maps.shape
    counts = np.zeros((n_l, n_h), np.int64)
    for bi in range(b):
        for li in range(n_l):
            for hi in range(n_h):
                rows = np.argsort(-maps[li, bi, hi], axis=-1, kind="stable")
                top = rows[:, :k].ravel()
                uniq, cnt = np.unique(top, return_counts=True)
                order = sorted(zip(uniq.tolist(), cnt.tolist()),
                               key=lambda x: x[1], reverse=True)
                top_keys = [c for c, _ in order[:k]]
                if 1 in top_keys and 2 in top_keys:
                    counts[li, hi] += 1
    return counts


def test_topk_old_counter_matches_literal_reference(oracle_setup):
    from agacs_tpu.adapt.head_selection import count_language_heads_topk

    model, params, tokens, enc = oracle_setup
    _, aux = whisper_decode(
        params, CFG, jnp.asarray(tokens.astype(np.int32)),
        jnp.asarray(enc.numpy()), collect_full_maps=True,
    )
    maps = np.asarray(aux["maps"], np.float64)
    want = _literal_topk_counts(maps)
    got = np.asarray(count_language_heads_topk(jnp.asarray(maps)))
    np.testing.assert_array_equal(got, want)
    # (the strict {1,2}-top-2 criterion rarely fires on a random model;
    # the tie-break test below asserts a constructed firing case)


def test_topk_old_counter_tie_break_prefers_smaller_column():
    from agacs_tpu.adapt.head_selection import count_language_heads_topk

    # hand-built map where cols 1, 2, 3 tie in the histogram: rows
    # alternate their top-2 between {1,2} and {2,3} -> hist 2/4/2 for
    # cols 1/2/3 plus col 0 twice... construct exactly: 4 rows,
    # top-2 sets {1,2},{2,3},{1,2},{2,3} -> hist: 1:2, 2:4, 3:2.
    # top-2 of hist = [2, 1] (tie 1 vs 3 at count 2 -> smaller wins),
    # so the head QUALIFIES; the literal reference resolves the same
    # way (np.unique ascending + stable sort).
    t = 6
    m = np.full((1, 1, 1, 4, t), -10.0, np.float32)
    for r, (a, b) in enumerate([(1, 2), (2, 3), (1, 2), (2, 3)]):
        m[0, 0, 0, r, a] = 2.0
        m[0, 0, 0, r, b] = 1.0
    got = np.asarray(count_language_heads_topk(jnp.asarray(m)))
    want = _literal_topk_counts(m.astype(np.float64))
    np.testing.assert_array_equal(got, want)
    assert got[0, 0] == 1
