"""Joint CTC/attention beam search tests (conformer family)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from agacs_tpu.decode.joint_beam import joint_beam_decode
from agacs_tpu.models.conformer import (
    TransformerDecoderConfig,
    init_transformer_decoder_params,
    transformer_decode,
)
from agacs_tpu.models.lm import TransformerLMConfig, init_lm_params

V = 50  # small vocab for testing (sos/eos remapped)
SOS, EOS = 1, 2
DEC = TransformerDecoderConfig(
    vocab_size=V, attention_heads=4, linear_units=64, num_blocks=2, d_model=32
)


@pytest.fixture(scope="module")
def setup():
    params = init_transformer_decoder_params(jax.random.PRNGKey(0), DEC)
    mem = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 32))
    mlens = jnp.array([9, 7])
    rng = np.random.RandomState(0)
    ctc_logits = rng.randn(2, 9, V).astype(np.float32)
    ctc_logp = jnp.asarray(
        ctc_logits - np.log(np.exp(ctc_logits).sum(-1, keepdims=True))
    )
    return params, mem, mlens, ctc_logp


def test_attention_only_beam1_is_greedy(setup):
    params, mem, mlens, _ = setup
    tokens, lens, scores = joint_beam_decode(
        params, DEC, mem, mlens, beam_size=1, pre_beam=4, max_steps=6,
        sos=SOS, eos=EOS, ctc_weight=0.0,
    )
    # manual greedy with teacher forcing
    toks = np.asarray(tokens)
    for i in range(2):
        n = int(lens[i])
        row = jnp.asarray(toks[i : i + 1, :n])
        logits = transformer_decode(params, DEC, row, mem[i : i + 1], mlens[i : i + 1])
        preds = np.asarray(jnp.argmax(logits, -1))[0]
        for pos in range(n - 1):
            if pos == n - 2 and toks[i, pos + 1] == EOS:
                continue  # <eos> appended at the cap, not searched
            assert preds[pos] == toks[i, pos + 1]


def test_joint_beam_with_ctc_runs_and_scores(setup):
    params, mem, mlens, ctc_logp = setup
    tokens, lens, scores = joint_beam_decode(
        params, DEC, mem, mlens, ctc_logp=ctc_logp, ctc_frame_lens=mlens,
        beam_size=3, pre_beam=6, max_steps=6, sos=SOS, eos=EOS, ctc_weight=0.3,
    )
    assert np.isfinite(np.asarray(scores)).all()
    toks = np.asarray(tokens)
    assert (toks[:, 0] == SOS).all()
    assert (toks >= 0).all() and (toks < V).all()
    # ctc changes the ranking vs attention-only
    t2, _, s2 = joint_beam_decode(
        params, DEC, mem, mlens, beam_size=3, pre_beam=6, max_steps=6,
        sos=SOS, eos=EOS, ctc_weight=0.0,
    )
    assert not np.allclose(np.asarray(scores), np.asarray(s2))


def test_wider_beam_not_worse(setup):
    params, mem, mlens, ctc_logp = setup
    _, _, s1 = joint_beam_decode(
        params, DEC, mem, mlens, ctc_logp=ctc_logp, beam_size=1, pre_beam=4,
        max_steps=6, sos=SOS, eos=EOS, ctc_weight=0.3,
    )
    _, _, s4 = joint_beam_decode(
        params, DEC, mem, mlens, ctc_logp=ctc_logp, beam_size=4, pre_beam=8,
        max_steps=6, sos=SOS, eos=EOS, ctc_weight=0.3,
    )
    assert (np.asarray(s4) >= np.asarray(s1) - 1e-4).all()


def test_lm_fusion_changes_scores(setup):
    params, mem, mlens, _ = setup
    lm_cfg = TransformerLMConfig(
        vocab_size=V, d_model=32, attention_heads=4, linear_units=64,
        num_blocks=2, sos=SOS, eos=EOS,
    )
    lm_params = init_lm_params(jax.random.PRNGKey(7), lm_cfg)
    _, _, s_no = joint_beam_decode(
        params, DEC, mem, mlens, beam_size=2, pre_beam=4, max_steps=5,
        sos=SOS, eos=EOS, ctc_weight=0.0,
    )
    _, _, s_lm = joint_beam_decode(
        params, DEC, mem, mlens, lm_params=lm_params, lm_cfg=lm_cfg,
        beam_size=2, pre_beam=4, max_steps=5, sos=SOS, eos=EOS,
        ctc_weight=0.0, lm_weight=0.3,
    )
    assert not np.allclose(np.asarray(s_no), np.asarray(s_lm))
