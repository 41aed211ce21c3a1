"""Composed beam search parity: the dense jitted core vs a literal
ragged-list implementation of the reference's BeamSearch semantics
(`espnet/nets/beam_search.py:346-483`) with full scorer composition
{decoder (1-λ), ctc (λ), lm (μ), length_bonus (β)} on a tiny whisper —
the VERDICT-#4 cached-vs-reference-composition test (ctc 0.3 + lm 0.3).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from agacs_tpu.decode.beam import beam_decode
from agacs_tpu.decode.composed_beam import composed_beam_decode
from agacs_tpu.decode.ctc_prefix import (
    ctc_eos_score,
    ctc_prefix_init,
    ctc_prefix_score,
    ctc_prefix_select,
)
from agacs_tpu.models.lm import TransformerLMConfig, init_lm_params, lm_score_step
from agacs_tpu.models.whisper import (
    WhisperConfig,
    init_whisper_params,
    whisper_decode,
    whisper_encode,
)

V = 40
EOT = 2
PRIMER = (3, 4)
CFG = WhisperConfig(
    n_mels=80, n_audio_ctx=12, n_audio_state=64, n_audio_head=4,
    n_audio_layer=2, n_vocab=V, n_text_ctx=24, n_text_state=64,
    n_text_head=4, n_text_layer=2,
)
LM_CFG = TransformerLMConfig(
    vocab_size=V, d_model=32, attention_heads=4, linear_units=64,
    num_blocks=2, sos=3, eos=EOT,
)


def _ragged_oracle(params, enc, ctc_logp, lm_params, k, pre_beam, max_steps,
                   ctc_weight, lm_weight, length_bonus):
    """Literal espnet BeamSearch: python list hypotheses, full-prefix
    decoder/LM re-forward per step (the reference's no-cache path,
    whisper_decoder.py:192-194), CTC partial scoring with pre-beam.
    Single utterance; end detection off (the jitted side gets the flag)."""
    w_att = 1.0 - ctc_weight

    hyps = [{
        "toks": list(PRIMER),
        "score": 0.0,
        "ctc": ctc_prefix_init(ctc_logp[None]),
    }]
    ended = []  # (score, tokens)
    for step in range(max_steps):
        cands = []
        for h in hyps:
            toks = jnp.asarray([h["toks"]], jnp.int32)
            logits, _ = whisper_decode(params, CFG, toks, enc[None])
            dlp = np.asarray(jax.nn.log_softmax(
                logits[0, -1].astype(jnp.float32)))
            full = w_att * dlp
            if lm_weight > 0.0:
                full = full + lm_weight * np.asarray(
                    lm_score_step(lm_params, LM_CFG, toks)[0]
                )
            ids = np.argsort(-full)[:pre_beam]
            psi, cand_state = ctc_prefix_score(
                ctc_logp[None], h["ctc"], jnp.asarray(ids)[None]
            )
            inc = np.asarray(psi[0]) - float(h["ctc"].score[0])
            eos_inc = float(ctc_eos_score(h["ctc"])[0]) - float(h["ctc"].score[0])
            for j, c in enumerate(ids):
                ctc_term = eos_inc if c == EOT else inc[j]
                s = h["score"] + full[c] + ctc_weight * ctc_term + length_bonus
                cands.append((float(s), h, int(c), cand_state, j))
        cands.sort(key=lambda x: -x[0])
        new_hyps = []
        for s, h, c, cand_state, j in cands[:k]:
            if c == EOT:
                ended.append((s, h["toks"] + [EOT]))
            else:
                new_hyps.append({
                    "toks": h["toks"] + [c],
                    "score": s,
                    "ctc": ctc_prefix_select(cand_state, jnp.asarray([j])),
                })
        hyps = new_hyps
        if not hyps:
            break
    # "adding <eos> in the last position": cap-append at zero cost
    for h in hyps:
        ended.append((h["score"], h["toks"] + [EOT]))
    return max(ended, key=lambda x: x[0])


@pytest.fixture(scope="module")
def setup():
    params = init_whisper_params(jax.random.PRNGKey(5), CFG)
    rng = np.random.RandomState(11)
    mel = jnp.asarray(rng.randn(1, 24, 80).astype(np.float32))
    enc = whisper_encode(params, CFG, mel)
    ctc_w = rng.randn(CFG.n_audio_state, V).astype(np.float32) * 0.5
    ctc_logits = np.asarray(enc) @ ctc_w
    ctc_logp = jnp.asarray(jax.nn.log_softmax(jnp.asarray(ctc_logits), -1))
    lm_params = init_lm_params(jax.random.PRNGKey(9), LM_CFG)
    return params, enc, ctc_logp, lm_params


def test_composition_parity_ctc_lm(setup):
    """Dense KV-cached beam == literal ragged reference composition,
    ctc_weight 0.3 + lm_weight 0.3 + penalty 0.1, beam 3."""
    params, enc, ctc_logp, lm_params = setup
    kw = dict(ctc_weight=0.3, lm_weight=0.3, length_bonus=0.1)
    ref_score, ref_toks = None, None
    ref_score, ref_toks = (lambda t: (t[0], t[1]))(
        _ragged_oracle(params, enc[0], ctc_logp[0], lm_params,
                       k=3, pre_beam=6, max_steps=6, **kw)
    )
    tokens, lens, scores = beam_decode(
        params, CFG, enc, beam_size=3, primer=PRIMER, max_steps=6, eot=EOT,
        ctc_logp=ctc_logp, lm_params=lm_params, lm_cfg=LM_CFG,
        pre_beam=6, use_end_detect=False, **kw,
    )
    got = np.asarray(tokens)[0, : int(lens[0])].tolist()
    assert got == ref_toks, (got, ref_toks)
    np.testing.assert_allclose(float(scores[0]), ref_score, atol=2e-3)


def test_composition_parity_attention_only(setup):
    params, enc, _, _ = setup
    ref_score, ref_toks = _ragged_oracle(
        params, enc[0], jnp.zeros((12, V)), None, k=2, pre_beam=V,
        max_steps=5, ctc_weight=0.0, lm_weight=0.0, length_bonus=0.0,
    )
    tokens, lens, scores = beam_decode(
        params, CFG, enc, beam_size=2, primer=PRIMER, max_steps=5, eot=EOT,
        use_end_detect=False,
    )
    got = np.asarray(tokens)[0, : int(lens[0])].tolist()
    assert got == ref_toks, (got, ref_toks)
    np.testing.assert_allclose(float(scores[0]), ref_score, atol=2e-3)


def test_scan_loop_matches_while(setup):
    """loop='scan' (fixed trip count, the fast TPU form) must reproduce
    the while_loop results exactly — full composition, both with and
    without end detection."""
    params, enc, ctc_logp, lm_params = setup
    for use_ed in (False, True):
        outs = {}
        for loop in ("while", "scan"):
            tokens, lens, scores = beam_decode(
                params, CFG, enc, beam_size=3, primer=PRIMER, max_steps=6,
                eot=EOT, ctc_weight=0.3, lm_weight=0.3, length_bonus=0.1,
                ctc_logp=ctc_logp, lm_params=lm_params, lm_cfg=LM_CFG,
                pre_beam=6, use_end_detect=use_ed, loop=loop,
            )
            outs[loop] = (
                np.asarray(tokens)[0, : int(lens[0])].tolist(),
                float(scores[0]),
            )
        assert outs["scan"][0] == outs["while"][0], (use_ed, outs)
        np.testing.assert_allclose(
            outs["scan"][1], outs["while"][1], atol=1e-5
        )


def test_end_detect_and_live_discard():
    """Core semantics with a stub stepper: an early ending + a live path
    inflated by length bonus. With end detection the search stops and the
    running hypothesis is DISCARDED (reference breaks before the eos
    append); without it the capped live hypothesis wins."""
    v, k, eot = 5, 2, 0
    primer = (3,)
    max_steps = 12

    # step 0: eot is best (-0.5), token 1 second (-0.6);
    # later steps: token 1 near-certain, eot below every other token so it
    # never enters the top-k again — every later step is "dry".
    first = np.full((v,), -8.0, np.float32)
    first[eot], first[1] = -0.5, -0.6
    later = np.full((v,), -12.0, np.float32)
    later[1] = -1e-3
    later[eot] = -30.0

    def step_fn(cur, pos, state):
        logits = jnp.where(pos == len(primer) - 1, jnp.asarray(first),
                           jnp.asarray(later))
        return jnp.tile(logits[None], (cur.shape[0], 1)), state

    common = dict(
        step_fn=step_fn, dec_state0=jnp.zeros((1, k)), batch=1, vocab=v,
        beam_size=k, primer=primer, max_steps=max_steps, eot=eot,
        max_pos=64, length_bonus=1.0,
    )
    toks_ed, lens_ed, score_ed = composed_beam_decode(
        use_end_detect=True, **common)
    toks_no, lens_no, score_no = composed_beam_decode(
        use_end_detect=False, **common)

    # end detection: the early ending wins, short hypothesis
    assert int(lens_ed[0]) == len(primer) + 1
    assert np.asarray(toks_ed)[0, len(primer)] == eot
    lp_eot = first[eot] - np.log(np.exp(first).sum())
    np.testing.assert_allclose(float(score_ed[0]), lp_eot + 1.0, atol=1e-4)
    # without it: the bonus-inflated live path reaches the cap and wins
    assert int(lens_no[0]) == len(primer) + max_steps + 1
    assert float(score_no[0]) > float(score_ed[0])


def test_batched_rows_match_per_row_decoding(setup):
    """With end detection off, batched dense rows decode independently:
    beam_decode on a 2-row batch == two single-row calls."""
    params, enc, ctc_logp, lm_params = setup
    enc2 = jnp.concatenate([enc, enc * 0.7], axis=0)
    ctc2 = jnp.concatenate([ctc_logp, ctc_logp], axis=0)
    kw = dict(beam_size=3, primer=PRIMER, max_steps=6, eot=EOT,
              ctc_weight=0.3, lm_params=lm_params, lm_cfg=LM_CFG,
              lm_weight=0.3, pre_beam=6, use_end_detect=False)
    tb, lb, sb = beam_decode(params, CFG, enc2, ctc_logp=ctc2, **kw)
    for i in range(2):
        t1, l1, s1 = beam_decode(
            params, CFG, enc2[i : i + 1], ctc_logp=ctc2[i : i + 1], **kw
        )
        np.testing.assert_allclose(float(sb[i]), float(s1[0]), atol=2e-3)
        assert (np.asarray(tb)[i, : int(lb[i])].tolist()
                == np.asarray(t1)[0, : int(l1[0])].tolist())


def test_composition_parity_with_ngram(setup):
    """Four-scorer composition (decoder + ctc + lm + ngram) vs the ragged
    oracle extended with the same hashed ngram scorer."""
    from agacs_tpu.models.ngram import ngram_score_step, train_ngram

    params, enc, ctc_logp, lm_params = setup
    rng = np.random.RandomState(3)
    seqs = [list(rng.choice(range(5, 25), size=rng.randint(3, 8)))
            for _ in range(60)]
    ngram = train_ngram(seqs, V, order=3, sos=PRIMER[0])

    # ragged oracle with the ngram term added to `full`
    w_att, lam, mu, nu, beta = 0.7, 0.3, 0.3, 0.4, 0.1
    hyps = [{"toks": list(PRIMER), "score": 0.0,
             "ctc": ctc_prefix_init(ctc_logp[:1])}]
    ended = []
    total = len(PRIMER) + 6 + 1
    for step in range(6):
        cands = []
        for h in hyps:
            toks = jnp.asarray([h["toks"]], jnp.int32)
            logits, _ = whisper_decode(params, CFG, toks, enc[:1])
            dlp = np.asarray(jax.nn.log_softmax(
                logits[0, -1].astype(jnp.float32)))
            full = w_att * dlp
            full += mu * np.asarray(lm_score_step(lm_params, LM_CFG, toks)[0])
            buf = np.full((1, total), EOT, np.int32)
            buf[0, : len(h["toks"])] = h["toks"]
            full += nu * np.asarray(ngram_score_step(
                ngram, jnp.asarray(buf), jnp.int32(len(h["toks"]) - 1)))[0]
            ids = np.argsort(-full)[:6]
            psi, cand_state = ctc_prefix_score(
                ctc_logp[:1], h["ctc"], jnp.asarray(ids)[None])
            inc = np.asarray(psi[0]) - float(h["ctc"].score[0])
            eos_inc = float(ctc_eos_score(h["ctc"])[0]) - float(h["ctc"].score[0])
            for j, c in enumerate(ids):
                term = eos_inc if c == EOT else inc[j]
                s = h["score"] + full[c] + lam * term + beta
                cands.append((float(s), h, int(c), cand_state, j))
        cands.sort(key=lambda x: -x[0])
        new_hyps = []
        for s, h, c, cand_state, j in cands[:3]:
            if c == EOT:
                ended.append((s, h["toks"] + [EOT]))
            else:
                new_hyps.append({
                    "toks": h["toks"] + [c], "score": s,
                    "ctc": ctc_prefix_select(cand_state, jnp.asarray([j]))})
        hyps = new_hyps
        if not hyps:
            break
    for h in hyps:
        ended.append((h["score"], h["toks"] + [EOT]))
    ref_score, ref_toks = max(ended, key=lambda x: x[0])

    tokens, lens, scores = beam_decode(
        params, CFG, enc, beam_size=3, primer=PRIMER, max_steps=6, eot=EOT,
        ctc_logp=ctc_logp, ctc_weight=lam,
        lm_params=lm_params, lm_cfg=LM_CFG, lm_weight=mu,
        ngram_lm=ngram, ngram_weight=nu,
        length_bonus=beta, pre_beam=6, use_end_detect=False,
    )
    got = np.asarray(tokens)[0, : int(lens[0])].tolist()
    assert got == ref_toks, (got, ref_toks)
    np.testing.assert_allclose(float(scores[0]), ref_score, atol=3e-3)
