"""Decoding tests: greedy vs teacher-forced consistency, beam search
properties, Speech2Text end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from agacs_tpu.decode import beam_decode, greedy_decode
from agacs_tpu.decode.speech2text import Speech2Text
from agacs_tpu.models.asr_model import ASRModelConfig, init_asr_params
from agacs_tpu.models.whisper import WhisperConfig, init_whisper_params, whisper_decode

TINY = WhisperConfig(
    n_mels=80, n_audio_ctx=32, n_audio_state=64, n_audio_head=4, n_audio_layer=2,
    n_vocab=51865, n_text_ctx=64, n_text_state=64, n_text_head=4, n_text_layer=2,
)
PRIMER = (50258, 50260, 50259, 50359, 50363)


@pytest.fixture(scope="module")
def setup():
    params = init_whisper_params(jax.random.PRNGKey(0), TINY)
    enc = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 64), jnp.float32)
    return params, enc


def test_greedy_matches_stepwise_teacher_forcing(setup):
    """Greedy output must be the argmax continuation of its own prefix
    under the full (non-cached) forward — cache correctness end-to-end."""
    params, enc = setup
    tokens, lens = greedy_decode(params, TINY, enc, primer=PRIMER, max_steps=10)
    tokens = np.asarray(tokens)

    for i in range(2):
        row = tokens[i : i + 1]
        logits, _ = whisper_decode(params, TINY, jnp.asarray(row), enc[i : i + 1])
        preds = np.asarray(jnp.argmax(logits, axis=-1))[0]
        n = int(lens[i])
        for pos in range(len(PRIMER) - 1, n - 1):
            assert preds[pos] == tokens[i, pos + 1], (i, pos)


def test_greedy_eot_padding(setup):
    params, enc = setup
    tokens, lens = greedy_decode(params, TINY, enc, primer=PRIMER, max_steps=10)
    tokens = np.asarray(tokens)
    for i in range(2):
        n = int(lens[i])
        if n < tokens.shape[1]:
            assert (tokens[i, n:] == 50257).all()


def test_beam1_equals_greedy(setup):
    params, enc = setup
    g_tokens, g_lens = greedy_decode(params, TINY, enc, primer=PRIMER, max_steps=8)
    b_tokens, b_lens, _ = beam_decode(
        params, TINY, enc, beam_size=1, primer=PRIMER, max_steps=8
    )
    eot = 50257
    for i in range(2):
        gn, bn = int(g_lens[i]), int(b_lens[i])
        g = np.asarray(g_tokens)[i, :gn]
        bt = np.asarray(b_tokens)[i, :bn]
        if g[-1] == eot:  # natural ending: identical hypotheses
            np.testing.assert_array_equal(g, bt)
        else:  # step cap: the beam appends <eot> at zero cost
            # ("adding <eos> in the last position", beam_search.py:463-468)
            assert bn == gn + 1 and bt[-1] == eot
            np.testing.assert_array_equal(g, bt[:-1])


def test_beam_score_at_least_greedy(setup):
    """A wider beam must find a hypothesis scoring >= the greedy one."""
    params, enc = setup
    _, _, s1 = beam_decode(params, TINY, enc, beam_size=1, primer=PRIMER, max_steps=8)
    _, _, s4 = beam_decode(params, TINY, enc, beam_size=4, primer=PRIMER, max_steps=8)
    assert (np.asarray(s4) >= np.asarray(s1) - 1e-4).all()


def test_speech2text_end_to_end():
    cfg = ASRModelConfig(whisper=TINY, use_specaug=False)
    params = init_asr_params(jax.random.PRNGKey(0), cfg)
    s2t = Speech2Text(params, cfg, beam_size=1, max_steps=6)
    audio = np.random.RandomState(0).randn(2, 64 * 160).astype(np.float32) * 0.1
    results = s2t(audio)
    assert len(results) == 2
    for r in results:
        assert r.tokens[:5] == list(PRIMER)
        assert isinstance(r.text, str)
    assert s2t.rtf > 0 and s2t.inverse_rtf > 0


def test_beam_with_pe_attention():
    """Composed beam over the PE dual-QK decoder (second key cache in the
    step path) produces finite, consistent hypotheses."""
    import jax

    from agacs_tpu.models.whisper import WhisperConfig, init_whisper_params, whisper_encode

    cfg = WhisperConfig(
        n_mels=80, n_audio_ctx=10, n_audio_state=96, n_audio_head=12,
        n_audio_layer=1, n_vocab=60, n_text_ctx=16, n_text_state=96,
        n_text_head=12, n_text_layer=1, pe_attention=True,
    )
    params = init_whisper_params(jax.random.PRNGKey(2), cfg)
    enc = whisper_encode(
        params, cfg, jax.random.normal(jax.random.PRNGKey(3), (2, 20, 80))
    )
    tokens, lens, scores = beam_decode(
        params, cfg, enc, beam_size=3, primer=(3, 4), max_steps=5, eot=2,
    )
    assert np.isfinite(np.asarray(scores)).all()
    toks = np.asarray(tokens)
    assert (toks[:, :2] == [3, 4]).all()
    # beam1 == greedy on the PE path too
    g_tokens, g_lens = greedy_decode(
        params, cfg, enc, primer=(3, 4), max_steps=5, eot=2
    )
    b_tokens, b_lens, _ = beam_decode(
        params, cfg, enc, beam_size=1, primer=(3, 4), max_steps=5, eot=2,
    )
    for i in range(2):
        gn = int(g_lens[i])
        np.testing.assert_array_equal(
            np.asarray(g_tokens)[i, : gn - 1 if np.asarray(g_tokens)[i, gn-1] != 2 else gn],
            np.asarray(b_tokens)[i, : gn - 1 if np.asarray(g_tokens)[i, gn-1] != 2 else gn],
        )


def test_beam_ancestry_matches_gather(setup):
    """ancestry=True (unreordered caches + index map resolved as a one-hot
    mix inside attention) must reproduce the physical-gather beam exactly:
    identical tokens/lengths, scores to f32 reduction-order tolerance."""
    params, enc = setup
    for loop in ("while", "scan"):
        t0, l0, s0 = beam_decode(
            params, TINY, enc, beam_size=4, primer=PRIMER, max_steps=12,
            loop=loop, ancestry=False,
        )
        t1, l1, s1 = beam_decode(
            params, TINY, enc, beam_size=4, primer=PRIMER, max_steps=12,
            loop=loop, ancestry=True,
        )
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
        np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-4)


def test_beam_ancestry_matches_gather_pe():
    """Ancestry parity on the PE dual-QK path (second key cache gets the
    same index-map treatment)."""
    import dataclasses

    cfg = dataclasses.replace(TINY, pe_attention=True, pe_decoder=True)
    params = init_whisper_params(jax.random.PRNGKey(7), cfg)
    enc = jax.random.normal(jax.random.PRNGKey(8), (2, 32, 64), jnp.float32)
    t0, l0, s0 = beam_decode(
        params, cfg, enc, beam_size=3, primer=PRIMER, max_steps=10, ancestry=False
    )
    t1, l1, s1 = beam_decode(
        params, cfg, enc, beam_size=3, primer=PRIMER, max_steps=10, ancestry=True
    )
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-4)


def test_beam_with_side_network():
    """Composed beam over the ladder side-network decoder (side KV caches
    + precomputed side cross K/V in the step path)."""
    import jax

    from agacs_tpu.models.whisper import (
        SideNetworkConfig, WhisperConfig, init_whisper_params, whisper_encode,
    )

    cfg = WhisperConfig(
        n_mels=80, n_audio_ctx=10, n_audio_state=64, n_audio_head=4,
        n_audio_layer=2, n_vocab=60, n_text_ctx=16, n_text_state=64,
        n_text_head=4, n_text_layer=2,
        side_network=SideNetworkConfig(n_dim=32, n_head=4, layers=(0, 1)),
    )
    params = init_whisper_params(jax.random.PRNGKey(4), cfg)
    enc = whisper_encode(
        params, cfg, jax.random.normal(jax.random.PRNGKey(5), (2, 20, 80))
    )
    tokens, lens, scores = beam_decode(
        params, cfg, enc, beam_size=2, primer=(3, 4), max_steps=5, eot=2,
    )
    assert np.isfinite(np.asarray(scores)).all()
    assert (np.asarray(lens) >= 3).all()


def test_greedy_scan_loop_matches_while(setup):
    """loop='scan' (fixed trip count, masked updates) must produce exactly
    the while_loop greedy's tokens and lengths."""
    params, enc = setup
    t_w, l_w = greedy_decode(params, TINY, enc, primer=PRIMER, max_steps=10,
                             loop="while")
    t_s, l_s = greedy_decode(params, TINY, enc, primer=PRIMER, max_steps=10,
                             loop="scan")
    np.testing.assert_array_equal(np.asarray(l_w), np.asarray(l_s))
    np.testing.assert_array_equal(np.asarray(t_w), np.asarray(t_s))


def test_decode_dp_sharded_matches_single():
    """Serving scales over the device mesh: greedy and beam decode with
    the batch dp-sharded across 8 devices must produce exactly the
    single-device tokens (GSPMD propagates the data sharding through the
    KV caches and the per-step top-k; reference scope: inference is
    single-GPU only — asr_inference.py — so this is TPU-native surplus)."""
    from agacs_tpu.parallel import make_mesh, shard_batch, shard_params

    params = init_whisper_params(jax.random.PRNGKey(0), TINY)
    enc = jax.random.normal(jax.random.PRNGKey(7), (8, 32, 64), jnp.float32)

    tg, lg = greedy_decode(params, TINY, enc, primer=PRIMER, max_steps=8)
    tb, lb, sb = beam_decode(
        params, TINY, enc, beam_size=3, primer=PRIMER, max_steps=8
    )

    mesh = make_mesh(n_data=8)
    params_s = shard_params(mesh, params)
    enc_s = shard_batch(mesh, enc)
    tg2, lg2 = greedy_decode(params_s, TINY, enc_s, primer=PRIMER, max_steps=8)
    tb2, lb2, sb2 = beam_decode(
        params_s, TINY, enc_s, beam_size=3, primer=PRIMER, max_steps=8
    )
    np.testing.assert_array_equal(np.asarray(tg), np.asarray(tg2))
    np.testing.assert_array_equal(np.asarray(lg), np.asarray(lg2))
    np.testing.assert_array_equal(np.asarray(tb), np.asarray(tb2))
    np.testing.assert_array_equal(np.asarray(lb), np.asarray(lb2))
    np.testing.assert_allclose(np.asarray(sb), np.asarray(sb2), atol=1e-5)


def test_decode_dp_sharded_kernel_path(monkeypatch):
    """Same dp-sharded-vs-single exactness with the Pallas decode kernel
    FORCED (interpret off-TPU): exercises the kernel's
    custom_partitioning rule — on a real multi-chip mesh GSPMD would
    otherwise replicate the custom call and all-gather the KV caches
    every step."""
    from agacs_tpu.parallel import make_mesh, shard_batch, shard_params

    monkeypatch.setenv("AGACS_DECODE_KERNEL", "pallas")
    params = init_whisper_params(jax.random.PRNGKey(0), TINY)
    enc = jax.random.normal(jax.random.PRNGKey(7), (8, 32, 64), jnp.float32)

    tg, lg = greedy_decode(params, TINY, enc, primer=PRIMER, max_steps=6)
    tb, lb, sb = beam_decode(
        params, TINY, enc, beam_size=3, primer=PRIMER, max_steps=6
    )

    mesh = make_mesh(n_data=8)
    params_s = shard_params(mesh, params)
    enc_s = shard_batch(mesh, enc)
    tg2, lg2 = greedy_decode(params_s, TINY, enc_s, primer=PRIMER,
                             max_steps=6)
    tb2, lb2, sb2 = beam_decode(
        params_s, TINY, enc_s, beam_size=3, primer=PRIMER, max_steps=6
    )
    np.testing.assert_array_equal(np.asarray(tg), np.asarray(tg2))
    np.testing.assert_array_equal(np.asarray(lg), np.asarray(lg2))
    np.testing.assert_array_equal(np.asarray(tb), np.asarray(tb2))
    np.testing.assert_array_equal(np.asarray(lb), np.asarray(lb2))
    np.testing.assert_allclose(np.asarray(sb), np.asarray(sb2), atol=1e-5)


def test_decode_dp_sharded_int8_cross(monkeypatch):
    """dp-sharded-vs-single exactness with int8 cross-KV + the forced
    kernel: exercises the quantized custom_partitioning rules (scales
    replicated, caches group-sharded) for both the shared grouped and
    ungrouped cross-attention sites."""
    import dataclasses

    from agacs_tpu.parallel import make_mesh, shard_batch, shard_params

    monkeypatch.setenv("AGACS_DECODE_KERNEL", "pallas")
    cfg = dataclasses.replace(TINY, cross_kv_int8=True)
    params = init_whisper_params(jax.random.PRNGKey(0), cfg)
    enc = jax.random.normal(jax.random.PRNGKey(7), (8, 32, 64), jnp.float32)

    tg, lg = greedy_decode(params, cfg, enc, primer=PRIMER, max_steps=6)
    tb, lb, sb = beam_decode(
        params, cfg, enc, beam_size=3, primer=PRIMER, max_steps=6
    )

    mesh = make_mesh(n_data=8)
    params_s = shard_params(mesh, params)
    enc_s = shard_batch(mesh, enc)
    tg2, lg2 = greedy_decode(params_s, cfg, enc_s, primer=PRIMER, max_steps=6)
    tb2, lb2, sb2 = beam_decode(
        params_s, cfg, enc_s, beam_size=3, primer=PRIMER, max_steps=6
    )
    np.testing.assert_array_equal(np.asarray(tg), np.asarray(tg2))
    np.testing.assert_array_equal(np.asarray(lg), np.asarray(lg2))
    np.testing.assert_array_equal(np.asarray(tb), np.asarray(tb2))
    np.testing.assert_array_equal(np.asarray(lb), np.asarray(lb2))
    np.testing.assert_allclose(np.asarray(sb), np.asarray(sb2), atol=1e-5)


def test_decode_token_exact_with_padded_token_emb():
    """Serving with a tp-padded embedding (parallel/mesh.pad_vocab_rows):
    greedy and beam decode must be token-exact vs the unpadded model —
    the pad logit columns are sliced before any argmax/top-k
    (models/whisper.py)."""
    import copy

    import numpy as np

    import jax
    import jax.numpy as jnp

    from agacs_tpu.decode.beam import beam_decode
    from agacs_tpu.decode.greedy import greedy_decode
    from agacs_tpu.models.whisper import (
        WhisperConfig,
        init_whisper_params,
        whisper_encode,
    )
    from agacs_tpu.parallel.mesh import pad_vocab_rows

    cfg = WhisperConfig(
        n_mels=80, n_audio_ctx=20, n_audio_state=64, n_audio_head=4,
        n_audio_layer=2, n_vocab=51865, n_text_ctx=16, n_text_state=64,
        n_text_head=4, n_text_layer=2,
    )
    params = init_whisper_params(jax.random.PRNGKey(0), cfg)
    padded = copy.copy(params)
    padded["decoder"] = dict(params["decoder"])
    padded["decoder"]["token_emb"] = jnp.asarray(
        pad_vocab_rows(params["decoder"]["token_emb"], 8)
    )
    assert padded["decoder"]["token_emb"].shape[0] == 51872

    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(3, 40, 80).astype(np.float32) * 0.1)
    enc = whisper_encode(params, cfg, mel)

    t1, l1 = greedy_decode(params, cfg, enc, max_steps=8)[:2]
    t2, l2 = greedy_decode(padded, cfg, enc, max_steps=8)[:2]
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    b1 = beam_decode(params, cfg, enc, beam_size=3, max_steps=6)
    b2 = beam_decode(padded, cfg, enc, beam_size=3, max_steps=6)
    np.testing.assert_array_equal(np.asarray(b1[0]), np.asarray(b2[0]))
    np.testing.assert_array_equal(np.asarray(b1[1]), np.asarray(b2[1]))
