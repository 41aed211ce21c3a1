"""Kernel-path vs XLA-path parity at the DECODE-STEP level.

The fused Pallas cache-attention kernel (ops/decode_attn.py) is gated by
AGACS_DECODE_KERNEL and off-TPU runs interpreted, so these tests force
both branches of every integration site on CPU and compare outputs —
pinning the per-site scaling conventions (q pre-scale, PE gate, side
ladder) that the kernel-only unit tests cannot see. f32 compute dtype
keeps both paths' accumulation comparable.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from agacs_tpu.models.whisper import (
    SideNetworkConfig,
    WhisperConfig,
    init_self_kv_cache,
    init_whisper_params,
    precompute_cross_kv,
    whisper_decode_step,
)

B, T_ENC = 2, 8


def _whisper_cfg(**kw):
    return WhisperConfig(
        n_mels=80, n_audio_ctx=T_ENC, n_audio_state=64, n_audio_head=4,
        n_audio_layer=2, n_vocab=128, n_text_ctx=32, n_text_state=64,
        n_text_head=4, n_text_layer=2, **kw,
    )


def _run_whisper_steps(
    cfg, mode, monkeypatch, beam=1, ancestry=False, max_len=16
):
    monkeypatch.setenv("AGACS_DECODE_KERNEL", mode)
    params = init_whisper_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    n = B * beam
    enc = jnp.asarray(rng.randn(B, T_ENC, 64).astype(np.float32) * 0.3)
    if beam > 1 and cfg.side_network is None:
        cross = precompute_cross_kv(params, cfg, enc)
        groups = beam
    else:
        cross = precompute_cross_kv(params, cfg, jnp.repeat(enc, beam, 0))
        groups = 1
    kv = init_self_kv_cache(cfg, batch=n, max_len=max_len, ancestry=ancestry)
    toks = jnp.asarray(rng.randint(0, 128, (n, 3)), jnp.int32)
    outs = []
    for p in range(3):
        logits, kv = whisper_decode_step(
            params, cfg, toks[:, p], jnp.int32(p), kv, cross,
            beam_groups=groups,
        )
        outs.append(logits)
        if ancestry and "anc" in kv:
            # shuffle the ancestry map like a beam reorder would
            perm = np.asarray(
                [g * beam + (np.arange(beam) + 1) % beam for g in range(B)]
            ).reshape(-1)
            kv["anc"] = kv["anc"][:, perm]
    return jnp.stack(outs)


@pytest.mark.parametrize(
    "variant", ["base", "pe", "beam_anc", "pe_beam_anc", "side"]
)
def test_whisper_step_kernel_matches_xla(variant, monkeypatch):
    kw, beam, anc = {}, 1, False
    if "pe" in variant:
        kw["pe_attention"] = True
    if "side" in variant:
        kw["side_network"] = SideNetworkConfig(n_dim=32, n_head=4, layers=(0, 1))
    if "beam_anc" in variant:
        beam, anc = 3, True
    cfg = _whisper_cfg(**kw)
    a = _run_whisper_steps(cfg, "xla", monkeypatch, beam=beam, ancestry=anc)
    b = _run_whisper_steps(cfg, "pallas", monkeypatch, beam=beam, ancestry=anc)
    np.testing.assert_allclose(a, b, atol=2e-4, rtol=2e-4)


def test_whisper_step_chunked_kernel_matches_xla(monkeypatch):
    """The PE 3-cache shape that overflows the single-block VMEM budget
    must dispatch through the time-chunked kernel, not fall back."""
    from agacs_tpu.ops import decode_attn as da

    cfg = _whisper_cfg(pe_attention=True)
    beam, max_len, d = 3, 32, 64
    # single block (3 caches x beam x 32 x 64) overflows; tc=16 fits
    budget = 2 * 3 * beam * 16 * d * 2
    monkeypatch.setattr(da, "_VMEM_BUDGET", budget)
    assert not da.kernel_fits(3, beam, max_len, d)
    assert da.pick_chunk(3, beam, max_len, d) == 16
    a = _run_whisper_steps(
        cfg, "xla", monkeypatch, beam=beam, ancestry=True, max_len=max_len
    )
    b = _run_whisper_steps(
        cfg, "pallas", monkeypatch, beam=beam, ancestry=True, max_len=max_len
    )
    np.testing.assert_allclose(a, b, atol=2e-4, rtol=2e-4)


def test_conformer_step_kernel_matches_xla(monkeypatch):
    from agacs_tpu.models.conformer import (
        TransformerDecoderConfig,
        init_decoder_kv_cache,
        init_transformer_decoder_params,
        precompute_decoder_cross_kv,
        transformer_decode_step,
    )

    cfg = TransformerDecoderConfig(
        vocab_size=50, attention_heads=4, linear_units=64, num_blocks=2,
        d_model=32,
    )
    params = init_transformer_decoder_params(jax.random.PRNGKey(0), cfg)
    mem = jax.random.normal(jax.random.PRNGKey(1), (B, 9, 32))
    mlens = jnp.array([9, 7])
    rng = np.random.RandomState(0)
    toks = jnp.asarray(rng.randint(0, 50, (B, 3)), jnp.int32)

    def run(mode):
        monkeypatch.setenv("AGACS_DECODE_KERNEL", mode)
        cross = precompute_decoder_cross_kv(params, cfg, mem)
        kv = init_decoder_kv_cache(cfg, B, 16)
        outs = []
        for p in range(3):
            lg, kv = transformer_decode_step(
                params, cfg, toks[:, p], jnp.int32(p), kv, cross, mlens
            )
            outs.append(lg)
        return jnp.stack(outs)

    np.testing.assert_allclose(run("xla"), run("pallas"), atol=2e-4, rtol=2e-4)


def test_lm_step_kernel_matches_xla(monkeypatch):
    from agacs_tpu.models.lm import (
        TransformerLMConfig,
        init_lm_kv_cache,
        init_lm_params,
        lm_score_step_cached,
    )

    cfg = TransformerLMConfig(
        vocab_size=50, d_model=32, attention_heads=4, linear_units=64,
        num_blocks=2,
    )
    params = init_lm_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    toks = jnp.asarray(rng.randint(0, 50, (B, 3)), jnp.int32)

    def run(mode):
        monkeypatch.setenv("AGACS_DECODE_KERNEL", mode)
        kv = init_lm_kv_cache(cfg, B, 16)
        outs = []
        for p in range(3):
            lp, kv = lm_score_step_cached(
                params, cfg, toks[:, p], jnp.int32(p), kv
            )
            outs.append(lp)
        return jnp.stack(outs)

    np.testing.assert_allclose(run("xla"), run("pallas"), atol=2e-4, rtol=2e-4)


def test_int8_cross_kv_quantization():
    """precompute_cross_kv(cross_kv_int8) emits int8 packed buffers +
    per-channel scales whose dequantization matches the bf16 layout."""
    import dataclasses

    cfg = _whisper_cfg(cross_kv_int8=True)
    params = init_whisper_params(jax.random.PRNGKey(0), cfg)
    enc = jnp.asarray(
        np.random.RandomState(0).randn(B, T_ENC, 64).astype(np.float32) * 0.3
    )
    cross = precompute_cross_kv(params, cfg, enc)
    cfg_f = dataclasses.replace(cfg, cross_kv_int8=False)
    cross_f = precompute_cross_kv(params, cfg_f, enc)
    assert cross["k_packed"][0].dtype == jnp.int8
    assert cross["v_packed"][0].dtype == jnp.int8
    assert "k_scale" in cross and cross["k_scale"][0].shape == (64,)
    for l in range(cfg.n_text_layer):
        for name in ("k", "v"):
            deq = (
                cross[f"{name}_packed"][l].astype(np.float32)
                * np.asarray(cross[f"{name}_scale"][l])[None, None, :]
            )
            ref = np.asarray(cross_f[f"{name}_packed"][l], np.float32)
            t = ref.shape[1]  # int8 pads time further (32-align)
            scale = np.abs(ref).max() or 1.0
            assert np.abs(deq[:, :t] - ref).max() / scale < 1e-2
            # int8 pad region must dequantize to exactly 0 (masked anyway)
            assert np.all(deq[:, t:] == 0.0)


@pytest.mark.parametrize("beam", [1, 3])
def test_whisper_step_int8_cross_matches_bf16(beam, monkeypatch):
    """Forced-kernel decode steps with int8 cross-KV track the unquantized
    kernel path within quantization error, for both the ungrouped
    (greedy) and shared-cache grouped (beam) cross-attention sites."""
    anc = beam > 1
    a = _run_whisper_steps(
        _whisper_cfg(), "pallas", monkeypatch, beam=beam, ancestry=anc
    )
    b = _run_whisper_steps(
        _whisper_cfg(cross_kv_int8=True), "pallas", monkeypatch,
        beam=beam, ancestry=anc,
    )
    # logits are f32; int8 per-channel quantization of cross K/V perturbs
    # them by O(1/127) per channel
    np.testing.assert_allclose(a, b, atol=0.05, rtol=0.05)
    assert np.mean(np.argmax(np.asarray(a), -1) == np.argmax(np.asarray(b), -1)) == 1.0


def test_whisper_step_shared_kernel_site(monkeypatch):
    """The grouped cross-attention must actually route through the
    shared-cache kernel (not silently fall back) when viable."""
    import agacs_tpu.ops.decode_attn as da

    calls = []
    orig = da.decode_shared_cache_attention

    def spy(*a, **k):
        calls.append(a[0].shape)
        return orig(*a, **k)

    monkeypatch.setattr(da, "decode_shared_cache_attention", spy)
    _run_whisper_steps(
        _whisper_cfg(), "pallas", monkeypatch, beam=3, ancestry=True
    )
    # 2 layers x 3 steps = 6 grouped cross-attention calls
    assert len(calls) == 6 and calls[0] == (B * 3, 64)
