"""Whisper model parity vs the reference torch implementation (tiny dims)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from agacs_tpu.models.checkpoint import params_from_state_dict
from agacs_tpu.models.whisper import (
    WhisperConfig,
    init_self_kv_cache,
    init_whisper_params,
    precompute_cross_kv,
    whisper_decode,
    whisper_decode_step,
    whisper_encode,
)
from reference_oracle import make_torch_model, torch_decoder_forward

TINY = dict(
    n_mels=80, n_audio_ctx=20, n_audio_state=64, n_audio_head=4, n_audio_layer=2,
    n_vocab=100, n_text_ctx=16, n_text_state=64, n_text_head=4, n_text_layer=2,
)


def _setup(adapter=False, pe=False):
    import torch

    # reference PE gate is hardcoded to 12 heads (model.py:121)
    dims = dict(TINY, **(dict(n_audio_state=96, n_text_state=96,
                              n_audio_head=12, n_text_head=12) if pe else {}))
    model = make_torch_model(
        adapter=adapter, pe_whisper=pe,
        n_state=dims["n_audio_state"], n_head=dims["n_audio_head"],
    )
    cfg = WhisperConfig(**dims, adapter=adapter, pe_attention=pe)
    params = params_from_state_dict(model.state_dict(), cfg)

    rng = np.random.RandomState(42)
    mel = rng.randn(2, 80, 40).astype(np.float32)  # (B, n_mels, frames)
    tokens = np.array([[3, 5, 7, 2, 9], [1, 4, 6, 8, 0]], dtype=np.int64)

    with torch.no_grad():
        enc_t = model.encoder(torch.from_numpy(mel)).numpy()
    enc_j = np.asarray(whisper_encode(params, cfg, jnp.asarray(mel.transpose(0, 2, 1))))
    return model, cfg, params, mel, tokens, enc_t, enc_j


@pytest.mark.parametrize("adapter", [False, True])
def test_encoder_parity(adapter):
    *_, enc_t, enc_j = _setup(adapter=adapter)
    assert enc_j.shape == enc_t.shape
    np.testing.assert_allclose(enc_j, enc_t, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("adapter", [False, True])
def test_decoder_parity_and_lang_cols(adapter):
    import torch

    model, cfg, params, mel, tokens, enc_t, _ = _setup(adapter=adapter)
    logits_t, maps_t = torch_decoder_forward(
        model, torch.from_numpy(tokens), torch.from_numpy(enc_t)
    )

    logits_j, aux = whisper_decode(
        params, cfg, jnp.asarray(tokens), jnp.asarray(enc_t),
        src_layer=0, collect_lang_cols=True,
    )
    np.testing.assert_allclose(
        np.asarray(logits_j), logits_t.numpy(), atol=3e-5, rtol=1e-5
    )
    # language columns == reference pre-softmax maps sliced [..., 1:3],
    # including -inf causal entries
    ref_cols = maps_t.numpy()[..., 1:3]  # (L, B, h, T, 2)
    ours = np.asarray(aux["qk_cols"])
    assert ours.shape == ref_cols.shape
    mask = np.isinf(ref_cols)
    assert (np.isinf(ours) == mask).all()
    np.testing.assert_allclose(ours[~mask], ref_cols[~mask], atol=2e-5, rtol=1e-5)


def test_pe_attention_parity():
    import torch

    model, cfg, params, mel, tokens, enc_t, _ = _setup(pe=True)
    logits_t, maps_t = torch_decoder_forward(
        model, torch.from_numpy(tokens), torch.from_numpy(enc_t)
    )
    logits_j, aux = whisper_decode(
        params, cfg, jnp.asarray(tokens), jnp.asarray(enc_t),
        src_layer=0, collect_lang_cols=True,
    )
    np.testing.assert_allclose(
        np.asarray(logits_j), logits_t.numpy(), atol=3e-5, rtol=1e-5
    )
    # PE blocks return POST-softmax scores (model.py:179) — compare p_cols
    ref_cols = maps_t.numpy()[..., 1:3]
    np.testing.assert_allclose(np.asarray(aux["p_cols"]), ref_cols, atol=2e-5)


def test_decoder_only_pe_parity():
    """tmecs 'pedecoder' variant: PE attention in the DECODER only, standard
    encoder (encoder_conf.pe_whisper=false, decoder_conf.pe_whisper=true)."""
    import torch

    from reference_oracle import import_reference_whisper

    wm = import_reference_whisper()
    torch.manual_seed(0)
    dims = wm.ModelDimensions(
        n_mels=80, n_audio_ctx=20, n_audio_state=96, n_audio_head=12,
        n_audio_layer=2, n_vocab=100, n_text_ctx=16, n_text_state=96,
        n_text_head=12, n_text_layer=2,
    )
    # build encoder standard + decoder PE, like the espnet wrappers with
    # differing conf flags
    enc_model = wm.AudioEncoder(80, 20, 96, 12, 2)
    dec_model = wm.TextDecoder(100, 16, 96, 12, 2, pe_whisper=True)
    torch.nn.init.normal_(dec_model.positional_embedding, 0.0, 0.02)
    enc_model.eval(), dec_model.eval()

    sd = {}
    sd.update({f"encoder.{k}": v for k, v in enc_model.state_dict().items()})
    sd.update({f"decoder.{k}": v for k, v in dec_model.state_dict().items()})

    cfg = WhisperConfig(
        n_mels=80, n_audio_ctx=20, n_audio_state=96, n_audio_head=12,
        n_audio_layer=2, n_vocab=100, n_text_ctx=16, n_text_state=96,
        n_text_head=12, n_text_layer=2,
        pe_encoder=False, pe_decoder=True,
    )
    params = params_from_state_dict(sd, cfg)

    rng = np.random.RandomState(3)
    mel = rng.randn(1, 80, 40).astype(np.float32)
    tokens = np.array([[3, 5, 7]], dtype=np.int64)
    with torch.no_grad():
        enc_t = enc_model(torch.from_numpy(mel)).numpy()
        x = dec_model.token_embedding(torch.from_numpy(tokens)) + dec_model.positional_embedding[:3]
        for block in dec_model.blocks:
            x, _ = block(x, torch.from_numpy(enc_t), mask=dec_model.mask)
        x = dec_model.ln(x)
        logits_t = (x @ dec_model.token_embedding.weight.T).numpy()

    enc_j = np.asarray(whisper_encode(params, cfg, jnp.asarray(mel.transpose(0, 2, 1))))
    np.testing.assert_allclose(enc_j, enc_t, atol=2e-5, rtol=1e-5)
    logits_j, _ = whisper_decode(params, cfg, jnp.asarray(tokens), jnp.asarray(enc_t))
    np.testing.assert_allclose(np.asarray(logits_j), logits_t, atol=3e-5, rtol=1e-5)


@pytest.mark.parametrize("pe", [False, True])
def test_kv_cached_decode_matches_full_forward(pe):
    cfg = WhisperConfig(**TINY, pe_attention=pe)
    params = init_whisper_params(jax.random.PRNGKey(0), cfg)
    enc = jax.random.normal(jax.random.PRNGKey(1), (2, 20, 64), jnp.float32)
    tokens = jnp.array([[3, 5, 7, 2, 9], [1, 4, 6, 8, 0]], dtype=jnp.int32)

    full_logits, _ = whisper_decode(params, cfg, tokens, enc)

    cross_kv = precompute_cross_kv(params, cfg, enc)
    self_kv = init_self_kv_cache(cfg, batch=2, max_len=8)
    step_logits = []
    for pos in range(tokens.shape[1]):
        lg, self_kv = whisper_decode_step(
            params, cfg, tokens[:, pos], jnp.int32(pos), self_kv, cross_kv
        )
        step_logits.append(np.asarray(lg))
    step_logits = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(
        step_logits, np.asarray(full_logits), atol=2e-4, rtol=1e-4
    )


def test_checkpoint_roundtrip_missing_adapters_filled():
    """A base (no-PET) checkpoint loads into an adapter config with fresh
    adapter params (reference strict=False behavior)."""
    model = make_torch_model(adapter=False)
    cfg = WhisperConfig(**TINY, adapter=True)
    params = params_from_state_dict(model.state_dict(), cfg)
    assert "adapter_attn" in params["decoder"]["blocks"]
    assert params["decoder"]["blocks"]["adapter_attn"]["down"]["w"].shape == (2, 64, 16)


def test_openai_pt_checkpoint_roundtrip(tmp_path):
    """A REAL OpenAI-format .pt file (dims + model_state_dict, saved by
    torch from the reference model) imports end-to-end: dims inferred,
    weights mapped, encoder/decoder logits match the torch oracle
    (whisper/__init__.py:182-268 load_model semantics)."""
    import torch

    from agacs_tpu.models.checkpoint import load_torch_whisper

    model = make_torch_model(seed=21)
    dims = dict(
        n_mels=80, n_audio_ctx=20, n_audio_state=64, n_audio_head=4,
        n_audio_layer=2, n_vocab=100, n_text_ctx=16, n_text_state=64,
        n_text_head=4, n_text_layer=2,
    )
    pt = str(tmp_path / "tiny_oracle.pt")
    torch.save({"dims": dims, "model_state_dict": model.state_dict()}, pt)

    params, cfg = load_torch_whisper(pt)  # cfg inferred from dims
    assert cfg.n_audio_state == 64 and cfg.n_text_layer == 2

    rng = np.random.RandomState(9)
    mel = rng.randn(2, 80, 40).astype(np.float32)
    tokens = np.array([[3, 5, 7], [1, 4, 6]], dtype=np.int64)
    with torch.no_grad():
        enc_t = model.encoder(torch.from_numpy(mel))
        logits_t, _ = torch_decoder_forward(model, torch.from_numpy(tokens), enc_t)
    enc_j = whisper_encode(params, cfg, jnp.asarray(mel.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(enc_j), enc_t.numpy(),
                               atol=2e-3, rtol=2e-3)
    logits_j, _ = whisper_decode(
        params, cfg, jnp.asarray(tokens.astype(np.int32)), enc_j
    )
    np.testing.assert_allclose(np.asarray(logits_j), logits_t.numpy(),
                               atol=5e-3, rtol=5e-3)


def test_conv1d_matmul_matches_lax_conv():
    """The matmul-form stem (shifted MXU matmuls, even/odd phases for
    stride 2) must match lax.conv exactly, incl. odd lengths."""
    from agacs_tpu.models.whisper import conv1d

    rng = np.random.RandomState(0)
    for t in (10, 11, 31):
        for stride in (1, 2):
            x = jnp.asarray(rng.randn(2, t, 5).astype(np.float32))
            p = {"w": jnp.asarray(rng.randn(3, 5, 7).astype(np.float32)),
                 "b": jnp.asarray(rng.randn(7).astype(np.float32))}
            ref = jax.lax.conv_general_dilated(
                x, p["w"], window_strides=(stride,), padding=((1, 1),),
                dimension_numbers=("NWC", "WIO", "NWC"),
            ) + p["b"]
            got = conv1d(x, p, stride)
            assert got.shape == ref.shape
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("unroll", [True, "encoder", "decoder"])
def test_unroll_layers_matches_scan(unroll):
    """cfg.unroll_layers (bool or per-stack str) is bit-identical to scan."""
    import dataclasses

    cfg = WhisperConfig(**TINY, adapter=True)
    params = init_whisper_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(7)
    mel = jnp.asarray(rng.randn(2, 40, 80).astype(np.float32))
    tokens = jnp.asarray([[3, 5, 7, 2, 9], [1, 4, 6, 8, 0]], dtype=jnp.int32)

    ucfg = dataclasses.replace(cfg, unroll_layers=unroll)
    enc = whisper_encode(params, cfg, mel)
    enc_u = whisper_encode(params, ucfg, mel)
    np.testing.assert_array_equal(np.asarray(enc), np.asarray(enc_u))

    logits, aux = whisper_decode(params, cfg, tokens, enc,
                                 collect_lang_cols=True)
    logits_u, aux_u = whisper_decode(params, ucfg, tokens, enc,
                                     collect_lang_cols=True)
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(logits_u))
    np.testing.assert_array_equal(np.asarray(aux["qk_cols"]),
                                  np.asarray(aux_u["qk_cols"]))
