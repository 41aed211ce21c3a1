"""Ladder side-network variant: forward/backward, sidenetwork freeze
preset, checkpoint import of side params from a reference-shaped state
dict."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from agacs_tpu.models.asr_model import ASRModelConfig, forward, init_asr_params
from agacs_tpu.models.whisper import (
    SideNetworkConfig,
    WhisperConfig,
    init_whisper_params,
    whisper_decode,
    whisper_encode,
)
from agacs_tpu.train.freeze import count_trainable, trainable_mask
from agacs_tpu.train.optim import OptimConfig
from agacs_tpu.train.trainer import build_tx, create_train_state, make_train_step

SIDE = SideNetworkConfig(n_dim=32, n_head=4, layers=(0, 1))
CFG = WhisperConfig(
    n_mels=80, n_audio_ctx=16, n_audio_state=64, n_audio_head=4, n_audio_layer=2,
    n_vocab=51865, n_text_ctx=32, n_text_state=64, n_text_head=4, n_text_layer=2,
    side_network=SIDE,
)


def test_side_network_forward_shapes():
    params = init_whisper_params(jax.random.PRNGKey(0), CFG)
    assert "encoder_side" in params and "decoder_side" in params
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 80))
    enc = whisper_encode(params, CFG, mel)
    assert enc.shape == (2, 16, 64)
    toks = jnp.array([[1, 2, 3], [4, 5, 6]], jnp.int32)
    logits, _ = whisper_decode(params, CFG, toks, enc)
    assert logits.shape == (2, 3, 51865)
    assert bool(jnp.isfinite(logits).all())


def test_side_network_training_with_freeze():
    cfg = ASRModelConfig(whisper=CFG, use_specaug=False)
    params = init_asr_params(jax.random.PRNGKey(0), cfg)
    tx, mask = build_tx(params, OptimConfig(warmup_steps=2),
                        freeze_preset="sidenetwork")
    n_train, n_total = count_trainable(params, mask)
    assert 0 < n_train < n_total
    # trunk frozen, side nets trainable
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    for path, m in flat:
        name = ".".join(str(getattr(k, "key", k)) for k in path)
        if name.startswith(("encoder_side", "decoder_side")):
            assert m, name
        elif name.startswith(("encoder.", "decoder.")):
            assert not m, name

    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    step = make_train_step(cfg, tx, trainable_mask=mask)
    rng = np.random.RandomState(0)
    batch = {
        "speech": jnp.asarray(rng.randn(2, 160 * 32).astype(np.float32) * 0.1),
        "speech_lengths": jnp.full((2,), 160 * 32, jnp.int32),
        "text": jnp.asarray([[5, 6, 7, -1], [8, 9, -1, -1]], jnp.int32),
    }
    trunk_before = np.asarray(params["decoder"]["token_emb"])
    side_before = np.asarray(params["decoder_side"]["downsample_input"]["w"])
    losses = []
    for _ in range(3):
        state, stats = step(state, batch)
        losses.append(float(stats["loss"]))
    assert all(np.isfinite(losses)) and losses[-1] < losses[0]
    np.testing.assert_array_equal(
        np.asarray(state.params["decoder"]["token_emb"]), trunk_before
    )
    assert not np.allclose(
        np.asarray(state.params["decoder_side"]["downsample_input"]["w"]),
        side_before,
    )


def test_side_network_cached_decode_matches_full():
    from agacs_tpu.models.whisper import (
        init_self_kv_cache,
        precompute_cross_kv,
        whisper_decode_step,
    )

    params = init_whisper_params(jax.random.PRNGKey(0), CFG)
    enc = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 64), jnp.float32)
    tokens = jnp.array([[3, 5, 7, 2], [1, 4, 6, 8]], dtype=jnp.int32)

    full_logits, _ = whisper_decode(params, CFG, tokens, enc)

    cross_kv = precompute_cross_kv(params, CFG, enc)
    assert "side_k" in cross_kv
    self_kv = init_self_kv_cache(CFG, batch=2, max_len=8)
    assert "side_k" in self_kv
    outs = []
    for pos in range(tokens.shape[1]):
        lg, self_kv = whisper_decode_step(
            params, CFG, tokens[:, pos], jnp.int32(pos), self_kv, cross_kv
        )
        outs.append(np.asarray(lg))
    np.testing.assert_allclose(
        np.stack(outs, 1), np.asarray(full_logits), atol=2e-4, rtol=1e-4
    )


def test_side_network_checkpoint_import():
    """Side params import from a reference-shaped torch state dict
    (encoder_sidenetwork.* / decoder_sidenetwork.* names)."""
    import torch

    from agacs_tpu.models.checkpoint import params_from_state_dict
    from reference_oracle import import_reference_whisper, tiny_dims

    wm = import_reference_whisper()
    torch.manual_seed(0)
    model = wm.Whisper(
        tiny_dims(wm, n_vocab=51865), side_network=True,
        side_network_conf={"n_dim": 32, "n_head": 4, "layers": [0, 1]},
    )
    torch.nn.init.normal_(model.decoder.positional_embedding, 0.0, 0.02)
    sd = model.state_dict()
    cfg = dataclasses.replace(
        CFG,
        n_audio_ctx=20, n_text_ctx=16,
    )
    params = params_from_state_dict(sd, cfg)
    # side weights actually came from the checkpoint (not random template)
    ref_w = sd["encoder_sidenetwork.downsample_input.weight"].numpy().T
    np.testing.assert_allclose(
        np.asarray(params["encoder_side"]["downsample_input"]["w"]), ref_w
    )
    ref_g = sd["decoder_sidenetwork.sigmoid_gate_intermediate_layers.0"].numpy()
    np.testing.assert_allclose(
        np.asarray(params["decoder_side"]["gates"][0]), ref_g.reshape(())
    )


def test_side_network_forward_matches_reference_oracle():
    """END-TO-END torch-oracle parity for the ladder side network: the
    literal reference forward (whisper_encoder.py:172-205 side loop +
    gate_output fusion; whisper_decoder.py:126-163 side loop, upsample
    REPLACING the trunk head — note the reference decoder ignores the
    side_encoder_output argument and recomputes
    downsample_encoder_input(hs_pad) at :129) vs whisper_encode /
    whisper_decode with imported weights."""
    import torch
    import torch.nn.functional as F

    from agacs_tpu.models.checkpoint import params_from_state_dict
    from reference_oracle import import_reference_whisper, tiny_dims

    wm = import_reference_whisper()
    torch.manual_seed(3)
    side_layers = [0, 1]
    model = wm.Whisper(
        tiny_dims(wm, n_vocab=51865), side_network=True,
        side_network_conf={"n_dim": 32, "n_head": 4, "layers": side_layers},
    ).eval()
    torch.nn.init.normal_(model.decoder.positional_embedding, 0.0, 0.02)

    rng = np.random.RandomState(0)
    mel = torch.from_numpy(rng.randn(2, 80, 40).astype(np.float32) * 0.5)
    tokens = torch.from_numpy(
        np.array([[50258, 5, 9, 11], [50258, 7, 3, 2]], np.int64)
    )

    with torch.no_grad():
        enc, dec = model.encoder, model.decoder
        es, ds = model.encoder_sidenetwork, model.decoder_sidenetwork
        # --- encoder (whisper_encoder.py:137-205, eval: no dropout)
        x = F.gelu(enc.conv1(mel))
        x = F.gelu(enc.conv2(x)).permute(0, 2, 1)
        x = (x + enc.positional_embedding[: x.size(1)]).to(x.dtype)
        xd = es.downsample_input(x)
        sb = 0
        for i in range(len(enc.blocks)):
            x, _ = enc.blocks[i](x)
            if i in side_layers:
                inter = es.downsample_intermediate_layers[sb](x)
                g = torch.sigmoid(es.sigmoid_gate_intermediate_layers[sb])
                xd = (1.0 - g) * inter + g * xd
                xd, _ = es.blocks[sb](xd)
                sb += 1
        x = enc.ln_post(x)
        xd = es.ln_post(es.upsample_output(xd))
        g = torch.sigmoid(es.sigmoid_gate_output)
        enc_t = (1.0 - g) * x + g * xd

        # --- decoder (whisper_decoder.py:117-165, whisper_cs maps)
        t = dec.token_embedding(tokens) + dec.positional_embedding[: tokens.size(1)]
        t = t.to(enc_t.dtype)
        td = ds.downsample_input(t)
        side_mem = ds.downsample_encoder_input(enc_t)
        maps = []
        sb = 0
        for i in range(len(dec.blocks)):
            t, att = dec.blocks[i](t, enc_t, mask=dec.mask)
            if i in side_layers:
                inter = ds.downsample_intermediate_layers[sb](t)
                g = torch.sigmoid(ds.sigmoid_gate_intermediate_layers[sb])
                td = (1.0 - g) * inter + g * td
                td, _ = ds.blocks[sb](td, side_mem, mask=ds.mask)
                sb += 1
            maps.append(att)
        t = dec.ln(t)  # computed then REPLACED by the side head (:160-163)
        t = ds.ln(ds.upsample_output(td))
        logits_t = (t @ dec.token_embedding.weight.T).float()

    cfg = dataclasses.replace(
        CFG, n_audio_ctx=20, n_text_ctx=16,
        side_network=SideNetworkConfig(n_dim=32, n_head=4,
                                       layers=tuple(side_layers)),
    )
    params = params_from_state_dict(model.state_dict(), cfg)
    from agacs_tpu.models.whisper import whisper_decode, whisper_encode

    enc_j = whisper_encode(params, cfg, jnp.asarray(mel.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(
        np.asarray(enc_j), enc_t.numpy(), atol=2e-4, rtol=2e-4
    )

    logits_j, aux = whisper_decode(
        params, cfg, jnp.asarray(tokens.numpy().astype(np.int32)), enc_j,
        collect_lang_cols=True,
    )
    np.testing.assert_allclose(
        np.asarray(logits_j), logits_t.numpy(), atol=3e-3, rtol=1e-3
    )
    # the CS-loss columns come from the TRUNK self-attention maps
    qk_ref = torch.stack(maps).numpy()[..., 1:3]
    np.testing.assert_allclose(
        np.asarray(aux["qk_cols"]), qk_ref, atol=2e-3, rtol=1e-3
    )
