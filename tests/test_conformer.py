"""Conformer track tests: shapes, masking invariance, hybrid training step."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from agacs_tpu.models.conformer import (
    ConformerConfig,
    TransformerDecoderConfig,
    _rel_shift,
    conformer_encode,
    init_conformer_params,
    init_transformer_decoder_params,
    rel_positional_encoding,
    transformer_decode,
)
from agacs_tpu.models.conformer_asr import (
    ConformerASRConfig,
    forward,
    init_conformer_asr_params,
)
from agacs_tpu.ops.frontend_default import DefaultFrontendConfig, default_frontend
from agacs_tpu.train.optim import OptimConfig
from agacs_tpu.train.trainer import build_tx, create_train_state, make_train_step

SMALL_ENC = ConformerConfig(
    input_size=80, output_size=64, attention_heads=4, linear_units=128, num_blocks=2
)
SMALL_DEC = TransformerDecoderConfig(
    vocab_size=51865, attention_heads=4, linear_units=128, num_blocks=2, d_model=64
)


def test_default_frontend_shapes():
    audio = jnp.asarray(np.random.RandomState(0).randn(2, 16000).astype(np.float32))
    feats, olens = default_frontend(audio, jnp.array([16000, 8000]))
    assert feats.shape == (2, 16000 // 128 + 1, 80)
    assert olens.tolist() == [126, 63]
    # padded frames zeroed + mean-normalized valid region
    assert float(jnp.abs(feats[1, 80:]).max()) == 0.0
    valid_mean = feats[1, :63].mean()
    assert abs(float(valid_mean)) < 1e-4  # utterance MVN


def test_rel_shift_semantics():
    """After the shift, out[q, k] must equal in[q, T-1 + (k - q)] —
    the (k-q) relative-position lookup."""
    t = 5
    x = np.zeros((1, 1, t, 2 * t - 1), np.float32)
    for q in range(t):
        for p in range(2 * t - 1):
            x[0, 0, q, p] = 100 * q + p
    out = np.asarray(_rel_shift(jnp.asarray(x)))
    for q in range(t):
        for k in range(t):
            assert out[0, 0, q, k] == 100 * q + (t - 1 + k - q)


def test_rel_pe_center():
    pe = rel_positional_encoding(4, 8)
    assert pe.shape == (7, 8)
    # center row = position 0 -> sin(0)=0, cos(0)=1
    np.testing.assert_allclose(pe[3, 0::2], 0.0, atol=1e-6)
    np.testing.assert_allclose(pe[3, 1::2], 1.0, atol=1e-6)


def test_conformer_encoder_shapes_and_padding_invariance():
    params = init_conformer_params(jax.random.PRNGKey(0), SMALL_ENC)
    rng = np.random.RandomState(0)
    feats = rng.randn(1, 40, 80).astype(np.float32)
    ilens = jnp.array([40])
    out1, olens1 = conformer_encode(params, SMALL_ENC, jnp.asarray(feats), ilens)
    assert olens1.tolist() == [((40 - 1) // 2 - 1) // 2]

    # appending garbage padding must not change the valid outputs
    feats_pad = np.concatenate([feats, rng.randn(1, 16, 80).astype(np.float32)], 1)
    out2, olens2 = conformer_encode(
        params, SMALL_ENC, jnp.asarray(feats_pad), ilens
    )
    n = int(olens1[0])
    np.testing.assert_allclose(
        np.asarray(out1)[0, :n], np.asarray(out2)[0, :n], atol=2e-5
    )


def test_transformer_decoder_causality():
    params = init_transformer_decoder_params(jax.random.PRNGKey(0), SMALL_DEC)
    mem = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 64))
    mlens = jnp.array([7])
    toks = jnp.array([[50258, 5, 9, 12]])
    full = transformer_decode(params, SMALL_DEC, toks, mem, mlens)
    # changing a future token must not affect earlier logits
    toks2 = toks.at[0, 3].set(999)
    full2 = transformer_decode(params, SMALL_DEC, toks2, mem, mlens)
    np.testing.assert_allclose(
        np.asarray(full)[0, :3], np.asarray(full2)[0, :3], atol=1e-5
    )


def test_transformer_decoder_cached_step_matches_full():
    from agacs_tpu.models.conformer import (
        init_decoder_kv_cache,
        precompute_decoder_cross_kv,
        transformer_decode_step,
    )

    params = init_transformer_decoder_params(jax.random.PRNGKey(0), SMALL_DEC)
    mem = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 64))
    mlens = jnp.array([7, 5])
    toks = jnp.array([[50258, 5, 9, 12], [50258, 8, 3, 2]], dtype=jnp.int32)

    full = transformer_decode(params, SMALL_DEC, toks, mem, mlens)

    cross = precompute_decoder_cross_kv(params, SMALL_DEC, mem)
    kv = init_decoder_kv_cache(SMALL_DEC, 2, 8)
    outs = []
    for pos in range(4):
        lg, kv = transformer_decode_step(
            params, SMALL_DEC, toks[:, pos], jnp.int32(pos), kv, cross, mlens
        )
        outs.append(np.asarray(lg))
    np.testing.assert_allclose(
        np.stack(outs, 1), np.asarray(full), atol=2e-4, rtol=1e-4
    )


def test_interctc():
    """Intermediate CTC (espnet_model.py:597-640 + interctc_layer_idx):
    per-layer aux CTC losses mix into the CTC branch."""
    cfg = ConformerASRConfig(
        encoder=SMALL_ENC, decoder=SMALL_DEC, ctc_weight=0.3,
        interctc_weight=0.5, interctc_layers=(1,), use_specaug=False,
    )
    params = init_conformer_asr_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    batch = {
        "speech": jnp.asarray(rng.randn(2, 8000).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray([8000, 8000], jnp.int32),
        "text": jnp.asarray([[5, 6, 7, -1], [8, 9, -1, -1]], jnp.int32),
    }
    loss, stats = forward(params, cfg, batch, train=False, rng=None)
    assert np.isfinite(float(loss))
    assert "loss_interctc_layer1" in stats
    assert np.isfinite(float(stats["loss_interctc_layer1"]))
    # gradient reaches the shared head through the intermediate tap
    g = jax.grad(lambda p: forward(p, cfg, batch, train=False, rng=None)[0])(params)
    assert float(jnp.abs(g["ctc"]["w"]).sum()) > 0


def test_global_mvn_path(tmp_path):
    """normalize: global_mvn with a collect_stats file normalizes features
    with corpus stats carried in params['mvn']."""
    import dataclasses

    from agacs_tpu.models.conformer_asr import encode as c_encode
    from agacs_tpu.ops.frontend_default import DefaultFrontendConfig

    stats = str(tmp_path / "feats_stats.npz")
    mean = np.full((80,), 2.0, np.float32)
    std = np.full((80,), 4.0, np.float32)
    np.savez(stats, mean=mean, std=std, count=np.asarray(100))

    cfg = ConformerASRConfig(
        encoder=SMALL_ENC, decoder=SMALL_DEC, use_specaug=False,
        frontend=DefaultFrontendConfig(normalize="global_mvn"),
        mvn_stats_path=stats,
    )
    params = init_conformer_asr_params(jax.random.PRNGKey(0), cfg)
    np.testing.assert_array_equal(np.asarray(params["mvn"]["mean"]), mean)

    speech = jnp.asarray(np.random.RandomState(0).randn(1, 16000).astype(np.float32))
    lens = jnp.array([16000])
    out1, _ = c_encode(params, cfg, speech, lens)
    # identity stats give a different encoding than corpus stats
    params2 = dict(params)
    params2["mvn"] = {"mean": jnp.zeros(80), "std": jnp.ones(80)}
    out2, _ = c_encode(params2, cfg, speech, lens)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_hybrid_train_step_decreases_loss():
    cfg = ConformerASRConfig(
        encoder=SMALL_ENC, decoder=SMALL_DEC, ctc_weight=0.3, use_specaug=False
    )
    params = init_conformer_asr_params(jax.random.PRNGKey(0), cfg)

    rng = np.random.RandomState(0)
    b = 4
    batch = {
        "speech": jnp.asarray(rng.randn(b, 16000).astype(np.float32) * 0.1),
        "speech_lengths": jnp.full((b,), 16000, jnp.int32),
        "text": jnp.asarray(
            np.concatenate(
                [rng.randint(100, 5000, (b, 6)), np.full((b, 2), -1)], axis=1
            ).astype(np.int32)
        ),
    }

    tx, _ = build_tx(params, OptimConfig(lr=1e-3, warmup_steps=4, scheduler="warmuplr"))
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    step = make_train_step(cfg, tx, loss_fn=forward)
    losses = []
    for _ in range(4):
        state, stats = step(state, batch)
        losses.append(float(stats["loss"]))
    assert all(np.isfinite(losses))
    assert "loss_ctc" in stats
    assert losses[-1] < losses[0]


def test_conformer_train_step_dp_sharded():
    """Conformer hybrid CTC/attention family under a dp-sharded mesh
    (GSPMD gradient reductions; reference DDP trainer.py:229-243) —
    same coverage as the whisper and transducer families."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from agacs_tpu.models.conformer import ConformerConfig, TransformerDecoderConfig
    from agacs_tpu.models.conformer_asr import (
        ConformerASRConfig,
        forward,
        init_conformer_asr_params,
    )
    from agacs_tpu.ops.frontend_default import DefaultFrontendConfig
    from agacs_tpu.parallel import make_mesh, shard_batch, shard_params
    from agacs_tpu.train.optim import OptimConfig
    from agacs_tpu.train.trainer import (
        build_tx,
        create_train_state,
        make_train_step,
    )

    cfg = ConformerASRConfig(
        encoder=ConformerConfig(
            input_size=20, output_size=32, attention_heads=2, linear_units=48,
            num_blocks=2, cnn_module_kernel=7,
        ),
        decoder=TransformerDecoderConfig(
            vocab_size=60, attention_heads=2, linear_units=48, num_blocks=2,
            d_model=32,
        ),
        frontend=DefaultFrontendConfig(n_mels=20, n_fft=128, hop_length=64),
        ctc_weight=0.3,
        use_specaug=False,
        sos=58, eos=59,  # inside the tiny 60-token vocab
    )
    params = init_conformer_asr_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(n_data=8)
    params = shard_params(mesh, params)
    tx, _ = build_tx(params, OptimConfig(warmup_steps=4))
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    step = make_train_step(cfg, tx, loss_fn=forward)

    rng = np.random.RandomState(0)
    batch = shard_batch(mesh, {
        "speech": jnp.asarray(rng.randn(8, 3200).astype(np.float32) * 0.1),
        "speech_lengths": jnp.full((8,), 3200, jnp.int32),
        "text": jnp.asarray(rng.randint(1, 57, (8, 5)), jnp.int32),
    })
    losses = []
    for _ in range(3):
        state, stats = step(state, batch)
        losses.append(float(stats["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


# ---------------------------------------------------------------------------
# conv_norm="batch": exact espnet ConvolutionModule / BatchNorm1d parity
# ---------------------------------------------------------------------------


def _torch_conv_module(d, k):
    import sys

    import torch

    sys.path.insert(0, "/root/reference/espnet")
    from espnet.nets.pytorch_backend.conformer.convolution import (
        ConvolutionModule,
    )

    torch.manual_seed(0)
    return ConvolutionModule(d, k, activation=torch.nn.SiLU())


def _params_from_torch_conv(m):
    import numpy as np

    return {
        "pw1": {
            "w": jnp.asarray(m.pointwise_conv1.weight.detach().numpy()[:, :, 0].T),
            "b": jnp.asarray(m.pointwise_conv1.bias.detach().numpy()),
        },
        "dw": jnp.asarray(
            np.transpose(m.depthwise_conv.weight.detach().numpy(), (2, 1, 0))
        ),
        "dw_b": jnp.asarray(m.depthwise_conv.bias.detach().numpy()),
        "norm": {
            "w": jnp.asarray(m.norm.weight.detach().numpy()),
            "b": jnp.asarray(m.norm.bias.detach().numpy()),
        },
        "running_mean": jnp.asarray(m.norm.running_mean.detach().numpy()),
        "running_var": jnp.asarray(m.norm.running_var.detach().numpy()),
        "pw2": {
            "w": jnp.asarray(m.pointwise_conv2.weight.detach().numpy()[:, :, 0].T),
            "b": jnp.asarray(m.pointwise_conv2.bias.detach().numpy()),
        },
    }


@pytest.mark.parametrize("mode", ["train", "eval"])
def test_conv_module_batchnorm_torch_parity(mode):
    """conv_norm='batch' == espnet ConvolutionModule with BatchNorm1d,
    bit-for-bit semantics: biased batch stats over all (B, T) positions
    in train (incl. padding — the reference's own quirk), running buffers
    at eval (`espnet/nets/pytorch_backend/conformer/convolution.py`)."""
    import torch

    from agacs_tpu.models.conformer import _conv_module

    d, k = 16, 7
    m = _torch_conv_module(d, k)
    with torch.no_grad():
        m.norm.running_mean.normal_(0.0, 0.5)
        m.norm.running_var.uniform_(0.5, 2.0)
    p = _params_from_torch_conv(m)

    rng = np.random.RandomState(1)
    x = rng.randn(3, 11, d).astype(np.float32)
    m.train(mode == "train")
    with torch.no_grad():
        want = m(torch.from_numpy(x)).numpy()

    valid = jnp.ones((3, 11), bool)
    got, stats = _conv_module(
        p, jnp.asarray(x), valid, k, conv_norm="batch",
        train=(mode == "train"),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)
    if mode == "train":
        # reported stats are the batch stats torch would EMA into buffers:
        # recompute the post-depthwise activations' mean to cross-check
        assert stats[0].shape == (d,) and stats[1].shape == (d,)
        assert float(jnp.max(stats[1])) > 0.0


def test_conformer_batchnorm_train_and_calibrate():
    """End-to-end: conv_norm='batch' trains, buffers stay out of the
    optimizer, and calibration writes batch stats for a sane eval."""
    import dataclasses

    from agacs_tpu.models.conformer import apply_bn_stats
    from agacs_tpu.models.conformer_asr import bn_calibration_stats
    from agacs_tpu.train.freeze import trainable_mask

    enc = dataclasses.replace(SMALL_ENC, conv_norm="batch")
    cfg = ConformerASRConfig(
        encoder=enc,
        decoder=SMALL_DEC,
        ctc_weight=0.3,
    )
    params = init_conformer_asr_params(jax.random.PRNGKey(0), cfg)
    assert params["encoder"]["blocks"]["conv"]["running_mean"].shape == (2, 64)

    mask = trainable_mask(params, None)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    buf_mask = [v for kp, v in flat if "running_" in str(kp)]
    assert buf_mask and not any(buf_mask)

    rng = np.random.RandomState(0)
    batch = {
        "speech": jnp.asarray(rng.randn(2, 16000).astype(np.float32)),
        "speech_lengths": jnp.asarray([16000, 12000]),
        "text": jnp.asarray(rng.randint(4, 100, (2, 6)).astype(np.int32)),
    }
    loss, stats = forward(params, cfg, batch, train=True,
                          rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))

    m, v = bn_calibration_stats(
        params, cfg, batch["speech"], batch["speech_lengths"]
    )
    assert m.shape == (2, 64) and v.shape == (2, 64)
    assert float(jnp.max(v)) > 0.0
    params["encoder"] = apply_bn_stats(params["encoder"], m, v)
    np.testing.assert_allclose(
        np.asarray(params["encoder"]["blocks"]["conv"]["running_mean"]),
        np.asarray(m),
    )
    loss_e, _ = forward(params, cfg, batch, train=False, rng=None)
    assert np.isfinite(float(loss_e))


def test_conformer_unroll_matches_scan():
    """unroll_layers=True replays the exact scan semantics (incl. the
    per-layer dropout rng chain and interCTC taps)."""
    import dataclasses

    from agacs_tpu.models.conformer import conformer_encode

    cfg = ConformerASRConfig(
        encoder=SMALL_ENC, decoder=SMALL_DEC, ctc_weight=0.0,
        use_specaug=False,
    ).encoder
    cfgu = dataclasses.replace(cfg, unroll_layers=True)
    params = {"": None}
    from agacs_tpu.models.conformer import init_conformer_params

    params = init_conformer_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 40, cfg.input_size).astype(np.float32))
    ilens = jnp.asarray([40, 28], jnp.int32)

    # eval path
    o1, l1 = conformer_encode(params, cfg, feats, ilens)
    o2, l2 = conformer_encode(params, cfgu, feats, ilens)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)

    # train path (dropout rng chain must match bit-for-bit)
    key = jax.random.PRNGKey(7)
    o1, _ = conformer_encode(params, cfg, feats, ilens, rng=key)
    o2, _ = conformer_encode(params, cfgu, feats, ilens, rng=key)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)

    # interCTC taps
    _, _, i1 = conformer_encode(params, cfg, feats, ilens,
                                interctc_layers=(1, 2))
    _, _, i2 = conformer_encode(params, cfgu, feats, ilens,
                                interctc_layers=(1, 2))
    for (a_i, a_h), (b_i, b_h) in zip(i1, i2):
        assert a_i == b_i
        np.testing.assert_allclose(np.asarray(a_h), np.asarray(b_h), atol=1e-5)
