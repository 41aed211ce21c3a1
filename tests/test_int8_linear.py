"""int8 frozen-trunk (W8A8) tests: quantizer exactness, custom-VJP dgrad,
tree surgery, training-step behavior, checkpoint round-trip.

The reference has no int8 path (torch fp16 AMP only, trainer.py:41-50);
this is a TPU-native optimization: the PET freeze presets
(abs_task.py:1163-1222) never update the trunk, so its projections run on
the MXU int8 path (ops/int8_linear.py, 2x bf16 peak on v5e).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from agacs_tpu.models.asr_model import ASRModelConfig, init_asr_params
from agacs_tpu.ops import int8_linear as i8
from agacs_tpu.train.checkpoint import load_pytree_like, save_pytree
from agacs_tpu.train.freeze import trainable_mask
from agacs_tpu.train.optim import OptimConfig
from agacs_tpu.train.trainer import (
    build_tx,
    create_train_state,
    dequantize_params,
    make_eval_step,
    make_train_step,
    quantize_frozen_linears,
)

from tests.test_trainer import TINY_WHISPER, _batch, _cfg, tok  # noqa: F401


def test_quantize_weight_roundtrip_on_grid():
    # weights already on the int8 grid round-trip exactly
    rng = np.random.RandomState(0)
    q = rng.randint(-127, 128, size=(16, 8)).astype(np.float32)
    w = q * 0.03
    w[0, :] = 127 * 0.03  # pin the scale per channel
    wq, ws = i8.quantize_weight(jnp.asarray(w))
    assert wq.dtype == jnp.int8 and ws.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(i8.dequantize_weight(wq, ws)), w, rtol=1e-6
    )


def test_quantize_weight_stacked_axes():
    # stacked (L, in, out): scale is per (L, out)
    w = np.zeros((3, 4, 2), np.float32)
    w[0, :, 0] = [1, -2, 3, -4]
    w[2, :, 1] = [100, 0, 0, 0]
    wq, ws = i8.quantize_weight(jnp.asarray(w))
    assert wq.shape == (3, 4, 2) and ws.shape == (3, 2)
    deq = np.asarray(i8.dequantize_weight(wq, ws))
    np.testing.assert_allclose(deq, w, atol=4 / 127 + 1e-6)


def test_int8_matmul_exact_on_grid():
    # x rows and w on exact int8 grids -> bit-exact vs the float reference
    rng = np.random.RandomState(1)
    x = (rng.randint(-127, 128, size=(5, 16)) * 0.5).astype(np.float32)
    x[:, 0] = 127 * 0.5
    w = (rng.randint(-127, 128, size=(16, 8)) * 0.25).astype(np.float32)
    w[0, :] = 127 * 0.25
    wq, ws = i8.quantize_weight(jnp.asarray(w))
    y = i8.int8_matmul(jnp.asarray(x), wq, ws)
    np.testing.assert_allclose(np.asarray(y), x @ w, rtol=1e-5)


def test_int8_matmul_tolerance_random():
    rng = np.random.RandomState(2)
    x = rng.randn(64, 128).astype(np.float32)
    w = (rng.randn(128, 96) * 0.05).astype(np.float32)
    wq, ws = i8.quantize_weight(jnp.asarray(w))
    y = np.asarray(i8.int8_matmul(jnp.asarray(x), wq, ws), np.float32)
    ref = x @ np.asarray(i8.dequantize_weight(wq, ws))
    # activation-quantization error only (weights compared post-quant):
    # per-row 8-bit -> ~0.5% relative on gaussian data
    err = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    assert err < 0.02, err


@pytest.mark.parametrize("bwd_int8", [True, False])
def test_int8_matmul_dx(bwd_int8, monkeypatch):
    monkeypatch.setattr(i8, "BWD_INT8", bwd_int8)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(6, 32).astype(np.float32))
    w = jnp.asarray((rng.randn(32, 24) * 0.1).astype(np.float32))
    wq, ws = i8.quantize_weight(w)
    co = jnp.asarray(rng.randn(6, 24).astype(np.float32))

    dx = jax.grad(lambda x_: jnp.vdot(i8.int8_matmul(x_, wq, ws), co))(x)
    ref = co @ np.asarray(i8.dequantize_weight(wq, ws)).T
    err = np.linalg.norm(np.asarray(dx) - ref) / np.linalg.norm(ref)
    # int8 mode: row-quantized dy; bf16 mode: bf16 matmul rounding
    assert err < (0.02 if bwd_int8 else 0.01), err


def test_int8_matmul_under_value_and_grad_with_frozen_operands():
    # wq/ws appear as non-differentiated closure constants (the trainer's
    # partitioned loss) — the float0/zero cotangents must not leak
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(4, 16).astype(np.float32))
    wq, ws = i8.quantize_weight(jnp.asarray(rng.randn(16, 8).astype(np.float32)))

    def loss(x_):
        return jnp.sum(i8.int8_matmul(x_, wq, ws) ** 2)

    val, g = jax.value_and_grad(loss)(x)
    assert np.isfinite(float(val)) and np.all(np.isfinite(np.asarray(g)))


def _quantized_setup(freeze="adapter"):
    cfg = _cfg()
    params = init_asr_params(jax.random.PRNGKey(0), cfg)
    mask0 = trainable_mask(params, freeze)
    qparams = quantize_frozen_linears(params, mask0)
    tx, mask = build_tx(qparams, OptimConfig(warmup_steps=4), freeze_preset=freeze)
    return cfg, params, qparams, tx, mask


def test_quantize_frozen_linears_structure():
    _, params, qparams, _, mask = _quantized_setup()
    enc_attn = qparams["encoder"]["blocks"]["attn"]
    # stacked block linears quantized: (L, in, out) int8 + (L, out) f32
    assert set(enc_attn["query"]) == {"w_q", "w_s", "b"}
    assert enc_attn["query"]["w_q"].dtype == jnp.int8
    assert enc_attn["query"]["w_q"].shape == (2, 64, 64)
    assert enc_attn["query"]["w_s"].shape == (2, 64)
    assert set(enc_attn["key"]) == {"w_q", "w_s"}  # key has no bias
    # adapters (trainable) untouched
    adp = qparams["decoder"]["blocks"]["adapter_attn"]["down"]
    assert "w" in adp and adp["w"].dtype == jnp.float32
    # conv stem + embeddings untouched
    assert "w" in qparams["encoder"]["conv1"]
    assert qparams["decoder"]["token_emb"].dtype == jnp.float32
    # mask rebuilt on the new tree marks w_q/w_s frozen
    assert mask["encoder"]["blocks"]["attn"]["query"]["w_q"] is False
    # dequantize_params restores the plain structure
    deq = dequantize_params(qparams)
    assert "w" in deq["encoder"]["blocks"]["attn"]["query"]
    np.testing.assert_allclose(
        np.asarray(deq["encoder"]["blocks"]["attn"]["query"]["w"]),
        np.asarray(params["encoder"]["blocks"]["attn"]["query"]["w"]),
        atol=0.05,
    )


def test_int8_forward_close_to_float(tok):  # noqa: F811
    cfg, params, qparams, _, _ = _quantized_setup()
    batch = _batch(tok)
    ev = make_eval_step(cfg)
    loss_f = float(ev(params, batch)["loss"])
    loss_q = float(ev(qparams, batch)["loss"])
    assert np.isfinite(loss_q)
    assert abs(loss_q - loss_f) / abs(loss_f) < 0.05, (loss_f, loss_q)


def test_train_step_int8_trunk(tok):  # noqa: F811
    cfg, _, qparams, tx, mask = _quantized_setup()
    state = create_train_state(qparams, tx, jax.random.PRNGKey(1))
    step = make_train_step(cfg, tx, trainable_mask=mask, donate=False)

    wq_before = np.asarray(qparams["encoder"]["blocks"]["attn"]["query"]["w_q"])
    adp_before = np.asarray(
        qparams["decoder"]["blocks"]["adapter_attn"]["down"]["w"]
    )
    batch = _batch(tok)
    losses = []
    for _ in range(3):
        state, stats = step(state, batch)
        losses.append(float(stats["loss"]))
    assert all(np.isfinite(losses)) and losses[-1] < losses[0]
    # int8 trunk bit-identical, adapters moved
    np.testing.assert_array_equal(
        np.asarray(state.params["encoder"]["blocks"]["attn"]["query"]["w_q"]),
        wq_before,
    )
    assert not np.allclose(
        np.asarray(state.params["decoder"]["blocks"]["adapter_attn"]["down"]["w"]),
        adp_before,
    )


def test_train_step_int8_accum_grad(tok):  # noqa: F811
    cfg, _, qparams, tx, mask = _quantized_setup()
    cfg = dataclasses.replace(cfg, use_specaug=False)
    state = create_train_state(qparams, tx, jax.random.PRNGKey(1))
    step = make_train_step(cfg, tx, accum_grad=2, trainable_mask=mask,
                           donate=False)
    _, stats = step(state, _batch(tok, b=8, accum=2))
    assert np.isfinite(float(stats["loss"]))


def test_checkpoint_roundtrip_int8(tmp_path):
    _, _, qparams, _, _ = _quantized_setup()
    path = str(tmp_path / "q.params.npz")
    save_pytree(path, qparams)
    loaded = load_pytree_like(path, qparams)
    ref = qparams["encoder"]["blocks"]["attn"]["query"]
    got = loaded["encoder"]["blocks"]["attn"]["query"]
    assert got["w_q"].dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(got["w_q"]), np.asarray(ref["w_q"]))
    np.testing.assert_array_equal(np.asarray(got["w_s"]), np.asarray(ref["w_s"]))


def test_train_step_int8_under_remat(tok):  # noqa: F811
    # dots_nb remat + encoder unroll + int8 trunk compile and run together
    wcfg = dataclasses.replace(TINY_WHISPER, remat="dots_nb", unroll_layers="encoder")
    cfg = ASRModelConfig(whisper=wcfg, cs_weight=0.01, use_specaug=False)
    params = init_asr_params(jax.random.PRNGKey(0), cfg)
    mask0 = trainable_mask(params, "adapter")
    qparams = quantize_frozen_linears(params, mask0)
    tx, mask = build_tx(qparams, OptimConfig(warmup_steps=4), freeze_preset="adapter")
    state = create_train_state(qparams, tx, jax.random.PRNGKey(1))
    step = make_train_step(cfg, tx, trainable_mask=mask, donate=False)
    _, stats = step(state, _batch(tok))
    assert np.isfinite(float(stats["loss"]))


def test_fused_qkv_linears_match_separate():
    """fused_linears = one matmul on concatenated weights; must equal the
    per-projection path bit-for-bit on the int8 path (same row scale —
    it depends only on x) and to bf16 tolerance on the dense path."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from agacs_tpu.models.whisper import fused_linears, linear
    from agacs_tpu.ops.int8_linear import quantize_weight

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(6, 40, 256).astype(np.float32) * 0.3,
                    jnp.bfloat16)

    def mk(bias):
        p = {"w": jnp.asarray(rng.randn(256, 256).astype(np.float32) * 0.05)}
        if bias:
            p["b"] = jnp.asarray(rng.randn(256).astype(np.float32) * 0.1)
        return p

    import os

    ps = [mk(True), mk(False), mk(True)]  # query, key (no bias), value
    os.environ["AGACS_FUSE_QKV_BF16"] = "1"  # dense fusion is opt-in now
    try:
        dense_f = fused_linears(x, ps)
    finally:
        os.environ.pop("AGACS_FUSE_QKV_BF16", None)
    dense_s = [linear(x, p) for p in ps]
    for a, r in zip(dense_f, dense_s):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(r, np.float32), atol=2e-2
        )

    qs = []
    for p in ps:
        q, s = quantize_weight(p["w"])
        qp = {"w_q": q, "w_s": s}
        if "b" in p:
            qp["b"] = p["b"]
        qs.append(qp)
    int8_f = fused_linears(x, qs)
    int8_s = [linear(x, p) for p in qs]
    for a, r in zip(int8_f, int8_s):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(r, np.float32))


def test_int8_mlp_megakernel_matches_unfused():
    """Fused MLP kernel (interpret mode) vs the int8_linear composition:
    fwd values and dx within quantization tolerance (the kernel keeps the
    hidden layer in f32 where the unfused path round-trips bf16)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from agacs_tpu.ops import int8_mlp
    from agacs_tpu.ops.int8_linear import quantize_weight

    import os

    os.environ["AGACS_INT8_MLP"] = "interpret"
    try:
        rng = np.random.RandomState(0)
        d, h, n = 256, 1024, 300
        x = jnp.asarray(rng.randn(n, d).astype(np.float32) * 0.5,
                        jnp.bfloat16)
        p1 = dict(zip(("w_q", "w_s"), quantize_weight(
            jnp.asarray(rng.randn(d, h).astype(np.float32) * 0.05))))
        p1["b"] = jnp.asarray(rng.randn(h).astype(np.float32) * 0.1)
        p2 = dict(zip(("w_q", "w_s"), quantize_weight(
            jnp.asarray(rng.randn(h, d).astype(np.float32) * 0.05))))
        p2["b"] = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)

        ref = int8_mlp._ref(x, p1, p2)
        got = int8_mlp.int8_mlp(x, p1, p2)
        r = np.asarray(ref, np.float32)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), r, atol=3e-2 * np.abs(r).max()
        )
        dy = jnp.asarray(rng.randn(n, d).astype(np.float32) * 0.3,
                         jnp.bfloat16)

        def loss(fn, x_):
            return jnp.sum(fn(x_).astype(jnp.float32)
                           * dy.astype(jnp.float32))

        gr = jax.grad(lambda x_: loss(
            lambda a: int8_mlp._ref(a, p1, p2), x_))(x)
        gg = jax.grad(lambda x_: loss(
            lambda a: int8_mlp.int8_mlp(a, p1, p2), x_))(x)
        gr = np.asarray(gr, np.float32)
        np.testing.assert_allclose(
            np.asarray(gg, np.float32), gr, atol=3e-2 * np.abs(gr).max()
        )
    finally:
        os.environ.pop("AGACS_INT8_MLP", None)


def test_w8a16_matmul_matches_dequant_xla():
    """Serving W8A16 kernel (interpret) == x @ dequantized weights, and
    quantize_for_serving produces both embedding layouts consistently."""
    import os

    import numpy as np

    import jax
    import jax.numpy as jnp

    from agacs_tpu.ops import int8_serve
    from agacs_tpu.ops.int8_linear import dequantize_weight, quantize_weight

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(5, 256).astype(np.float32) * 0.4, jnp.bfloat16)
    w_q, w_s = quantize_weight(
        jnp.asarray(rng.randn(256, 1024).astype(np.float32) * 0.05)
    )
    got = int8_serve.w8a16_matmul(x, w_q, w_s, True)
    want = jnp.dot(x, dequantize_weight(w_q, w_s, jnp.bfloat16))
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2
    )

    # quantize_for_serving: row-major and column-major embeddings agree
    from agacs_tpu.models.whisper import init_whisper_params, make_config

    cfg = make_config("tiny", compute_dtype=jnp.bfloat16)
    params = init_whisper_params(jax.random.PRNGKey(0), cfg)
    qp = int8_serve.quantize_for_serving(params)
    dec = qp["decoder"]
    v = cfg.n_vocab
    np.testing.assert_array_equal(
        np.asarray(dec["logits_w_q"])[:, :v], np.asarray(dec["token_emb_q"]).T
    )
    assert dec["logits_w_q"].shape[1] % 512 == 0
    # every trunk linear got quantized
    assert "w_q" in qp["decoder"]["blocks"]["attn"]["query"]
    assert "w_q" in qp["encoder"]["blocks"]["mlp"]["fc1"]
