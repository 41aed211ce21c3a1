"""Method-level test: optimizing the CS loss actually steers decoder
self-attention scores at the language columns toward the target pattern
(the paper's mechanism), and head masks gate which heads move. Layers 0-1
carry the reference's early-layer pattern (zeros at the language columns,
espnet_model.py:479-487), so the language pattern is tested on layer 2
and the zero pattern on layer 1."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from agacs_tpu.adapt import attention_target_labels, cs_attention_loss, targets_from_labels
from agacs_tpu.models.whisper import WhisperConfig, init_whisper_params, whisper_decode
from agacs_tpu.text import WhisperTokenizer, WhisperTokenIdConverter

CFG = WhisperConfig(
    n_mels=80, n_audio_ctx=16, n_audio_state=64, n_audio_head=4, n_audio_layer=2,
    n_vocab=51865, n_text_ctx=32, n_text_state=64, n_text_head=4, n_text_layer=3,
)


def _setup():
    tok = WhisperTokenizer()
    conv = WhisperTokenIdConverter(tok)
    ids = conv.tokens2ids(tok.text2tokens("我们 go"))
    ys_in = np.asarray([[50258] + ids], np.int64)
    labels = jnp.asarray(attention_target_labels(ys_in, tok))
    tokens = jnp.asarray(ys_in.astype(np.int32))
    params = init_whisper_params(jax.random.PRNGKey(0), CFG)
    enc = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 64))
    return tokens, labels, params, enc


def _optimize(params, tokens, labels, enc, head_mask, steps=200):
    def loss_fn(p):
        _, aux = whisper_decode(p, CFG, tokens, enc, collect_lang_cols=True)
        return cs_attention_loss(aux["qk_cols"], labels, head_mask, 0.6)

    tx = optax.adam(5e-3)
    opt_state = tx.init(params)
    l0 = float(loss_fn(params))
    step = jax.jit(
        lambda p, o: (lambda g: (optax.apply_updates(p, tx.update(g, o, p)[0]),
                                 tx.update(g, o, p)[1]))(jax.grad(loss_fn)(p))
    )
    for _ in range(steps):
        params, opt_state = step(params, opt_state)
    return params, l0, float(loss_fn(params))


def _col_errs(params, tokens, labels, enc):
    _, aux = whisper_decode(params, CFG, tokens, enc, collect_lang_cols=True)
    targets, valid = targets_from_labels(labels, 0.6)
    cols = np.asarray(aux["qk_cols"])  # (L, 1, h, T, 2)
    tgt = np.asarray(targets)[0]
    v = np.asarray(valid)[0].astype(bool)

    def err(layer, target):
        c = cols[layer, 0]  # (h, T, 2)
        m = np.isfinite(c) & v[None, :, None]
        return float(np.abs(np.where(m, c - target, 0.0)).sum() / m.sum())

    return lambda layer: err(layer, tgt[None]), lambda layer: err(layer, 0.0)


def test_cs_loss_steers_language_pattern_layer2():
    tokens, labels, params, enc = _setup()
    # steer only heads of layer 2 (a "language pattern" layer)
    head_mask = jnp.zeros((3, 4)).at[2].set(1.0)
    params, l0, l1 = _optimize(params, tokens, labels, enc, head_mask)
    assert l1 < 0.2 * l0, (l0, l1)
    lang_err, _ = _col_errs(params, tokens, labels, enc)
    assert lang_err(2) < 0.1
    assert lang_err(0) > 3 * lang_err(2)  # unmasked layer untouched


def test_cs_loss_steers_early_layer_to_zero():
    tokens, labels, params, enc = _setup()
    # steer only heads of layer 1: target is ZERO at the language columns
    head_mask = jnp.zeros((3, 4)).at[1].set(1.0)
    params, l0, l1 = _optimize(params, tokens, labels, enc, head_mask)
    assert l1 < 0.2 * l0, (l0, l1)
    _, zero_err = _col_errs(params, tokens, labels, enc)
    assert zero_err(1) < 0.1
    assert zero_err(0) > 3 * zero_err(1)
