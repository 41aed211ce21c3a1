"""Method-level test: optimizing the CS loss actually steers decoder
self-attention scores at the language columns toward the target pattern
(the paper's mechanism), and head masks gate which heads move."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from agacs_tpu.adapt import attention_target_labels, cs_attention_loss, targets_from_labels
from agacs_tpu.adapt.cs_loss import LANG_PAD
from agacs_tpu.models.whisper import WhisperConfig, init_whisper_params, whisper_decode
from agacs_tpu.text import WhisperTokenizer, WhisperTokenIdConverter

CFG = WhisperConfig(
    n_mels=80, n_audio_ctx=16, n_audio_state=64, n_audio_head=4, n_audio_layer=2,
    n_vocab=51865, n_text_ctx=32, n_text_state=64, n_text_head=4, n_text_layer=2,
)


def test_cs_loss_steers_attention_columns():
    tok = WhisperTokenizer()
    conv = WhisperTokenIdConverter(tok)
    ids = conv.tokens2ids(tok.text2tokens("我们 go"))
    ys_in = np.asarray([[50258] + ids], np.int64)
    labels = jnp.asarray(attention_target_labels(ys_in, tok))
    tokens = jnp.asarray(ys_in.astype(np.int32))

    params = init_whisper_params(jax.random.PRNGKey(0), CFG)
    enc = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 64))

    # steer only heads of layer 1 (mask), leave layer 0 untouched
    head_mask = jnp.zeros((2, 4)).at[1].set(1.0)

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
    for _ in range(200):
        params, opt_state = step(params, opt_state)
    l1 = float(loss_fn(params))
    assert l1 < 0.2 * l0, (l0, l1)

    # masked layer's scores now match the target pattern; unmasked doesn't
    _, aux = whisper_decode(params, CFG, tokens, enc, collect_lang_cols=True)
    targets, valid = targets_from_labels(labels, 0.6)
    cols = np.asarray(aux["qk_cols"])  # (L, 1, h, T, 2)
    tgt = np.asarray(targets)[0]
    v = np.asarray(valid)[0].astype(bool)
    # mean abs error on valid finite entries, steered layer vs unsteered
    def mean_err(layer):
        c = cols[layer, 0]  # (h, T, 2)
        m = np.isfinite(c) & v[None, :, None]
        return float(np.abs(np.where(m, c - tgt[None], 0.0)).sum() / m.sum())

    assert mean_err(1) < 0.1
    assert mean_err(0) > 3 * mean_err(1)
