"""Transformer LM: loss/perplexity, scorer step, training CLI smoke."""

import numpy as np

import jax
import jax.numpy as jnp

from agacs_tpu.models.lm import (
    TransformerLMConfig,
    init_lm_params,
    lm_forward,
    lm_loss,
    lm_score_step,
)

SMALL = TransformerLMConfig(
    d_model=32, attention_heads=4, linear_units=64, num_blocks=2
)


def test_lm_loss_and_ppl():
    params = init_lm_params(jax.random.PRNGKey(0), SMALL)
    batch = {"text": jnp.asarray([[5, 6, 7, -1], [8, 9, 10, 11]], jnp.int32)}
    loss, stats = lm_loss(params, SMALL, batch)
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(float(stats["ppl"]), np.exp(float(loss)), rtol=1e-5)
    # random init: ppl near vocab size
    assert 10000 < float(stats["ppl"]) < 500000


def test_lm_causality():
    params = init_lm_params(jax.random.PRNGKey(0), SMALL)
    a = lm_forward(params, SMALL, jnp.asarray([[1, 2, 3, 4]], jnp.int32))
    b = lm_forward(params, SMALL, jnp.asarray([[1, 2, 3, 999]], jnp.int32))
    np.testing.assert_allclose(np.asarray(a)[0, :3], np.asarray(b)[0, :3], atol=1e-5)


def test_lm_overfits_short_corpus():
    import optax

    params = init_lm_params(jax.random.PRNGKey(0), SMALL)
    batch = {"text": jnp.asarray([[5, 6, 7, 8]] * 4, jnp.int32)}
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        (l, _), g = jax.value_and_grad(lambda pp: lm_loss(pp, SMALL, batch), has_aux=True)(p)
        u, o2 = tx.update(g, o, p)
        return optax.apply_updates(p, u), o2, l

    for _ in range(60):
        params, opt, loss = step(params, opt)
    assert float(loss) < 0.5
    lp = lm_score_step(params, SMALL, jnp.asarray([[SMALL.sos, 5, 6]], jnp.int32))
    assert int(jnp.argmax(lp[0])) == 7  # predicts the memorized continuation


def test_lm_cached_step_matches_full():
    from agacs_tpu.models.lm import init_lm_kv_cache, lm_score_step_cached

    params = init_lm_params(jax.random.PRNGKey(0), SMALL)
    toks = jnp.asarray([[50258, 5, 9, 12], [50258, 7, 3, 2]], jnp.int32)
    full = jax.nn.log_softmax(lm_forward(params, SMALL, toks), -1)
    kv = init_lm_kv_cache(SMALL, 2, 8)
    outs = []
    for pos in range(4):
        lp, kv = lm_score_step_cached(params, SMALL, toks[:, pos], jnp.int32(pos), kv)
        outs.append(np.asarray(lp))
    np.testing.assert_allclose(
        np.stack(outs, 1), np.asarray(full), atol=2e-4, rtol=1e-4
    )


def test_lm_train_cli(tmp_path):
    from agacs_tpu.bin import lm_train
    from agacs_tpu.data.io import write_scp

    for split in ("train", "valid"):
        write_scp(
            str(tmp_path / f"{split}_text"),
            {"u1": "我们 go", "u2": "hello 你"},
        )
    out = lm_train.main([
        "--train_text", str(tmp_path / "train_text"),
        "--valid_text", str(tmp_path / "valid_text"),
        "--exp_dir", str(tmp_path / "lm"),
        "--d_model", "32", "--attention_heads", "4",
        "--linear_units", "64", "--num_blocks", "2",
        "--max_epoch", "2", "--compute_dtype", "float32",
    ])
    assert 2 in out["history"]
    assert np.isfinite(out["history"][2]["valid"]["loss"])
    assert (tmp_path / "lm" / "valid.loss.ave.params.npz").exists()


def test_lm_calc_perplexity_cli(tmp_path):
    """lm_calc_perplexity: trained-LM corpus perplexity with exact
    token-count weighting (espnet2.bin.lm_calc_perplexity)."""
    from agacs_tpu.bin import lm_calc_perplexity, lm_train
    from agacs_tpu.data.io import write_scp

    for split in ("train", "valid"):
        write_scp(
            str(tmp_path / f"{split}_text"),
            {"u1": "我们 go", "u2": "hello 你", "u3": "go go"},
        )
    lm_train.main([
        "--train_text", str(tmp_path / "train_text"),
        "--valid_text", str(tmp_path / "valid_text"),
        "--exp_dir", str(tmp_path / "lm"),
        "--d_model", "32", "--attention_heads", "4",
        "--linear_units", "64", "--num_blocks", "2",
        "--max_epoch", "1", "--compute_dtype", "float32",
    ])
    rep = lm_calc_perplexity.main([
        "--lm_exp", str(tmp_path / "lm"),
        "--text", str(tmp_path / "valid_text"),
        "--output", str(tmp_path / "ppl.json"),
    ])
    assert rep["perplexity"] > 1.0 and np.isfinite(rep["perplexity"])
    assert rep["n_tokens"] > 0
    assert (tmp_path / "ppl.json").exists()
