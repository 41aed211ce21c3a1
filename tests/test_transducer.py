"""Transducer stack tests: RNNT loss vs a literal lattice oracle, decoder
cell parity vs torch LSTM/GRU, greedy/beam search, and a training smoke
test for the transducer model family.

Reference: espnet2/asr/decoder/transducer_decoder.py,
espnet2/asr_transducer/joint_network.py, espnet2/asr/transducer/
beam_search_transducer.py, espnet_model.py:980-1027 (warprnnt criterion).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from agacs_tpu.models.transducer import (
    TransducerConfig,
    default_beam_search,
    greedy_search,
    init_decoder_state,
    init_transducer_params,
    joint,
    joint_lattice,
    transducer_decoder,
    transducer_decoder_step,
)
from agacs_tpu.train.rnnt_loss import rnnt_loss


def _oracle_nll(logits, tgt, t_len, u_len, blank=0):
    """Literal forward-lattice DP (float64), the definition warprnnt
    implements."""
    lp = np.asarray(
        jax.nn.log_softmax(jnp.asarray(logits, jnp.float32), axis=-1), np.float64
    )
    a = np.full((t_len, u_len + 1), -np.inf)
    a[0, 0] = 0.0
    for t in range(t_len):
        for u in range(u_len + 1):
            if t == 0 and u == 0:
                continue
            h = a[t - 1, u] + lp[t - 1, u, blank] if t > 0 else -np.inf
            v = a[t, u - 1] + lp[t, u - 1, tgt[u - 1]] if u > 0 else -np.inf
            a[t, u] = np.logaddexp(h, v)
    return -(a[t_len - 1, u_len] + lp[t_len - 1, u_len, blank])


def test_rnnt_loss_matches_oracle():
    rng = np.random.RandomState(0)
    b, t_max, u_max, v = 4, 12, 6, 9
    logits = (rng.randn(b, t_max, u_max + 1, v) * 2).astype(np.float32)
    tgts = rng.randint(1, v, (b, u_max))
    t_lens = np.array([12, 9, 5, 1])
    u_lens = np.array([6, 4, 1, 0])

    got = np.asarray(
        rnnt_loss(
            jnp.asarray(logits), jnp.asarray(tgts),
            jnp.asarray(t_lens), jnp.asarray(u_lens), reduction="none",
        )
    )
    want = np.array([
        _oracle_nll(logits[i], tgts[i], t_lens[i], u_lens[i]) for i in range(b)
    ])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # mean reduction
    m = float(rnnt_loss(jnp.asarray(logits), jnp.asarray(tgts),
                        jnp.asarray(t_lens), jnp.asarray(u_lens)))
    assert abs(m - want.mean()) < 1e-4


def test_rnnt_loss_zero_length_encoder():
    """t_lens==0 must yield NLL 0 (no lattice path), not silently index
    the last frame via -1 wraparound (ADVICE r2)."""
    rng = np.random.RandomState(2)
    b, t_max, u_max, v = 3, 6, 3, 5
    logits = jnp.asarray(rng.randn(b, t_max, u_max + 1, v).astype(np.float32))
    tgts = jnp.asarray(rng.randint(1, v, (b, u_max)))
    t_lens = jnp.asarray([6, 0, 3])
    u_lens = jnp.asarray([3, 0, 2])
    nll = np.asarray(rnnt_loss(logits, tgts, t_lens, u_lens, reduction="none"))
    assert nll[1] == 0.0
    assert nll[0] > 0.0 and nll[2] > 0.0


def test_rnnt_loss_grad_and_fastemit():
    rng = np.random.RandomState(1)
    b, t_max, u_max, v = 2, 8, 4, 6
    logits = jnp.asarray(rng.randn(b, t_max, u_max + 1, v).astype(np.float32))
    tgts = jnp.asarray(rng.randint(1, v, (b, u_max)))
    t_lens = jnp.asarray([8, 6])
    u_lens = jnp.asarray([4, 2])

    f = lambda lg, lam: rnnt_loss(lg, tgts, t_lens, u_lens, fastemit_lambda=lam)
    v0, g0 = jax.value_and_grad(f)(logits, 0.0)
    v1, g1 = jax.value_and_grad(f)(logits, 0.5)
    assert bool(jnp.all(jnp.isfinite(g0)))
    # FastEmit: identical loss VALUE, different (scaled-emission) gradient
    assert float(jnp.abs(v0 - v1)) == 0.0
    assert float(jnp.max(jnp.abs(g0 - g1))) > 0.0

    # gradient sanity: training on the loss reduces it
    lg = logits
    for _ in range(30):
        lg = lg - 0.5 * jax.grad(lambda x: f(x, 0.0))(lg)
    assert float(f(lg, 0.0)) < float(v0)


def test_decoder_cell_matches_torch():
    torch = pytest.importorskip("torch")
    for rnn_type in ("lstm", "gru"):
        cfg = TransducerConfig(
            vocab_size=20, rnn_type=rnn_type, num_layers=2, hidden_size=16
        )
        params = init_transducer_params(jax.random.PRNGKey(0), cfg, encoder_size=8)

        tdec = torch.nn.ModuleList([
            (torch.nn.LSTM if rnn_type == "lstm" else torch.nn.GRU)(
                16, 16, 1, batch_first=True
            )
            for _ in range(2)
        ])
        with torch.no_grad():
            for li, m in enumerate(tdec):
                m.weight_ih_l0.copy_(
                    torch.tensor(np.asarray(params["layers"]["w_ih"][li]).T)
                )
                m.weight_hh_l0.copy_(
                    torch.tensor(np.asarray(params["layers"]["w_hh"][li]).T)
                )
                m.bias_ih_l0.copy_(
                    torch.tensor(np.asarray(params["layers"]["b_ih"][li]))
                )
                m.bias_hh_l0.copy_(
                    torch.tensor(np.asarray(params["layers"]["b_hh"][li]))
                )
        emb = torch.nn.Embedding(20, 16, padding_idx=0)
        with torch.no_grad():
            emb.weight.copy_(torch.tensor(np.asarray(params["embed"])))

        tokens = np.array([[0, 3, 5, 1], [0, 7, 0, 2]], np.int64)
        x = emb(torch.tensor(tokens))
        for m in tdec:
            x, _ = m(x)
        want = x.detach().numpy()

        got = np.asarray(
            transducer_decoder(params, cfg, jnp.asarray(tokens.astype(np.int32)))
        )
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_decoder_step_matches_teacher_forced():
    cfg = TransducerConfig(vocab_size=30, num_layers=2, hidden_size=12)
    params = init_transducer_params(jax.random.PRNGKey(1), cfg, encoder_size=8)
    tokens = jnp.asarray(np.random.RandomState(0).randint(0, 30, (3, 7)))
    full = transducer_decoder(params, cfg, tokens)

    state = init_decoder_state(cfg, 3)
    outs = []
    for u in range(7):
        out, state = transducer_decoder_step(params, cfg, tokens[:, u], state)
        outs.append(out)
    step = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(step), rtol=1e-5,
                               atol=1e-5)


def test_joint_shapes_and_lattice():
    cfg = TransducerConfig(vocab_size=11, hidden_size=12, joint_space_size=8)
    params = init_transducer_params(jax.random.PRNGKey(2), cfg, encoder_size=6)
    enc = jnp.asarray(np.random.RandomState(0).randn(2, 5, 6), jnp.float32)
    dec = jnp.asarray(np.random.RandomState(1).randn(2, 4, 12), jnp.float32)
    lat = joint_lattice(params, cfg, enc, dec)
    assert lat.shape == (2, 5, 4, 11)
    # lattice [b, t, u] equals pointwise joint of (enc[b,t], dec[b,u])
    one = joint(params, cfg, enc[0, 3], dec[0, 2])
    np.testing.assert_allclose(np.asarray(lat[0, 3, 2]), np.asarray(one),
                               rtol=1e-5, atol=1e-5)


def _overfit_tiny(cfg, params, enc, enc_lens, targets, u_lens, steps=150,
                  lr=0.5):
    """Train decoder+joint on one fixed encoder batch until the RNNT loss
    is small; returns trained params."""
    import optax

    from agacs_tpu.models.transducer import joint_lattice as jl
    from agacs_tpu.models.transducer import transducer_decoder as td

    blank = cfg.blank_id
    decoder_in = jnp.concatenate(
        [jnp.full((targets.shape[0], 1), blank, jnp.int32), targets], axis=1
    )
    tx = optax.adam(lr * 1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            dec = td(p, cfg, decoder_in)
            logits = jl(p, cfg, enc, dec)
            return rnnt_loss(logits, targets, enc_lens, u_lens, blank=blank)

        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, loss

    for _ in range(steps):
        params, opt, loss = step(params, opt)
    return params, float(loss)


def test_greedy_and_beam_recover_overfit_sequence():
    rng = np.random.RandomState(0)
    cfg = TransducerConfig(vocab_size=8, hidden_size=16, joint_space_size=16)
    params = init_transducer_params(jax.random.PRNGKey(3), cfg, encoder_size=6)
    enc = jnp.asarray(rng.randn(2, 10, 6), jnp.float32)
    enc_lens = jnp.asarray([10, 7])
    targets = jnp.asarray([[3, 1, 4, 2], [5, 6, 0, 0]], jnp.int32)
    u_lens = jnp.asarray([4, 2])

    params, loss = _overfit_tiny(cfg, params, enc, enc_lens, targets, u_lens)
    assert loss < 1.0, loss

    tokens, n = greedy_search(params, cfg, enc, enc_lens, max_symbols=6)
    got0 = list(np.asarray(tokens[0, : int(n[0])]))
    got1 = list(np.asarray(tokens[1, : int(n[1])]))
    assert got0 == [3, 1, 4, 2], (got0, np.asarray(tokens))
    assert got1 == [5, 6], (got1, np.asarray(tokens))

    # beam search finds the same argmax sequence with a higher-or-equal score
    nbest = default_beam_search(params, cfg, np.asarray(enc[0][:10]), beam_size=3)
    assert nbest[0][1] == [3, 1, 4, 2], nbest[0]
    assert nbest == sorted(nbest, key=lambda h: -h[0])


def test_transducer_asr_train_smoke():
    from agacs_tpu.models.conformer import ConformerConfig
    from agacs_tpu.models.transducer_asr import (
        TransducerASRConfig,
        forward,
        init_transducer_asr_params,
    )
    from agacs_tpu.ops.frontend_default import DefaultFrontendConfig

    cfg = TransducerASRConfig(
        encoder=ConformerConfig(
            input_size=20, output_size=32, attention_heads=2, linear_units=48,
            num_blocks=2, cnn_module_kernel=7,
        ),
        decoder=TransducerConfig(vocab_size=50, hidden_size=24,
                                 joint_space_size=16),
        frontend=DefaultFrontendConfig(n_mels=20, n_fft=128, hop_length=64),
        ctc_weight=0.2,
        use_specaug=False,
    )
    params = init_transducer_asr_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    batch = {
        "speech": jnp.asarray(rng.randn(2, 3200).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray([3200, 2400]),
        "text": jnp.asarray([[5, 9, 3, -1], [7, 2, -1, -1]], jnp.int32),
    }

    loss, stats = jax.jit(
        lambda p, b: forward(p, cfg, b, train=True, rng=jax.random.PRNGKey(1))
    )(params, batch)
    assert np.isfinite(float(loss))
    assert "loss_transducer" in stats and "loss_ctc" in stats

    grads = jax.grad(
        lambda p: forward(p, cfg, batch, train=False, rng=None)[0]
    )(params)
    flat = jax.tree.leaves(jax.tree.map(lambda g: jnp.all(jnp.isfinite(g)), grads))
    assert all(bool(x) for x in flat)
    # the blank embedding row must receive zero gradient (padding_idx)
    g_embed = grads["transducer"]["embed"]
    assert float(jnp.max(jnp.abs(g_embed[cfg.decoder.blank_id]))) == 0.0


def test_transducer_train_step_dp_sharded():
    """The transducer family trains under a dp-sharded mesh (GSPMD
    inserts the gradient reductions; reference DDP trainer.py:229-243)."""
    from agacs_tpu.models.conformer import ConformerConfig
    from agacs_tpu.models.transducer_asr import (
        TransducerASRConfig,
        forward,
        init_transducer_asr_params,
    )
    from agacs_tpu.ops.frontend_default import DefaultFrontendConfig
    from agacs_tpu.parallel import make_mesh, shard_batch, shard_params
    from agacs_tpu.train.optim import OptimConfig
    from agacs_tpu.train.trainer import (
        build_tx,
        create_train_state,
        make_train_step,
    )

    cfg = TransducerASRConfig(
        encoder=ConformerConfig(
            input_size=20, output_size=32, attention_heads=2, linear_units=48,
            num_blocks=2, cnn_module_kernel=7,
        ),
        decoder=TransducerConfig(vocab_size=50, hidden_size=24,
                                 joint_space_size=16),
        frontend=DefaultFrontendConfig(n_mels=20, n_fft=128, hop_length=64),
        use_specaug=False,
    )
    params = init_transducer_asr_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(n_data=8)
    params = shard_params(mesh, params)
    tx, _ = build_tx(params, OptimConfig(warmup_steps=4))
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    step = make_train_step(cfg, tx, loss_fn=forward)

    rng = np.random.RandomState(0)
    batch = shard_batch(mesh, {
        "speech": jnp.asarray(rng.randn(8, 3200).astype(np.float32) * 0.1),
        "speech_lengths": jnp.full((8,), 3200, jnp.int32),
        "text": jnp.asarray(rng.randint(1, 50, (8, 5)), jnp.int32),
    })
    losses = []
    for _ in range(3):
        state, stats = step(state, batch)
        losses.append(float(stats["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_greedy_advance_on_emit_reference_semantics():
    """advance_on_emit=True reproduces the reference's one-symbol-per-frame
    greedy (beam_search_transducer.py:221-253): emitted count can never
    exceed the frame count, and a python re-implementation of the
    reference loop gives identical output."""
    rng = np.random.RandomState(2)
    cfg = TransducerConfig(vocab_size=6, hidden_size=8, joint_space_size=8)
    params = init_transducer_params(jax.random.PRNGKey(5), cfg, encoder_size=4)
    enc = jnp.asarray(rng.randn(2, 9, 4), jnp.float32)
    enc_lens = jnp.asarray([9, 6])

    tokens, n = greedy_search(
        params, cfg, enc, enc_lens, max_symbols=12, advance_on_emit=True
    )
    tokens, n = np.asarray(tokens), np.asarray(n)
    assert (n <= np.asarray(enc_lens)).all()

    # literal reference loop: one joint per frame, advance every frame
    for b in range(2):
        state = init_decoder_state(cfg, 1)
        dec, state = transducer_decoder_step(
            params, cfg, jnp.asarray([cfg.blank_id], jnp.int32), state
        )
        out = []
        for t in range(int(enc_lens[b])):
            logits = joint(params, cfg, enc[b, t][None], dec)
            best = int(jnp.argmax(logits, axis=-1)[0])
            if best != cfg.blank_id:
                out.append(best)
                dec, state = transducer_decoder_step(
                    params, cfg, jnp.asarray([best], jnp.int32), state
                )
        assert tokens[b, : n[b]].tolist() == out, (b, tokens[b], out)


def test_tsd_beam_search_batched():
    """Batched time-synchronous beam search (decode/transducer_tsd.py):
    recovers the overfit sequences for a whole batch in one jitted call,
    best-first, with per-utterance frame masking; the top hypothesis
    matches the host default_beam_search result."""
    from agacs_tpu.decode.transducer_tsd import tsd_beam_search

    rng = np.random.RandomState(0)
    cfg = TransducerConfig(vocab_size=8, hidden_size=16, joint_space_size=16)
    params = init_transducer_params(jax.random.PRNGKey(3), cfg, encoder_size=6)
    enc = jnp.asarray(rng.randn(2, 10, 6), jnp.float32)
    enc_lens = jnp.asarray([10, 7])
    targets = jnp.asarray([[3, 1, 4, 2], [5, 6, 0, 0]], jnp.int32)
    u_lens = jnp.asarray([4, 2])
    params, loss = _overfit_tiny(cfg, params, enc, enc_lens, targets, u_lens)
    assert loss < 1.0

    tokens, n, scores = tsd_beam_search(
        params, cfg, enc, enc_lens, beam=3, max_sym_exp=3
    )
    assert tokens.shape == (2, 3, 10)
    got0 = list(np.asarray(tokens[0, 0, : int(n[0, 0])]))
    got1 = list(np.asarray(tokens[1, 0, : int(n[1, 0])]))
    assert got0 == [3, 1, 4, 2], got0
    assert got1 == [5, 6], got1
    # best-first scores
    s = np.asarray(scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()

    # top hypothesis agrees with the host-side reference default beam
    nbest = default_beam_search(params, cfg, np.asarray(enc[0]), beam_size=3)
    assert nbest[0][1] == got0

    # masking: padding frames beyond t_len must not change the result
    enc_pad = jnp.concatenate(
        [enc, jnp.asarray(rng.randn(2, 4, 6), jnp.float32)], axis=1
    )
    tokens2, n2, scores2 = tsd_beam_search(
        params, cfg, enc_pad, enc_lens, beam=3, max_sym_exp=3
    )
    np.testing.assert_array_equal(np.asarray(tokens)[..., :10],
                                  np.asarray(tokens2)[..., :10])
    np.testing.assert_allclose(np.asarray(scores), np.asarray(scores2),
                               rtol=1e-5, atol=1e-5)


def test_default_beam_lm_fusion():
    """LM shallow fusion in the transducer default beam (reference
    use_lm branch :314-336): lm_weight=0 is exactly the no-LM search;
    lm_weight>0 adds per-token LM log-probs to non-blank expansions."""
    from agacs_tpu.models.lm import TransformerLMConfig, init_lm_params

    rng = np.random.RandomState(0)
    cfg = TransducerConfig(vocab_size=8, hidden_size=16, joint_space_size=16)
    params = init_transducer_params(jax.random.PRNGKey(3), cfg, encoder_size=6)
    enc = jnp.asarray(rng.randn(2, 10, 6), jnp.float32)
    enc_lens = jnp.asarray([10, 7])
    targets = jnp.asarray([[3, 1, 4, 2], [5, 6, 0, 0]], jnp.int32)
    u_lens = jnp.asarray([4, 2])
    params, _ = _overfit_tiny(cfg, params, enc, enc_lens, targets, u_lens)

    lm_cfg = TransformerLMConfig(
        vocab_size=8, d_model=16, attention_heads=2, linear_units=32,
        num_blocks=1, compute_dtype=jnp.float32,
    )
    lm_params = init_lm_params(jax.random.PRNGKey(9), lm_cfg)

    base = default_beam_search(params, cfg, np.asarray(enc[0]), beam_size=3)
    zero = default_beam_search(
        params, cfg, np.asarray(enc[0]), beam_size=3,
        lm_params=lm_params, lm_cfg=lm_cfg, lm_weight=0.0, lm_sos=7,
    )
    assert zero == base  # weight 0 short-circuits to the plain search

    fused = default_beam_search(
        params, cfg, np.asarray(enc[0]), beam_size=3,
        lm_params=lm_params, lm_cfg=lm_cfg, lm_weight=0.05, lm_sos=7,
    )
    # scores shift by the LM term; ordering stays best-first
    assert fused != base
    assert [s for s, _ in fused] == sorted((s for s, _ in fused), reverse=True)
    # the overfit acoustic model still dominates at small weight, and the
    # winning score moved by exactly the (nonzero) LM contribution
    assert fused[0][1] == [3, 1, 4, 2], fused[0]
    assert abs(fused[0][0] - base[0][0]) > 1e-6


def test_alsd_beam_search_batched():
    """Batched align-length-sync beam search: recovers the overfit
    sequences, agrees with the default beam's 1-best, and is invariant to
    padding frames beyond t_len."""
    from agacs_tpu.decode.transducer_tsd import alsd_beam_search

    rng = np.random.RandomState(0)
    cfg = TransducerConfig(vocab_size=8, hidden_size=16, joint_space_size=16)
    params = init_transducer_params(jax.random.PRNGKey(3), cfg, encoder_size=6)
    enc = jnp.asarray(rng.randn(2, 10, 6), jnp.float32)
    enc_lens = jnp.asarray([10, 7])
    targets = jnp.asarray([[3, 1, 4, 2], [5, 6, 0, 0]], jnp.int32)
    u_lens = jnp.asarray([4, 2])
    params, loss = _overfit_tiny(cfg, params, enc, enc_lens, targets, u_lens)
    assert loss < 1.0

    tokens, n, scores = alsd_beam_search(
        params, cfg, enc, enc_lens, beam=3, u_max=8
    )
    got0 = list(np.asarray(tokens[0, 0, : int(n[0, 0])]))
    got1 = list(np.asarray(tokens[1, 0, : int(n[1, 0])]))
    assert got0 == [3, 1, 4, 2], (got0, np.asarray(tokens[0]))
    assert got1 == [5, 6], got1
    s = np.asarray(scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()

    nbest = default_beam_search(params, cfg, np.asarray(enc[0]), beam_size=3)
    assert nbest[0][1] == got0

    enc_pad = jnp.concatenate(
        [enc, jnp.asarray(rng.randn(2, 5, 6), jnp.float32)], axis=1
    )
    tokens2, n2, scores2 = alsd_beam_search(
        params, cfg, enc_pad, enc_lens, beam=3, u_max=8
    )
    assert list(np.asarray(tokens2[0, 0, : int(n2[0, 0])])) == got0
    np.testing.assert_allclose(np.asarray(scores)[:, 0],
                               np.asarray(scores2)[:, 0], rtol=1e-5, atol=1e-5)


def test_greedy_scan_matches_while_loop():
    """The scan-form greedy (production path) matches the exact
    while_loop greedy whenever no frame exceeds the per-frame cap."""
    from agacs_tpu.models.transducer import greedy_search_scan

    rng = np.random.RandomState(0)
    cfg = TransducerConfig(vocab_size=8, hidden_size=16, joint_space_size=16)
    params = init_transducer_params(jax.random.PRNGKey(3), cfg, encoder_size=6)
    enc = jnp.asarray(rng.randn(2, 10, 6), jnp.float32)
    enc_lens = jnp.asarray([10, 7])
    targets = jnp.asarray([[3, 1, 4, 2], [5, 6, 0, 0]], jnp.int32)
    u_lens = jnp.asarray([4, 2])
    params, _ = _overfit_tiny(cfg, params, enc, enc_lens, targets, u_lens)

    t_w, n_w = greedy_search(params, cfg, enc, enc_lens, max_symbols=8)
    t_s, n_s = greedy_search_scan(params, cfg, enc, enc_lens, max_symbols=8)
    np.testing.assert_array_equal(np.asarray(n_w), np.asarray(n_s))
    for b in range(2):
        np.testing.assert_array_equal(
            np.asarray(t_w[b, : int(n_w[b])]), np.asarray(t_s[b, : int(n_s[b])])
        )

    # untrained model too (different emission pattern)
    p2 = init_transducer_params(jax.random.PRNGKey(11), cfg, encoder_size=6)
    t_w, n_w = greedy_search(p2, cfg, enc, enc_lens, max_symbols=8)
    t_s, n_s = greedy_search_scan(p2, cfg, enc, enc_lens, max_symbols=8)
    np.testing.assert_array_equal(np.asarray(n_w), np.asarray(n_s))
    np.testing.assert_array_equal(np.asarray(t_w), np.asarray(t_s))


def test_joint_chunked_loss_matches_full():
    """joint_chunk_t bounds peak memory to one (B, chunk, U+1, V) joint
    chunk; loss value AND gradients must match the full-lattice path
    (incl. a T not divisible by the chunk, and FastEmit grads)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from agacs_tpu.models.conformer import ConformerConfig
    from agacs_tpu.models.transducer import TransducerConfig
    from agacs_tpu.models.transducer_asr import (
        TransducerASRConfig,
        forward,
        init_transducer_asr_params,
    )
    from agacs_tpu.ops.frontend_default import DefaultFrontendConfig

    base = TransducerASRConfig(
        encoder=ConformerConfig(
            input_size=20, output_size=32, attention_heads=2, linear_units=48,
            num_blocks=2, cnn_module_kernel=7,
        ),
        decoder=TransducerConfig(vocab_size=50, hidden_size=24,
                                 joint_space_size=16),
        frontend=DefaultFrontendConfig(n_mels=20, n_fft=128, hop_length=64),
        use_specaug=False,
        fastemit_lambda=0.1,
    )
    params = init_transducer_asr_params(jax.random.PRNGKey(0), base)
    rng = np.random.RandomState(0)
    batch = {
        "speech": jnp.asarray(rng.randn(4, 3900).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray([3900, 3500, 2700, 1900], jnp.int32),
        "text": jnp.asarray(
            np.where(np.arange(6)[None, :] < np.array([6, 4, 3, 5])[:, None],
                     rng.randint(1, 50, (4, 6)), -1).astype(np.int32)
        ),
    }

    chunked = dataclasses.replace(base, joint_chunk_t=7)  # 7 ∤ T on purpose

    def loss_of(cfg):
        def f(p):
            loss, _ = forward(p, cfg, batch, train=False)
            return loss
        return f

    l_full, g_full = jax.value_and_grad(loss_of(base))(params)
    l_chun, g_chun = jax.value_and_grad(loss_of(chunked))(params)
    np.testing.assert_allclose(float(l_chun), float(l_full), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_chun)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=1e-6)
