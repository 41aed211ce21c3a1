"""Trainer smoke tests on the 8-device CPU mesh: data-parallel sharded
training step with CS loss, freeze presets, grad accumulation,
checkpointing, n-best averaging."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from agacs_tpu.adapt import attention_target_labels
from agacs_tpu.models.asr_model import ASRModelConfig, forward, init_asr_params
from agacs_tpu.models.whisper import WhisperConfig
from agacs_tpu.parallel import make_mesh, shard_batch, shard_params
from agacs_tpu.text import WhisperTokenIdConverter, WhisperTokenizer
from agacs_tpu.train.checkpoint import CheckpointManager, load_pytree_like
from agacs_tpu.train.freeze import count_trainable, trainable_mask
from agacs_tpu.train.optim import OptimConfig
from agacs_tpu.train.trainer import (
    TrainState,
    build_tx,
    create_train_state,
    make_eval_step,
    make_train_step,
)

TINY_WHISPER = WhisperConfig(
    n_mels=80, n_audio_ctx=32, n_audio_state=64, n_audio_head=4, n_audio_layer=2,
    n_vocab=51865, n_text_ctx=32, n_text_state=64, n_text_head=4, n_text_layer=2,
    adapter=True,
)


@pytest.fixture(scope="module")
def tok():
    return WhisperTokenizer()


def _batch(tok, b=8, accum=None):
    """Synthetic batch: ~0.64 s of audio -> 64 frames -> 32 enc positions."""
    rng = np.random.RandomState(0)
    conv = WhisperTokenIdConverter(tok)
    s = 64 * 160
    speech = (rng.randn(b, s) * 0.05).astype(np.float32)
    speech_lengths = np.full((b,), s, np.int32)
    texts = ["我们 go", "hello 你", "好 ok", "去 shop"] * (b // 4)
    ids = [conv.tokens2ids(tok.text2tokens(t)) for t in texts]
    tmax = max(len(x) for x in ids)
    text = np.full((b, tmax), -1, np.int64)
    for i, x in enumerate(ids):
        text[i, : len(x)] = x
    # labels aligned with ys_in = [sot] + text(eos-padded)
    ys_in = np.concatenate(
        [np.full((b, 1), 50258), np.where(text == -1, 50257, text)], axis=1
    )
    cs_labels = attention_target_labels(ys_in, tok)
    batch = {
        "speech": jnp.asarray(speech),
        "speech_lengths": jnp.asarray(speech_lengths),
        "text": jnp.asarray(text.astype(np.int32)),
        "cs_labels": jnp.asarray(cs_labels),
    }
    if accum:
        batch = jax.tree.map(
            lambda x: x.reshape(accum, b // accum, *x.shape[1:]), batch
        )
    return batch


def _cfg(**kw):
    return ASRModelConfig(whisper=TINY_WHISPER, cs_weight=0.01, use_specaug=True, **kw)


def test_train_step_dp_sharded(tok):
    cfg = _cfg()
    params = init_asr_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(n_data=8)
    params = shard_params(mesh, params)

    tx, mask = build_tx(params, OptimConfig(warmup_steps=4), freeze_preset="adapter")
    n_train, n_total = count_trainable(params, mask)
    assert 0 < n_train < n_total

    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    step = make_train_step(cfg, tx)

    frozen_before = np.asarray(state.params["decoder"]["token_emb"])
    adapter_before = np.asarray(
        state.params["decoder"]["blocks"]["adapter_attn"]["down"]["w"]
    )

    batch = shard_batch(mesh, _batch(tok))
    losses = []
    for _ in range(3):
        state, stats = step(state, batch)
        losses.append(float(stats["loss"]))

    assert all(np.isfinite(losses))
    assert "loss_cs" in stats and np.isfinite(float(stats["loss_cs"]))
    # frozen leaves unchanged, adapters updated
    np.testing.assert_array_equal(
        np.asarray(state.params["decoder"]["token_emb"]), frozen_before
    )
    assert not np.allclose(
        np.asarray(state.params["decoder"]["blocks"]["adapter_attn"]["down"]["w"]),
        adapter_before,
    )
    # training reduces the loss on a fixed batch
    assert losses[-1] < losses[0]


def test_grad_accum_matches_big_batch(tok):
    cfg = dataclasses.replace(_cfg(), use_specaug=False)
    params = init_asr_params(jax.random.PRNGKey(0), cfg)
    tx, _ = build_tx(params, OptimConfig(warmup_steps=4), freeze_preset=None,
                     skip_nonfinite=False)

    s0 = create_train_state(params, tx, jax.random.PRNGKey(1))
    big = make_train_step(cfg, tx, accum_grad=1, donate=False)
    _, stats_big = big(s0, _batch(tok, b=8))

    s1 = create_train_state(params, tx, jax.random.PRNGKey(1))
    acc = make_train_step(cfg, tx, accum_grad=2, donate=False)
    _, stats_acc = acc(s1, _batch(tok, b=8, accum=2))

    np.testing.assert_allclose(
        float(stats_big["loss"]), float(stats_acc["loss"]), rtol=1e-5
    )


def test_eval_step(tok):
    cfg = _cfg()
    params = init_asr_params(jax.random.PRNGKey(0), cfg)
    ev = make_eval_step(cfg)
    stats = ev(params, _batch(tok))
    assert np.isfinite(float(stats["loss"]))
    assert 0.0 <= float(stats["acc"]) <= 1.0


def test_estimate_c_trains_under_adapter_preset(tok):
    """Learnable c_val target (estimate_c): created, marked trainable by the
    'adapter' preset (abs_task.py:1175-1177), and actually updated by the
    CS loss (unlike the reference, whose live loss ignores it)."""
    cfg = ASRModelConfig(
        whisper=TINY_WHISPER, cs_weight=0.05, estimate_c=True, use_specaug=False
    )
    params = init_asr_params(jax.random.PRNGKey(0), cfg)
    assert "estimated_c_val" in params
    tx, mask = build_tx(params, OptimConfig(warmup_steps=2), freeze_preset="adapter")
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    step = make_train_step(cfg, tx)
    batch = _batch(tok, b=4)
    c0 = float(state.params["estimated_c_val"][0])
    for _ in range(3):
        state, stats = step(state, batch)
    assert float(state.params["estimated_c_val"][0]) != c0
    assert np.isfinite(float(stats["loss_cs"]))


def test_checkpoint_manager_nbest(tok, tmp_path):
    cfg = _cfg()
    params = init_asr_params(jax.random.PRNGKey(0), cfg)
    tx, _ = build_tx(params, OptimConfig(), freeze_preset="adapter")
    state = create_train_state(params, tx, jax.random.PRNGKey(1))

    mgr = CheckpointManager(str(tmp_path), keep_nbest=2)
    history = {}
    for ep, acc in [(1, 0.1), (2, 0.5), (3, 0.3)]:
        history[ep] = {"valid": {"acc": acc}}
        state = dataclasses.replace(state, step=state.step + 1)
        mgr.save_epoch(ep, state, history)

    # pruned to 2 best (epochs 2, 3)
    import os

    kept = sorted(f for f in os.listdir(tmp_path) if f.endswith("epoch.params.npz"))
    assert kept == ["2epoch.params.npz", "3epoch.params.npz"]
    assert mgr.best_epoch(history) == 2

    avg = mgr.average_nbest(history, state.params)
    assert jax.tree.structure(avg) == jax.tree.structure(state.params)

    # resume restores step
    state2, start_ep, hist2 = mgr.resume(state)
    assert start_ep == 4 and int(state2.step) == int(state.step)
    assert hist2[2]["valid"]["acc"] == 0.5

    # params roundtrip exactly
    p = load_pytree_like(str(tmp_path / "3epoch.params.npz"), state.params)
    np.testing.assert_array_equal(
        np.asarray(p["encoder"]["conv1"]["b"]),
        np.asarray(state.params["encoder"]["conv1"]["b"]),
    )


def test_nonfinite_step_skipped_and_counted():
    """A non-finite gradient skips the update (apply_if_finite) and the
    step reports the skip counter (reference trainer.py:679-694 skip +
    :450-456 all-invalid abort signal)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from agacs_tpu.train.optim import OptimConfig
    from agacs_tpu.train.trainer import build_tx, create_train_state, make_train_step

    params = {"w": jnp.ones((4,))}

    def loss_fn(p, cfg, batch, train=True, rng=None):
        loss = jnp.sum(p["w"] * batch["x"])
        return loss, {"loss": loss}

    tx, _ = build_tx(params, OptimConfig(warmup_steps=1))
    state = create_train_state(params, tx, jax.random.PRNGKey(0))
    step = make_train_step(None, tx, loss_fn=loss_fn, donate=False)

    bad = {"x": jnp.asarray([jnp.inf, 1.0, 1.0, 1.0])}
    good = {"x": jnp.ones((4,))}

    w0 = np.asarray(state.params["w"]).copy()
    state, stats = step(state, bad)
    assert int(stats["grad_nonfinite_total"]) == 1
    np.testing.assert_array_equal(np.asarray(state.params["w"]), w0)  # skipped

    state, stats = step(state, good)
    assert int(stats["grad_nonfinite_total"]) == 1  # no new skips
    assert not np.allclose(np.asarray(state.params["w"]), w0)  # applied


def test_tp_sharding_applies_to_production_dims():
    """shard_params actually partitions whisper-small-sized leaves over
    the model axis (tiny test dims silently fall back to replicated, so
    pin the real geometry: d=768, heads=12, mlp 3072)."""
    import jax
    import numpy as np

    from agacs_tpu.models.whisper import WhisperConfig, init_whisper_params
    from agacs_tpu.parallel import make_mesh, shard_params

    cfg = WhisperConfig(
        n_mels=80, n_audio_ctx=32, n_audio_state=768, n_audio_head=12,
        n_audio_layer=2, n_vocab=51865, n_text_ctx=16, n_text_state=768,
        n_text_head=12, n_text_layer=2,
    )
    mesh = make_mesh(n_data=4, n_model=2)
    params = init_whisper_params(jax.random.PRNGKey(0), cfg)
    params = shard_params(mesh, params, tensor_parallel=True)

    def spec_of(x):
        return tuple(x.sharding.spec)

    enc = params["encoder"]["blocks"]
    # column-parallel fc1: (L, d, 4d) -> shard the 4d axis
    assert spec_of(enc["mlp"]["fc1"]["w"]) == (None, None, "model")
    # row-parallel fc2: (L, 4d, d) -> shard the 4d axis
    assert spec_of(enc["mlp"]["fc2"]["w"]) == (None, "model", None)
    # head-parallel qkv, row-parallel out
    assert spec_of(enc["attn"]["query"]["w"]) == (None, None, "model")
    assert spec_of(enc["attn"]["out"]["w"]) == (None, "model", None)
    # the whisper vocab (51865) is odd: shard_params zero-pads the rows to
    # a multiple of the model axis (pad_vocab_rows) and shards them; the
    # model slices logits back to n_vocab (whisper.py)
    dec = params["decoder"]
    assert spec_of(dec["token_emb"]) == ("model", None)
    assert dec["token_emb"].shape == (51866, 768)
    # shards actually live on distinct devices
    w = enc["mlp"]["fc1"]["w"]
    assert len({s.device for s in w.addressable_shards}) == 8
    assert w.addressable_shards[0].data.shape[-1] == w.shape[-1] // 2


def test_cast_frozen_params_bf16_training(tok):
    """Frozen trunk stored bf16 (cast_frozen_params): same per-use
    rounding as fp32 storage under bf16 compute, frozen leaves stay
    untouched by training, trainable masters remain fp32."""
    from agacs_tpu.train.trainer import cast_frozen_params

    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, whisper=dataclasses.replace(cfg.whisper, compute_dtype=jnp.bfloat16)
    )
    params = init_asr_params(jax.random.PRNGKey(0), cfg)
    tx, mask = build_tx(params, OptimConfig(warmup_steps=4), freeze_preset="adapter")
    cast = cast_frozen_params(params, mask)

    # dtypes: frozen f32 -> bf16, trainable unchanged
    for (path, leaf), (_, m) in zip(
        jax.tree_util.tree_flatten_with_path(cast)[0],
        jax.tree_util.tree_flatten_with_path(mask)[0],
    ):
        if m:
            assert leaf.dtype == jnp.float32, path
        elif leaf.dtype != jnp.bfloat16:
            assert leaf.dtype not in (jnp.float32,), path

    # loss identical to fp32 storage at step 1 (per-use cast == storage cast)
    batch = _batch(tok, b=4)
    l_fp32 = float(forward(params, cfg, batch, train=False, rng=None)[0])
    l_bf16 = float(forward(cast, cfg, batch, train=False, rng=None)[0])
    assert abs(l_fp32 - l_bf16) < 1e-3 * max(1.0, abs(l_fp32)), (l_fp32, l_bf16)

    state = create_train_state(cast, tx, jax.random.PRNGKey(1))
    step = make_train_step(cfg, tx, trainable_mask=mask)
    frozen_before = np.asarray(state.params["decoder"]["token_emb"])
    losses = []
    for _ in range(3):
        state, stats = step(state, batch)
        losses.append(float(stats["loss"]))
    assert all(np.isfinite(losses)) and losses[-1] < losses[0]
    np.testing.assert_array_equal(
        np.asarray(state.params["decoder"]["token_emb"]), frozen_before
    )
    assert state.params["decoder"]["token_emb"].dtype == jnp.bfloat16


def test_checkpoint_bf16_roundtrip(tmp_path):
    """npz checkpoints must round-trip bf16 leaves (the frozen trunk under
    cast_frozen_params): numpy has no native bfloat16, so they are stored
    as lossless float32 and cast back by the template on load. Legacy
    files with raw-saved bf16 (void'2') leaves are reinterpreted."""
    from agacs_tpu.train.checkpoint import load_pytree_like, save_pytree

    tree = {
        "frozen": (jnp.arange(6, dtype=jnp.float32) / 3.0).astype(jnp.bfloat16),
        "master": jnp.arange(4, dtype=jnp.float32),
    }
    p = str(tmp_path / "ck.npz")
    save_pytree(p, tree)
    loaded = load_pytree_like(p, tree)
    assert loaded["frozen"].dtype == jnp.bfloat16
    assert loaded["master"].dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(loaded["frozen"], np.float32),
                                  np.asarray(tree["frozen"], np.float32))

    # legacy file: bf16 bytes saved raw -> void itemsize-2 on load
    import ml_dtypes

    raw = np.asarray(tree["frozen"]).view(np.void(2).dtype)
    np.savez(str(tmp_path / "legacy.npz"), frozen=raw,
             master=np.asarray(tree["master"]))
    legacy = load_pytree_like(str(tmp_path / "legacy.npz"), tree)
    np.testing.assert_array_equal(
        np.asarray(legacy["frozen"], np.float32),
        np.asarray(tree["frozen"], np.float32),
    )


def test_init_param_adapts_padded_token_emb(tmp_path):
    """--init_param loading adapts tp-padded token_emb rows
    (parallel/mesh.pad_vocab_rows) to the template instead of dropping
    the largest parameter via the ignore-mismatch fallback."""
    import numpy as np

    from agacs_tpu.bin.train import load_init_params

    tmpl = {"decoder": {"token_emb": jnp.zeros((7, 4), jnp.float32)},
            "other": jnp.zeros((3,), jnp.float32)}

    # padded checkpoint (8 rows) -> unpadded template (7): slice
    padded = np.arange(32, dtype=np.float32).reshape(8, 4)
    np.savez(tmp_path / "p.npz", **{"decoder/token_emb": padded,
                                    "other": np.ones(3, np.float32)})
    out = load_init_params(str(tmp_path / "p.npz"), tmpl, cfg=None)
    np.testing.assert_array_equal(np.asarray(out["decoder"]["token_emb"]),
                                  padded[:7])
    np.testing.assert_array_equal(np.asarray(out["other"]), np.ones(3))

    # unpadded checkpoint (7) -> padded template (8): zero-pad
    tmpl8 = {"decoder": {"token_emb": jnp.zeros((8, 4), jnp.float32)}}
    np.savez(tmp_path / "u.npz", **{"decoder/token_emb": padded[:7]})
    out = load_init_params(str(tmp_path / "u.npz"), tmpl8, cfg=None)
    got = np.asarray(out["decoder"]["token_emb"])
    np.testing.assert_array_equal(got[:7], padded[:7])
    assert (got[7] == 0).all()


def test_optim_state_shard_full_ft_parity(tok):
    """ZeRO-1 equivalent (parallel/mesh.shard_opt_state; reference
    fairscale OSS option trainer.py:193-199): full-FT train steps with
    Adam moments sharded over the data axis match the replicated-state
    trajectory, and the big moment leaves actually shard."""
    import dataclasses as dc

    from agacs_tpu.parallel import opt_state_shard_stats, shard_opt_state

    cfg = dataclasses.replace(_cfg(), use_specaug=False)
    params = init_asr_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(n_data=8)
    params = shard_params(mesh, params)
    tx, _ = build_tx(params, OptimConfig(warmup_steps=4))  # full FT
    batch = shard_batch(mesh, _batch(tok))
    step = make_train_step(cfg, tx, donate=False)

    ref = create_train_state(params, tx, jax.random.PRNGKey(1))
    zs = create_train_state(params, tx, jax.random.PRNGKey(1))
    zs = dc.replace(zs, opt_state=shard_opt_state(mesh, zs.opt_state))

    st = opt_state_shard_stats(zs.opt_state)
    assert st["sharded_leaves"] > 0
    assert st["sharded_bytes"] > st["replicated_bytes"]
    # token_emb moments are the largest leaves; verify one is sharded
    mu = zs.opt_state
    big = [l for l in jax.tree.leaves(mu)
           if hasattr(l, "shape") and l.shape[:1] == (51865,)]
    assert big and not big[0].sharding.is_fully_replicated

    for _ in range(2):
        ref, ref_stats = step(ref, batch)
        zs, z_stats = step(zs, batch)
    np.testing.assert_allclose(
        float(z_stats["loss"]), float(ref_stats["loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(z_stats["grad_norm"]), float(ref_stats["grad_norm"]), rtol=1e-5
    )
    # params after two sharded-state updates match the replicated run
    a = np.asarray(ref.params["decoder"]["token_emb"])
    b = np.asarray(zs.params["decoder"]["token_emb"])
    np.testing.assert_allclose(a, b, atol=1e-6)
