"""End-to-end mini recipe: synthetic corpus -> train (CLI) -> decode (CLI)
-> score (CLI) -> head counting (CLI). The equivalent of the reference's
mini_an4 integration fixture (ci/test_integration_espnet2.sh:15-40:
"mini corpus + 1 epoch + greedy decode + sclite")."""

import json
import os

import numpy as np
import pytest
import yaml

from agacs_tpu.data.io import write_scp, write_wav

TINY_CONF = {
    "encoder": "whisper",
    "encoder_conf": {
        "whisper_model": "tiny",
        "use_specaug": True,
        "specaug_conf": {
            "apply_time_warp": True,
            "time_warp_window": 5,
            "apply_freq_mask": True,
            "freq_mask_width_range": [0, 10],
            "num_freq_mask": 2,
            "apply_time_mask": True,
            "time_mask_width_range": [0, 10],
            "num_time_mask": 2,
        },
        "adapter": True,
    },
    "decoder": "whisper",
    "decoder_conf": {"whisper_model": "tiny", "src_layer": 1,
                     "whisper_cs": True, "adapter": True},
    "model_conf": {"ctc_weight": 0.0, "lsm_weight": 0.1, "cs_weight": 0.01,
                   "c_val_attention": 0.6, "head_percentage": 100.0},
    "seed": 2022,
    "log_interval": 2,
    "batch_type": "numel",
    "batch_bins": 100000,
    "accum_grad": 1,
    "max_epoch": 2,
    "keep_nbest_models": 2,
    "best_model_criterion": [["valid", "acc", "max"]],
    "optim": "adamw",
    "grad_clip": 1.0,
    "optim_conf": {"lr": 1.0e-3, "weight_decay": 0.01,
                   "betas": [0.9, 0.99], "eps": 1.0e-6},
    "scheduler": "warmuplr",
    "scheduler_conf": {"warmup_steps": 5},
}

TEXTS = {
    "u01": "我们 go",
    "u02": "hello 你",
    "u03": "好 ok",
    "u04": "去 shop",
    "u05": "this 样",
    "u06": "没 yes",
}


@pytest.fixture(scope="module")
def recipe_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("recipe")
    rng = np.random.RandomState(0)
    for split, utts in [("train", list(TEXTS)[:4]), ("valid", list(TEXTS)[4:])]:
        d = root / "data" / split
        wavs, texts = {}, {}
        for u in utts:
            p = str(d / f"{u}.wav")
            write_wav(p, rng.randn(8000 + 320 * int(u[1:])).astype(np.float32) * 0.1)
            wavs[u] = p
            texts[u] = TEXTS[u]
        write_scp(str(d / "wav.scp"), wavs)
        write_scp(str(d / "text"), texts)
    conf = root / "train.yaml"
    with open(conf, "w") as f:
        yaml.safe_dump(TINY_CONF, f)
    return root


def test_full_recipe(recipe_dir):
    from agacs_tpu.bin import count_heads, decode, score, train

    exp = str(recipe_dir / "exp")
    out = train.main([
        "--config", str(recipe_dir / "train.yaml"),
        "--train_dir", str(recipe_dir / "data/train"),
        "--valid_dir", str(recipe_dir / "data/valid"),
        "--exp_dir", exp,
        "--freeze_param", "adapter",
        "--compute_dtype", "float32",
    ])
    assert os.path.exists(os.path.join(exp, "config.yaml"))
    assert os.path.exists(os.path.join(exp, "valid.acc.ave.params.npz"))
    assert 1 in out["history"] and 2 in out["history"]
    assert np.isfinite(out["history"][2]["train"]["loss"])
    assert "loss_cs" in out["history"][2]["train"]
    # eval-epoch cer/wer (ErrorCalculator, espnet_model.py:955-959) — a
    # best-model criterion like ("valid", "cer", "min") can select on them
    assert "cer" in out["history"][2]["valid"]
    assert "wer" in out["history"][2]["valid"]
    assert out["history"][2]["valid"]["cer"] >= 0.0
    # observability sinks under exp/ (trainer.py:254-265,802+ equivalents)
    import glob as _glob

    assert _glob.glob(os.path.join(exp, "tensorboard", "events.out.tfevents.*"))
    assert os.path.exists(os.path.join(exp, "images", "loss.png"))
    assert _glob.glob(os.path.join(exp, "att_ws", "*", "ep*.png"))

    # decode the valid set greedily
    dec_dir = str(recipe_dir / "decode_valid")
    dec = decode.main([
        "--config", os.path.join(exp, "config.yaml"),
        "--params", os.path.join(exp, "valid.acc.ave.params.npz"),
        "--data_dir", str(recipe_dir / "data/valid"),
        "--output_dir", dec_dir,
        "--beam_size", "1",
        "--max_steps", "8",
        "--compute_dtype", "float32",
    ])
    assert os.path.exists(os.path.join(dec_dir, "hyp.trn"))
    assert dec["rtf"]["rtf"] > 0

    # score
    score_dir = str(recipe_dir / "score")
    rep = score.main([
        "--ref", os.path.join(dec_dir, "ref.trn"),
        "--hyp", os.path.join(dec_dir, "hyp.trn"),
        "--output_dir", score_dir,
    ])
    assert os.path.exists(os.path.join(score_dir, "result.json"))
    # untrained tiny model on synthetic noise: just require a sane table
    assert rep["mer"]["ref_tokens"] > 0
    assert rep["mer"]["err"] >= 0

    # head counting CLI
    counts_path = str(recipe_dir / "counts.json")
    hc = count_heads.main([
        "--config", os.path.join(exp, "config.yaml"),
        "--data_dir", str(recipe_dir / "data/train"),
        "--params", os.path.join(exp, "valid.acc.ave.params.npz"),
        "--output", counts_path,
        "--compute_dtype", "float32",
    ])
    assert hc["counts"].shape == (4, 6)  # tiny: 4 layers, 6 heads
    with open(counts_path) as f:
        assert json.load(f)["shape"] == [4, 6]


def test_resume(recipe_dir):
    """--resume restarts from the saved epoch (trainer.py:133-158)."""
    from agacs_tpu.bin import train

    exp = str(recipe_dir / "exp")
    out = train.main([
        "--config", str(recipe_dir / "train.yaml"),
        "--train_dir", str(recipe_dir / "data/train"),
        "--valid_dir", str(recipe_dir / "data/valid"),
        "--exp_dir", exp,
        "--freeze_param", "adapter",
        "--compute_dtype", "float32",
        "--resume",
        "--max_epoch", "3",
    ])
    assert 3 in out["history"]


def test_orbax_checkpoint_backend(tmp_path):
    """CheckpointManager(backend='orbax') round-trips sharded params +
    optimizer state and resumes identically to the npz backend (the
    multi-host-safe path: no host gather on save)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from agacs_tpu.models.asr_model import ASRModelConfig, init_asr_params
    from agacs_tpu.models.whisper import WhisperConfig
    from agacs_tpu.parallel import make_mesh, shard_params
    from agacs_tpu.train.checkpoint import CheckpointManager
    from agacs_tpu.train.optim import OptimConfig
    from agacs_tpu.train.trainer import build_tx, create_train_state

    cfg = ASRModelConfig(
        whisper=WhisperConfig(
            n_mels=80, n_audio_ctx=10, n_audio_state=64, n_audio_head=4,
            n_audio_layer=1, n_vocab=64, n_text_ctx=8, n_text_state=64,
            n_text_head=4, n_text_layer=1,
        ),
        use_specaug=False,
    )
    mesh = make_mesh(n_data=4, n_model=2)
    params = init_asr_params(jax.random.PRNGKey(0), cfg)
    params = shard_params(mesh, params, tensor_parallel=True)
    tx, _ = build_tx(params, OptimConfig(warmup_steps=2))
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    state = dataclasses.replace(state, step=jnp.int32(7))

    mgr = CheckpointManager(str(tmp_path), keep_nbest=2, backend="orbax")
    history = {1: {"valid": {"acc": 0.5}}}
    mgr.save_epoch(1, state, history)
    assert (tmp_path / "1epoch.params.orbax").is_dir()

    fresh = create_train_state(
        init_asr_params(jax.random.PRNGKey(9), cfg), tx, jax.random.PRNGKey(2)
    )
    restored, start_epoch, hist = mgr.resume(fresh)
    assert start_epoch == 2 and hist == history
    assert int(restored.step) == 7
    a = np.asarray(state.params["encoder"]["conv1"]["w"])
    b = np.asarray(restored.params["encoder"]["conv1"]["w"])
    np.testing.assert_array_equal(a, b)
    # optimizer state restored leaf-exact
    la = jax.tree.leaves(state.opt_state)
    lb = jax.tree.leaves(restored.opt_state)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # n-best averaging writes the portable npz artifact
    avg = mgr.average_nbest(history, state.params)
    assert (tmp_path / "valid.acc.ave.params.npz").exists()


def test_int8_trunk_cli_roundtrip(recipe_dir, tmp_path):
    """freeze_quant: int8 through the CLIs: train quantizes the frozen
    trunk (W8A8, trainer.quantize_frozen_linears), the npz checkpoint
    stores int8 leaves, and decode rebuilds the quantized template from
    the saved config.yaml — including when --freeze_param came from the
    CLI rather than the config (train.main records the resolved value)."""
    import numpy as np

    from agacs_tpu.bin import decode, train

    conf = dict(TINY_CONF, max_epoch=1, freeze_quant="int8")
    conf_path = tmp_path / "train_int8.yaml"
    with open(conf_path, "w") as f:
        yaml.safe_dump(conf, f)
    exp = str(tmp_path / "exp_int8")
    out = train.main([
        "--config", str(conf_path),
        "--train_dir", str(recipe_dir / "data/train"),
        "--valid_dir", str(recipe_dir / "data/valid"),
        "--exp_dir", exp,
        "--freeze_param", "adapter",  # CLI-only on purpose
        "--compute_dtype", "float32",
    ])
    assert np.isfinite(out["history"][1]["train"]["loss"])
    saved = yaml.safe_load(open(os.path.join(exp, "config.yaml")))
    assert saved["freeze_param"] == "adapter"  # resolved CLI value recorded
    assert saved["freeze_quant"] == "int8"
    ckpt = np.load(os.path.join(exp, "valid.acc.ave.params.npz"))
    int8_keys = [k for k in ckpt.files if k.endswith("w_q")]
    assert int8_keys and all(ckpt[k].dtype == np.int8 for k in int8_keys)

    dec_dir = str(tmp_path / "decode_int8")
    dec = decode.main([
        "--config", os.path.join(exp, "config.yaml"),
        "--params", os.path.join(exp, "valid.acc.ave.params.npz"),
        "--data_dir", str(recipe_dir / "data/valid"),
        "--output_dir", dec_dir,
        "--beam_size", "1",
        "--max_steps", "8",
        "--compute_dtype", "float32",
    ])
    assert os.path.exists(os.path.join(dec_dir, "hyp.trn"))
    assert dec["rtf"]["rtf"] > 0
