"""Config task dispatch (whisper vs conformer) + conformer train CLI +
CTC greedy decode."""

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from agacs_tpu.decode.ctc_greedy import collapse_ctc, ctc_greedy_decode
from agacs_tpu.utils.config import task_from_dict

CONFORMER_CONF = {
    "encoder": "conformer",
    "encoder_conf": {"output_size": 64, "attention_heads": 4,
                     "linear_units": 128, "num_blocks": 2},
    "decoder": "transformer",
    "decoder_conf": {"attention_heads": 4, "linear_units": 128, "num_blocks": 2},
    "model_conf": {"ctc_weight": 0.3, "lsm_weight": 0.1},
    "specaug": "specaug",
    "specaug_conf": {"apply_time_warp": False, "apply_freq_mask": True,
                     "freq_mask_width_range": [0, 10], "num_freq_mask": 2,
                     "apply_time_mask": True, "time_mask_width_range": [0, 10],
                     "num_time_mask": 2},
    "optim": "adam", "optim_conf": {"lr": 1.0e-3},
    "scheduler": "warmuplr", "scheduler_conf": {"warmup_steps": 5},
    "batch_bins": 100000, "max_epoch": 1, "keep_nbest_models": 1,
}


def test_whisper_task_dispatch():
    task = task_from_dict(
        {"encoder": "whisper", "encoder_conf": {"whisper_model": "tiny"},
         "model_conf": {"cs_weight": 0.01}},
        compute_dtype=jnp.float32,
    )
    assert task.kind == "whisper"
    assert task.cfg.whisper.n_audio_layer == 4
    assert task.cfg.cs_weight == 0.01


def test_conformer_task_dispatch_and_step():
    task = task_from_dict(CONFORMER_CONF, compute_dtype=jnp.float32)
    assert task.kind == "conformer"
    assert task.cfg.encoder.output_size == 64
    assert task.cfg.use_specaug

    params = task.init_fn(jax.random.PRNGKey(0), task.cfg)
    rng = np.random.RandomState(0)
    batch = {
        "speech": jnp.asarray(rng.randn(2, 8000).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray([8000, 6000], jnp.int32),
        "text": jnp.asarray([[5, 6, 7, -1], [8, 9, -1, -1]], jnp.int32),
    }
    loss, stats = task.loss_fn(params, task.cfg, batch, train=False, rng=None)
    assert np.isfinite(float(loss)) and "loss_ctc" in stats


def test_conformer_train_cli(tmp_path):
    from agacs_tpu.bin import train
    from agacs_tpu.data.io import write_scp, write_wav

    rng = np.random.RandomState(0)
    for split in ("train", "valid"):
        d = tmp_path / split
        wavs, texts = {}, {}
        for u in ("a", "b"):
            p = str(d / f"{u}.wav")
            write_wav(p, rng.randn(8000).astype(np.float32) * 0.1)
            wavs[u] = p
            texts[u] = "我们 ok"
        write_scp(str(d / "wav.scp"), wavs)
        write_scp(str(d / "text"), texts)
    conf = tmp_path / "conf.yaml"
    with open(conf, "w") as f:
        yaml.safe_dump(CONFORMER_CONF, f)

    out = train.main([
        "--config", str(conf),
        "--train_dir", str(tmp_path / "train"),
        "--valid_dir", str(tmp_path / "valid"),
        "--exp_dir", str(tmp_path / "exp"),
        "--compute_dtype", "float32",
    ])
    assert np.isfinite(out["history"][1]["train"]["loss"])
    assert "loss_ctc" in out["history"][1]["train"]

    # decode the valid set with the joint CTC/attention beam
    from agacs_tpu.bin import decode

    dec = decode.main([
        "--config", str(tmp_path / "exp" / "config.yaml"),
        "--params", str(tmp_path / "exp" / "valid.acc.ave.params.npz"),
        "--data_dir", str(tmp_path / "valid"),
        "--output_dir", str(tmp_path / "dec"),
        "--beam_size", "2",
        "--max_steps", "6",
        "--ctc_weight", "0.3",
        "--compute_dtype", "float32",
    ])
    assert len(dec["hyps"]) == 2
    assert dec["rtf"]["rtf"] > 0
    assert (tmp_path / "dec" / "hyp.trn").exists()

    # decode again with LM shallow fusion from a trained LM experiment:
    # the LM architecture must round-trip through its own config.yaml
    from agacs_tpu.bin import lm_train

    lm_train.main([
        "--train_text", str(tmp_path / "train" / "text"),
        "--valid_text", str(tmp_path / "valid" / "text"),
        "--exp_dir", str(tmp_path / "lm"),
        "--d_model", "32", "--attention_heads", "4",
        "--linear_units", "64", "--num_blocks", "2",
        "--max_epoch", "1", "--compute_dtype", "float32",
    ])
    dec_lm = decode.main([
        "--config", str(tmp_path / "exp" / "config.yaml"),
        "--params", str(tmp_path / "exp" / "valid.acc.ave.params.npz"),
        "--data_dir", str(tmp_path / "valid"),
        "--output_dir", str(tmp_path / "dec_lm"),
        "--beam_size", "2", "--max_steps", "6",
        "--ctc_weight", "0.3",
        "--lm_exp", str(tmp_path / "lm"), "--lm_weight", "0.3",
        "--compute_dtype", "float32",
    ])
    assert len(dec_lm["hyps"]) == 2


def test_collapse_ctc():
    ids = np.array([[0, 3, 3, 0, 4, 4, 4, 0, 3, 0]])
    assert collapse_ctc(ids) == [[3, 4, 3]]
    assert collapse_ctc(np.array([[0, 0, 0]])) == [[]]


def test_ctc_greedy_decode_pipeline():
    from agacs_tpu.models.conformer import ConformerConfig, TransformerDecoderConfig
    from agacs_tpu.models import conformer_asr

    cfg = conformer_asr.ConformerASRConfig(
        encoder=ConformerConfig(output_size=64, linear_units=128, num_blocks=2),
        decoder=TransformerDecoderConfig(d_model=64, linear_units=128, num_blocks=2),
        use_specaug=False,
    )
    params = conformer_asr.init_conformer_asr_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    batch = {
        "speech": jnp.asarray(rng.randn(2, 8000).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray([8000, 8000], jnp.int32),
    }

    def enc(params, s, sl):
        return conformer_asr.encode(params, cfg, s, sl)

    hyps = ctc_greedy_decode(params, enc, batch)
    assert len(hyps) == 2
    assert all(isinstance(h, list) for h in hyps)


def test_init_param_prefix_mapping(tmp_path):
    """--init_param path:src:dst:exclude mapping semantics
    (espnet2 load_pretrained_model / abs_task.py:627-651)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from agacs_tpu.bin.train import load_init_params
    from agacs_tpu.models.asr_model import ASRModelConfig, init_asr_params
    from agacs_tpu.models.whisper import WhisperConfig
    from agacs_tpu.train.checkpoint import save_pytree

    cfg = ASRModelConfig(
        whisper=WhisperConfig(
            n_mels=80, n_audio_ctx=10, n_audio_state=64, n_audio_head=4,
            n_audio_layer=1, n_vocab=50, n_text_ctx=8, n_text_state=64,
            n_text_head=4, n_text_layer=1,
        ),
        use_specaug=False,
    )
    src_params = init_asr_params(jax.random.PRNGKey(5), cfg)
    ckpt = str(tmp_path / "src.params.npz")
    save_pytree(ckpt, src_params)

    tgt = init_asr_params(jax.random.PRNGKey(9), cfg)
    # load ONLY the encoder subtree, excluding its conv stem
    loaded = load_init_params(f"{ckpt}:encoder:encoder:encoder/conv1", tgt, cfg)
    np.testing.assert_array_equal(
        np.asarray(loaded["encoder"]["blocks"]["attn"]["query"]["w"]),
        np.asarray(src_params["encoder"]["blocks"]["attn"]["query"]["w"]),
    )
    # excluded + outside-src leaves keep the target init
    np.testing.assert_array_equal(
        np.asarray(loaded["encoder"]["conv1"]["w"]),
        np.asarray(tgt["encoder"]["conv1"]["w"]),
    )
    np.testing.assert_array_equal(
        np.asarray(loaded["decoder"]["token_emb"]),
        np.asarray(tgt["decoder"]["token_emb"]),
    )


def test_decode_config_yaml_defaults(tmp_path):
    """--decode_config YAML supplies decode options (decode_asr_whisper.yaml
    schema); explicit CLI flags override; maxlenratio-bearing configs
    derive maxlen from encoder frames (max_steps 0); penalty maps to
    length_bonus."""
    from agacs_tpu.bin.decode import _apply_decode_config, build_argparser
    from agacs_tpu.utils.config import dump_resolved

    dc = tmp_path / "decode.yaml"
    dump_resolved(str(dc), {
        "beam_size": 4, "ctc_weight": 0.2, "lm_weight": 0.0,
        "maxlenratio": 0.0, "minlenratio": 0.0, "penalty": 0.5,
    })
    argv = ["--config", "x.yaml", "--params", "p", "--data_dir", "d",
            "--output_dir", "o", "--decode_config", str(dc),
            "--beam_size", "2"]
    args = build_argparser().parse_args(argv)
    _apply_decode_config(args, str(dc), argv)
    assert args.beam_size == 2          # explicit CLI flag wins
    assert args.ctc_weight == 0.2       # YAML default applied
    assert args.length_bonus == 0.5     # penalty -> length_bonus
    assert args.max_steps == 0          # maxlenratio config derives maxlen
    assert args.maxlenratio == 0.0


def test_average_checkpoints_cli(tmp_path):
    """Standalone state-dict averaging (average_nbest_models as a tool)."""
    import numpy as np

    from agacs_tpu.bin.average_checkpoints import main as ave_main
    from agacs_tpu.train.checkpoint import load_pytree_like, save_pytree

    t1 = {"a": np.full((3,), 1.0, np.float32), "b": {"c": np.full((2,), 3.0)}}
    t2 = {"a": np.full((3,), 3.0, np.float32), "b": {"c": np.full((2,), 5.0)}}
    p1, p2 = str(tmp_path / "e1.npz"), str(tmp_path / "e2.npz")
    save_pytree(p1, t1)
    save_pytree(p2, t2)
    out = str(tmp_path / "ave.npz")
    ave_main(["--inputs", p1, p2, "--output", out])
    avg = load_pytree_like(out, t1)
    np.testing.assert_allclose(np.asarray(avg["a"]), 2.0)
    np.testing.assert_allclose(np.asarray(avg["b"]["c"]), 4.0)


def test_dump_attention_cli(tmp_path):
    """attention_map.md workflow CLI: per-utterance decoder self-attn maps
    as npz + PNG heatmap grids."""
    import glob

    import numpy as np

    from agacs_tpu.bin.dump_attention import main as dump_main
    from agacs_tpu.data.io import write_scp, write_wav
    from agacs_tpu.utils.config import dump_resolved

    rng = np.random.RandomState(0)
    wavs, texts = {}, {}
    for i in range(2):
        p = str(tmp_path / f"u{i}.wav")
        write_wav(p, (0.1 * rng.randn(8000)).astype(np.float32))
        wavs[f"u{i}"] = p
        texts[f"u{i}"] = "我们 go"
    write_scp(str(tmp_path / "wav.scp"), wavs)
    write_scp(str(tmp_path / "text"), texts)
    dump_resolved(str(tmp_path / "config.yaml"), {
        "encoder": "whisper",
        "encoder_conf": {"whisper_model": "tiny", "use_specaug": False},
        "model_conf": {},
    })
    dump_main([
        "--config", str(tmp_path / "config.yaml"),
        "--data_dir", str(tmp_path),
        "--output_dir", str(tmp_path / "att"),
        "--utts", "u0", "--plot", "--compute_dtype", "float32",
    ])
    npz = glob.glob(str(tmp_path / "att" / "*.npz"))
    assert npz
    d = np.load(npz[0])
    assert d["maps"].ndim == 4  # (L, h, T, T)
    assert glob.glob(str(tmp_path / "att" / "*.png"))


TRANSDUCER_CONF = {
    "encoder": "conformer",
    "encoder_conf": {"output_size": 32, "attention_heads": 2,
                     "linear_units": 48, "num_blocks": 2,
                     "cnn_module_kernel": 7},
    "decoder": "transducer",
    "decoder_conf": {"rnn_type": "lstm", "num_layers": 1, "hidden_size": 24},
    "joint_net_conf": {"joint_space_size": 16},
    "model_conf": {"ctc_weight": 0.2},
    "vocab_size": 51865,
    "optim": "adam", "optim_conf": {"lr": 1.0e-3},
    "scheduler": "warmuplr", "scheduler_conf": {"warmup_steps": 5},
    "batch_bins": 100000, "max_epoch": 1, "keep_nbest_models": 1,
    # no acc stat on the transducer branch; select on valid loss
    "best_model_criterion": [["valid", "loss", "min"]],
}


def test_transducer_task_dispatch_and_step():
    task = task_from_dict(TRANSDUCER_CONF, compute_dtype=jnp.float32)
    assert task.kind == "transducer"
    assert task.cfg.decoder.hidden_size == 24
    assert task.cfg.ctc_weight == 0.2

    params = task.init_fn(jax.random.PRNGKey(0), task.cfg)
    rng = np.random.RandomState(0)
    batch = {
        "speech": jnp.asarray(rng.randn(2, 8000).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray([8000, 6000], jnp.int32),
        "text": jnp.asarray([[5, 6, 7, -1], [8, 9, -1, -1]], jnp.int32),
    }
    loss, stats = task.loss_fn(params, task.cfg, batch, train=False, rng=None)
    assert np.isfinite(float(loss))
    assert "loss_transducer" in stats and "loss_ctc" in stats


def test_transducer_train_and_decode_cli(tmp_path):
    """Transducer family end-to-end: bin/train 1 epoch on a toy corpus,
    then bin/decode with batched greedy and with the default beam."""
    from agacs_tpu.bin import decode, train
    from agacs_tpu.data.io import write_scp, write_wav

    rng = np.random.RandomState(0)
    for split in ("train", "valid"):
        d = tmp_path / split
        wavs, texts = {}, {}
        for u in ("a", "b"):
            p = str(d / f"{u}.wav")
            write_wav(p, rng.randn(8000).astype(np.float32) * 0.1)
            wavs[u] = p
            texts[u] = "我们 ok"
        write_scp(str(d / "wav.scp"), wavs)
        write_scp(str(d / "text"), texts)
    conf = tmp_path / "conf.yaml"
    with open(conf, "w") as f:
        yaml.safe_dump(TRANSDUCER_CONF, f)

    out = train.main([
        "--config", str(conf),
        "--train_dir", str(tmp_path / "train"),
        "--valid_dir", str(tmp_path / "valid"),
        "--exp_dir", str(tmp_path / "exp"),
        "--compute_dtype", "float32",
    ])
    assert np.isfinite(out["history"][1]["train"]["loss"])
    assert "loss_transducer" in out["history"][1]["train"]
    # transducer eval cer/wer comes from batched greedy decoding
    # (ErrorCalculatorTransducer role), not teacher-forced argmax
    assert "cer" in out["history"][1]["valid"]
    assert out["history"][1]["valid"]["cer"] >= 0.0

    ave = str(tmp_path / "exp" / "valid.loss.ave.params.npz")
    dec = decode.main([
        "--config", str(tmp_path / "exp" / "config.yaml"),
        "--params", ave,
        "--data_dir", str(tmp_path / "valid"),
        "--output_dir", str(tmp_path / "dec"),
        "--beam_size", "1",
        "--compute_dtype", "float32",
    ])
    assert len(dec["hyps"]) == 2 and dec["rtf"]["rtf"] > 0

    dec_beam = decode.main([
        "--config", str(tmp_path / "exp" / "config.yaml"),
        "--params", ave,
        "--data_dir", str(tmp_path / "valid"),
        "--output_dir", str(tmp_path / "dec_beam"),
        "--beam_size", "2",
        "--compute_dtype", "float32",
    ])
    assert len(dec_beam["hyps"]) == 2

    dec_tsd = decode.main([
        "--config", str(tmp_path / "exp" / "config.yaml"),
        "--params", ave,
        "--data_dir", str(tmp_path / "valid"),
        "--output_dir", str(tmp_path / "dec_tsd"),
        "--beam_size", "2",
        "--transducer_search", "tsd",
        "--compute_dtype", "float32",
    ])
    assert len(dec_tsd["hyps"]) == 2
