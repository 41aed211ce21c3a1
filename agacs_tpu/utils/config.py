"""YAML config system, schema-compatible with the reference's recipe configs.

The reference resolves training config through `config_argparse` +
`ClassChoices` (`tasks/abs_task.py:261-871`, `train/class_choices.py`) and
persists the resolved tree to `exp/.../config.yaml`, which is the single
artifact needed to rebuild the model at inference
(`asr_inference.py:113`). Here the SAME YAML keys (encoder/encoder_conf/
decoder/decoder_conf/model_conf/optim/... as in
`egs2/*/asr1/conf/whisper/*.yaml`) map onto frozen dataclasses, plus
`key=value` dotted CLI overrides. The resolved dict is dumped to the
experiment dir likewise.
"""

from __future__ import annotations

import copy
import dataclasses
from typing import Any

import jax.numpy as jnp
import yaml

from agacs_tpu.models.asr_model import ASRModelConfig
from agacs_tpu.models.whisper import SideNetworkConfig, WhisperConfig, make_config
from agacs_tpu.ops.specaug import SpecAugConfig
from agacs_tpu.train.optim import OptimConfig


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    max_epoch: int = 15
    accum_grad: int = 1
    batch_bins: int = 8_000_000
    batch_type: str = "numel"
    # constant-size batch types (sorted/unsorted/folded) use batch_size;
    # folded shrinks it by ceil(len/fold_length) per the reference
    batch_size: int = 20
    fold_length: tuple[int, ...] = (80000, 150)
    # fixed_shapes bucket-grid ratio: 1.3 -> ~22 compiled shapes at ~21%
    # padding overhead; 1.1 -> ~2x the shapes (and compiles) at ~half the
    # padding (tools/shape_census.py quantifies both for a corpus)
    shape_ratio: float = 1.3
    keep_nbest_models: int = 3
    best_model_criterion: tuple[str, str, str] = ("valid", "acc", "max")
    seed: int = 2022
    log_interval: int = 100
    patience: int | None = None
    freeze_param: str | None = None
    # int8-quantize the FROZEN trunk linears (W8A8 on the MXU's int8 path,
    # ~2x bf16 matmul peak; trainer.quantize_frozen_linears). "int8" or None.
    freeze_quant: str | None = None
    # ZeRO-1 equivalent: shard Adam moments over the data axis
    # (parallel/mesh.shard_opt_state; reference optional fairscale OSS,
    # trainer.py:193-199). For full-FT configs — pointless for PET.
    optim_state_shard: bool = False
    init_param: str | None = None
    num_workers: int = 0


def load_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def apply_overrides(config: dict, overrides: list[str]) -> dict:
    """'a.b.c=value' dotted overrides, YAML-parsed values."""
    config = copy.deepcopy(config)
    for ov in overrides:
        key, _, val = ov.partition("=")
        node = config
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = yaml.safe_load(val)
    return config


def _side_network_config(conf: dict | None) -> SideNetworkConfig | None:
    if not conf:
        return None
    return SideNetworkConfig(
        n_dim=conf.get("n_dim", 192),
        n_head=conf.get("n_head", 4),
        layers=tuple(conf.get("layers", (0, 2, 4, 6, 8, 10))),
    )


def model_config_from_dict(d: dict, compute_dtype: Any = jnp.bfloat16) -> ASRModelConfig:
    """Build ASRModelConfig from a reference-schema config dict
    (e.g. train_asr_whisper_small_adapter_csloss_2stage_check.yaml)."""
    enc_conf = d.get("encoder_conf", {}) or {}
    dec_conf = d.get("decoder_conf", {}) or {}
    model_conf = d.get("model_conf", {}) or {}

    assert d.get("encoder", "whisper") == "whisper", "use task_from_dict for conformer"
    model_size = enc_conf.get("whisper_model", "small")
    side = _side_network_config(
        enc_conf.get("side_network_conf") or dec_conf.get("side_network_conf")
        if (enc_conf.get("side_network") or dec_conf.get("side_network"))
        else None
    )
    # PET flags are per component, like encoder_conf/decoder_conf in the
    # reference recipes (e.g. tmecs pedecoder: decoder-only PE)
    whisper = make_config(
        model_size,
        remat=enc_conf.get("remat", "dots_nb"),
        # "encoder" unrolls the encoder layer scan: -12% step at 16x15 s
        # for a one-off per-shape compile cost (docs/PERF.md round 3);
        # scan (False) stays the default for short runs / CI.
        unroll_layers=enc_conf.get("unroll_layers", False),
        adapter=bool(enc_conf.get("adapter", False) or dec_conf.get("adapter", False)),
        pe_attention=bool(
            enc_conf.get("pe_whisper", False) or dec_conf.get("pe_whisper", False)
        ),
        adapter_encoder=bool(enc_conf.get("adapter", False)),
        adapter_decoder=bool(dec_conf.get("adapter", False)),
        pe_encoder=bool(enc_conf.get("pe_whisper", False)),
        pe_decoder=bool(dec_conf.get("pe_whisper", False)),
        side_network=side,
        compute_dtype=compute_dtype,
    )

    head_mask = model_conf.get("head_mask")
    return ASRModelConfig(
        whisper=whisper,
        ctc_weight=float(model_conf.get("ctc_weight", 0.0)),
        interctc_weight=float(model_conf.get("interctc_weight", 0.0)),
        cs_weight=float(model_conf.get("cs_weight", 0.0)),
        cs_loss_type=str(model_conf.get("cs_loss_type", "attention")),
        c_val_attention=float(model_conf.get("c_val_attention", 0.6)),
        head_percentage=float(model_conf.get("head_percentage", 100.0)),
        lsm_weight=float(model_conf.get("lsm_weight", 0.1)),
        length_normalized_loss=bool(model_conf.get("length_normalized_loss", False)),
        src_layer=int(dec_conf.get("src_layer", 1)),
        # BEHAVIORAL DEVIATION: with estimate_c: true the learnable
        # c_val actually FEEDS the CS loss here; the reference creates
        # the parameter but its live loss never reads it
        # (whisper_decoder.py:85-86 vs espnet_model.py:463-530 — only
        # the dead espnet_model_bak.py uses it). A bit-parity run
        # against the reference must keep estimate_c: false.
        estimate_c=bool(dec_conf.get("estimate_c", False)),
        use_specaug=bool(enc_conf.get("use_specaug", False)),
        specaug=SpecAugConfig.from_dict(enc_conf.get("specaug_conf")),
        head_mask=tuple(map(tuple, head_mask)) if head_mask else None,
    )


def optim_config_from_dict(d: dict) -> OptimConfig:
    oc = d.get("optim_conf", {}) or {}
    sc = d.get("scheduler_conf", {}) or {}
    return OptimConfig(
        optim=d.get("optim", "adamw"),
        lr=float(oc.get("lr", 1.0e-3)),
        weight_decay=float(oc.get("weight_decay", 0.01)),
        betas=tuple(oc.get("betas", (0.9, 0.99))),
        eps=float(oc.get("eps", 1.0e-6)),
        scheduler=d.get("scheduler", "warmuplr"),
        warmup_steps=int(sc.get("warmup_steps", 25000)),
        grad_clip=float(d.get("grad_clip", 1.0)),
    )


def trainer_config_from_dict(d: dict) -> TrainerConfig:
    crit = d.get("best_model_criterion", [["valid", "acc", "max"]])
    if crit and isinstance(crit[0], list):
        crit = crit[0]
    return TrainerConfig(
        max_epoch=int(d.get("max_epoch", 15)),
        accum_grad=int(d.get("accum_grad", 1)),
        batch_bins=int(d.get("batch_bins", 8_000_000)),
        batch_type=d.get("batch_type", "numel"),
        batch_size=int(d.get("batch_size", 20)),
        fold_length=tuple(d.get("fold_length", (80000, 150))),
        shape_ratio=float(d.get("shape_ratio", 1.3)),
        keep_nbest_models=int(d.get("keep_nbest_models", 3)),
        best_model_criterion=tuple(crit),
        seed=int(d.get("seed", 2022)),
        log_interval=int(d.get("log_interval", 100)),
        patience=d.get("patience") if d.get("patience") not in ("none", None) else None,
        freeze_param=d.get("freeze_param"),
        freeze_quant=d.get("freeze_quant"),
        optim_state_shard=bool(d.get("optim_state_shard", False)),
        init_param=d.get("init_param"),
    )


@dataclasses.dataclass(frozen=True)
class Task:
    """Model family selected by the config's `encoder:` key — the ClassChoices
    dispatch (`tasks/asr.py:88-189`) reduced to the two families the
    reference's recipes use."""

    kind: str  # "whisper" | "conformer" | "transducer"
    cfg: Any
    init_fn: Any
    loss_fn: Any


def task_from_dict(d: dict, compute_dtype: Any = jnp.bfloat16) -> Task:
    encoder = d.get("encoder", "whisper")
    if encoder == "whisper":
        from agacs_tpu.models import asr_model

        cfg = model_config_from_dict(d, compute_dtype)
        return Task("whisper", cfg, asr_model.init_asr_params, asr_model.forward)
    if encoder == "conformer":
        from agacs_tpu.models import conformer_asr
        from agacs_tpu.models.conformer import ConformerConfig, TransformerDecoderConfig
        from agacs_tpu.ops.frontend_default import DefaultFrontendConfig

        enc_conf = d.get("encoder_conf", {}) or {}
        dec_conf = d.get("decoder_conf", {}) or {}
        model_conf = d.get("model_conf", {}) or {}
        frontend_conf = d.get("frontend_conf", {}) or {}
        enc = ConformerConfig(
            input_size=int(frontend_conf.get("n_mels", 80)),
            output_size=int(enc_conf.get("output_size", 256)),
            attention_heads=int(enc_conf.get("attention_heads", 4)),
            linear_units=int(enc_conf.get("linear_units", 2048)),
            num_blocks=int(enc_conf.get("num_blocks", 12)),
            cnn_module_kernel=int(enc_conf.get("cnn_module_kernel", 15)),
            macaron_style=bool(enc_conf.get("macaron_style", True)),
            use_cnn_module=bool(enc_conf.get("use_cnn_module", True)),
            conv_norm=str(enc_conf.get("conv_norm", "layer")),
            unroll_layers=bool(enc_conf.get("unroll_layers", False)),
            compute_dtype=compute_dtype,
        )
        dec = TransformerDecoderConfig(
            vocab_size=int(d.get("vocab_size", 51865)),
            attention_heads=int(dec_conf.get("attention_heads", 4)),
            linear_units=int(dec_conf.get("linear_units", 2048)),
            num_blocks=int(dec_conf.get("num_blocks", 6)),
            d_model=enc.output_size,
            compute_dtype=compute_dtype,
        )
        normalize = d.get("normalize", "utterance_mvn")
        norm_conf = d.get("normalize_conf", {}) or {}
        frontend = DefaultFrontendConfig(
            n_fft=int(frontend_conf.get("n_fft", 512)),
            hop_length=int(frontend_conf.get("hop_length", 128)),
            n_mels=int(frontend_conf.get("n_mels", 80)),
            normalize=normalize if normalize not in ("none",) else None,
        )
        if d.get("decoder") == "transducer":
            # transducer family: decoder_conf + joint_net_conf select the
            # RNNT branch (reference tasks/asr.py decoder choices +
            # espnet_model.py:117 use_transducer_decoder)
            from agacs_tpu.models import transducer_asr
            from agacs_tpu.models.transducer import TransducerConfig

            joint_conf = d.get("joint_net_conf", {}) or {}
            tcfg = transducer_asr.TransducerASRConfig(
                encoder=enc,
                decoder=TransducerConfig(
                    vocab_size=int(d.get("vocab_size", 51865)),
                    rnn_type=dec_conf.get("rnn_type", "lstm"),
                    num_layers=int(dec_conf.get("num_layers", 1)),
                    hidden_size=int(dec_conf.get("hidden_size", 320)),
                    dropout=float(dec_conf.get("dropout", 0.0)),
                    dropout_embed=float(dec_conf.get("dropout_embed", 0.0)),
                    joint_space_size=int(joint_conf.get("joint_space_size", 256)),
                    joint_activation=joint_conf.get(
                        "joint_activation_type", "tanh"
                    ),
                ),
                frontend=frontend,
                mvn_stats_path=norm_conf.get("stats_file"),
                ctc_weight=float(model_conf.get("ctc_weight", 0.0)),
                fastemit_lambda=float(model_conf.get("fastemit_lambda", 0.0)),
                use_specaug=d.get("specaug") == "specaug",
                specaug=SpecAugConfig.from_dict(d.get("specaug_conf")),
                joint_chunk_t=(
                    int(model_conf["joint_chunk_t"])
                    if model_conf.get("joint_chunk_t") else None
                ),
            )
            return Task(
                "transducer", tcfg, transducer_asr.init_transducer_asr_params,
                transducer_asr.forward,
            )
        cfg = conformer_asr.ConformerASRConfig(
            encoder=enc,
            decoder=dec,
            frontend=frontend,
            mvn_stats_path=norm_conf.get("stats_file"),
            ctc_weight=float(model_conf.get("ctc_weight", 0.3)),
            interctc_weight=float(model_conf.get("interctc_weight", 0.0)),
            interctc_layers=tuple(enc_conf.get("interctc_layer_idx", ()) or ()),
            lsm_weight=float(model_conf.get("lsm_weight", 0.1)),
            length_normalized_loss=bool(model_conf.get("length_normalized_loss", False)),
            use_specaug=d.get("specaug") == "specaug",
            specaug=SpecAugConfig.from_dict(d.get("specaug_conf")),
        )
        return Task(
            "conformer", cfg, conformer_asr.init_conformer_asr_params,
            conformer_asr.forward,
        )
    raise ValueError(f"unknown encoder family: {encoder}")


def dump_resolved(path: str, d: dict) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(d, f, allow_unicode=True, sort_keys=False)
