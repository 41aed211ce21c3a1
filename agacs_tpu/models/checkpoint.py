"""Import OpenAI/reference Whisper torch checkpoints into the agacs_tpu pytree.

Maps the torch state-dict names of the reference's modified Whisper
(`espnet/whisper/whisper/model.py`) — including its PET additions (adapters,
PE dual-QK attention, ladder side networks) — onto the stacked-layer params
produced by `agacs_tpu.models.whisper.init_whisper_params`.

Accepted inputs:
  * a raw OpenAI checkpoint dict {"dims": ..., "model_state_dict": ...}
  * a bare state dict (torch tensors or numpy arrays)
  * ESPnet-trained checkpoints using the wrapper prefixes
    `encoder.encoders.*` / `decoder.decoders.*`
    (espnet2/asr/encoder/whisper_encoder.py:60, decoder/whisper_decoder.py:51)

Weight-layout conventions translated:
  torch Linear weight (out, in)    -> ours (in, out)
  torch Conv1d weight (out, in, w) -> ours (w, in, out)
  per-layer modules blocks.{i}.*   -> stacked leading axis
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from agacs_tpu.models.whisper import WhisperConfig, init_whisper_params


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor without importing torch
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _lin(sd: Mapping, prefix: str, bias: bool = True) -> dict:
    p = {"w": _np(sd[prefix + ".weight"]).T}
    if bias and prefix + ".bias" in sd:
        p["b"] = _np(sd[prefix + ".bias"])
    return p


def _ln(sd: Mapping, prefix: str) -> dict:
    return {"w": _np(sd[prefix + ".weight"]), "b": _np(sd[prefix + ".bias"])}


def _attn(sd: Mapping, prefix: str, pe: bool) -> dict:
    p = {
        "query": _lin(sd, prefix + ".query"),
        "key": _lin(sd, prefix + ".key"),
        "value": _lin(sd, prefix + ".value"),
        "out": _lin(sd, prefix + ".out"),
    }
    if pe and prefix + ".query_cs.weight" in sd:
        p["query_cs"] = _lin(sd, prefix + ".query_cs")
        p["key_cs"] = _lin(sd, prefix + ".key_cs")
        p["gate"] = _np(sd[prefix + ".gate"])
    return p


def _block(sd: Mapping, prefix: str, cfg: WhisperConfig, cross: bool) -> dict:
    p = {
        "attn": _attn(sd, prefix + ".attn", cfg.pe_attention),
        "attn_ln": _ln(sd, prefix + ".attn_ln"),
        "mlp": {
            "fc1": _lin(sd, prefix + ".mlp.0"),
            "fc2": _lin(sd, prefix + ".mlp.2"),
        },
        "mlp_ln": _ln(sd, prefix + ".mlp_ln"),
    }
    if cross:
        p["cross_attn"] = _attn(sd, prefix + ".cross_attn", pe=False)
        p["cross_attn_ln"] = _ln(sd, prefix + ".cross_attn_ln")
    if cfg.adapter and prefix + ".adapter_attn.model.0.weight" in sd:
        p["adapter_attn"] = {
            "down": _lin(sd, prefix + ".adapter_attn.model.0"),
            "up": _lin(sd, prefix + ".adapter_attn.model.2"),
        }
        p["adapter_attn_ln"] = _ln(sd, prefix + ".adapter_attn_ln")
        p["adapter_mlp"] = {
            "down": _lin(sd, prefix + ".adapter_mlp.model.0"),
            "up": _lin(sd, prefix + ".adapter_mlp.model.2"),
        }
        p["adapter_mlp_ln"] = _ln(sd, prefix + ".adapter_mlp_ln")
    return p


def _stack(blocks: list[dict]) -> dict:
    return jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs, axis=0)), *blocks)


def _merge_missing(loaded: Any, template: Any) -> Any:
    """Fill pytree leaves/subtrees absent from the checkpoint (e.g. freshly
    added adapters under `strict=False` load, whisper/__init__.py:254-259)
    from the randomly-initialized template."""
    if isinstance(template, dict):
        out = {}
        for key, tval in template.items():
            if isinstance(loaded, dict) and key in loaded:
                out[key] = _merge_missing(loaded[key], tval)
            else:
                out[key] = tval
        return out
    return jnp.asarray(loaded, dtype=jnp.asarray(template).dtype)


def params_from_state_dict(
    state_dict: Mapping[str, Any],
    cfg: WhisperConfig,
    rng: jax.Array | None = None,
    init_pe_from_base: bool = True,
) -> dict:
    """Build the params pytree from a torch state dict.

    Missing PET parameters are random-initialized (reference loads PET
    variants with strict=False, whisper/__init__.py:254-259); for the PE
    variant, query_cs/key_cs are seeded from query/key like the reference
    (whisper/__init__.py:238-247) when `init_pe_from_base`.
    """
    # strip espnet wrapper prefixes
    sd = {}
    for name, val in state_dict.items():
        name = name.replace("encoder.encoders.", "encoder.")
        name = name.replace("decoder.decoders.", "decoder.")
        name = name.replace("encoder.encoders_sidenetwork.", "encoder_sidenetwork.")
        name = name.replace("decoder.decoders_sidenetwork.", "decoder_sidenetwork.")
        sd[name] = val

    n_enc = cfg.n_audio_layer
    n_dec = cfg.n_text_layer

    enc_cfg, dec_cfg = cfg.part("encoder"), cfg.part("decoder")
    enc_blocks = [_block(sd, f"encoder.blocks.{i}", enc_cfg, cross=False) for i in range(n_enc)]
    dec_blocks = [_block(sd, f"decoder.blocks.{i}", dec_cfg, cross=True) for i in range(n_dec)]

    conv1_w = _np(sd["encoder.conv1.weight"]).transpose(2, 1, 0)
    conv2_w = _np(sd["encoder.conv2.weight"]).transpose(2, 1, 0)

    loaded = {
        "encoder": {
            "conv1": {"w": conv1_w, "b": _np(sd["encoder.conv1.bias"])},
            "conv2": {"w": conv2_w, "b": _np(sd["encoder.conv2.bias"])},
            "blocks": _stack(enc_blocks),
            "ln_post": _ln(sd, "encoder.ln_post"),
        },
        "decoder": {
            "token_emb": _np(sd["decoder.token_embedding.weight"]),
            "pos_emb": _np(sd["decoder.positional_embedding"]),
            "blocks": _stack(dec_blocks),
            "ln": _ln(sd, "decoder.ln"),
        },
    }
    # side networks, if present in the checkpoint
    if cfg.side_network is not None and "encoder_sidenetwork.downsample_input.weight" in sd:
        loaded["encoder_side"] = _side(sd, "encoder_sidenetwork", cfg, cross=False)
        loaded["decoder_side"] = _side(sd, "decoder_sidenetwork", cfg, cross=True)

    template = init_whisper_params(
        rng if rng is not None else jax.random.PRNGKey(0), cfg
    )
    params = _merge_missing(loaded, template)

    if init_pe_from_base:
        for part, pcfg in (("encoder", enc_cfg), ("decoder", dec_cfg)):
            if not pcfg.pe_attention or f"{part}.blocks.0.attn.query_cs.weight" in sd:
                continue
            blocks = params[part]["blocks"]
            blocks["attn"]["query_cs"]["w"] = blocks["attn"]["query"]["w"]
            blocks["attn"]["query_cs"]["b"] = blocks["attn"]["query"]["b"]
            blocks["attn"]["key_cs"]["w"] = blocks["attn"]["key"]["w"]
    return params


def _side(sd: Mapping, prefix: str, cfg: WhisperConfig, cross: bool) -> dict:
    sc = cfg.side_network
    n_side = len(sc.layers)
    import dataclasses

    side_cfg = dataclasses.replace(cfg, adapter=False, pe_attention=False)
    p = {
        "downsample_input": _lin(sd, f"{prefix}.downsample_input"),
        "downsample_layers": _stack(
            [_lin(sd, f"{prefix}.downsample_intermediate_layers.{i}") for i in range(n_side)]
        ),
        "gates": np.stack(
            [_np(sd[f"{prefix}.sigmoid_gate_intermediate_layers.{i}"]).reshape(()) for i in range(n_side)]
        ),
        "blocks": _stack(
            [_block(sd, f"{prefix}.blocks.{i}", side_cfg, cross=cross) for i in range(n_side)]
        ),
        "upsample_output": _lin(sd, f"{prefix}.upsample_output"),
    }
    if cross:
        p["downsample_encoder_input"] = _lin(sd, f"{prefix}.downsample_encoder_input")
        p["ln"] = _ln(sd, f"{prefix}.ln")
    else:
        p["ln_post"] = _ln(sd, f"{prefix}.ln_post")
        p["gate_output"] = _np(sd[f"{prefix}.sigmoid_gate_output"]).reshape((1,))
    return p


def load_torch_whisper(path: str, cfg: WhisperConfig | None = None, **kw):
    """Load an OpenAI-format .pt checkpoint file (requires torch, CPU only)."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        if cfg is None:
            d = ckpt["dims"]
            cfg = WhisperConfig(**{k: d[k] for k in WhisperConfig.__dataclass_fields__ if k in d})
        sd = ckpt["model_state_dict"]
    else:
        sd = ckpt
        assert cfg is not None, "cfg required for bare state dicts"
    return params_from_state_dict(sd, cfg, **kw), cfg
