"""Attention-map dump CLI — the first-class replacement for the
reference's debugger workflow (`code_util/attention_map.md`: breakpoint at
whisper_decoder.py:242 on EOT, hand-dump plotly heatmaps per head).

Teacher-forces each utterance's reference (or a decoded hypothesis) and
writes the full per-layer/head decoder self-attention score maps as npz
plus token metadata for plotting.

  python -m agacs_tpu.bin.dump_attention --config exp/x/config.yaml \
      --params exp/x/valid.acc.ave.params.npz --data_dir data/dev \
      --output_dir exp/x/att_maps [--utts u1 u2] [--from_hyp]
"""

from __future__ import annotations

import argparse
import json
import logging
import os

import numpy as np

import jax
import jax.numpy as jnp

from agacs_tpu.data import ASRDataset
from agacs_tpu.decode.greedy import greedy_decode
from agacs_tpu.models.asr_model import encode, init_asr_params
from agacs_tpu.models.whisper import whisper_decode
from agacs_tpu.train.checkpoint import load_pytree_like
from agacs_tpu.train.losses import add_sos_eos
from agacs_tpu.utils.config import load_yaml, model_config_from_dict


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--params", default=None)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--utts", nargs="*", default=None)
    p.add_argument("--from_hyp", action="store_true",
                   help="dump maps for the greedy hypothesis instead of the reference text")
    p.add_argument("--plot", action="store_true",
                   help="also render per-layer PNG heatmap grids (the "
                        "attention_map.md plotly dumps, as matplotlib)")
    p.add_argument("--compute_dtype", default="float32")
    return p


def _plot_maps(maps, token_strs, out_png: str) -> None:
    """(L, h, T, T) score maps -> one PNG grid of post-softmax heatmaps."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    l_n, h_n, t, _ = maps.shape
    probs = np.where(np.isfinite(maps), maps, -1e30)
    probs = np.exp(probs - probs.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    fig, axes = plt.subplots(l_n, h_n, figsize=(2.2 * h_n, 2.2 * l_n))
    axes = np.atleast_2d(axes)
    for li in range(l_n):
        for hi in range(h_n):
            ax = axes[li, hi]
            ax.imshow(probs[li, hi], cmap="viridis", aspect="auto")
            ax.set_xticks([]), ax.set_yticks([])
            if hi == 0:
                ax.set_ylabel(f"L{li}", fontsize=8)
            if li == 0:
                ax.set_title(f"H{hi}", fontsize=8)
    fig.suptitle(" ".join(token_strs)[:120], fontsize=9)
    fig.tight_layout()
    fig.savefig(out_png, dpi=90)
    plt.close(fig)


def main(argv: list[str] | None = None) -> dict:
    from agacs_tpu.utils.runtime import setup as _runtime_setup

    _runtime_setup()
    args = build_argparser().parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    cfg = model_config_from_dict(
        load_yaml(args.config), compute_dtype=getattr(jnp, args.compute_dtype)
    )
    params = init_asr_params(jax.random.PRNGKey(0), cfg)
    if args.params:
        params = load_pytree_like(args.params, params)

    ds = ASRDataset(args.data_dir, with_cs_labels=False)
    utts = args.utts or ds.utt_ids
    os.makedirs(args.output_dir, exist_ok=True)

    dumped = {}
    for utt in utts:
        item = ds[utt]
        speech = jnp.asarray(item["speech"])[None, :]
        slen = jnp.asarray([len(item["speech"])], jnp.int32)
        enc_out, _ = encode(params, cfg, speech, slen, train=False)
        if args.from_hyp:
            toks, lens = greedy_decode(params, cfg.whisper, enc_out, max_steps=100)
            ys_in = toks[:, : int(lens[0])]
        else:
            text = jnp.asarray(item["text"])[None, :]
            ys_in, _ = add_sos_eos(text, cfg.sos, cfg.eos, cfg.ignore_id)
        _, aux = whisper_decode(
            params, cfg.whisper, ys_in, enc_out,
            src_layer=0, collect_full_maps=True,
        )
        maps = np.asarray(aux["maps"])[:, 0]  # (L, h, T, T)
        token_ids = np.asarray(ys_in)[0].tolist()
        token_strs = [ds.tokenizer.id_to_token(t) for t in token_ids]
        out_path = os.path.join(args.output_dir, f"{utt}.npz")
        np.savez_compressed(out_path, maps=maps, token_ids=np.asarray(token_ids))
        with open(os.path.join(args.output_dir, f"{utt}.json"), "w") as f:
            json.dump({"tokens": token_strs, "shape": list(maps.shape)}, f,
                      ensure_ascii=False)
        if args.plot:
            _plot_maps(
                maps, token_strs, os.path.join(args.output_dir, f"{utt}.png")
            )
        dumped[utt] = maps.shape
        logging.info("%s: maps %s", utt, maps.shape)
    return dumped


if __name__ == "__main__":
    main()
