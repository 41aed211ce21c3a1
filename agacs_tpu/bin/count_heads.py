"""Head-selection CLI — the first-class replacement for the reference's
debugger procedure (`code_util/head_selection.md`): run the frozen model
over a data dir, count language-attending heads on-device, emit the
counts JSON + selected-head mask (replaces attention_count_whispernoft_new.pkl).

  python -m agacs_tpu.bin.count_heads --config conf.yaml \
      --data_dir data/train [--params ckpt.npz] \
      --output counts.json [--head_percentage 100]
"""

from __future__ import annotations

import argparse
import json
import logging

import numpy as np

import jax
import jax.numpy as jnp

from agacs_tpu.adapt.head_selection import (
    count_language_heads,
    count_language_heads_topk,
    save_counts,
    select_heads,
)
from agacs_tpu.data import ASRDataset, collate_batch, num_elements_batches
from agacs_tpu.models.asr_model import ASRModelConfig, encode, init_asr_params
from agacs_tpu.models.whisper import whisper_decode
from agacs_tpu.train.checkpoint import load_pytree_like
from agacs_tpu.train.losses import add_sos_eos
from agacs_tpu.utils.config import load_yaml, model_config_from_dict


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--params", default=None)
    p.add_argument("--output", required=True)
    p.add_argument("--head_percentage", type=float, default=100.0)
    p.add_argument("--batch_bins", type=int, default=2_000_000)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument(
        "--criterion", choices=["mass", "topk_old"], default="mass",
        help="'mass' = the live new_check_attention_language criterion; "
        "'topk_old' = the reference's dead old top-k formulation "
        "(espnet_model.py:312-363), needs full (T, T) maps",
    )
    return p


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

    topk_old = args.criterion == "topk_old"

    @jax.jit
    def batch_counts(params, speech, speech_lengths, text):
        enc_out, _ = encode(params, cfg, speech, speech_lengths, train=False)
        ys_in, _ = add_sos_eos(text, cfg.sos, cfg.eos, cfg.ignore_id)
        _, aux = whisper_decode(
            params, cfg.whisper, ys_in, enc_out,
            src_layer=0,
            collect_lang_cols=not topk_old,
            collect_full_maps=topk_old,
            need_probs=not topk_old,
        )
        if topk_old:
            return count_language_heads_topk(aux["maps"])
        return count_language_heads(aux["p_cols"])

    ds = ASRDataset(args.data_dir, with_cs_labels=False)
    lens = {u: ds.num_samples(u) for u in ds.utt_ids}
    batches = num_elements_batches(lens, args.batch_bins)

    total = None
    for i, utts in enumerate(batches):
        batch = collate_batch([ds[u] for u in utts])
        c = batch_counts(
            params,
            jnp.asarray(batch["speech"]),
            jnp.asarray(batch["speech_lengths"]),
            jnp.asarray(batch["text"]),
        )
        total = c if total is None else total + c
        if (i + 1) % 20 == 0:
            logging.info("counted %d/%d batches", i + 1, len(batches))

    counts = np.asarray(total)
    save_counts(args.output, counts)
    mask = select_heads(counts, args.head_percentage)
    mask_path = args.output.replace(".json", "") + ".mask.json"
    with open(mask_path, "w") as f:
        json.dump({"head_mask": mask.astype(int).tolist()}, f)
    logging.info(
        "saved %s (+mask): %d/%d heads selected",
        args.output, int(mask.sum()), mask.size,
    )
    return {"counts": counts, "mask": mask}


if __name__ == "__main__":
    main()
