"""Decoding CLI — the `espnet2.bin.asr_inference` / recipe stage-12
equivalent: data dir -> hyp.trn + ref.trn + RTF report.

  python -m agacs_tpu.bin.decode --config exp/x/config.yaml \
      --params exp/x/valid.acc.ave.params.npz \
      --data_dir data/dev --output_dir exp/x/decode_dev \
      [--beam_size 1] [--max_steps 200] [--batch_size 8]
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
from agacs_tpu.decode.speech2text import Speech2Text
from agacs_tpu.eval.scoring import write_trn
from agacs_tpu.models.asr_model import init_asr_params
from agacs_tpu.train.checkpoint import load_pytree_like
from agacs_tpu.utils.config import load_yaml, model_config_from_dict


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--params", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--beam_size", type=int, default=1)
    p.add_argument("--max_steps", type=int, default=200)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--length_bonus", type=float, default=0.0)
    p.add_argument("--compute_dtype", default="bfloat16")
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
    params = load_pytree_like(args.params, params)

    ds = ASRDataset(args.data_dir, with_cs_labels=False)
    s2t = Speech2Text(
        params, cfg, beam_size=args.beam_size, max_steps=args.max_steps,
        length_bonus=args.length_bonus,
    )

    hyps: dict[str, str] = {}
    refs: dict[str, str] = {}
    # batch utterances of similar length together (padded to the batch max)
    utts = sorted(ds.utt_ids, key=ds.num_samples)
    for i in range(0, len(utts), args.batch_size):
        chunk = utts[i : i + args.batch_size]
        items = [ds[u] for u in chunk]
        s_max = max(len(it["speech"]) for it in items)
        audio = np.zeros((len(items), s_max), np.float32)
        for k, it in enumerate(items):
            audio[k, : len(it["speech"])] = it["speech"]
        results = s2t(audio)
        for u, r in zip(chunk, results):
            hyps[u] = r.text
            refs[u] = ds.text[u]
        logging.info("decoded %d/%d (running 1/RTF=%.1fx)",
                     min(i + args.batch_size, len(utts)), len(utts),
                     s2t.inverse_rtf)

    os.makedirs(args.output_dir, exist_ok=True)
    write_trn(os.path.join(args.output_dir, "hyp.trn"), hyps)
    write_trn(os.path.join(args.output_dir, "ref.trn"), refs)
    rtf_report = {
        "rtf": s2t.rtf,
        "inverse_rtf": s2t.inverse_rtf,
        "audio_seconds": s2t._audio_seconds,
        "decode_seconds": s2t._decode_seconds,
        "n_utts": len(utts),
    }
    with open(os.path.join(args.output_dir, "rtf.json"), "w") as f:
        json.dump(rtf_report, f, indent=1)
    logging.info("RTF=%.4f (decode %.1fs / audio %.1fs)",
                 s2t.rtf, s2t._decode_seconds, s2t._audio_seconds)
    return {"hyps": hyps, "refs": refs, "rtf": rtf_report}


if __name__ == "__main__":
    main()
