"""Corpus perplexity under a trained LM — the
`espnet2.bin.lm_calc_perplexity` utility: text file -> token-level
perplexity (exact token-count weighting, not batch means).

  python -m agacs_tpu.bin.lm_calc_perplexity --lm_exp exp/lm \
      --text data/valid/text [--batch_tokens 8192]
"""

from __future__ import annotations

import argparse
import json
import logging
import os

import numpy as np

import jax
import jax.numpy as jnp


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--lm_exp", required=True,
                   help="LM experiment dir (config.yaml + ave params)")
    p.add_argument("--text", required=True)
    p.add_argument("--params", default=None,
                   help="override checkpoint (default: valid.loss.ave)")
    p.add_argument("--batch_tokens", type=int, default=8192)
    p.add_argument("--output", default=None, help="optional JSON report")
    return p


def main(argv: list[str] | None = None) -> dict:
    from agacs_tpu.utils.runtime import setup as _runtime_setup

    _runtime_setup()
    args = build_argparser().parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    from agacs_tpu.bin.decode import _load_lm_config
    from agacs_tpu.bin.lm_train import _batches
    from agacs_tpu.models.lm import init_lm_params, lm_loss
    from agacs_tpu.text import WhisperTokenIdConverter, WhisperTokenizer
    from agacs_tpu.train.checkpoint import load_pytree_like

    cfg = _load_lm_config(args.lm_exp)
    params_path = args.params or os.path.join(
        args.lm_exp, "valid.loss.ave.params.npz"
    )
    params = load_pytree_like(
        params_path, init_lm_params(jax.random.PRNGKey(0), cfg)
    )

    tok = WhisperTokenizer()
    conv = WhisperTokenIdConverter(tok)
    batches = _batches(args.text, conv, tok, args.batch_tokens)

    step = jax.jit(lambda p, b: lm_loss(p, cfg, b, train=False)[1])
    total_nll = total_tokens = 0.0
    for b in batches:
        stats = step(params, b)
        n = int(np.sum(np.asarray(b["text"]) != -1))
        total_nll += float(stats["loss"]) * n
        total_tokens += n
    nll = total_nll / max(total_tokens, 1)
    report = {
        "nll_per_token": nll,
        "perplexity": float(np.exp(nll)),
        "n_tokens": int(total_tokens),
        "n_batches": len(batches),
    }
    logging.info("perplexity: %s", json.dumps(report))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(report, f, indent=1)
    return report


if __name__ == "__main__":
    main()
