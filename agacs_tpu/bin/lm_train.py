"""LM training CLI — `espnet2.bin.lm_train` equivalent (recipe stages 6-9
train the transformer LM the conformer baseline fuses at decode time).

  python -m agacs_tpu.bin.lm_train --train_text data/train/text \
      --valid_text data/valid/text --exp_dir exp/lm \
      [--d_model 512 --num_blocks 16 --max_epoch 15 ...]
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

import jax
import jax.numpy as jnp

from agacs_tpu.data.io import read_scp
from agacs_tpu.models.lm import TransformerLMConfig, init_lm_params, lm_loss
from agacs_tpu.text import WhisperTokenIdConverter, WhisperTokenizer
from agacs_tpu.train.checkpoint import CheckpointManager
from agacs_tpu.train.optim import OptimConfig
from agacs_tpu.train.reporter import Reporter
from agacs_tpu.train.trainer import build_tx, create_train_state, make_eval_step, make_train_step


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train_text", required=True)
    p.add_argument("--valid_text", required=True)
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--d_model", type=int, default=512)
    p.add_argument("--attention_heads", type=int, default=8)
    p.add_argument("--linear_units", type=int, default=2048)
    p.add_argument("--num_blocks", type=int, default=16)
    p.add_argument("--max_epoch", type=int, default=15)
    p.add_argument("--batch_tokens", type=int, default=8192)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--warmup_steps", type=int, default=25000)
    p.add_argument("--seed", type=int, default=2022)
    p.add_argument("--compute_dtype", default="bfloat16")
    return p


def _batches(path: str, conv: WhisperTokenIdConverter, tok, batch_tokens: int):
    texts = list(read_scp(path).values())
    seqs = [conv.tokens2ids(tok.text2tokens(t)) for t in texts if t.strip()]
    seqs.sort(key=len, reverse=True)
    batches, cur, cur_max = [], [], 0
    for s in seqs:
        m = max(cur_max, len(s))
        if cur and m * (len(cur) + 1) > batch_tokens:
            batches.append(cur)
            cur, cur_max, m = [], 0, len(s)
        cur.append(s)
        cur_max = m
    if cur:
        batches.append(cur)
    out = []
    for b in batches:
        t = -(-max(len(s) for s in b) // 8) * 8  # bucket to 8
        arr = np.full((len(b), t), -1, np.int32)
        for i, s in enumerate(b):
            arr[i, : len(s)] = s[:t]
        out.append({"text": jnp.asarray(arr)})
    return out


def main(argv: list[str] | None = None) -> dict:
    from agacs_tpu.utils.runtime import setup as _runtime_setup

    _runtime_setup()
    args = build_argparser().parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    cfg = TransformerLMConfig(
        d_model=args.d_model, attention_heads=args.attention_heads,
        linear_units=args.linear_units, num_blocks=args.num_blocks,
        compute_dtype=getattr(jnp, args.compute_dtype),
    )
    # resolved config is the single artifact needed to rebuild the LM at
    # decode time (cf. abs_task.py:1258-1266 / asr_inference.py:113)
    os.makedirs(args.exp_dir, exist_ok=True)
    from agacs_tpu.utils.config import dump_resolved

    dump_resolved(
        os.path.join(args.exp_dir, "config.yaml"),
        {
            "lm_conf": {
                "d_model": cfg.d_model,
                "attention_heads": cfg.attention_heads,
                "linear_units": cfg.linear_units,
                "num_blocks": cfg.num_blocks,
                "vocab_size": cfg.vocab_size,
            }
        },
    )
    tok = WhisperTokenizer()
    conv = WhisperTokenIdConverter(tok)
    train_b = _batches(args.train_text, conv, tok, args.batch_tokens)
    valid_b = _batches(args.valid_text, conv, tok, args.batch_tokens)
    logging.info("train %d batches, valid %d batches", len(train_b), len(valid_b))

    params = init_lm_params(jax.random.PRNGKey(args.seed), cfg)
    tx, _ = build_tx(params, OptimConfig(lr=args.lr, warmup_steps=args.warmup_steps))
    state = create_train_state(params, tx, jax.random.PRNGKey(args.seed + 1))
    step = make_train_step(cfg, tx, loss_fn=lm_loss)
    ev = make_eval_step(cfg, loss_fn=lm_loss)

    mgr = CheckpointManager(args.exp_dir, keep_nbest=3,
                            criterion=("valid", "loss", "min"))
    reporter = Reporter()
    history: dict = {}
    for epoch in range(1, args.max_epoch + 1):
        sub = reporter.start_epoch("train", epoch)
        for b in train_b:
            state, stats = step(state, b)
            sub.register({k: float(v) for k, v in stats.items()}, len(b["text"]))
        reporter.finish_epoch(sub)
        sub = reporter.start_epoch("valid", epoch)
        for b in valid_b:
            stats = ev(state.params, b)
            sub.register({k: float(v) for k, v in stats.items()}, len(b["text"]))
        reporter.finish_epoch(sub)
        history[epoch] = reporter.history[epoch]
        mgr.save_epoch(epoch, state, history)
    mgr.average_nbest(history, state.params)
    reporter.dump(os.path.join(args.exp_dir, "train_history.json"))
    return {"history": history}


if __name__ == "__main__":
    main()
