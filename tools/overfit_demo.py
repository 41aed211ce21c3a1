"""End-to-end learning demonstration: overfit whisper-tiny (random init) on
a tiny synthetic corpus of distinguishable tones with mixed zh/en
transcripts, then greedy-decode and score. Exercises the full stack —
frontend, model, CS loss, trainer, KV-cached decode, tokenizer, scoring —
and must reach ~0% MER on the training utterances.

  PYTHONPATH=. python tools/overfit_demo.py [--steps 150]
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--lr", type=float, default=3e-4)
    args = ap.parse_args()

    from agacs_tpu.adapt import attention_target_labels
    from agacs_tpu.decode.greedy import greedy_decode
    from agacs_tpu.eval.scoring import score_report
    from agacs_tpu.models import asr_model
    from agacs_tpu.models.asr_model import ASRModelConfig, init_asr_params
    from agacs_tpu.models.whisper import make_config
    from agacs_tpu.text import WhisperTokenIdConverter, WhisperTokenizer
    from agacs_tpu.train.optim import OptimConfig
    from agacs_tpu.train.trainer import build_tx, create_train_state, make_train_step
    from agacs_tpu.utils.runtime import fetch, setup

    setup()
    tok = WhisperTokenizer()
    conv = WhisperTokenIdConverter(tok)

    texts = [
        "我们 go shopping",
        "hello 你好",
        "这样 ok 吗",
        "sure 没 问题",
        "今天 very good",
        "run 快 点",
        "吃 lunch 了",
        "see you 明天",
    ]
    b = len(texts)
    secs = 2
    s = secs * 16000
    rng = np.random.RandomState(0)
    t_ax = np.arange(s) / 16000.0
    speech = np.stack(
        [
            (np.sin(2 * np.pi * (200 + 70 * i) * t_ax)
             + 0.5 * np.sin(2 * np.pi * (900 + 130 * i) * t_ax)).astype(np.float32)
            * 0.3
            for i in range(b)
        ]
    )
    ids = [conv.tokens2ids(tok.text2tokens(t)) for t in texts]
    tmax = max(len(x) for x in ids)
    text_arr = np.full((b, tmax), -1, np.int64)
    for i, x in enumerate(ids):
        text_arr[i, : len(x)] = x
    ys_in = np.concatenate(
        [np.full((b, 1), 50258), np.where(text_arr == -1, 50257, text_arr)], 1
    )
    batch = {
        "speech": jnp.asarray(speech),
        "speech_lengths": jnp.full((b,), s, jnp.int32),
        "text": jnp.asarray(text_arr.astype(np.int32)),
        "cs_labels": jnp.asarray(attention_target_labels(ys_in, tok)),
    }

    cfg = ASRModelConfig(
        whisper=make_config("tiny", compute_dtype=jnp.bfloat16),
        cs_weight=0.01,
        use_specaug=False,
    )
    params = init_asr_params(jax.random.PRNGKey(0), cfg)
    tx, mask = build_tx(
        params, OptimConfig(lr=args.lr, warmup_steps=50), freeze_preset=None
    )
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    step = make_train_step(cfg, tx, trainable_mask=mask)

    t0 = time.time()
    for i in range(args.steps):
        state, stats = step(state, batch)
        if (i + 1) % 25 == 0:
            print(
                f"step {i+1}: loss={fetch(stats['loss']):.3f} "
                f"acc={fetch(stats['acc']):.3f} loss_cs={fetch(stats['loss_cs']):.3f}"
            )
    print(f"trained {args.steps} steps in {time.time()-t0:.1f}s")

    enc, _ = jax.jit(
        lambda p, sp, il: asr_model.encode(p, cfg, sp, il, train=False)
    )(state.params, batch["speech"], batch["speech_lengths"])
    tokens, lens = greedy_decode(
        state.params, cfg.whisper, enc, max_steps=tmax + 4
    )
    tokens, lens = np.asarray(tokens), np.asarray(lens)

    refs, hyps = {}, {}
    for i in range(b):
        hyp_ids = [t for t in tokens[i, : lens[i]].tolist() if t < 50257]
        hyps[f"u{i}"] = tok.decode(hyp_ids)
        refs[f"u{i}"] = texts[i]
        print(f"u{i}: ref={texts[i]!r} hyp={hyps[f'u{i}']!r}")
    rep = score_report(refs, hyps)
    print("MER:", rep["mer"]["err"], "%  (expect ~0 after overfit)")
    return rep


if __name__ == "__main__":
    main()
