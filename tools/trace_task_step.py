"""Capture a JAX profiler trace of a conformer/transducer training step.

The conformer-hybrid and transducer tracks (bench.py regression rows) have
their own stall profiles — this drives the exact bench configuration
through the profiler so xplane_summary/xplane_timeline attribution matches
the benched step.

Usage: python tools/trace_task_step.py --track conformer [--batch 16]
          [--seconds 15] [--steps 5] [--unroll] [--vocab 5000]
          [--out /tmp/agacs_conf_trace]
Then:  python tools/xplane_summary.py <out> --steps N --group-by name
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--track", choices=["conformer", "transducer"],
                    default="conformer")
    ap.add_argument("--batch", type=int, default=0)  # 0 = bench default
    ap.add_argument("--seconds", type=int, default=15)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--unroll", action="store_true",
                    help="encoder_conf.unroll_layers: true (recipe setting)")
    ap.add_argument("--vocab", type=int, default=5000)
    ap.add_argument("--joint-chunk-t", type=int, default=0)
    ap.add_argument("--out", default="/tmp/agacs_task_trace")
    args = ap.parse_args()

    from agacs_tpu.utils.runtime import setup as runtime_setup

    runtime_setup()

    import jax

    from bench import _conformer_batch
    from agacs_tpu.train.optim import OptimConfig
    from agacs_tpu.train.trainer import (
        build_tx, create_train_state, make_train_step,
    )
    from agacs_tpu.utils.config import task_from_dict
    from agacs_tpu.utils.profiling import trace

    enc_conf = {"unroll_layers": bool(args.unroll)}
    if args.track == "conformer":
        batch_size = args.batch or 16
        task = task_from_dict({
            "encoder": "conformer",
            "decoder": "transformer",
            "encoder_conf": enc_conf,
            "model_conf": {"ctc_weight": 0.3, "lsm_weight": 0.1},
            "frontend_conf": {"n_fft": 512, "hop_length": 128, "n_mels": 80},
            "normalize": "utterance_mvn",
            "specaug": "specaug",
        })
        vocab = 51865
    else:
        batch_size = args.batch or 8
        model_conf = {"ctc_weight": 0.3}
        if args.joint_chunk_t:
            model_conf["joint_chunk_t"] = args.joint_chunk_t
        task = task_from_dict({
            "encoder": "conformer",
            "decoder": "transducer",
            "vocab_size": args.vocab,
            "encoder_conf": enc_conf,
            "decoder_conf": {"rnn_type": "lstm", "num_layers": 1,
                             "hidden_size": 320},
            "joint_net_conf": {"joint_space_size": 320},
            "model_conf": model_conf,
            "frontend_conf": {"n_fft": 512, "hop_length": 128, "n_mels": 80},
            "normalize": "utterance_mvn",
            "specaug": "specaug",
        })
        vocab = args.vocab

    params = task.init_fn(jax.random.PRNGKey(0), task.cfg)
    tx, _ = build_tx(params, OptimConfig(warmup_steps=25000))
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    step = make_train_step(task.cfg, tx, loss_fn=task.loss_fn, donate=False)
    batch = _conformer_batch(batch_size, args.seconds, vocab=vocab)

    state, stats = step(state, batch)  # compile + warm
    print("warm loss:", float(stats["loss"]))
    for _ in range(2):
        state, stats = step(state, batch)
    float(stats["loss"])
    t0 = time.perf_counter()
    for _ in range(10):
        state, stats = step(state, batch)
    float(stats["loss"])
    print(f"ms/step: {(time.perf_counter() - t0) * 100:.1f}")

    with trace(args.out):
        for _ in range(args.steps):
            state, stats = step(state, batch)
        print("traced loss:", float(stats["loss"]))
    print("trace written to", args.out)
    sys.stdout.flush()
    os._exit(0)  # skip the minutes-long tunnel session teardown


if __name__ == "__main__":
    main()
