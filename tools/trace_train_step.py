"""Capture a JAX profiler trace of the flagship training step.

Usage: python tools/trace_train_step.py [--batch 8] [--seconds 15]
          [--steps 5] [--remat dots_nb] [--out /tmp/agacs_trace]
          [--donate]

Then:  python tools/xplane_summary.py <out> --steps N --group-by category
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seconds", type=int, default=15)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--remat", default="dots_nb")
    ap.add_argument("--unroll", nargs="?", const="all", default="none",
                    choices=["none", "all", "encoder", "decoder"])
    ap.add_argument("--out", default="/tmp/agacs_trace")
    ap.add_argument("--donate", action="store_true")
    ap.add_argument("--int8", action="store_true",
                    help="int8-quantize the frozen trunk linears (W8A8)")
    args = ap.parse_args()

    from agacs_tpu.utils.runtime import setup as runtime_setup

    runtime_setup()

    import jax
    import jax.numpy as jnp

    from bench import _make_batch
    from agacs_tpu.models.asr_model import ASRModelConfig, init_asr_params
    from agacs_tpu.models.whisper import make_config
    from agacs_tpu.train.optim import OptimConfig
    from agacs_tpu.train.trainer import build_tx, create_train_state, make_train_step
    from agacs_tpu.utils.profiling import trace

    cfg = ASRModelConfig(
        whisper=make_config(
            "small", adapter=True, compute_dtype=jnp.bfloat16, remat=args.remat,
            unroll_layers={"none": False, "all": True}.get(
                args.unroll, args.unroll),
        ),
        cs_weight=0.01,
        use_specaug=True,
    )
    params = init_asr_params(jax.random.PRNGKey(0), cfg)
    tx, mask = build_tx(params, OptimConfig(warmup_steps=500), freeze_preset="adapter")
    if args.int8:
        from agacs_tpu.train.trainer import quantize_frozen_linears

        params = quantize_frozen_linears(params, mask)
        tx, mask = build_tx(params, OptimConfig(warmup_steps=500),
                            freeze_preset="adapter")
    step = make_train_step(cfg, tx, trainable_mask=mask, donate=args.donate)
    batch = _make_batch(args.batch, args.seconds)
    state = create_train_state(params, tx, jax.random.PRNGKey(1))

    state, stats = step(state, batch)  # compile + warm
    print("warm loss:", float(stats["loss"]))
    state, stats = step(state, batch)
    float(stats["loss"])

    with trace(args.out):
        for _ in range(args.steps):
            state, stats = step(state, batch)
        print("traced loss:", float(stats["loss"]))
    print("trace written to", args.out)


if __name__ == "__main__":
    main()
