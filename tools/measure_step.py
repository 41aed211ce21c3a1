"""Time the flagship training step for one config point.

Usage: python tools/measure_step.py [--batch 8] [--seconds 15]
          [--remat dots_nb] [--unroll] [--donate] [--steps 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seconds", type=int, default=15)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--remat", default="dots_nb")
    ap.add_argument("--unroll", nargs="?", const="all", default="none",
                    choices=["none", "all", "encoder", "decoder"])
    ap.add_argument("--donate", action="store_true")
    ap.add_argument("--fp32_frozen", action="store_true",
                    help="keep frozen trunk in fp32 (default: bf16 storage)")
    ap.add_argument("--attn", default="auto",
                    choices=["auto", "flash", "einsum"],
                    help="attention backend (ops/attention.fused_mha)")
    ap.add_argument("--int8", action="store_true",
                    help="int8-quantize the frozen trunk linears (W8A8)")
    ap.add_argument("--int8_bwd", default="int8", choices=["int8", "bf16"],
                    help="dgrad path for quantized linears")
    args = ap.parse_args()

    from agacs_tpu.utils.runtime import setup as runtime_setup

    runtime_setup()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _make_batch, whisper_fwd_flops, V5E_PEAK_BF16_FLOPS
    from agacs_tpu.models.asr_model import ASRModelConfig, init_asr_params
    from agacs_tpu.models.whisper import make_config
    from agacs_tpu.train.optim import OptimConfig
    from agacs_tpu.train.trainer import build_tx, create_train_state, make_train_step

    cfg = ASRModelConfig(
        whisper=make_config(
            "small", adapter=True, compute_dtype=jnp.bfloat16,
            remat=args.remat,
            unroll_layers={"none": False, "all": True}.get(
                args.unroll, args.unroll),
            attention_backend=args.attn,
        ),
        cs_weight=0.01,
        use_specaug=True,
    )
    params = init_asr_params(jax.random.PRNGKey(0), cfg)
    tx, mask = build_tx(params, OptimConfig(warmup_steps=500), freeze_preset="adapter")
    if not args.fp32_frozen:
        from agacs_tpu.train.trainer import cast_frozen_params

        params = cast_frozen_params(params, mask)
    if args.int8:
        from agacs_tpu.ops import int8_linear as i8
        from agacs_tpu.train.trainer import quantize_frozen_linears

        i8.BWD_INT8 = args.int8_bwd == "int8"
        params = quantize_frozen_linears(params, mask)
        tx, mask = build_tx(params, OptimConfig(warmup_steps=500),
                            freeze_preset="adapter")
    step = make_train_step(cfg, tx, trainable_mask=mask, donate=args.donate)
    batch = _make_batch(args.batch, args.seconds)
    state = create_train_state(params, tx, jax.random.PRNGKey(1))

    t0 = time.perf_counter()
    state, stats = step(state, batch)
    float(stats["loss"])
    print(f"compile+first: {time.perf_counter() - t0:.1f} s")
    for _ in range(2):
        state, stats = step(state, batch)
    float(stats["loss"])

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, stats = step(state, batch)
    final = float(stats["loss"])
    dt = (time.perf_counter() - t0) / args.steps
    assert np.isfinite(final)
    flops = 3.0 * whisper_fwd_flops(args.batch, args.seconds)
    print(
        f"B{args.batch}x{args.seconds}s remat={args.remat} unroll={args.unroll} "
        f"donate={args.donate} int8={args.int8}: {dt * 1e3:.1f} ms/step, "
        f"{args.batch * args.seconds / dt:.0f} audio-sec/s, "
        f"MFU {flops / dt / V5E_PEAK_BF16_FLOPS:.3f}"
    )


if __name__ == "__main__":
    main()
