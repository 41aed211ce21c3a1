"""Executed-FLOP MFU calibration (VERDICT r2 weak #6).

bench.py's MFU is analytic (fwd matmul FLOPs x3) and has both-way
errors: the frozen-trunk stop_gradient removes most weight-grad matmuls
(overcount) while remat recompute is uncredited (undercount). This tool
compiles the ACTUAL benchmark train step and reports XLA's own
cost-analysis FLOP count for the optimized HLO next to the analytic
figure, giving a one-off calibration factor for the bench numbers.

Usage: python tools/executed_flops.py [--batch 8] [--seconds 15]
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
    ap.add_argument("--remat", default="dots_nb")
    args = ap.parse_args()

    from agacs_tpu.utils.runtime import setup as runtime_setup

    runtime_setup()

    import jax
    import jax.numpy as jnp

    from bench import V5E_PEAK_BF16_FLOPS, _make_batch, whisper_fwd_flops
    from agacs_tpu.models.asr_model import ASRModelConfig, init_asr_params
    from agacs_tpu.models.whisper import make_config
    from agacs_tpu.train.optim import OptimConfig
    from agacs_tpu.train.trainer import (
        build_tx,
        cast_frozen_params,
        create_train_state,
        make_train_step,
    )
    from agacs_tpu.utils.runtime import fetch

    cfg = ASRModelConfig(
        whisper=make_config("small", adapter=True,
                            compute_dtype=jnp.bfloat16, remat=args.remat),
        cs_weight=0.01,
        use_specaug=True,
    )
    params = init_asr_params(jax.random.PRNGKey(0), cfg)
    tx, mask = build_tx(params, OptimConfig(warmup_steps=500),
                        freeze_preset="adapter")
    params = cast_frozen_params(params, mask)
    step = make_train_step(cfg, tx, trainable_mask=mask, donate=False)
    batch = _make_batch(args.batch, args.seconds)
    state = create_train_state(params, tx, jax.random.PRNGKey(1))

    lowered = step.lower(state, batch)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    executed = float(ca.get("flops", float("nan")))
    analytic = 3.0 * whisper_fwd_flops(args.batch, args.seconds)

    # time the real step for an executed-FLOP MFU
    state, stats = step(state, batch)
    fetch(stats)
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        state, stats = step(state, batch)
    fetch(stats)
    dt = (time.perf_counter() - t0) / n

    print(f"shape {args.batch}x{args.seconds}s remat={args.remat}")
    print(f"xla_executed_flops: {executed:.3e}")
    print(f"analytic_fwd3x_flops: {analytic:.3e}")
    if executed == executed and executed > 0:
        print(f"executed/analytic: {executed / analytic:.3f}")
        print(f"step {dt * 1e3:.1f} ms  "
              f"MFU_executed {executed / dt / V5E_PEAK_BF16_FLOPS:.4f}  "
              f"MFU_analytic {analytic / dt / V5E_PEAK_BF16_FLOPS:.4f}")
    else:
        print("cost_analysis returned no flops on this backend; "
              "analytic-only MFU stands")


if __name__ == "__main__":
    main()
