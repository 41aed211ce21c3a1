"""Encoder FLOPs/params/latency profile — the reference's
`pyscripts/utils/profile_encoder.py` (DeepSpeed FlopsProfiler on
`model.encode` at 10/15/20 s inputs, driven by profile.sh) rebuilt on XLA
cost analysis + wall-clock timing.

  python -m agacs_tpu.bin.profile_encoder [--model small] [--secs 10 15 20]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main(argv: list[str] | None = None) -> list[dict]:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="small")
    p.add_argument("--secs", nargs="*", type=int, default=[10, 15, 20])
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--compute_dtype", default="bfloat16")
    args = p.parse_args(argv)

    from agacs_tpu.models.asr_model import ASRModelConfig, encode, init_asr_params
    from agacs_tpu.models.whisper import make_config
    from agacs_tpu.utils.profiling import cost_analysis, count_params
    from agacs_tpu.utils.runtime import fetch, setup

    setup()
    cfg = ASRModelConfig(
        whisper=make_config(args.model, compute_dtype=getattr(jnp, args.compute_dtype)),
        use_specaug=False,
    )
    params = init_asr_params(jax.random.PRNGKey(0), cfg)
    n_params = count_params(params)

    results = []
    for secs in args.secs:
        s = secs * 16000
        speech = jnp.zeros((args.batch, s), jnp.float32)
        ilens = jnp.full((args.batch,), s, jnp.int32)

        fn = lambda p, sp, il: encode(p, cfg, sp, il, train=False)[0]
        costs = cost_analysis(fn, params, speech, ilens)

        jfn = jax.jit(fn)
        out = jfn(params, speech, ilens)
        fetch(out)
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            out = jfn(params, speech, ilens)
        fetch(out)
        dt = (time.perf_counter() - t0) / n

        row = {
            "seconds": secs,
            "batch": args.batch,
            "params": n_params,
            "gflops": round(costs["flops"] / 1e9, 2),
            "gbytes_accessed": round(costs["bytes_accessed"] / 1e9, 3),
            "latency_ms": round(dt * 1000, 2),
            "rtf": round(dt / (args.batch * secs), 5),
            "tflops_per_s": round(costs["flops"] / dt / 1e12, 2),
        }
        results.append(row)
        print(json.dumps(row))
    return results


if __name__ == "__main__":
    main()
