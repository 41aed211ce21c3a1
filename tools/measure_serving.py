"""Measure warm serving throughput/latency on the real chip.

Times KV-cached scan decodes (greedy + beam) at serving shapes, with the
tunnel's ~30 ms per-fetch RPC amortized over back-to-back dispatches
(docs/PERF.md round-3: dispatch is async, only fetches pay the
round-trip — per-iteration fetch under-reports x-realtime by a
constant).

Usage:
  python tools/measure_serving.py [--model small] [--seconds 15]
      [--steps 100] [--int8] [--shapes greedy:8,beam5:8,beam5:32,beam5:1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="small")
    ap.add_argument("--seconds", type=int, default=15)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--int8", action="store_true",
                    help="int8 cross-KV caches (cross_kv_int8)")
    ap.add_argument("--shapes", default="greedy:8,beam5:8,beam5:32,beam5:1")
    ap.add_argument("--reps", type=int, default=5,
                    help="back-to-back decodes per timing (RPC amortization)")
    args = ap.parse_args()

    from agacs_tpu.utils.runtime import setup as runtime_setup

    runtime_setup()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from agacs_tpu.decode.beam import beam_decode
    from agacs_tpu.decode.greedy import greedy_decode
    from agacs_tpu.models.whisper import (
        init_whisper_params, make_config, whisper_encode,
    )
    from agacs_tpu.ops import log_mel_spectrogram
    from agacs_tpu.utils.runtime import fetch

    cfg = make_config(args.model, compute_dtype=jnp.bfloat16,
                      cross_kv_int8=args.int8)
    params = init_whisper_params(jax.random.PRNGKey(0), cfg)
    enc_fn = jax.jit(lambda p, f: whisper_encode(p, cfg, f))
    rng = np.random.RandomState(0)
    sec = args.seconds

    for spec in args.shapes.split(","):
        kind, b = spec.split(":")
        b = int(b)
        if kind == "greedy":
            fn = lambda e: greedy_decode(params, cfg, e,
                                         max_steps=args.steps)
        else:
            beam = int(kind.removeprefix("beam"))
            fn = lambda e, bm=beam: beam_decode(
                params, cfg, e, beam_size=bm, max_steps=args.steps,
                loop="scan")
        audio = jnp.asarray(rng.randn(b, sec * 16000).astype(np.float32) * 0.1)
        feats, _ = jax.jit(log_mel_spectrogram)(
            audio, jnp.full((b,), sec * 16000, jnp.int32))
        enc = enc_fn(params, feats)
        fetch(enc)
        t0 = time.perf_counter()
        fetch(fn(enc))
        print(f"{spec}: compile+first {time.perf_counter() - t0:.1f} s",
              flush=True)
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            rs = [fn(enc) for _ in range(args.reps)]
            for r in rs:
                fetch(r)
            ts.append((time.perf_counter() - t0) / args.reps)
        ms = min(ts) * 1e3
        tag = " int8" if args.int8 else ""
        print(f"{spec}{tag} {b}x{sec}s: {ms:.1f} ms/batch "
              f"({b * sec / min(ts):.0f}x realtime)", flush=True)


if __name__ == "__main__":
    main()
