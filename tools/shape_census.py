"""Compiled-shape census for a SEAME-scale epoch.

The training step recompiles once per distinct (B, S_pad, T_pad) batch
shape, and each compile costs 25-125 s through this environment's remote
TPU compile helper (docs/PERF.md) — so the shape set per epoch, not the
step time, can dominate a real corpus wall. This tool synthesizes a
SEAME-like length distribution (conversational code-switching: ~100k
utterances, lognormal durations 1-30 s, text length ~proportional), runs
the REAL sampler + bucketing pipeline (num_elements_batches with the
trainer's b_grid, collate-grid padding), and reports:

  * distinct compiled shapes per epoch (the number of train-step compiles)
  * batches that would fall off the B-grid (replicated-serial tails)
  * padded-numel overshoot vs batch_bins from grid rounding

Usage: python tools/shape_census.py [--utts 100000] [--batch_bins 8000000]
           [--n_data 8] [--epochs 2]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from agacs_tpu.data.sampler import bucket_length, num_elements_batches


def seame_like_lengths(n: int, seed: int = 0) -> dict[str, int]:
    """Lognormal conversational durations clipped to [1 s, 30 s] at
    16 kHz — mean ~3.4 s, long right tail, like SEAME's 1-30 s filter
    (asr.sh stage 4, --min/max_wav_duration)."""
    rng = np.random.RandomState(seed)
    secs = np.clip(rng.lognormal(mean=1.05, sigma=0.65, size=n), 1.0, 30.0)
    return {f"u{i:06d}": int(s * 16000) for i, s in enumerate(secs)}


def text_tokens_for(n_samples: int, rng) -> int:
    """~3.2 tokens/s for code-switching speech + prompt(4) + eot(1)."""
    secs = n_samples / 16000.0
    return max(6, int(rng.normal(3.2 * secs, 1.5)) + 5)


def census(lengths: dict[str, int], batch_bins: int, b_grid: int,
           epochs: int, batch_type: str, seed: int = 0, ratio=1.3):
    from agacs_tpu.data.sampler import (
        fixed_shape_batches,
        geometric_s_buckets,
    )

    rng = np.random.RandomState(seed + 1)
    tok = {u: text_tokens_for(n, rng) for u, n in lengths.items()}
    sbuckets = geometric_s_buckets(ratio=ratio)

    def s_pad_of(mx):
        if batch_type == "fixed_shapes":
            for s in sbuckets:
                if mx <= s:
                    return s
            return sbuckets[-1]
        return bucket_length(mx, 16000, 30 * 16000)

    shapes = set()
    n_batches = 0
    off_grid = 0
    padded_numel = 0
    real_numel = sum(lengths.values()) * epochs
    overshoot_max = 0.0
    for ep in range(epochs):
        if batch_type == "fixed_shapes":
            batches = fixed_shape_batches(
                lengths, batch_bins, b_grid=b_grid,
                shuffle_batches=True, seed=seed + ep, ratio=ratio,
            )
        else:
            batches = num_elements_batches(
                lengths, batch_bins, shuffle_batches=True, seed=seed + ep,
                b_grid=b_grid,
            )
        n_batches += len(batches)
        for b in batches:
            s_pad = s_pad_of(max(lengths[u] for u in b))
            t_pad = bucket_length(max(tok[u] for u in b), 8, None)
            shapes.add((len(b), s_pad, t_pad))
            padded_numel += len(b) * s_pad
            if len(b) % b_grid != 0:
                off_grid += 1
            overshoot_max = max(overshoot_max,
                                len(b) * s_pad / batch_bins - 1.0)
    return {
        "batch_type": batch_type,
        "epochs": epochs,
        "batches": n_batches,
        "distinct_shapes": len(shapes),
        "off_grid_batches": off_grid,
        "padding_overhead": round(padded_numel / real_numel - 1.0, 4),
        "max_numel_overshoot": round(overshoot_max, 4),
        "shapes": sorted(shapes),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--utts", type=int, default=100_000)
    ap.add_argument("--batch_bins", type=int, default=8_000_000)
    ap.add_argument("--ratio", type=float, default=1.3)
    ap.add_argument("--n_data", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=2)
    args = ap.parse_args()

    b_grid = 8 * args.n_data // math.gcd(8, args.n_data)
    lengths = seame_like_lengths(args.utts)
    print(f"utts={args.utts} batch_bins={args.batch_bins} b_grid={b_grid}")
    for batch_type in ("numel", "fixed_shapes"):
        r = census(lengths, args.batch_bins, b_grid, args.epochs, batch_type,
                   ratio=args.ratio)
        print(f"--- {batch_type}")
        for k, v in r.items():
            if k == "shapes":
                if batch_type == "fixed_shapes":
                    print(f"shapes (B, S_pad, T_pad): {v}")
                else:
                    print(f"shapes: {len(v)} distinct (omitted)")
            else:
                print(f"{k}: {v}")


if __name__ == "__main__":
    main()
