"""Collect-stats CLI — recipe stage 10 (`asr.sh:1030-1139`,
`main_funcs/collect_stats.py`): shape files for the batch sampler plus
feature mean/variance stats for GlobalMVN (conformer track).

  python -m agacs_tpu.bin.collect_stats --data_dir data/train \
      --output_dir exp/stats_train [--frontend default|whisper]
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

import jax.numpy as jnp

from agacs_tpu.data import ASRDataset
from agacs_tpu.ops.frontend_default import DefaultFrontendConfig, default_frontend
from agacs_tpu.ops.logmel import log_mel_spectrogram


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--frontend", default="default", choices=["default", "whisper"])
    return p


def main(argv: list[str] | None = None) -> dict:
    args = build_argparser().parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    os.makedirs(args.output_dir, exist_ok=True)

    ds = ASRDataset(args.data_dir, with_cs_labels=False)

    # shape files (speech_shape / text_shape, consumed by batch samplers)
    with open(os.path.join(args.output_dir, "speech_shape"), "w") as f_s, open(
        os.path.join(args.output_dir, "text_shape"), "w"
    ) as f_t:
        for u in ds.utt_ids:
            f_s.write(f"{u} {ds.num_samples(u)}\n")
            f_t.write(f"{u} {len(ds.tokenize(ds.text[u]))}\n")

    # feature sum/sqsum for GlobalMVN (no-frontend whisper path skips MVN)
    n_frames = 0
    acc = None
    sq = None
    for u in ds.utt_ids:
        item = ds[u]
        audio = jnp.asarray(item["speech"])[None, :]
        ilens = jnp.asarray([len(item["speech"])], jnp.int32)
        if args.frontend == "default":
            feats, olens = default_frontend(
                audio, ilens, DefaultFrontendConfig(normalize=None)
            )
        else:
            feats, olens = log_mel_spectrogram(audio, ilens)
        n = int(olens[0])
        x = np.asarray(feats)[0, :n]
        if acc is None:
            acc = x.sum(0)
            sq = (x**2).sum(0)
        else:
            acc += x.sum(0)
            sq += (x**2).sum(0)
        n_frames += n

    mean = acc / n_frames
    std = np.sqrt(np.maximum(sq / n_frames - mean**2, 1e-20))
    np.savez(
        os.path.join(args.output_dir, "feats_stats.npz"),
        mean=mean.astype(np.float32),
        std=std.astype(np.float32),
        count=np.asarray(n_frames),
    )
    logging.info("stats over %d utts / %d frames written", len(ds), n_frames)
    return {"n_frames": n_frames, "mean": mean, "std": std}


if __name__ == "__main__":
    main()
