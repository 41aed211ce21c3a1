"""Full-dress rehearsal of the SEAME two-stage recipe on the real TPU.

The e2e pytest (tests/test_e2e_recipe.py) runs the same flow with a tiny
model on virtual CPU devices; this script runs the ACTUAL recipe configs
(whisper-small, adapters, CS loss — recipes/seame/conf/*.yaml) against a
synthetic corpus on the real chip: perturb -> stage-1 train ->
count_heads -> stage-2 train (init from stage-1 average) -> greedy
decode -> MER scoring. Epoch counts and batch_bins are scaled down via
CLI flags; everything else is the shipped configuration.

Usage: python tools/tpu_recipe_rehearsal.py [--root /tmp/rehearsal]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


MARKER = ".agacs_rehearsal"


def _safe_reset_root(root: str) -> None:
    """rmtree `root` only if it is a previous rehearsal output.

    Mirrors datadir.split_data_dir's refusal to clobber arbitrary
    directories: we only delete a directory we created ourselves
    (identified by the MARKER file this script writes).
    """
    if not os.path.isdir(root):
        return
    if not os.path.exists(os.path.join(root, MARKER)):
        raise SystemExit(
            f"--root {root} exists but has no {MARKER} marker; refusing to "
            "delete a directory this script did not create. Remove it "
            "yourself or pick a fresh path.")
    shutil.rmtree(root)


def build_corpus(root: str, n_train=10, n_valid=4, n_test=4, seed=0):
    from agacs_tpu.data.io import write_scp, write_wav

    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, MARKER), "w") as f:
        f.write("created by tools/tpu_recipe_rehearsal.py\n")

    rng = np.random.RandomState(seed)
    texts = ["我们 去 shopping", "hello 你 好", "今天 ok 吗", "我 想 eat lunch",
             "not bad 啦", "这个 weekend 去 哪里"]
    for split, n in (("train", n_train), ("valid", n_valid), ("devman", n_test)):
        d = os.path.join(root, "data", split)
        wavs, txt = {}, {}
        for i in range(n):
            u = f"{split}{i:02d}"
            sec = 2 + int(rng.randint(0, 2))
            tone = np.sin(2 * np.pi * (200 + 50 * i) *
                          np.arange(sec * 16000) / 16000)
            wav = (0.1 * tone + 0.02 * rng.randn(sec * 16000)).astype(np.float32)
            p = os.path.join(d, f"{u}.wav")
            write_wav(p, wav)
            wavs[u] = p
            txt[u] = texts[i % len(texts)]
        write_scp(os.path.join(d, "wav.scp"), wavs)
        write_scp(os.path.join(d, "text"), txt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/rehearsal")
    ap.add_argument("--max_epoch", type=int, default=1)
    ap.add_argument("--batch_bins", type=int, default=2_000_000)
    ap.add_argument("--track", default="whisper",
                    choices=("whisper", "conformer", "transducer"))
    args = ap.parse_args()

    conf = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "recipes", "seame", "conf")
    root = args.root
    _safe_reset_root(root)
    t0 = time.time()
    build_corpus(root)
    if args.track == "conformer":
        return conformer_track(root, conf, args, t0)
    if args.track == "transducer":
        return transducer_track(root, conf, args, t0)

    from agacs_tpu.bin import count_heads, decode, score, train
    from agacs_tpu.data.perturb import perturb_data_dir

    print("=== speed perturb ===", flush=True)
    perturb_data_dir(os.path.join(root, "data/train"),
                     os.path.join(root, "data/train_sp"))

    print("=== stage 1: adapter encoder fine-tune (whisper-small) ===",
          flush=True)
    train.main([
        "--config", os.path.join(conf, "train_asr_whisper_small_adapter_encoder.yaml"),
        "--train_dir", os.path.join(root, "data/train_sp"),
        "--valid_dir", os.path.join(root, "data/valid"),
        "--exp_dir", os.path.join(root, "exp/stage1"),
        "--max_epoch", str(args.max_epoch),
        "--batch_bins", str(args.batch_bins),
        "--num_att_plot", "1",
    ])

    print("=== head counting ===", flush=True)
    count_heads.main([
        "--config", os.path.join(root, "exp/stage1/config.yaml"),
        "--params", os.path.join(root, "exp/stage1/valid.acc.ave.params.npz"),
        "--data_dir", os.path.join(root, "data/valid"),
        "--output", os.path.join(root, "exp/attention_counts.json"),
    ])

    print("=== stage 2: adapter + CS loss ===", flush=True)
    train.main([
        "--config", os.path.join(
            conf, "train_asr_whisper_small_adapter_csloss_2stage.yaml"),
        "--train_dir", os.path.join(root, "data/train_sp"),
        "--valid_dir", os.path.join(root, "data/valid"),
        "--exp_dir", os.path.join(root, "exp/stage2"),
        "--init_param", os.path.join(root, "exp/stage1/valid.acc.ave.params.npz"),
        "--max_epoch", str(args.max_epoch),
        "--batch_bins", str(args.batch_bins),
        "--num_att_plot", "1",
    ])

    print("=== decode devman (greedy, decode_asr_whisper.yaml) ===", flush=True)
    out = os.path.join(root, "exp/stage2/decode_devman")
    decode.main([
        "--config", os.path.join(root, "exp/stage2/config.yaml"),
        "--decode_config", os.path.join(conf, "decode_asr_whisper.yaml"),
        "--params", os.path.join(root, "exp/stage2/valid.acc.ave.params.npz"),
        "--data_dir", os.path.join(root, "data/devman"),
        "--output_dir", out,
    ])
    score.main([
        "--ref", os.path.join(out, "ref.trn"),
        "--hyp", os.path.join(out, "hyp.trn"),
        "--output_dir", os.path.join(out, "score"),
    ])

    result = json.load(open(os.path.join(out, "score", "result.json")))
    rtf = json.load(open(os.path.join(out, "rtf.json")))
    print(json.dumps({
        "wall_minutes": round((time.time() - t0) / 60, 1),
        "mer": result.get("mer"),
        "rtf": rtf.get("rtf"),
        "counts_file": os.path.exists(
            os.path.join(root, "exp/attention_counts.json")),
    }))
    print("REHEARSAL OK")


def _finish(root, out, t0):
    result = json.load(open(os.path.join(out, "score", "result.json")))
    rtf = json.load(open(os.path.join(out, "rtf.json")))
    print(json.dumps({
        "wall_minutes": round((time.time() - t0) / 60, 1),
        "mer": result.get("mer"),
        "rtf": rtf.get("rtf"),
    }))
    print("REHEARSAL OK")


def conformer_track(root, conf, args, t0):
    """run_conformer.sh stages 1-5: stats -> LM -> conformer hybrid train
    -> joint CTC/attention decode with LM fusion -> scoring."""
    from agacs_tpu.bin import collect_stats, decode, lm_train, score, train

    print("=== collect stats (GlobalMVN) ===", flush=True)
    collect_stats.main([
        "--data_dir", os.path.join(root, "data/train"),
        "--output_dir", os.path.join(root, "exp/stats"),
    ])
    print("=== transformer LM ===", flush=True)
    lm_train.main([
        "--train_text", os.path.join(root, "data/train/text"),
        "--valid_text", os.path.join(root, "data/valid/text"),
        "--exp_dir", os.path.join(root, "exp/lm"),
        "--d_model", "64", "--attention_heads", "4",
        "--linear_units", "128", "--num_blocks", "2",
        "--max_epoch", str(args.max_epoch),
    ])
    print("=== conformer hybrid CTC/attention train ===", flush=True)
    train.main([
        "--config", os.path.join(conf, "train_asr_conformer.yaml"),
        "--train_dir", os.path.join(root, "data/train"),
        "--valid_dir", os.path.join(root, "data/valid"),
        "--exp_dir", os.path.join(root, "exp/conformer"),
        "--max_epoch", str(args.max_epoch),
        "--batch_bins", str(args.batch_bins),
        "--override",
        "normalize_conf.stats_file=" + os.path.join(
            root, "exp/stats/feats_stats.npz"),
        "--num_att_plot", "0",
    ])
    print("=== joint decode + LM fusion (decode_asr.yaml) ===", flush=True)
    out = os.path.join(root, "exp/conformer/decode_devman")
    decode.main([
        "--config", os.path.join(root, "exp/conformer/config.yaml"),
        "--decode_config", os.path.join(conf, "decode_asr.yaml"),
        "--params", os.path.join(root, "exp/conformer/valid.acc.ave.params.npz"),
        "--data_dir", os.path.join(root, "data/devman"),
        "--output_dir", out,
        "--lm_exp", os.path.join(root, "exp/lm"),
    ])
    score.main([
        "--ref", os.path.join(out, "ref.trn"),
        "--hyp", os.path.join(out, "hyp.trn"),
        "--output_dir", os.path.join(out, "score"), "--per_bucket",
    ])
    _finish(root, out, t0)


def transducer_track(root, conf, args, t0):
    """Transducer family: RNNT train -> batched greedy + TSD decode ->
    scoring (recipes/seame/conf/train_asr_transducer.yaml)."""
    from agacs_tpu.bin import decode, score, train

    print("=== transducer (RNNT) train ===", flush=True)
    train.main([
        "--config", os.path.join(conf, "train_asr_transducer.yaml"),
        "--train_dir", os.path.join(root, "data/train"),
        "--valid_dir", os.path.join(root, "data/valid"),
        "--exp_dir", os.path.join(root, "exp/transducer"),
        "--max_epoch", str(args.max_epoch),
        "--batch_bins", str(args.batch_bins),
        "--override", "normalize=utterance_mvn",
        "--num_att_plot", "0",
    ])
    for name, extra in (("greedy", ["--beam_size", "1"]),
                        ("tsd", ["--beam_size", "4",
                                 "--transducer_search", "tsd"])):
        print(f"=== decode devman ({name}) ===", flush=True)
        out = os.path.join(root, f"exp/transducer/decode_devman_{name}")
        decode.main([
            "--config", os.path.join(root, "exp/transducer/config.yaml"),
            "--params", os.path.join(
                root, "exp/transducer/valid.loss.ave.params.npz"),
            "--data_dir", os.path.join(root, "data/devman"),
            "--output_dir", out,
        ] + extra)
        score.main([
            "--ref", os.path.join(out, "ref.trn"),
            "--hyp", os.path.join(out, "hyp.trn"),
            "--output_dir", os.path.join(out, "score"),
        ])
    _finish(root, out, t0)


if __name__ == "__main__":
    main()
