"""Benchmark: Whisper-small adapter+CS-loss fine-tuning throughput on one
TPU chip, over a matrix of realistic packed batch shapes (the recipe's
`batch_bins: 8e6` numel packing yields ~100-500 audio-seconds of short
utterances per batch, conf/whisper/train_asr_whisper_small_adapter_
csloss_2stage_check.yaml:55-86), with an explicit MFU figure per shape
from XLA's compiled-module FLOP count.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio_sec/s/chip", "vs_baseline": N,
   "best_shape": "BxS", "matrix": {...}}

`value` is the best shape's throughput. Baseline: the reference
implementation's training step (bundled modified Whisper-small, adapters,
attention-map collection + CS loss, PyTorch) measured on this host's CPU
— the only hardware the reference runs on here (BASELINE.json north star
is >10x that). Measured with tools/measure_torch_baseline.py.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

# audio-sec/s of the reference torch CPU training step on this host
# (tools/measure_torch_baseline.py, measured 2026-08-16: 3 steps of
# whisper-small adapter training, B=8 x 15 s -> 1.82 audio_sec/s).
TORCH_CPU_BASELINE_AUDIO_SEC_PER_S = 1.82

# TPU v5e (PALLAS_AXON_TPU_GEN) peak bf16 matmul throughput
V5E_PEAK_BF16_FLOPS = 197e12


def whisper_fwd_flops(b: int, seconds: int, t_text: int = 33,
                      d: int = 768, layers: int = 12, vocab: int = 51865):
    """Analytic forward matmul FLOPs for whisper-small (2 flops/MAC).

    XLA's cost_analysis undercounts here (Pallas flash kernels report no
    flops and the remote backend's counts are inconsistent), so MFU uses
    this model-FLOPs formula with the standard fwd + 2x-bwd convention.
    """
    t_mel = seconds * 100
    t_enc = t_mel // 2
    d_mlp = 4 * d
    # conv stem: k=3 conv 80->d at t_mel, k=3 stride-2 conv d->d at t_enc
    stem = t_mel * 80 * d * 3 + t_enc * d * d * 3
    enc_layer = (
        4 * t_enc * d * d            # q, k, v, out projections
        + 2 * t_enc * t_enc * d      # scores + weighted sum
        + 2 * t_enc * d * d_mlp      # mlp fc1 + fc2
    )
    dec_layer = (
        4 * t_text * d * d           # self q, k, v, out
        + 2 * t_text * t_text * d    # self attention
        + 2 * t_text * d * d         # cross q, out
        + 2 * t_enc * d * d          # cross k, v (per layer)
        + 2 * t_text * t_enc * d     # cross attention
        + 2 * t_text * d * d_mlp     # mlp
    )
    logits = t_text * d * vocab
    macs = stem + layers * (enc_layer + dec_layer) + logits
    return 2.0 * macs * b

# (batch, seconds, remat): the legacy headline shape + batch_bins-realistic
# packs. dots_nb + encoder-unroll is the measured winner at EVERY shape
# (docs/PERF.md round-3 "encoder backward stall forensics" table; it
# also retires round-2's "full remat at the largest 5 s pack" rule).
SHAPES = [(8, 15, "dots_nb", False), (16, 15, "dots_nb", False),
          (32, 5, "dots_nb", False), (64, 5, "dots_nb", False),
          (8, 30, "dots_nb", False),  # full 30 s context (q-chunked kernel)
          # int8 frozen trunk (W8A8, freeze_quant: int8) at the headline
          # shape — docs/PERF.md round-3 int8-trunk section
          (16, 15, "dots_nb", True)]
UNROLL = "encoder"
STEPS = 10


def _make_batch(batch: int, seconds: int):
    from agacs_tpu.adapt.cs_loss import LANG_EN, LANG_PAD, LANG_ZH

    rng = np.random.RandomState(0)
    s = seconds * 16000
    n_text = 32
    text = np.full((batch, n_text), -1, np.int64)
    labels = np.full((batch, n_text + 1), LANG_PAD, np.int8)
    for i in range(batch):
        n = n_text - (i % 4)
        text[i, :4] = [50260, 50259, 50359, 50363]
        text[i, 4:n] = rng.randint(100, 50000, n - 4)
        text[i, n - 1] = 50257
        labels[i, :5] = [0, LANG_ZH, LANG_EN, 0, 0]
        labels[i, 5 : n + 1] = LANG_ZH
    return {
        "speech": jnp.asarray((rng.randn(batch, s) * 0.05).astype(np.float32)),
        "speech_lengths": jnp.full((batch,), s, jnp.int32),
        "text": jnp.asarray(text.astype(np.int32)),
        "cs_labels": jnp.asarray(labels),
    }


def main():
    from agacs_tpu.utils.runtime import setup as _runtime_setup

    _runtime_setup()
    from agacs_tpu.models.asr_model import ASRModelConfig, init_asr_params
    from agacs_tpu.models.whisper import make_config
    from agacs_tpu.train.optim import OptimConfig
    from agacs_tpu.train.trainer import build_tx, create_train_state, make_train_step

    matrix = {}
    best = (0.0, None)
    for batch_size, seconds, remat, int8 in SHAPES:
        cfg = ASRModelConfig(
            whisper=make_config("small", adapter=True,
                                compute_dtype=jnp.bfloat16, remat=remat,
                                unroll_layers=UNROLL),
            cs_weight=0.01,
            use_specaug=True,
        )
        params = init_asr_params(jax.random.PRNGKey(0), cfg)
        tx, mask = build_tx(
            params, OptimConfig(warmup_steps=500), freeze_preset="adapter"
        )
        from agacs_tpu.train.trainer import cast_frozen_params

        params = cast_frozen_params(params, mask)  # bf16 frozen trunk
        if int8:  # W8A8 frozen trunk on the MXU int8 path
            from agacs_tpu.train.trainer import quantize_frozen_linears

            params = quantize_frozen_linears(params, mask)
            tx, mask = build_tx(params, OptimConfig(warmup_steps=500),
                                freeze_preset="adapter")
        step = make_train_step(cfg, tx, trainable_mask=mask, donate=False)
        batch = _make_batch(batch_size, seconds)
        state = create_train_state(params, tx, jax.random.PRNGKey(1))

        # model FLOPs: fwd + 2x bwd (standard MFU convention; remat
        # recompute and the frozen-trunk weight-grad cut both ignored)
        flops = 3.0 * whisper_fwd_flops(batch_size, seconds)

        state, stats = step(state, batch)  # compile + warm
        float(stats["loss"])
        for _ in range(2):
            state, stats = step(state, batch)
        float(stats["loss"])

        # NOTE: on the axon remote backend, block_until_ready does not
        # actually wait — only a host value fetch synchronizes. Fetch the
        # final loss (it data-depends on every step) to time the chain.
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, stats = step(state, batch)
        final_loss = float(stats["loss"])
        dt = (time.perf_counter() - t0) / STEPS
        assert np.isfinite(final_loss)

        audio_per_s = batch_size * seconds / dt
        key = f"{batch_size}x{seconds}s" + ("_int8" if int8 else "")
        matrix[key] = {
            "ms_per_step": round(dt * 1e3, 1),
            "audio_sec_per_s": round(audio_per_s, 1),
            "mfu": round(flops / dt / V5E_PEAK_BF16_FLOPS, 4) if flops else None,
        }
        if audio_per_s > best[0]:
            best = (audio_per_s, key)

    inference = _bench_inference()

    print(
        json.dumps(
            {
                "metric": "whisper_small_adapter_csloss_train_throughput",
                "value": round(best[0], 2),
                "unit": "audio_sec/s/chip",
                "vs_baseline": round(best[0] / TORCH_CPU_BASELINE_AUDIO_SEC_PER_S, 2),
                "best_shape": best[1],
                "matrix": matrix,
                "inference": inference,
            }
        )
    )


def _bench_inference():
    """Warm greedy + beam-5 decode throughput (KV-cached, scan loop) —
    the serving-side numbers next to the training headline."""
    from agacs_tpu.decode.beam import beam_decode
    from agacs_tpu.decode.greedy import greedy_decode
    from agacs_tpu.models.whisper import (
        init_whisper_params,
        make_config,
        whisper_encode,
    )
    from agacs_tpu.ops import log_mel_spectrogram
    from agacs_tpu.utils.runtime import fetch

    cfg = make_config("small", compute_dtype=jnp.bfloat16)
    cfg_i8 = make_config(
        "small", compute_dtype=jnp.bfloat16, cross_kv_int8=True
    )
    params = init_whisper_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    sec = 15
    enc_fn = jax.jit(lambda p, f: whisper_encode(p, cfg, f))
    out = {}
    for name, b, fn in (
        ("greedy_8x15s", 8,
         lambda enc: greedy_decode(params, cfg, enc, max_steps=100)),
        ("greedy_8x15s_int8kv", 8,
         lambda enc: greedy_decode(params, cfg_i8, enc, max_steps=100)),
        ("beam5_1x15s", 1,  # single-utterance serving latency
         lambda enc: beam_decode(params, cfg, enc, beam_size=5,
                                 max_steps=100, loop="scan")),
        ("beam5_8x15s", 8,
         lambda enc: beam_decode(params, cfg, enc, beam_size=5,
                                 max_steps=100, loop="scan")),
        ("beam5_32x15s", 32,
         lambda enc: beam_decode(params, cfg, enc, beam_size=5,
                                 max_steps=100, loop="scan")),
    ):
        audio = jnp.asarray(rng.randn(b, sec * 16000).astype(np.float32) * 0.1)
        feats, _ = jax.jit(log_mel_spectrogram)(
            audio, jnp.full((b,), sec * 16000, jnp.int32)
        )
        enc = enc_fn(params, feats)
        fetch(enc)
        fetch(fn(enc))  # compile + warm
        # dispatch is async through the tunnel but every fetch pays a
        # ~30 ms RPC round-trip (measured round 3); amortize it over K
        # back-to-back decodes so the number reflects device time like
        # the training matrix does (earlier rounds' serving numbers
        # carried the full RPC per batch — docs/PERF.md round-3)
        reps = 5
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            rs = [fn(enc) for _ in range(reps)]
            for r in rs:
                fetch(r)
            ts.append((time.perf_counter() - t0) / reps)
        out[name] = {
            "ms_per_batch": round(min(ts) * 1e3, 1),
            "x_realtime": round(b * sec / min(ts), 0),
        }
    return out


if __name__ == "__main__":
    main()
