"""Benchmark: Whisper-small adapter+CS-loss fine-tuning throughput on one
TPU chip, in audio-seconds of speech processed per wall-clock second.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio_sec/s/chip", "vs_baseline": N}

Baseline: the reference implementation's training step (its bundled
modified Whisper-small, adapters, attention-map collection + CS loss,
PyTorch) measured on this host's CPU — the only hardware the reference
can run on in this environment. BASELINE.json's north star is >10x this
CPU reference number. The constant below was measured with
tools/measure_torch_baseline.py (forward+backward on an identical batch);
re-run that script to refresh it.
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

BATCH = 8
SECONDS = 15
STEPS = 20


def main():
    from agacs_tpu.utils.runtime import setup as _runtime_setup

    _runtime_setup()
    from agacs_tpu.adapt.cs_loss import LANG_EN, LANG_PAD, LANG_ZH
    from agacs_tpu.models.asr_model import ASRModelConfig, init_asr_params
    from agacs_tpu.models.whisper import make_config
    from agacs_tpu.train.optim import OptimConfig
    from agacs_tpu.train.trainer import build_tx, create_train_state, make_train_step

    cfg = ASRModelConfig(
        whisper=make_config("small", adapter=True, compute_dtype=jnp.bfloat16),
        cs_weight=0.01,
        use_specaug=True,
    )
    params = init_asr_params(jax.random.PRNGKey(0), cfg)

    rng = np.random.RandomState(0)
    s = SECONDS * 16000
    n_text = 32
    text = np.full((BATCH, n_text), -1, np.int64)
    labels = np.full((BATCH, n_text + 1), LANG_PAD, np.int8)
    for i in range(BATCH):
        n = n_text - (i % 4)
        text[i, :4] = [50260, 50259, 50359, 50363]
        text[i, 4:n] = rng.randint(100, 50000, n - 4)
        text[i, n - 1] = 50257
        labels[i, :5] = [0, LANG_ZH, LANG_EN, 0, 0]
        labels[i, 5 : n + 1] = LANG_ZH
    batch = {
        "speech": jnp.asarray((rng.randn(BATCH, s) * 0.05).astype(np.float32)),
        "speech_lengths": jnp.full((BATCH,), s, jnp.int32),
        "text": jnp.asarray(text.astype(np.int32)),
        "cs_labels": jnp.asarray(labels),
    }

    tx, mask = build_tx(params, OptimConfig(warmup_steps=500), freeze_preset="adapter")
    state = create_train_state(params, tx, jax.random.PRNGKey(1))
    step = make_train_step(cfg, tx, trainable_mask=mask)

    state, stats = step(state, batch)  # compile
    float(stats["loss"])

    # NOTE: on the axon remote backend, block_until_ready does not actually
    # wait — only a host value fetch synchronizes. Fetch the final loss
    # (it data-depends on every step) to time the full chain.
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, stats = step(state, batch)
    final_loss = float(stats["loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)

    audio_sec_per_s = STEPS * BATCH * SECONDS / dt
    print(
        json.dumps(
            {
                "metric": "whisper_small_adapter_csloss_train_throughput",
                "value": round(audio_sec_per_s, 2),
                "unit": "audio_sec/s/chip",
                "vs_baseline": round(
                    audio_sec_per_s / TORCH_CPU_BASELINE_AUDIO_SEC_PER_S, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
