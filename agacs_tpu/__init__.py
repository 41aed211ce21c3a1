"""agacs_tpu — TPU-native attention-guided code-switching ASR framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
"Attention-Guided Adaptation for Code-Switching Speech Recognition"
(an ESPnet 202301 fork bundling a modified OpenAI Whisper); see SURVEY.md.

Package layout:
  ops/       numerical kernels: log-mel STFT frontend, attention, SpecAug, CTC
  models/    Whisper (+PET variants), Conformer/Transformer (pure-pytree, functional)
  adapt/     attention-guided CS machinery: target patterns, CS loss, head counting
  text/      Whisper BPE tokenizer (tiktoken format) + token-id converter
  data/      wav.scp/text IO, SEAME-style prep, numel batch-bins bucketing
  train/     pjit trainer, optax optim/sched, freeze presets, checkpoints, reporter
  decode/    KV-cached greedy/beam search under jit
  eval/      sclite-compatible WER/CER/MER scoring, per-language splits
  parallel/  device mesh + sharding rules
  utils/     YAML config system
"""

__version__ = "0.1.0"
