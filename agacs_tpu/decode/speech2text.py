"""Speech2Text — end-to-end inference API (reference
`espnet2/bin/asr_inference.py:50` Speech2Text), with built-in RTF
measurement (replacing the reference's decode-log scraping,
`utils/calculate_rtf.py` / asr.sh:1405-1417).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from agacs_tpu.decode.beam import beam_decode
from agacs_tpu.decode.greedy import WHISPER_CS_PRIMER, greedy_decode
from agacs_tpu.models import asr_model
from agacs_tpu.models.asr_model import ASRModelConfig
from agacs_tpu.text import WhisperTokenizer


@dataclasses.dataclass
class DecodeResult:
    text: str
    tokens: list[int]
    score: float


class Speech2Text:
    """audio (16 kHz float) -> hypotheses.

    beam_size=1 uses the greedy path (the recipes' decode config:
    beam_size 1, ctc_weight 0.0, decode_asr_whisper.yaml:1-6).
    """

    def __init__(
        self,
        params: Any,
        cfg: ASRModelConfig,
        tokenizer: WhisperTokenizer | None = None,
        beam_size: int = 1,
        max_steps: int = 200,
        length_bonus: float = 0.0,
        primer: tuple[int, ...] = WHISPER_CS_PRIMER,
    ):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer or WhisperTokenizer()
        self.beam_size = beam_size
        self.max_steps = max_steps
        self.length_bonus = length_bonus
        self.primer = tuple(primer)
        self._audio_seconds = 0.0
        self._decode_seconds = 0.0

        self._encode = jax.jit(
            lambda p, s, l: asr_model.encode(p, cfg, s, l, train=False)
        )

    @property
    def rtf(self) -> float:
        """decode-time / audio-time (lower is better)."""
        return self._decode_seconds / max(self._audio_seconds, 1e-9)

    @property
    def inverse_rtf(self) -> float:
        return self._audio_seconds / max(self._decode_seconds, 1e-9)

    def __call__(self, audio: np.ndarray, fs: int = 16000) -> list[DecodeResult]:
        """audio: (T,) or (B, T) float waveform at 16 kHz."""
        audio = np.asarray(audio, np.float32)
        if audio.ndim == 1:
            audio = audio[None, :]
        b, s = audio.shape
        lengths = jnp.full((b,), s, jnp.int32)

        t0 = time.perf_counter()
        enc, _ = self._encode(self.params, jnp.asarray(audio), lengths)
        if self.beam_size <= 1:
            tokens, lens = greedy_decode(
                self.params, self.cfg.whisper, enc,
                primer=self.primer, max_steps=self.max_steps,
            )
            scores = jnp.zeros((b,), jnp.float32)
        else:
            tokens, lens, scores = beam_decode(
                self.params, self.cfg.whisper, enc,
                beam_size=self.beam_size, primer=self.primer,
                max_steps=self.max_steps, length_bonus=self.length_bonus,
            )
        tokens = np.asarray(tokens)
        lens = np.asarray(lens)
        scores = np.asarray(scores)
        self._decode_seconds += time.perf_counter() - t0
        self._audio_seconds += b * s / fs

        out = []
        for i in range(b):
            ids = tokens[i, : lens[i]].tolist()
            hyp_ids = [t for t in ids if t < self.tokenizer.special.eot]
            out.append(
                DecodeResult(
                    text=self.tokenizer.decode(hyp_ids),
                    tokens=ids,
                    score=float(scores[i]),
                )
            )
        return out
