"""Speech2Text — end-to-end inference API (reference
`espnet2/bin/asr_inference.py:50` Speech2Text), with built-in RTF
measurement (replacing the reference's decode-log scraping,
`utils/calculate_rtf.py` / asr.sh:1405-1417).

Scorer composition mirrors asr_inference.py:139-174,258-290: the whisper
decoder plus optional CTC head, LM shallow fusion and length bonus, with
maxlen derived from the encoder frame count when maxlenratio == 0
(beam_search.py:365-371) and capped by the 448-token decoder context.
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

    beam_size=1 with no extra scorers uses the greedy path (the recipes'
    decode config: beam_size 1, ctc_weight 0.0, decode_asr_whisper.yaml).

    max_steps=None derives maxlen from the encoder frame count
    (maxlenratio == 0 semantics); a positive maxlenratio multiplies it.
    """

    def __init__(
        self,
        params: Any,
        cfg: ASRModelConfig,
        tokenizer: WhisperTokenizer | None = None,
        beam_size: int = 1,
        max_steps: int | None = 200,
        maxlenratio: float = 0.0,
        length_bonus: float = 0.0,
        ctc_weight: float = 0.0,
        lm_params: Any = None,
        lm_cfg: Any = None,
        lm_weight: float = 0.0,
        ngram_lm: Any = None,
        ngram_weight: float = 0.0,
        pre_beam: int = 0,
        use_end_detect: bool = True,
        primer: tuple[int, ...] = WHISPER_CS_PRIMER,
        loop: str = "scan",
    ):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer or WhisperTokenizer()
        self.beam_size = beam_size
        self.max_steps = max_steps
        self.maxlenratio = maxlenratio
        self.length_bonus = length_bonus
        self.ctc_weight = ctc_weight
        self.lm_params = lm_params
        self.lm_cfg = lm_cfg
        self.lm_weight = lm_weight
        self.ngram_lm = ngram_lm
        self.ngram_weight = ngram_weight
        self.pre_beam = pre_beam
        self.use_end_detect = use_end_detect
        self.primer = tuple(primer)
        self.loop = loop
        self._audio_seconds = 0.0
        self._decode_seconds = 0.0

        if ctc_weight > 0.0 and "ctc" not in params:
            raise ValueError(
                "ctc_weight > 0 but the model has no CTC head "
                "(train with ctc_weight != 0 to create one)"
            )

        self._encode = jax.jit(
            lambda p, s, l: asr_model.encode(p, cfg, s, l, train=False)
        )
        self._ctc_logp = jax.jit(
            lambda p, enc: jax.nn.log_softmax(
                (
                    jnp.dot(enc, p["ctc"]["w"].astype(enc.dtype))
                    + p["ctc"]["b"].astype(enc.dtype)
                ).astype(jnp.float32),
                -1,
            )
        )

    @property
    def rtf(self) -> float:
        """decode-time / audio-time (lower is better)."""
        return self._decode_seconds / max(self._audio_seconds, 1e-9)

    @property
    def inverse_rtf(self) -> float:
        return self._audio_seconds / max(self._decode_seconds, 1e-9)

    def _maxlen(self, t_enc: int) -> int:
        cap = self.cfg.whisper.n_text_ctx - len(self.primer) - 1
        if self.max_steps is not None:
            return min(self.max_steps, cap)
        if self.maxlenratio > 0:
            return min(max(1, int(self.maxlenratio * t_enc)), cap)
        return min(t_enc, cap)  # maxlenratio == 0: maxlen = frames

    def __call__(
        self,
        audio: np.ndarray,
        fs: int = 16000,
        lengths: np.ndarray | None = None,
    ) -> list[DecodeResult]:
        """audio: (T,) or (B, T) float waveform at 16 kHz; `lengths` gives
        each padded row's true sample count (CTC frame lengths + RTF)."""
        audio = np.asarray(audio, np.float32)
        if audio.ndim == 1:
            audio = audio[None, :]
        b, s = audio.shape
        lengths = (
            jnp.asarray(lengths, jnp.int32)
            if lengths is not None
            else jnp.full((b,), s, jnp.int32)
        )

        t0 = time.perf_counter()
        enc, enc_lens = self._encode(self.params, jnp.asarray(audio), lengths)
        max_steps = self._maxlen(int(enc.shape[1]))
        simple = (
            self.beam_size <= 1
            and self.ctc_weight == 0.0
            and self.lm_weight == 0.0
            and self.ngram_weight == 0.0
        )
        if simple:
            tokens, lens = greedy_decode(
                self.params, self.cfg.whisper, enc,
                primer=self.primer, max_steps=max_steps, loop=self.loop,
            )
            scores = jnp.zeros((b,), jnp.float32)
        else:
            ctc_logp = (
                self._ctc_logp(self.params, enc)
                if self.ctc_weight > 0.0
                else None
            )
            tokens, lens, scores = beam_decode(
                self.params, self.cfg.whisper, enc,
                beam_size=self.beam_size, primer=self.primer,
                max_steps=max_steps, length_bonus=self.length_bonus,
                ctc_weight=self.ctc_weight, ctc_logp=ctc_logp,
                ctc_frame_lens=enc_lens if ctc_logp is not None else None,
                lm_params=self.lm_params, lm_cfg=self.lm_cfg,
                lm_weight=self.lm_weight,
                ngram_lm=self.ngram_lm, ngram_weight=self.ngram_weight,
                pre_beam=self.pre_beam,
                use_end_detect=self.use_end_detect, loop=self.loop,
            )
        tokens = np.asarray(tokens)
        lens = np.asarray(lens)
        scores = np.asarray(scores)
        self._decode_seconds += time.perf_counter() - t0
        self._audio_seconds += float(np.asarray(lengths).sum()) / fs

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
