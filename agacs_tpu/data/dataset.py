"""ASR dataset over kaldi-style data dirs.

Functional equivalent of `ESPnetDataset` + `CommonPreprocessor`
(`espnet2/train/dataset.py:368`, `train/preprocessor.py:127-260`): lazy
per-utterance loading, text cleaning, tokenization through the Whisper
converter (dual-language prompt + eot), plus the CS language labels the
adaptation loss needs (computed here, on host, once per utterance).
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np

from agacs_tpu.adapt.cs_loss import attention_target_labels
from agacs_tpu.data.io import read_scp, read_wav, wav_num_samples
from agacs_tpu.text import TextCleaner, WhisperTokenIdConverter, WhisperTokenizer

SOT = 50258
EOT = 50257


class ASRDataset:
    def __init__(
        self,
        data_dir: str,
        tokenizer: WhisperTokenizer | None = None,
        cleaner: str | None = "whisper_basic",
        min_samples: int = 0,
        max_samples: int = 30 * 16000,
        with_cs_labels: bool = True,
    ):
        self.wav = read_scp(os.path.join(data_dir, "wav.scp"))
        self.text = read_scp(os.path.join(data_dir, "text"))
        self.tokenizer = tokenizer or WhisperTokenizer()
        self.converter = WhisperTokenIdConverter(self.tokenizer)
        self.cleaner = TextCleaner(cleaner) if cleaner else None
        self.with_cs_labels = with_cs_labels

        self.utt_ids = [u for u in self.wav if u in self.text]
        if min_samples or max_samples:
            kept = []
            for u in self.utt_ids:
                n = wav_num_samples(self.wav[u])
                if (not min_samples or n >= min_samples) and (
                    not max_samples or n <= max_samples
                ):
                    kept.append(u)
            self.utt_ids = kept
        self._shape_cache: dict[str, int] = {}

    def __len__(self) -> int:
        return len(self.utt_ids)

    def num_samples(self, utt_id: str) -> int:
        if utt_id not in self._shape_cache:
            self._shape_cache[utt_id] = wav_num_samples(self.wav[utt_id])
        return self._shape_cache[utt_id]

    def tokenize(self, text: str) -> list[int]:
        if self.cleaner is not None:
            text = self.cleaner(text)
        return self.converter.tokens2ids(self.tokenizer.text2tokens(text))

    def __getitem__(self, utt_id: str) -> dict:
        speech, sr = read_wav(self.wav[utt_id])
        assert sr == 16000, f"{utt_id}: expected 16 kHz, got {sr}"
        ids = np.asarray(self.tokenize(self.text[utt_id]), np.int32)
        item = {"utt_id": utt_id, "speech": speech, "text": ids}
        if self.with_cs_labels:
            ys_in = np.concatenate([[SOT], ids])[None, :]
            item["cs_labels"] = attention_target_labels(ys_in, self.tokenizer)[0]
        return item

    def iter_utts(self) -> Iterator[dict]:
        for u in self.utt_ids:
            yield self[u]
