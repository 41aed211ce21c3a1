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
        cs_label_mode: str = "attention",
        augment=None,
    ):
        self.wav = read_scp(os.path.join(data_dir, "wav.scp"))
        self.text = read_scp(os.path.join(data_dir, "text"))
        # kaldi segments: utterances are (recording, start_s, end_s) slices
        # and wav.scp keys recordings (dataset.py/fileio segments handling)
        self.segments: dict[str, tuple[str, float, float]] = {}
        seg_path = os.path.join(data_dir, "segments")
        if os.path.exists(seg_path):
            for utt, v in read_scp(seg_path).items():
                rec, start, end = v.split()
                self.segments[utt] = (rec, float(start), float(end))
        self.tokenizer = tokenizer or WhisperTokenizer()
        self.converter = WhisperTokenIdConverter(self.tokenizer)
        self.cleaner = TextCleaner(cleaner) if cleaner else None
        self.with_cs_labels = with_cs_labels
        # "attention" (shipped loss) or "lid_ce" (cs_loss_type: lid_ce)
        self.cs_label_mode = cs_label_mode
        # optional on-the-fly RIR/noise augmentation (data/augment.py),
        # applied per utterance at read time like the reference's
        # CommonPreprocessor._speech_process (train datasets only)
        self.augment = augment
        self._rec_cache: tuple[str, np.ndarray, int] | None = None

        if self.segments:
            self.utt_ids = [
                u for u in self.segments
                if u in self.text and self.segments[u][0] in self.wav
            ]
        else:
            self.utt_ids = [u for u in self.wav if u in self.text]
        self._shape_cache: dict[str, int] = {}
        self._tok_len_cache: dict[str, int] = {}
        # format stage writes utt2num_samples (format_wav_scp.py:164):
        # use it instead of probing every audio header (shape collection
        # over a 100k-utterance ark dump would otherwise read ~GBs)
        num_path = os.path.join(data_dir, "utt2num_samples")
        if os.path.exists(num_path):
            for u, n in read_scp(num_path).items():
                self._shape_cache[u] = int(n)
        if min_samples or max_samples:
            kept = []
            for u in self.utt_ids:
                n = self.num_samples(u)
                if (not min_samples or n >= min_samples) and (
                    not max_samples or n <= max_samples
                ):
                    kept.append(u)
            self.utt_ids = kept

    def __len__(self) -> int:
        return len(self.utt_ids)

    def num_samples(self, utt_id: str) -> int:
        if utt_id not in self._shape_cache:
            if utt_id in self.segments:
                _, start, end = self.segments[utt_id]
                self._shape_cache[utt_id] = int(round((end - start) * 16000))
            else:
                self._shape_cache[utt_id] = wav_num_samples(self.wav[utt_id])
        return self._shape_cache[utt_id]

    def _read_speech(self, utt_id: str) -> tuple[np.ndarray, int]:
        if utt_id not in self.segments:
            return read_wav(self.wav[utt_id])
        rec, start, end = self.segments[utt_id]
        # one-recording cache: split dirs are sorted by recording, so
        # consecutive utterances slice the same long FLAC
        if self._rec_cache is None or self._rec_cache[0] != rec:
            audio, sr = read_wav(self.wav[rec])
            self._rec_cache = (rec, audio, sr)
        _, audio, sr = self._rec_cache
        return audio[int(round(start * sr)) : int(round(end * sr))], sr

    def tokenize(self, text: str) -> list[int]:
        if self.cleaner is not None:
            text = self.cleaner(text)
        return self.converter.tokens2ids(self.tokenizer.text2tokens(text))

    def num_tokens(self, utt_id: str) -> int:
        """Token count without touching audio (cached) — multi-host
        collation needs every utterance's text length to agree on the
        global padded shape."""
        if utt_id not in self._tok_len_cache:
            self._tok_len_cache[utt_id] = len(self.tokenize(self.text[utt_id]))
        return self._tok_len_cache[utt_id]

    def __getitem__(self, utt_id: str) -> dict:
        speech, sr = self._read_speech(utt_id)
        assert sr == 16000, f"{utt_id}: expected 16 kHz, got {sr}"
        if self.augment is not None:
            speech = self.augment(speech)
        ids = np.asarray(self.tokenize(self.text[utt_id]), np.int32)
        item = {"utt_id": utt_id, "speech": speech, "text": ids}
        if self.with_cs_labels:
            ys_in = np.concatenate([[SOT], ids])[None, :]
            item["cs_labels"] = attention_target_labels(
                ys_in, self.tokenizer, mode=self.cs_label_mode
            )[0]
        return item

    def iter_utts(self) -> Iterator[dict]:
        for u in self.utt_ids:
            yield self[u]
