"""Batch collation — `CommonCollateFn` (`espnet2/train/collate_fn.py:11`)
with TPU shape bucketing: speech zero-padded (pad value 0.0), text padded
with -1 (ignore_id), cs_labels padded with LANG_PAD; lengths emitted.
"""

from __future__ import annotations

import numpy as np

from agacs_tpu.adapt.cs_loss import LANG_PAD
from agacs_tpu.data.sampler import bucket_length


def collate_batch(
    items: list[dict],
    speech_grid: int = 16000,
    text_grid: int = 8,
    max_speech: int | None = 30 * 16000,
    pad_to: tuple[int, int] | None = None,
) -> dict:
    """pad_to=(s_pad, t_pad) forces the padded shapes — multi-host runs
    collate only their local row block but must pad to the GLOBAL batch's
    shape so every host's shard agrees (bin/train.py computes it from the
    shared length tables)."""
    b = len(items)
    if pad_to is not None:
        s_pad, t_pad = pad_to
    else:
        s_max = max(len(it["speech"]) for it in items)
        s_pad = bucket_length(s_max, speech_grid, max_speech)
        t_max = max(len(it["text"]) for it in items)
        t_pad = bucket_length(t_max, text_grid, None)

    speech = np.zeros((b, s_pad), np.float32)
    speech_lengths = np.zeros((b,), np.int32)
    text = np.full((b, t_pad), -1, np.int32)
    text_lengths = np.zeros((b,), np.int32)
    has_labels = all("cs_labels" in it for it in items)
    cs_labels = np.full((b, t_pad + 1), LANG_PAD, np.int8) if has_labels else None

    for i, it in enumerate(items):
        s = it["speech"][: s_pad]
        speech[i, : len(s)] = s
        speech_lengths[i] = len(s)
        ids = it["text"][:t_pad]
        text[i, : len(ids)] = ids
        text_lengths[i] = len(ids)
        if has_labels:
            lab = it["cs_labels"][: t_pad + 1]
            cs_labels[i, : len(lab)] = lab

    out = {
        "speech": speech,
        "speech_lengths": speech_lengths,
        "text": text,
        "text_lengths": text_lengths,
        "utt_ids": [it["utt_id"] for it in items],
    }
    if has_labels:
        out["cs_labels"] = cs_labels
    return out
