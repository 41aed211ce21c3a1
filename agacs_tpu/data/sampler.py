"""Batch assembly: numel batch-bins packing + per-host sharding.

Replicates `NumElementsBatchSampler` (`espnet2/samplers/
num_elements_batch_sampler.py:10-157`, `batch_type: numel`): utterances
sorted by length descending, packed greedily so the PADDED element count
(batch_size × max_len_in_batch) stays under `batch_bins`.

TPU addition: per-host sharding (each JAX process takes a strided slice of
the batch list — replaces the reference's DistributedSampler rank split)
and shape BUCKETING (pad speech/text to a coarse grid so jit sees a small
closed set of shapes instead of one compilation per batch).
"""

from __future__ import annotations

import numpy as np


def num_elements_batches(
    lengths: dict[str, int],
    batch_bins: int,
    sort_in_batch: str = "descending",
    min_batch_size: int = 1,
    max_batch_size: int | None = None,
    shuffle_batches: bool = False,
    seed: int = 0,
) -> list[list[str]]:
    """Pack utt_ids into batches under a padded-numel budget.

    lengths: utt_id -> sample count (speech length; the reference bins on
    the first feature's numel, which for raw waveform input is exactly
    this). Returns a list of utt_id lists.
    """
    items = sorted(lengths.items(), key=lambda kv: kv[1], reverse=True)
    if sort_in_batch == "ascending":
        items = items[::-1]

    batches: list[list[str]] = []
    cur: list[str] = []
    cur_max = 0
    for utt, n in items:
        new_max = max(cur_max, n)
        if cur and (
            new_max * (len(cur) + 1) > batch_bins
            or (max_batch_size and len(cur) >= max_batch_size)
        ):
            batches.append(cur)
            cur, cur_max = [], 0
            new_max = n
        cur.append(utt)
        cur_max = new_max
    if cur:
        batches.append(cur)

    if len(batches) and len(batches[-1]) < min_batch_size and len(batches) > 1:
        batches[-2].extend(batches.pop())

    if shuffle_batches:
        rng = np.random.RandomState(seed)
        rng.shuffle(batches)
    return batches


def shard_batches(batches: list[list[str]], process_index: int, process_count: int):
    """Strided per-host split; drops the tail so every host sees the same
    number of batches (the reference instead allreduces a stop flag each
    step, trainer.py:514-524 — a fixed count is the jit-friendly form)."""
    import logging

    n = (len(batches) // process_count) * process_count
    if n < len(batches):
        logging.info(
            "shard_batches: dropping %d tail batch(es) of %d so all %d "
            "hosts see equal counts", len(batches) - n, len(batches),
            process_count,
        )
    return batches[process_index:n:process_count]


def bucket_length(n: int, grid: int = 16000, max_len: int | None = None) -> int:
    """Round n up to the bucket grid (default 1 s of samples)."""
    b = ((n + grid - 1) // grid) * grid
    return min(b, max_len) if max_len else b
