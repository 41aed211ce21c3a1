"""Shape collection for batch-bins packing — distributed when multi-host.

The reference collects shapes in a separate fan-out stage (asr.sh:1030
collect-stats with nj CPU jobs) and every DDP rank reads the shape files.
Here:
  * dirs written by the format stage carry `utt2num_samples` — shapes are
    a file read (ASRDataset seeds its cache from it);
  * otherwise each host probes only its stride-slice of the corpus
    (header reads) and the counts are exchanged through a tiny
    `process_allgather` — no host touches every file.
"""

from __future__ import annotations

import numpy as np


def collect_num_samples(ds) -> dict[str, int]:
    """{utt_id: n_samples} for every utterance of `ds`, probing only this
    host's slice in multi-process runs."""
    import jax

    utts = list(ds.utt_ids)
    n_proc = jax.process_count()
    if n_proc == 1:
        return {u: ds.num_samples(u) for u in utts}

    # cached entries (segments / utt2num_samples) are free everywhere
    missing = [u for u in utts if u not in ds._shape_cache]
    local = {u: ds.num_samples(u) for u in missing[jax.process_index()::n_proc]}

    # exchange: fixed-size int64 vector per process, -1 = not mine
    from jax.experimental import multihost_utils

    vec = np.full((len(missing),), -1, np.int64)
    for i, u in enumerate(missing):
        if u in local:
            vec[i] = local[u]
    gathered = np.asarray(multihost_utils.process_allgather(vec))
    merged = gathered.max(axis=0) if gathered.ndim == 2 else gathered
    out = {}
    for i, u in enumerate(missing):
        n = int(merged[i])
        assert n >= 0, f"{u}: no host probed this utterance"
        ds._shape_cache[u] = n
    return {u: ds.num_samples(u) for u in utts}
