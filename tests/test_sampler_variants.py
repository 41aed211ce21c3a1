"""sorted/unsorted/folded/length batch types vs the reference samplers.

The reference classes (`espnet2/samplers/{sorted,unsorted,folded,length}
_batch_sampler.py`) import cleanly from the read-only checkout, so every
variant is oracle-tested over randomized length tables and parameter
grids: identical batch lists, key for key.
"""

import os
import sys

import numpy as np
import pytest

from agacs_tpu.data.sampler import (
    folded_batches,
    length_batches,
    sorted_batches,
    unsorted_batches,
)

ESPNET = "/root/reference/espnet"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(ESPNET), reason="reference not mounted"
)


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, ESPNET)
    try:
        from espnet2.samplers.folded_batch_sampler import FoldedBatchSampler
        from espnet2.samplers.length_batch_sampler import LengthBatchSampler
        from espnet2.samplers.sorted_batch_sampler import SortedBatchSampler
        from espnet2.samplers.unsorted_batch_sampler import (
            UnsortedBatchSampler,
        )
    finally:
        sys.path.remove(ESPNET)
    return {
        "folded": FoldedBatchSampler,
        "length": LengthBatchSampler,
        "sorted": SortedBatchSampler,
        "unsorted": UnsortedBatchSampler,
    }


def _lengths(n, seed, lo=50, hi=3000):
    rng = np.random.RandomState(seed)
    return {f"utt{i:03d}": int(rng.randint(lo, hi)) for i in range(n)}


def _write_shapes(tmp_path, lengths, name):
    p = tmp_path / name
    p.write_text("".join(f"{k} {v}\n" for k, v in lengths.items()))
    return str(p)


@pytest.mark.parametrize("sort_in_batch", ["descending", "ascending"])
@pytest.mark.parametrize("sort_batch", ["ascending", "descending"])
@pytest.mark.parametrize("drop_last", [False, True])
@pytest.mark.parametrize("n,bs", [(57, 8), (8, 8), (5, 8), (64, 16)])
def test_sorted_oracle(ref, tmp_path, sort_in_batch, sort_batch, drop_last, n, bs):
    lengths = _lengths(n, seed=n + bs)
    shape_file = _write_shapes(tmp_path, lengths, "speech_shape")
    want = list(
        ref["sorted"](
            batch_size=bs, shape_file=shape_file,
            sort_in_batch=sort_in_batch, sort_batch=sort_batch,
            drop_last=drop_last,
        )
    )
    got = sorted_batches(
        lengths, bs, sort_in_batch=sort_in_batch, sort_batch=sort_batch,
        drop_last=drop_last,
    )
    assert [list(b) for b in want] == got


@pytest.mark.parametrize("drop_last", [False, True])
@pytest.mark.parametrize("n,bs", [(57, 8), (8, 8), (5, 8)])
def test_unsorted_oracle(ref, tmp_path, drop_last, n, bs):
    lengths = _lengths(n, seed=n)
    key_file = _write_shapes(tmp_path, lengths, "keys")
    want = list(
        ref["unsorted"](batch_size=bs, key_file=key_file, drop_last=drop_last)
    )
    got = unsorted_batches(list(lengths), bs, drop_last=drop_last)
    assert [list(b) for b in want] == got


@pytest.mark.parametrize("sort_in_batch", ["descending", "ascending"])
@pytest.mark.parametrize("sort_batch", ["ascending", "descending"])
@pytest.mark.parametrize("drop_last", [False, True])
@pytest.mark.parametrize("n,bs,minb", [(57, 16, 1), (64, 24, 4), (9, 16, 2)])
def test_folded_oracle(
    ref, tmp_path, sort_in_batch, sort_batch, drop_last, n, bs, minb
):
    speech = _lengths(n, seed=n * 3, lo=8000, hi=480000)
    text = {k: int(v // 1000) + 1 for k, v in speech.items()}
    sf = _write_shapes(tmp_path, speech, "speech_shape")
    tf = _write_shapes(tmp_path, text, "text_shape")
    fold = [80000, 150]
    want = list(
        ref["folded"](
            batch_size=bs, shape_files=[sf, tf], fold_lengths=fold,
            min_batch_size=minb, sort_in_batch=sort_in_batch,
            sort_batch=sort_batch, drop_last=drop_last,
        )
    )
    got = folded_batches(
        [speech, text], bs, fold, min_batch_size=minb,
        sort_in_batch=sort_in_batch, sort_batch=sort_batch,
        drop_last=drop_last,
    )
    assert [list(b) for b in want] == got


@pytest.mark.parametrize("sort_in_batch", ["descending", "ascending"])
@pytest.mark.parametrize("sort_batch", ["ascending", "descending"])
@pytest.mark.parametrize("padding", [True, False])
@pytest.mark.parametrize("drop_last", [False, True])
@pytest.mark.parametrize("n,bins,minb", [(57, 2_000_000, 1), (40, 800_000, 4)])
def test_length_oracle(
    ref, tmp_path, sort_in_batch, sort_batch, padding, drop_last, n, bins, minb
):
    speech = _lengths(n, seed=n * 7, lo=8000, hi=480000)
    text = {k: int(v // 1000) + 1 for k, v in speech.items()}
    sf = _write_shapes(tmp_path, speech, "speech_shape")
    tf = _write_shapes(tmp_path, text, "text_shape")
    want = list(
        ref["length"](
            batch_bins=bins, shape_files=[sf, tf], min_batch_size=minb,
            sort_in_batch=sort_in_batch, sort_batch=sort_batch,
            drop_last=drop_last, padding=padding,
        )
    )
    got = length_batches(
        [speech, text], bins, min_batch_size=minb,
        sort_in_batch=sort_in_batch, sort_batch=sort_batch,
        drop_last=drop_last, padding=padding,
    )
    assert [list(b) for b in want] == got


def test_unsorted_categories():
    keys = [f"u{i}" for i in range(10)]
    cats = {k: ("a" if i < 7 else "b") for i, k in enumerate(keys)}
    got = unsorted_batches(keys, 3, utt2category=cats)
    # every batch is single-category and all keys are covered exactly once
    flat = [k for b in got for k in b]
    assert sorted(flat) == sorted(keys)
    for b in got:
        assert len({cats[k] for k in b}) == 1


def test_errors():
    with pytest.raises(ValueError):
        sorted_batches({"a": 1}, 2, sort_in_batch="bogus")
    with pytest.raises(RuntimeError):
        length_batches([{"a": 1}, {"b": 2}], 100)
    with pytest.raises(RuntimeError):
        sorted_batches({}, 2)
