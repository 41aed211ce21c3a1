"""Background batch prefetching — the role of the reference's DataLoader
worker processes (`iterators/sequence_iter_factory.py` + num_workers):
overlap host-side wav reading / tokenization / collation with device steps.

Worker threads build batches ahead of consumption (bounded lookahead,
in-order delivery); with async jit dispatch one or two batches of
lookahead hides the host time.
"""

from __future__ import annotations

import threading
from typing import Callable, Iterable, Iterator


def prefetch_batches(
    make_batch: Callable[[list[str]], dict],
    batch_ids: Iterable[list[str]],
    lookahead: int = 2,
    num_threads: int = 2,
) -> Iterator[dict]:
    """Yield make_batch(utts) for each utt list, in order, built ahead by
    up to `lookahead` batches."""
    batch_ids = list(batch_ids)
    if not batch_ids:
        return

    cv = threading.Condition()
    results: dict[int, object] = {}
    next_claim = [0]
    consumed = [0]
    error: list[BaseException] = []

    def worker():
        while True:
            with cv:
                while (
                    next_claim[0] < len(batch_ids)
                    and next_claim[0] - consumed[0] > lookahead
                    and not error
                ):
                    cv.wait(timeout=0.1)
                if next_claim[0] >= len(batch_ids) or error:
                    return
                i = next_claim[0]
                next_claim[0] += 1
            try:
                b = make_batch(batch_ids[i])
            except BaseException as e:
                with cv:
                    error.append(e)
                    cv.notify_all()
                return
            with cv:
                results[i] = b
                cv.notify_all()

    threads = [
        threading.Thread(target=worker, daemon=True)
        for _ in range(max(1, num_threads))
    ]
    for t in threads:
        t.start()

    for i in range(len(batch_ids)):
        with cv:
            while i not in results and not error:
                cv.wait(timeout=0.1)
            if error:
                raise error[0]
            b = results.pop(i)
            consumed[0] = i + 1
            cv.notify_all()
        yield b
