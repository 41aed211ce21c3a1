"""Observability sinks: TensorBoard event-file round-trip (masked-CRC
TFRecord + hand-rolled Event/Summary protobuf), matplotlib history
curves, attention-map PNGs (trainer.py:254-265,802+ equivalents)."""

import glob
import os

import numpy as np

from agacs_tpu.train.observability import (
    TensorboardWriter,
    crc32c,
    plot_history,
    read_event_file,
)


def test_crc32c_known_vectors():
    # RFC 3720 test vectors
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_event_file_roundtrip(tmp_path):
    tb = TensorboardWriter(str(tmp_path))
    tb.add_scalars(1, {"train/loss": 3.25, "valid/acc": 0.5})
    tb.add_scalars(2, {"train/loss": 2.0})
    tb.close()
    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1
    events = read_event_file(files[0])  # CRC-verified
    assert events[0]["values"] == {}  # file_version header event
    assert events[1]["step"] == 1
    np.testing.assert_allclose(events[1]["values"]["train/loss"], 3.25)
    np.testing.assert_allclose(events[1]["values"]["valid/acc"], 0.5)
    assert events[2]["step"] == 2


def test_plot_history(tmp_path):
    history = {
        1: {"train": {"loss": 3.0, "acc": 0.2, "iter_time": 1.0},
            "valid": {"loss": 3.5, "acc": 0.1}},
        2: {"train": {"loss": 2.0, "acc": 0.5},
            "valid": {"loss": 2.8, "acc": 0.3}},
    }
    written = plot_history(history, str(tmp_path))
    names = {os.path.basename(w) for w in written}
    assert {"loss.png", "acc.png"} <= names
    assert "iter_time.png" not in names  # timings excluded
    for w in written:
        assert os.path.getsize(w) > 1000
