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


def test_wandb_sink_offline(tmp_path):
    """No wandb package in this image: the sink must fall back to the
    run-dir JSONL + artifact manifest (the reference's trainer.py:397-415
    wandb role, offline form)."""
    import json

    from agacs_tpu.train.observability import WandbSink

    sink = WandbSink(str(tmp_path))
    sink.log_epoch(1, {"train": {"loss": 3.0}, "valid": {"acc": 0.25}})
    sink.log_epoch(2, {"train": {"loss": 2.0}, "valid": {"acc": 0.5}})
    model = tmp_path / "valid.acc.ave.params.npz"
    model.write_bytes(b"x" * 16)
    sink.log_artifact(str(model))
    sink.finish()

    lines = [json.loads(l) for l in
             (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert lines[0] == {"epoch": 1, "train/loss": 3.0, "valid/acc": 0.25}
    assert lines[1]["valid/acc"] == 0.5
    manifest = json.loads((tmp_path / "artifacts.json").read_text())
    assert manifest[0]["kind"] == "model"
    assert manifest[0]["path"].endswith("valid.acc.ave.params.npz")
