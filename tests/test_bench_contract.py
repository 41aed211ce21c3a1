"""The driver contract of bench.py: ONE parseable JSON line with the
metric/value/unit/vs_baseline keys (graft harness requirement), plus the
budget-guard arithmetic — tested WITHOUT touching a device."""

import io
import json
import sys


def test_emit_prints_driver_schema(capsys):
    import bench

    matrix = {"16x15s_int8": {"ms_per_step": 85.2,
                              "audio_sec_per_s": 2815.9, "mfu": 0.52}}
    bench._emit(matrix, (2815.9, "16x15s_int8"))
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    line = json.loads(out[0])
    assert line["metric"] == "whisper_small_adapter_csloss_train_throughput"
    assert line["unit"] == "audio_sec/s/chip"
    assert line["value"] == 2815.9
    assert line["vs_baseline"] > 1000  # vs the 1.82 torch-CPU baseline
    assert line["best_shape"] == "16x15s_int8"
    assert line["matrix"] == matrix
    assert "inference" not in line

    bench._emit(matrix, (2815.9, "16x15s_int8"), inference={"greedy": {}})
    line = json.loads(capsys.readouterr().out.strip())
    assert line["inference"] == {"greedy": {}}


def test_analytic_flops_monotonic():
    import bench

    # more audio-seconds / batch => more model FLOPs, at every family
    assert bench.whisper_fwd_flops(16, 15) > bench.whisper_fwd_flops(8, 15)
    assert bench.whisper_fwd_flops(8, 30) > bench.whisper_fwd_flops(8, 15)
    assert bench.conformer_fwd_flops(16, 1875) > bench.conformer_fwd_flops(8, 1875)
    assert bench.transducer_fwd_flops(8, 1875, vocab=51865) > \
        bench.transducer_fwd_flops(8, 1875, vocab=5000)


def test_headline_shape_is_first_and_batchbins_realistic():
    import bench

    b, s, remat, int8 = bench.HEADLINE
    assert int8 and (b * s * 16000) <= 8_000_000  # recipe batch_bins 8e6
    # default matrix stays small enough for the driver budget
    assert len(bench.DEFAULT_WHISPER) <= 2
