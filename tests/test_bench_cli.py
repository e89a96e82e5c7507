"""bench.py end-to-end smoke on the CPU backend (slow).

The driver runs `python bench.py` on real hardware each round and records
the JSON line; this pins the contract (single JSON line with
metric/value/unit/vs_baseline) and the analytic-MFU plumbing off-chip.
"""
import json
import runpy
import sys

import pytest

pytestmark = pytest.mark.slow


def test_bench_cli_json_contract(monkeypatch, capsys):
    monkeypatch.setattr(sys, "argv", ["bench.py", "8", "--seconds", "0.2"])
    runpy.run_path("bench.py", run_name="__main__")
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    assert len(lines) == 1, "bench.py must print exactly one JSON line"
    row = json.loads(lines[0])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(row)
    assert row["metric"] == "streaming_encdec_rtf_per_chip"
    assert row["value"] > 0
    # analytic FLOP accounting reports achieved_tflops even on CPU
    assert row.get("achieved_tflops", 0) > 0


def test_bench_cli_frames_block_streaming(monkeypatch, capsys):
    """--frames F (block streaming) runs end-to-end and tags the metric;
    token bit-identity across block sizes is pinned separately by
    tests/test_codec_api.py::test_stream_block_sizes_agree."""
    monkeypatch.setattr(sys, "argv",
                        ["bench.py", "8", "--seconds", "0.2",
                         "--frames", "4"])
    runpy.run_path("bench.py", run_name="__main__")
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    assert len(lines) == 1
    row = json.loads(lines[0])
    assert row["metric"] == "streaming_encdec_rtf_per_chip_f4"
    assert "block=4 frames" in row["unit"]
    assert row["value"] > 0
