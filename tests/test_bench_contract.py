"""bench.py driver-contract tests.

Round 3 lost its only perf record because the kernel gate ran un-budgeted
before any output (BENCH_r03.json: rc=124, parsed=null).  These tests pin
the invariants that prevent a recurrence: the gate is parsed/timed-out
without suppressing the metric, the baseline lookup never blocks on a
6-minute re-measure, and the SIGTERM handler flushes the best-so-far JSON.
"""

import json
import subprocess
import sys

import pytest

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
import bench  # noqa: E402


def test_gate_subprocess_parses_report(tmp_path, monkeypatch):
    report = {"ok": True, "bwd.grads_global": {"err_pallas_vs_f32": 1e-3}}

    def fake_run(cmd, capture_output, text, timeout):
        class R:
            returncode = 0
            stdout = "noise line\n" + json.dumps(report, indent=1)
            stderr = ""
        return R()

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    # NEVER the tracked docs/ path: this test once clobbered the genuine
    # hardware gate record (round-4 advisor high finding)
    artifact = tmp_path / "gate.json"
    monkeypatch.setattr(bench, "GATE_ARTIFACT", str(artifact))
    got = bench.run_gate_subprocess(10)
    assert got["ok"] is True
    assert got["bwd.grads_global"]["err_pallas_vs_f32"] == 1e-3
    assert json.loads(artifact.read_text())["ok"] is True


def test_gate_subprocess_timeout_is_nonfatal(monkeypatch):
    def fake_run(cmd, capture_output, text, timeout):
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench.run_gate_subprocess(1) == {"ok": "timeout"}


def test_gate_subprocess_garbage_output_is_nonfatal(monkeypatch):
    def fake_run(cmd, capture_output, text, timeout):
        class R:
            returncode = 1
            stdout = "no json here"
            stderr = "boom"
        return R()

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench.run_gate_subprocess(10) == {"ok": "error"}


def test_baseline_never_remeasures_by_default(tmp_path, monkeypatch):
    # no cache file + no opt-in env -> the recorded constant, instantly
    monkeypatch.setattr(bench, "BASELINE_CACHE", str(tmp_path / "none.json"))
    monkeypatch.delenv("SVIT_BENCH_MEASURE_BASELINE", raising=False)
    assert bench.measure_torch_cpu_baseline() == (
        bench.RECORDED_CPU_CLIPS_PER_SEC, "recorded-r1r3"
    )


def test_baseline_cache_roundtrip(tmp_path, monkeypatch):
    cache = tmp_path / "cache.json"
    cache.write_text(json.dumps({"cpu_clips_per_sec": 0.25, "batch": bench.BATCH}))
    monkeypatch.setattr(bench, "BASELINE_CACHE", str(cache))
    assert bench.measure_torch_cpu_baseline() == (0.25, "cached")


def test_sigterm_handler_flushes_partial_result(capsys, monkeypatch):
    codes = []
    monkeypatch.setattr(bench.os, "_exit", codes.append)
    bench._RESULT.clear()
    bench._RESULT.update({"metric": "m", "value": 123.0, "unit": "clips/s"})
    bench._on_term(15, None)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(out)
    assert parsed["value"] == 123.0
    assert parsed["note"] == "terminated before completion"
    # partial JSON is flushed, but the rc still says "terminated" (143)
    assert codes == [143]
    bench._RESULT.clear()


def test_sigterm_handler_silent_without_metric(capsys, monkeypatch):
    monkeypatch.setattr(bench.os, "_exit", lambda code: None)
    bench._RESULT.clear()
    bench._on_term(15, None)
    assert capsys.readouterr().out.strip() == ""
