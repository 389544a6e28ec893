"""bench.py's unreachable-backend guard.

Round-2 postmortem: the driver's benchmark run is the round's one perf
artifact, and the axon tunnel fails by HANGING ``jax.devices()`` — an
unguarded bench then times out (rc 124) and the round records nothing
(BENCH_r02.json).  The guard must (a) emit a parseable primary line and
exit 0 with no device, (b) never present a stale value as a fresh
measurement.
"""

import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load_bench(monkeypatch, tmp_path):
    spec = importlib.util.spec_from_file_location("bench_under_test", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_stale_fallback_line_is_parseable_and_marked(monkeypatch, tmp_path, capsys):
    bench = _load_bench(monkeypatch, tmp_path)
    record = {
        "metric": "nst_steps_per_sec_512px_bs4",
        "value": 47.95,
        "unit": "closure_evals/sec",
        "vs_baseline": 1.94,
        "date": "2026-08-17",
    }
    cap = tmp_path / "BENCH_last.json"
    cap.write_text(json.dumps(record))
    monkeypatch.setattr(bench, "LAST_CAPTURE_PATH", str(cap))

    bench.emit_stale_fallback()
    line = json.loads(capsys.readouterr().out.strip())
    assert line["metric"] == "nst_steps_per_sec_512px_bs4"
    assert line["value"] == 47.95
    assert line["vs_baseline"] == 1.94
    assert line["measured_now"] is False
    assert "unreachable" in line["note"]


def test_stale_fallback_without_capture_reports_zero(monkeypatch, tmp_path, capsys):
    bench = _load_bench(monkeypatch, tmp_path)
    monkeypatch.setattr(bench, "LAST_CAPTURE_PATH", str(tmp_path / "missing.json"))
    bench.emit_stale_fallback()
    line = json.loads(capsys.readouterr().out.strip())
    assert line["value"] == 0.0
    assert line["measured_now"] is False
    assert "no prior capture" in line["note"]


def test_main_short_circuits_when_backend_unreachable(monkeypatch, tmp_path, capsys):
    bench = _load_bench(monkeypatch, tmp_path)
    monkeypatch.setattr(bench, "backend_reachable", lambda: False)
    monkeypatch.setattr(bench, "LAST_CAPTURE_PATH", str(tmp_path / "missing.json"))
    bench.main()  # must not touch the model / device path at all
    line = json.loads(capsys.readouterr().out.strip())
    assert line["measured_now"] is False


def test_main_falls_back_when_backend_resolves_to_cpu(monkeypatch, tmp_path, capsys):
    bench = _load_bench(monkeypatch, tmp_path)
    monkeypatch.setattr(bench, "backend_reachable", lambda: True)
    monkeypatch.setattr(bench.jax, "default_backend", lambda: "cpu")
    monkeypatch.delenv("BENCH_ALLOW_CPU", raising=False)
    monkeypatch.setattr(bench, "LAST_CAPTURE_PATH", str(tmp_path / "missing.json"))
    bench.main()  # must not start the hours-long CPU measurement
    line = json.loads(capsys.readouterr().out.strip())
    assert line["measured_now"] is False
    assert "resolved to CPU" in line["note"]


def test_backend_reachable_subprocess_timeout(monkeypatch):
    bench = _load_bench(monkeypatch, None)
    # no axon platform -> straight to the subprocess check; make the probe
    # command time out so the timeout path is what returns
    monkeypatch.setenv("JAX_PLATFORMS", "definitely_not_axon")
    monkeypatch.setenv("BENCH_PROBE_TIMEOUT_S", "1")

    import subprocess as sp

    def fake_run(cmd, timeout, capture_output):
        raise sp.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(sp, "run", fake_run)
    assert bench.backend_reachable() is False
