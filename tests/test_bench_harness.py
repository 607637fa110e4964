"""Tests for bench.py's hardened harness (round-2 VERDICT item 1).

The round-2 bench failure was unrecoverable because only 500 chars of
ANSI-colored log noise survived; these pin the capture/preflight behavior
without touching a TPU.
"""

import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


@pytest.mark.quick
class TestTracebackExtraction:
    def test_plain_traceback(self):
        err = (
            "INFO some log line\n"
            "Traceback (most recent call last):\n"
            '  File "x.py", line 1, in <module>\n'
            "    raise RuntimeError('boom')\n"
            "RuntimeError: boom\n"
        )
        tb = bench.extract_traceback(err)
        assert tb.startswith("Traceback")
        assert "RuntimeError: boom" in tb

    def test_last_traceback_wins(self):
        err = (
            "Traceback (most recent call last):\nValueError: first\n"
            "retrying...\n"
            "Traceback (most recent call last):\nRuntimeError: second\n"
        )
        tb = bench.extract_traceback(err)
        assert "second" in tb and "first" not in tb

    def test_ansi_stripped(self):
        err = (
            "\x1b[2m2026-08-17\x1b[0m \x1b[32mINFO\x1b[0m noise\n"
            "Traceback (most recent call last):\n\x1b[31mXlaRuntimeError: "
            "RESOURCE_EXHAUSTED\x1b[0m\n"
        )
        tb = bench.extract_traceback(err)
        assert "\x1b[" not in tb
        assert "RESOURCE_EXHAUSTED" in tb

    def test_error_lines_without_traceback_header(self):
        err = "\n".join(
            ["INFO compiling module"] * 50
            + ["F0817 fatal check failure: RESOURCE_EXHAUSTED: out of memory"]
            + ["INFO shutting down"] * 5
        )
        tb = bench.extract_traceback(err)
        assert "RESOURCE_EXHAUSTED" in tb
        assert "INFO compiling" not in tb

    def test_pure_noise_falls_back_to_tail(self):
        err = "line\n" * 2000
        tb = bench.extract_traceback(err, max_chars=100)
        assert len(tb) <= 100


@pytest.mark.quick
class TestPreflight:
    def test_self_and_tunnel_excluded(self):
        """The running pytest (our own ancestor chain) and the axon tunnel
        daemon must never be suspects — killing them ends the session."""
        for pid, _age, cmd in bench.find_tpu_suspects():
            assert pid != os.getpid()
            assert ".tpu_init" not in cmd

    def test_other_python_process_detected(self):
        # a genuinely separate process whose cmdline matches the suspect set
        proc = subprocess.Popen(
            [sys.executable, "-c",
             "import time; time.sleep(30)  # vangan_bench_suspect_marker"],
        )
        try:
            import time

            deadline = time.time() + 5
            found = False
            while time.time() < deadline and not found:
                found = any(p == proc.pid for p, _, _ in bench.find_tpu_suspects())
                if not found:
                    time.sleep(0.2)
            assert found, "spawned vangan-marker process not detected as suspect"
        finally:
            proc.kill()
            proc.wait()


@pytest.mark.quick
def test_probe_json_line_parsing(tmp_path, monkeypatch):
    """_run_probe returns the parsed metric line and writes full logs."""
    monkeypatch.setattr(bench, "LOG_DIR", str(tmp_path))
    # abuse --batch with a stub: run a tiny subprocess emitting a JSON line
    script = tmp_path / "fake.py"
    script.write_text('print(\'{"metric": "m", "value": 1.5}\')\n')
    monkeypatch.setattr(
        bench.subprocess, "run",
        lambda *a, **k: subprocess.CompletedProcess(
            a, 0, stdout='{"metric": "m", "value": 1.5}\n', stderr="warn\n"),
    )
    result, rc, tb = bench._run_probe(["--batch", "1"], "t1")
    assert result == {"metric": "m", "value": 1.5}
    assert rc == 0 and tb is None
    assert (tmp_path / "t1.out.log").read_text().startswith("{")
    assert (tmp_path / "t1.err.log").read_text() == "warn\n"


@pytest.mark.quick
def test_probe_failure_returns_traceback(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "LOG_DIR", str(tmp_path))
    monkeypatch.setattr(
        bench.subprocess, "run",
        lambda *a, **k: subprocess.CompletedProcess(
            a, 1, stdout="",
            stderr="noise\nTraceback (most recent call last):\nKeyError: 'x'\n"),
    )
    result, rc, tb = bench._run_probe(["--batch", "1"], "t2")
    assert result is None and rc == 1
    assert tb.startswith("Traceback") and "KeyError" in tb


@pytest.mark.quick
def test_probe_retry_respects_wall_budget(tmp_path, monkeypatch):
    """Round-3 VERDICT item 1: per-probe timeouts derive from the remaining
    budget; a probe is skipped outright when too little remains."""
    monkeypatch.setattr(bench, "LOG_DIR", str(tmp_path))
    timeouts = []

    def fake_run(*a, **k):
        timeouts.append(k.get("timeout"))
        return subprocess.CompletedProcess(
            a, 1, stdout="", stderr="Traceback (most recent call last):\nX: y\n")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench, "preflight", lambda wait_s=0: None)

    # (almost) no budget left -> skipped without spawning anything
    monkeypatch.setattr(bench, "_remaining", lambda: 100.0)
    failures = []
    assert bench._probe_with_retry(["--batch", "1"], "t3", failures, timeout=500) is None
    assert timeouts == []
    assert failures == []  # skip, not failure

    # budget available -> timeout clamped to remaining - reserve, retried once
    monkeypatch.setattr(bench, "_remaining", lambda: 1000.0)
    assert bench._probe_with_retry(
        ["--batch", "1"], "t4", failures, timeout=5000, reserve=300) is None
    assert timeouts == [700, 700]
    assert len(failures) == 2


@pytest.mark.quick
def test_emit_is_json_line(capsys):
    bench._emit({"metric": "m", "value": 2.0})
    out = capsys.readouterr().out
    import json

    assert json.loads(out.strip()) == {"metric": "m", "value": 2.0}
