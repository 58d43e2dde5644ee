"""bench.py driver-contract guards that don't need a Spark session.

The driver parses bench.py's stdout as ONE JSON line; anything else a
bench phase emits must go to stderr. The sf1 fixture generator is a
subprocess, so its inherited stdout is the one place a phase could
pollute the contract without any print() in bench.py itself.
"""

import subprocess
import sys

import bench


def test_ensure_sf1_keeps_child_output_off_stdout(tmp_path, monkeypatch):
    calls = {}

    def fake_run(cmd, **kwargs):
        calls["cmd"] = cmd
        calls["stdout"] = kwargs.get("stdout")
        return subprocess.CompletedProcess(cmd, 0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._ensure_sf1(str(tmp_path / "sf1")) is True
    # gen_sf.py prints per-table progress; it must not inherit bench's
    # stdout (the driver parses stdout as a single JSON line).
    assert calls["stdout"] is sys.stderr


def test_ensure_sf1_short_circuits_on_existing_fixture(tmp_path, monkeypatch):
    sf1 = tmp_path / "sf1"
    sf1.mkdir()
    (sf1 / "lineitem.parquet").write_bytes(b"")

    def boom(*a, **k):  # pragma: no cover - must not be reached
        raise AssertionError("subprocess.run called despite existing fixture")

    monkeypatch.setattr(subprocess, "run", boom)
    assert bench._ensure_sf1(str(sf1)) is True
