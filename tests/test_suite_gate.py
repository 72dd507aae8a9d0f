"""Perf-regression gate logic (benchmarks/suite.py).

The gate protects the RESULTS.md numbers against silent kernel
regressions using same-session ratios (config qps / probe qps), because
the axon tunnel's session variance (±20-31%) makes absolute floors
useless. These tests pin the pure decision logic and the floor-file
round-trip; CI's bench smoke runs the probe end-to-end in interpret mode
(`suite.py --gate sim10k`)."""

import importlib.util
import json
import os

import pytest

_SUITE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchmarks",
    "suite.py",
)


@pytest.fixture(scope="module")
def suite():
    spec = importlib.util.spec_from_file_location("mvt_bench_suite", _SUITE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _row(name, qps):
    return {"config": name, "qps": qps, "p50_ms": 1.0, "recall": 1.0,
            "notes": ""}


def test_gate_passes_within_tolerance(suite):
    floors = {"a": 2.0}
    # session ratio 1.6 = floor - 20%, inside the 25% tolerance
    failures, messages = suite.gate_check(floors, [_row("a", 1600.0)], 1000.0)
    assert failures == []
    assert any("GATE ok" in m for m in messages)


def test_gate_fails_past_tolerance(suite):
    floors = {"a": 2.0}
    # ratio 1.4 = floor - 30% > tolerance
    failures, messages = suite.gate_check(floors, [_row("a", 1400.0)], 1000.0)
    assert failures == ["a"]
    assert any("GATE FAIL" in m and "a" in m for m in messages)


def test_gate_is_session_relative(suite):
    """A uniformly slow session (tunnel, not kernels) moves qps AND the
    probe together — ratios hold, the gate stays quiet."""
    floors = {"a": 2.0, "b": 0.5}
    rows = [_row("a", 2000.0), _row("b", 500.0)]
    assert suite.gate_check(floors, rows, 1000.0)[0] == []
    slow = [_row("a", 1000.0), _row("b", 250.0)]  # everything halved
    assert suite.gate_check(floors, slow, 500.0)[0] == []


def test_gate_skips_failed_and_unknown_rows(suite):
    floors = {"a": 2.0}
    rows = [_row("a", 0.0), _row("new-config", 3000.0)]
    failures, messages = suite.gate_check(floors, rows, 1000.0)
    assert failures == []
    assert any("no recorded floor" in m for m in messages)


def test_gate_record_roundtrip(suite, tmp_path, monkeypatch):
    gate_path = tmp_path / "GATE.json"
    monkeypatch.setattr(suite, "GATE_PATH", str(gate_path))
    rows = [_row("a", 2000.0), _row("b", 0.0)]
    floors = suite._gate_record("cpu", rows, 1000.0)
    assert floors == {"a": 2.0}  # qps==0 (FAILED) rows are not recorded
    assert json.loads(gate_path.read_text()) == {"cpu": {"a": 2.0}}
    assert suite._gate_load("cpu") == {"a": 2.0}
    assert suite._gate_load("tpu") == {}
    # re-record updates in place, preserving other backends
    suite._gate_record("tpu", [_row("a", 5000.0)], 1000.0)
    assert suite._gate_load("cpu") == {"a": 2.0}
    assert suite._gate_load("tpu") == {"a": 5.0}
