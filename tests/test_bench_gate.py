"""Unit tests for bench.py's noise gate (round 14, VERDICT item 1).

BENCH_r13 was contaminated by 5.6% hypervisor steal the artifact itself
stamped; these tests pin the gate helpers without running the suite.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _load_bench():
    spec = importlib.util.spec_from_file_location("gbe_bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["gbe_bench"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_steal_between_basic():
    bench = _load_bench()
    start = {"cpu_total_jiffies": 1000, "cpu_steal_jiffies": 10}
    end = {"cpu_total_jiffies": 2000, "cpu_steal_jiffies": 66}
    # 56 steal jiffies over 1000 total = 5.6% — the exact r13 signature
    assert bench._steal_between(start, end) == 5.6


def test_steal_between_missing_counters():
    bench = _load_bench()
    assert bench._steal_between({}, {}) is None
    assert bench._steal_between({"cpu_total_jiffies": 5}, {"cpu_total_jiffies": 5}) is None


def test_probe_steal_runs_quickly():
    bench = _load_bench()
    steal, stamp = bench._probe_steal(window_sec=0.2)
    # On any Linux box /proc/stat exists, so a numeric reading comes back
    assert steal is None or steal >= 0.0
    assert isinstance(stamp, dict)


def test_load_stamp_fields():
    bench = _load_bench()
    s = bench._load_stamp()
    assert "cpu_total_jiffies" in s
    assert "loadavg_1m" in s
