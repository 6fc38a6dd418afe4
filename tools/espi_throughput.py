"""Idle-box re-measurement of the headline ESPI multi-file throughput
(r11 VERDICT item 1: bench read ~81 files/s twice vs r10's 107 — noise
or regression?).

Mirrors bench.py's protocol exactly: untimed single-file warm-up
(Python workers/Arrow), untimed 40-file warm-up (glob/many-partition
codepaths), then N timed trials over 512 hard-linked copies, reporting
min and median files/s plus the load stamps.  Run it in a FRESH
process per session: ``python tools/espi_throughput.py [n_trials]``.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

EGD = "/root/reference/test_files/EGD_Gas_EnergyUsage_20221225_20241225.xml"


def main() -> None:
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_files = int(os.environ.get("SPARK_GRAFT_ESPI_FILES", "512"))

    from bench import _load_stamp
    from greenbuttonengine_spark.espi import timeseries_from_files
    from greenbuttonengine_spark.session import get_spark
    from greenbuttonengine_spark.sinks import write_parquet

    load_start = _load_stamp()
    spark = get_spark(app_name="gbe-espi-throughput")
    spark.sparkContext.setLogLevel("OFF")

    def run_espi(paths) -> float:
        out = tempfile.mkdtemp(prefix="espi_tp_")
        t0 = time.time()
        ts, _errors = timeseries_from_files(spark, paths)
        write_parquet(ts, out)
        dt = time.time() - t0
        shutil.rmtree(out, ignore_errors=True)
        spark.catalog.clearCache()
        return dt

    run_espi(EGD)  # warm-up: Python workers, Arrow, XML codepaths
    multi = tempfile.mkdtemp(prefix="espi_tp_multi_")
    for i in range(n_files):
        os.link(EGD, os.path.join(multi, f"copy_{i:04d}.xml"))
    run_espi(os.path.join(multi, "copy_00[0-3]?.xml"))  # glob warm-up
    trials = [run_espi(os.path.join(multi, "*.xml")) for _ in range(n_trials)]
    shutil.rmtree(multi, ignore_errors=True)
    load_end = _load_stamp()

    out = {
        "n_files": n_files,
        "trials_sec": [round(t, 2) for t in trials],
        "files_per_sec_min_time": round(n_files / min(trials), 1),
        "files_per_sec_median": round(n_files / statistics.median(trials), 1),
        "loadavg_start": [load_start.get("loadavg_1m"), load_start.get("loadavg_5m")],
        "loadavg_end": [load_end.get("loadavg_1m"), load_end.get("loadavg_5m")],
    }
    dt = load_end.get("cpu_total_jiffies", 0) - load_start.get("cpu_total_jiffies", 0)
    if dt > 0 and "cpu_steal_jiffies" in load_end:
        ds = load_end["cpu_steal_jiffies"] - load_start.get("cpu_steal_jiffies", 0)
        out["cpu_steal_pct"] = round(100.0 * ds / dt, 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
