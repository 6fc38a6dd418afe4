"""Fresh build+exec split timing for declared queries.

Per trial: rebuild the DataFrame from scratch (times DRIVER-side plan
construction, including any jobs the builder itself runs — seeded
collects, fixpoint loops, eager checkpoints), then execute it to the
noop sink (times execution).  This is the honest per-run cost bench.py
pays, split so driver-bound and executor-bound queries are
distinguishable (guide §1 / §7.3).

Usage: python tools/time_query.py [sf_dir] query [query ...]
       [--trials N]

Prints one line per (query, trial) plus a median summary.  Run on an
idle box; the first trial of a fresh session carries JVM/Catalyst
warm-up and is reported but excluded from the warm median.
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    trials = 4
    for i, a in enumerate(sys.argv[1:]):
        if a == "--trials":
            trials = int(sys.argv[1:][i + 1])
            args.remove(sys.argv[1:][i + 1])
    sf_dir = args[0] if args and Path(args[0]).is_dir() else "/root/testdata/sf0.1"
    names = args[1:] if args and Path(args[0]).is_dir() else args
    if not names:
        sys.exit("usage: time_query.py [sf_dir] query [query ...] [--trials N]")

    import __spark_entry__ as e
    from greenbuttonengine_spark.session import get_spark

    spark = get_spark(app_name="time-query")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    # warm parquet footers once
    from greenbuttonengine_spark.sources.catalog import TABLES, load_table

    for t in TABLES:
        load_table(spark, t, sf_dir).write.format("noop").mode("overwrite").save()

    for name in names:
        builds, execs = [], []
        for i in range(trials):
            spark.sparkContext.setJobDescription(f"{name} trial {i}")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            print(
                f"{name} trial {i}: build {t1 - t0:.2f}s exec {t2 - t1:.2f}s",
                flush=True,
            )
        wb = builds[1:] if len(builds) > 1 else builds
        we = execs[1:] if len(execs) > 1 else execs
        print(
            f"{name} WARM-MEDIAN: build {statistics.median(wb):.2f}s "
            f"exec {statistics.median(we):.2f}s "
            f"total {statistics.median([b + x for b, x in zip(wb, we)]):.2f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
