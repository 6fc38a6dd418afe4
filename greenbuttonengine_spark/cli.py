"""gbcli — batch Green Button conversion, matching the reference CLI
(cli-frontend/src/main.rs:15-57):

    python -m greenbuttonengine_spark.cli --filetype={csv|influxdb|parquet}
        [--out=FILE | --out-dir=DIR] [--sort] PATH [PATH ...]

Reference semantics preserved: per-file error tolerance (failed files
logged to stderr, the rest convert; main.rs:31-38), stdout output when
no --out (csv/influxdb), all inputs UNION-ALLed into one result.
Differences, by design: ``--out-dir`` keeps the output distributed
(partitioned parquet is the 100 TB path); ``--sort`` applies the O1
(title, time) ordering since Spark has no file-order guarantee.
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys
import tempfile


def _single_file_from_dir(tmp_dir: str, pattern: str, out: str | None) -> None:
    parts = sorted(glob.glob(os.path.join(tmp_dir, pattern)))
    if out is None:
        for p in parts:
            with open(p) as fh:
                shutil.copyfileobj(fh, sys.stdout)
    else:
        with open(out, "wb") as dst:
            for p in parts:
                with open(p, "rb") as src:
                    shutil.copyfileobj(src, dst)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="gbcli", description=__doc__)
    ap.add_argument("--filetype", required=True, choices=["csv", "influxdb", "parquet"])
    ap.add_argument("--out", help="single output file (collected to the driver)")
    ap.add_argument("--out-dir", help="distributed output directory (scale path)")
    ap.add_argument("--sort", action="store_true", help="order by (title, time)")
    ap.add_argument(
        "--partition-by-title", action="store_true", help="parquet only: one dir per series"
    )
    ap.add_argument("paths", nargs="+")
    args = ap.parse_args(argv)

    from .session import get_spark
    from .espi import timeseries_from_files
    from .sinks import write_csv, write_influx_lines, write_parquet

    spark = get_spark(app_name="gbcli")
    ts, errors = timeseries_from_files(spark, args.paths)

    for row in errors.collect():  # per-file tolerance: log and continue
        print(f"error: {row['source_file']}: {row['error']}", file=sys.stderr)

    if args.sort:
        ts = ts.orderBy("title", "time_period_start_unix")

    if args.out_dir:
        if args.filetype == "csv":
            write_csv(ts, args.out_dir, single_file=False)
        elif args.filetype == "parquet":
            write_parquet(
                ts, args.out_dir, partition_by_title=args.partition_by_title
            )
        else:
            write_influx_lines(ts, args.out_dir, single_file=False)
        return 0

    tmp = tempfile.mkdtemp(prefix="gbcli_")
    try:
        if args.filetype == "csv":
            write_csv(ts, tmp, single_file=True)
            _single_file_from_dir(tmp, "part-*.csv", args.out)
        elif args.filetype == "parquet":
            if args.out is None:
                print("error: parquet output requires --out or --out-dir", file=sys.stderr)
                return 2
            write_parquet(ts, tmp, single_file=True)
            shutil.copyfile(glob.glob(os.path.join(tmp, "part-*.parquet"))[0], args.out)
        else:
            write_influx_lines(ts, tmp, single_file=True)
            _single_file_from_dir(tmp, "part-*.txt", args.out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
