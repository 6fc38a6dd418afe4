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


# Above this size the parse itself dominates and the distributed path
# is competitive anyway; the fast path targets the reference CLI's
# single-small-export latency (main.rs:15-57 converts in milliseconds).
_FASTPATH_MAX_BYTES = 64 * 1024 * 1024


def _use_fastpath(args: argparse.Namespace) -> bool:
    if args.engine == "spark" or args.out_dir:
        return False
    single_file = len(args.paths) == 1 and os.path.isfile(args.paths[0])
    if args.engine == "local":
        if not single_file:
            raise SystemExit(
                "error: --engine=local handles exactly one input FILE "
                "(directories/globs/multi-file need the Spark engine)"
            )
        return True
    return single_file and os.path.getsize(args.paths[0]) <= _FASTPATH_MAX_BYTES


def _run_fastpath(args: argparse.Namespace) -> int:
    """Driver-side conversion: pure-Python parse + denormalize
    (espi/fastpath.py, value parity with the Spark pipeline is
    pytest-pinned) — no JVM, <200 ms for a small export."""
    from .espi import fastpath as fp

    path = args.paths[0]
    rows, errors = fp.convert_file(path)
    for err in errors:  # per-file tolerance: log and continue
        print(f"error: {path}: {err}", file=sys.stderr)

    if args.filetype == "parquet":
        if args.out is None:
            print("error: parquet output requires --out or --out-dir", file=sys.stderr)
            return 2
        fp.write_parquet_local(rows, args.out, sort=args.sort)
        return 0
    lines = (
        fp.csv_lines(rows, sort=args.sort)
        if args.filetype == "csv"
        else fp.influx_lines(rows, sort=args.sort)
    )
    text = "".join(line + "\n" for line in lines)
    if args.out is None:
        sys.stdout.write(text)
    else:
        with open(args.out, "w") as fh:
            fh.write(text)
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="gbcli", description=__doc__)
    ap.add_argument("--filetype", required=True, choices=["csv", "influxdb", "parquet"])
    ap.add_argument("--out", help="single output file (collected to the driver)")
    ap.add_argument("--out-dir", help="distributed output directory (scale path)")
    ap.add_argument("--sort", action="store_true", help="order by (title, time)")
    ap.add_argument(
        "--partition-by-title", action="store_true", help="parquet only: one dir per series"
    )
    ap.add_argument(
        "--engine",
        choices=["auto", "spark", "local"],
        default="auto",
        help="auto (default): single small file converts driver-side with no "
        "Spark job (reference-CLI latency); directories/globs/multi-file "
        "inputs use Spark.  'spark'/'local' force a path.",
    )
    ap.add_argument(
        "--multi-ltp",
        action="store_true",
        help="resolve LocalTimeParameters per usage point (href scope, "
        "file-global fallback) instead of the reference's one-LTP-per-"
        "file rule — for multi-utility exports with one tz per usage "
        "point.  Spark engine only (the driver-side fast path keeps "
        "strict reference parity).",
    )
    ap.add_argument("paths", nargs="+")
    args = ap.parse_args(argv)

    if args.multi_ltp and args.engine == "local":
        raise SystemExit(
            "error: --multi-ltp needs the Spark engine "
            "(--engine=local is the strict reference-parity path)"
        )
    if not args.multi_ltp and _use_fastpath(args):
        return _run_fastpath(args)

    from .session import get_spark
    from .espi import timeseries_from_files
    from .sinks import write_csv, write_influx_lines, write_parquet

    spark = get_spark(app_name="gbcli")
    ts, errors = timeseries_from_files(
        spark, args.paths, strict_single_ltp=not args.multi_ltp
    )

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
