"""Run any declared query by name from the command line.

    python tools/run_query.py <query> [sf_dir] [--limit N] [--out DIR]
                              [--explain] [--sql]
    python tools/run_query.py --list [tag-substring]

Shows the first N rows (default 20) as Spark's table rendering, or
writes the full result as parquet with --out.  --explain prints the
formatted physical plan instead of executing; --sql prints the DuckDB
oracle SQL (when the query has one).  --list enumerates the declared
inventory with tags and one-line docs, optionally filtered.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    args = sys.argv[1:]
    if not args:
        print(__doc__)
        return 2

    import __spark_entry__ as e
    from greenbuttonengine_spark.plans import registry

    e.queries()  # populate the registry

    if args[0] == "--list":
        needle = args[1].lower() if len(args) > 1 else ""
        for name, spec in registry.QUERIES.items():
            hay = f"{name} {' '.join(spec.tags)}".lower()
            if needle and needle not in hay:
                continue
            kind = "oracle" if spec.sql else "rows-only"
            tags = ",".join(spec.tags) or "-"
            print(f"{name:40s} [{kind:9s}] ({tags}) {spec.doc[:70]}")
        return 0

    name = args[0]
    if name not in registry.QUERIES:
        print(f"unknown query {name!r}; try --list", file=sys.stderr)
        return 2
    spec = registry.QUERIES[name]

    if "--sql" in args:
        if spec.sql is None:
            print(f"{name} is rows-only (no oracle SQL)", file=sys.stderr)
            return 1
        print(spec.sql.strip())
        return 0

    rest = [a for a in args[1:] if not a.startswith("--")]
    sf_dir = rest[0] if rest else "/root/testdata/sf0.01"
    limit = 20
    if "--limit" in args:
        limit = int(args[args.index("--limit") + 1])
    out = None
    if "--out" in args:
        out = args[args.index("--out") + 1]

    from greenbuttonengine_spark.session import get_spark

    spark = get_spark()
    df = spec.fn(spark, sf_dir)
    if "--explain" in args:
        df.explain("formatted")
        return 0
    if out:
        df.write.mode("overwrite").parquet(out)
        print(f"wrote {out}")
    else:
        df.show(limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
