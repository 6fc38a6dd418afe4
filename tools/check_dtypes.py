"""Dtype-parity sweep between Spark results and DuckDB oracle results.

The driver's correctness gate hashes SERIALIZED values, so a column pair
that is numerically equal but dtype-divergent (DuckDB ``SUM(CASE...)``
-> HUGEINT -> pandas float64 ``1175.0`` vs Spark BIGINT ``1175``) hash-
mismatches even though the local float-coercing gate passes.  r4 lost
``math1_functions`` and r5 lost ``q12_priority_shipping`` to exactly
this class.  This tool runs every oracle-backed query at a small sf and
reports any column whose pandas *serialization class* differs between
the two engines, so the divergence is fixed at the source (usually a
CAST in the oracle SQL).

Serialization classes: int (any integer dtype), float, bool, datetime,
str, decimal, bytes, list, other-object.  A divergence between classes
that serialize identically under ``str()`` would not hash-mismatch, but
none of those pairs occur in practice; everything reported here is a
real risk.

Usage: python tools/check_dtypes.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as _dt
import decimal
import os
import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _cls(series: pd.Series) -> str:
    dt = series.dtype
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "datetime"
    # object column: inspect the first non-null value
    nn = series.dropna()
    if nn.empty:
        return "empty-object"
    v = nn.iloc[0]
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, (int, np.integer)):
        return "int"
    if isinstance(v, (float, np.floating)):
        return "float"
    if isinstance(v, decimal.Decimal):
        return "decimal"
    if isinstance(v, str):
        return "str"
    if isinstance(v, (bytes, bytearray)):
        return "bytes"
    if isinstance(v, (_dt.datetime, _dt.date)):
        return "datetime"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "list"
    if isinstance(v, dict):
        return "map"
    return f"object:{type(v).__name__}"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()

    from greenbuttonengine_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(app_name="dtype-check", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_ok = n_div = n_err = 0
    diverged: list[str] = []
    for name in qs:
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            odf = con.sql(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            print(f"ERR  {name}: {type(ex).__name__}: {str(ex)[:200]}")
            n_err += 1
            continue
        msgs = []
        for c in sorted(set(sdf.columns) & set(odf.columns)):
            sc, oc = _cls(sdf[c]), _cls(odf[c])
            if sc == oc:
                continue
            # empty frames can't diverge under value hashing
            if "empty-object" in (sc, oc) and (sdf.empty or odf.empty):
                continue
            msgs.append(f"{c}: spark={sc} oracle={oc}")
        if msgs:
            n_div += 1
            diverged.append(name)
            print(f"DIVERGE {name}: " + "; ".join(msgs) + f" ({time.time()-t0:.1f}s)")
        else:
            n_ok += 1
            print(f"ok   {name} ({time.time()-t0:.1f}s)")
    print(f"\n{n_ok} ok, {n_div} diverged, {n_err} errors")
    if diverged:
        print("diverged:", " ".join(diverged))
    return 1 if (n_div or n_err) else 0


if __name__ == "__main__":
    raise SystemExit(main())
