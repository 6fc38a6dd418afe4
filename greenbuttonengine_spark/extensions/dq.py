"""Single-scan data-quality expectations (the Deequ / dbt-test shape).

A 100 TB table cannot afford one scan per check, so the whole
expectation suite compiles into ONE aggregate pass: every check is a
conditional count (or a distinct-count) inside a single ``agg``, and
the scalar result row is unpivoted into the per-check report with
``stack`` — O(checks) output rows, one shuffle-free partial+final
aggregate over the table regardless of suite size.  Checks are pure
integer counts, so the report is cross-engine exact.

Check vocabulary (the core of what Deequ's VerificationSuite runs):

  not_null(col)            observed = # NULL rows, passes when 0
  unique(col)              observed = # rows - # distinct, passes when 0
  in_range(col, lo, hi)    observed = # rows outside [lo, hi]
  in_set(col, values)      observed = # rows outside the allowed set
  min_rows(n)              observed = # rows, passes when >= n
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple[str, Column, str]:
    return (
        f"not_null({col})",
        # coalesce: on an EMPTY table sum aggregates to NULL, which
        # would report observed=NULL / passed=NULL — and a NULL
        # 'passed' slips through boolean failure filters silently
        F.coalesce(F.sum(F.col(col).isNull().cast("long")), F.lit(0)),
        "eq0",
    )


def unique(col: str) -> tuple[str, Column, str]:
    return (
        f"unique({col})",
        F.count(col) - F.countDistinct(col),
        "eq0",
    )


def in_range(col: str, lo, hi) -> tuple[str, Column, str]:
    return (
        f"in_range({col})",
        F.coalesce(F.sum(
            (~F.col(col).between(F.lit(lo), F.lit(hi)) | F.col(col).isNull()).cast(
                "long"
            )
        ), F.lit(0)),
        "eq0",
    )


def in_set(col: str, values: tuple) -> tuple[str, Column, str]:
    return (
        f"in_set({col})",
        F.coalesce(
            F.sum((~F.col(col).isin(*values) | F.col(col).isNull()).cast("long")),
            F.lit(0),
        ),
        "eq0",
    )


def min_rows(n: int) -> tuple[str, Column, str]:
    return (f"min_rows({n})", F.count(F.lit(1)), f"ge{n}")


def check_report(df: DataFrame, checks) -> DataFrame:
    """Run the expectation suite in one aggregate pass.

    Returns (check string, observed bigint, passed boolean), one row
    per check.  ``observed`` is the violation count for eq0-style
    checks and the row count for min_rows, so a failing report is
    directly actionable (how many rows violate, not just a boolean).
    """
    names, aggs, rules = zip(*checks)
    row = df.agg(
        *[a.cast("long").alias(f"__m{i}") for i, a in enumerate(aggs)]
    )
    # unpivot the scalar row: stack(n, name0, m0, rule0, ...) — O(checks)
    pairs = []
    for i, (name, rule) in enumerate(zip(names, rules)):
        pairs += [F.lit(name), F.col(f"__m{i}"), F.lit(rule)]
    out = row.select(
        F.stack(F.lit(len(names)), *pairs).alias("check", "observed", "__rule")
    )
    passed = F.when(
        F.col("__rule") == "eq0", F.col("observed") == 0
    ).otherwise(
        F.col("observed")
        >= F.regexp_extract("__rule", r"ge(\d+)", 1).cast("long")
    )
    return out.select(
        "check", F.col("observed").cast("long").alias("observed"), passed.alias("passed")
    )
