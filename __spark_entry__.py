"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full declared inventory (SURVEY.md §2 +
extension operators) for the DuckDB correctness gate.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def _registry():
    # Importing the query modules populates the registry. Import order IS
    # gate order (a budgeted correctness gate checks a prefix): reference
    # §2 operators first, then the LLM-pipeline extensions, then the
    # generic complex-type and TPC-H batches.
    from greenbuttonengine_spark.plans import registry
    from greenbuttonengine_spark.plans import core_queries  # noqa: F401
    from greenbuttonengine_spark.plans import relational_queries  # noqa: F401
    from greenbuttonengine_spark.plans import advanced_queries  # noqa: F401

    try:
        from greenbuttonengine_spark.plans import extension_queries  # noqa: F401
    except ImportError:
        pass
    from greenbuttonengine_spark.plans import complex_queries  # noqa: F401
    from greenbuttonengine_spark.plans import tpch_queries  # noqa: F401

    return registry


# Rows-only entries (no oracle -> weaker check) run after every
# oracle-backed query, so a time-budgeted gate spends its window on the
# hard signal first; the slow ESPI ingest runs dead last.
_LAST = ("espi_egd_timeseries",)


def _ordered_names(reg) -> list[str]:
    names = [n for n in reg.QUERIES if n not in _LAST]
    oracle_backed = [n for n in names if n in reg.ORACLES]
    rows_only = [n for n in names if n not in reg.ORACLES]
    return oracle_backed + rows_only + [n for n in _LAST if n in reg.QUERIES]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    reg = _registry()
    return reg.QUERIES["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    reg = _registry()
    return {name: reg.QUERIES[name].fn for name in _ordered_names(reg)}


def oracle_sql() -> dict[str, str]:
    reg = _registry()
    return {n: reg.ORACLES[n] for n in _ordered_names(reg) if n in reg.ORACLES}
