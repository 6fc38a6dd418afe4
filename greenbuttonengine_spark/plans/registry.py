"""Registry of declared queries and their DuckDB oracle SQL.

Every operator from SURVEY.md §2 is exposed here as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` built with the DataFrame
API, plus (where SQL-expressible) an equivalent ANSI-SQL string the
DuckDB oracle runs over the same parquet tables.

Cross-engine determinism rules (so the driver's value-hash matches):

* Sums/averages over DOUBLE columns are computed in DECIMAL in BOTH
  engines and cast back to DOUBLE at the end.  Decimal arithmetic is
  exact, so the result is independent of partitioning / accumulation
  order; plain fp sums are not.
* Every computed column is aliased to the same name on both sides.
* Ranking/limit queries carry explicit total-order keys (no ties).
* Integer-valued results are cast to BIGINT on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}
ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None, tags: tuple[str, ...] = (), doc: str = ""):
    """Decorator registering a query callable under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QuerySpec(name=name, fn=fn, sql=sql, tags=tags, doc=doc)
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco
