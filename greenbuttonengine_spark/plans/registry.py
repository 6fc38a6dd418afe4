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

Hard-won refinements (each found as a real oracle mismatch):

* The DECIMAL->DOUBLE cast is itself engine-dependent at high
  precision: DuckDB scales the int128 payload in floating point (two
  roundings) while Java BigDecimal rounds the true value once — up to
  1 ulp apart.  When inputs are quantized (cents, fixed grids), sum
  exact BIGINTs below 2^53 instead and do all later math in double:
  every step is then one correctly-rounded op on bit-identical inputs
  (anomaly_zscore_events, embedding_label_centroids).
* FLOAT->DECIMAL diverges too: DuckDB rounds the float's shortest
  decimal repr, Spark the exact binary expansion (~1e-9 apart).
  Widen float->double explicitly before any decimal cast.
* floor(log2(x)) at power-of-two boundaries is libm-dependent; use
  bit_length-1 / length(bin(x))-1 (corpus_length_histogram).
* Spark decimal multiplication silently reduces scale when the exact
  result exceeds precision 38; keep operand precision low enough that
  products fit exactly, or the engines keep different digits.
* Non-finite embeddings (r14 ADVICE 1+2, closed r15): the similarity
  module drops rows whose sum-of-squares folds non-finite
  (similarity._with_norm) — NaN/inf components AND overflow-magnitude
  components.  The oracles of the canonical retrievers
  (ann_bruteforce/ivf/lsh, eval_ann_recall, eval_retrieval_ndcg,
  search_hybrid_rrf) mirror it as
  ``WHERE isfinite(list_dot_product(v, v))`` on the SCORED sides only
  (seed selection stays raw, matching seeded_centroids).  The
  composite eval oracles (PQ/hier/RAG recall) keep zero-norm-only
  mirrors: their brute legs gate Spark-side identically on any finite
  corpus, and non-finite embeddings are out of those evals' contract.
* Modulo signedness: Spark-side seeded hashing uses F.pmod, but most
  oracles write plain DuckDB ``%`` (signed, sign-of-dividend).  The two
  agree only because every synthetic key (doc_id/user_id/event_id/
  vec_id) is NONNEGATIVE — that precondition is load-bearing.  For a
  key that may go negative, write the pmod-exact form
  ``((k % m) + m) % m`` (as pack_sequences_docs' oracle does).
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
