"""Round-9 extension wave (fifth batch): evaluation and ops
analytics — the pairwise model win-rate matrix (arena-style eval
aggregation) and a partition-skew report with a salting
recommendation (the diagnosis that precedes a5_salted_skew_aggregate's
cure).

Same cross-engine rules as wave9_queries.py: seeded md5-60 hashes,
exact BIGINT arithmetic, fractions as one final IEEE division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register

# ---------------------------------------------------------------------------
# Pairwise model win-rate matrix (arena eval aggregation)
# ---------------------------------------------------------------------------

_N_MODELS = 4


@register(
    "eval_pairwise_winrate",
    f"""
    WITH cand AS (
        SELECT coalesce(source, '') AS source_key,
               coalesce(lang, '') AS lang_key,
               CAST(concat('0x', substr(md5(concat('mdl:',
                   CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)
                   % {_N_MODELS} AS model,
               CAST(concat('0x', substr(md5(concat('rw:',
                   CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)
                   % 1000000 AS reward,
               doc_id
        FROM documents
    ), best AS (
        SELECT source_key, lang_key, model,
               MAX(reward) AS best_reward
        FROM cand GROUP BY 1, 2, 3
    ), duel AS (
        SELECT a.model AS model_a, b.model AS model_b,
               CASE WHEN a.best_reward > b.best_reward THEN 1 ELSE 0 END
                   AS win_a,
               CASE WHEN a.best_reward = b.best_reward THEN 1 ELSE 0 END
                   AS tie
        FROM best a JOIN best b
          ON a.source_key = b.source_key AND a.lang_key = b.lang_key
             AND a.model < b.model
    )
    SELECT CAST(model_a AS BIGINT) AS model_a,
           CAST(model_b AS BIGINT) AS model_b,
           CAST(COUNT(*) AS BIGINT) AS n_battles,
           CAST(SUM(win_a) AS BIGINT) AS wins_a,
           CAST(SUM(tie) AS BIGINT) AS ties,
           CAST(SUM(win_a) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS winrate_a
    FROM duel GROUP BY 1, 2
    """,
    tags=("eval", "preference"),
    doc="Pairwise model win-rate matrix — the arena/eval aggregation "
    "run over every head-to-head eval harness: candidates carry a "
    "model id and a reward (seeded md5-60 stand-ins for 'which model "
    "produced this completion' and its judge score; real columns drop "
    "in unchanged), each model is represented per prompt pool by its "
    "best reward (plain MAX — only the value is compared downstream, "
    "so ties need no break), and every pool holding both models of "
    "a pair contributes one battle.  Output: n_battles / wins / ties "
    "/ win-rate per ordered pair — the input to Elo or Bradley-Terry "
    "fits.  Plan: one map-side-combined aggregate to per-(pool, "
    "model) champions (shrinks the corpus to O(pools*models)), then "
    "a pool-key self-join of that SMALL aggregate and a 6-row "
    "rollup; the corpus is never self-joined.  Pools scale to "
    "millions at 100 TB, all stages keyed by pool hash.",
)
def eval_pairwise_winrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    sid = F.col("doc_id").cast("string")
    h = lambda tag: F.conv(  # noqa: E731
        F.substring(F.md5(F.concat(F.lit(tag), sid)), 1, 15), 16, 10
    ).cast("long")
    cand = docs.select(
        F.coalesce("source", F.lit("")).alias("source_key"),
        F.coalesce("lang", F.lit("")).alias("lang_key"),
        (h("mdl:") % _N_MODELS).alias("model"),
        (h("rw:") % 1000000).alias("reward"),
        "doc_id",
    )
    best = cand.groupBy("source_key", "lang_key", "model").agg(
        F.max("reward").alias("best_reward")
    )
    a = best.select(
        "source_key", "lang_key",
        F.col("model").alias("model_a"),
        F.col("best_reward").alias("ra"),
    )
    b = best.select(
        "source_key", "lang_key",
        F.col("model").alias("model_b"),
        F.col("best_reward").alias("rb"),
    )
    duel = a.join(b, ["source_key", "lang_key"]).filter(
        F.col("model_a") < F.col("model_b")
    )
    return duel.groupBy(
        F.col("model_a").cast("long").alias("model_a"),
        F.col("model_b").cast("long").alias("model_b"),
    ).agg(
        F.count("*").cast("long").alias("n_battles"),
        F.sum((F.col("ra") > F.col("rb")).cast("long")).cast("long").alias("wins_a"),
        F.sum((F.col("ra") == F.col("rb")).cast("long")).cast("long").alias("ties"),
        (
            F.sum((F.col("ra") > F.col("rb")).cast("long")).cast("double")
            / F.count("*").cast("double")
        ).alias("winrate_a"),
    )


# ---------------------------------------------------------------------------
# Partition-skew report + salting recommendation
# ---------------------------------------------------------------------------


@register(
    "ops_partition_skew_report",
    """
    WITH per_key AS (
        SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
    ), ranked AS (
        SELECT n, CAST(ROW_NUMBER() OVER (ORDER BY n, user_id) AS BIGINT)
                   AS rn,
               CAST(COUNT(*) OVER () AS BIGINT) AS nk
        FROM per_key
    ), quant AS (
        SELECT MAX(CASE WHEN rn = (nk + 1) // 2 THEN n END) AS p50,
               MAX(CASE WHEN rn = (nk * 9 + 9) // 10 THEN n END) AS p90,
               MAX(CASE WHEN rn = (nk * 99 + 99) // 100 THEN n END) AS p99
        FROM ranked
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(n) AS BIGINT) AS total_rows,
           CAST(MIN(n) AS BIGINT) AS min_rows,
           CAST(MAX(n) AS BIGINT) AS max_rows,
           CAST(q.p50 AS BIGINT) AS p50_rows,
           CAST(q.p90 AS BIGINT) AS p90_rows,
           CAST(q.p99 AS BIGINT) AS p99_rows,
           CAST(MAX(n) * 100 // GREATEST(q.p50, 1) AS BIGINT)
               AS skew_x100,
           CAST((MAX(n) + GREATEST(q.p50, 1) - 1) // GREATEST(q.p50, 1)
               AS BIGINT) AS recommended_salt
    FROM per_key CROSS JOIN quant q
    GROUP BY q.p50, q.p90, q.p99
    """,
    tags=("ops", "tiny-global-window", "tiny-bnlj"),
    doc="Partition-skew report with a salting recommendation — the "
    "diagnosis that precedes a5_salted_skew_aggregate's cure and the "
    "number AQE's skew-join threshold is tuned against: per-key row "
    "counts (one map-side-combined aggregate over the corpus), then "
    "EXACT order-statistic quantiles (nearest-rank p50/p90/p99 via "
    "row_number over the O(keys) aggregate — percentile_approx is "
    "engine-dependent, rank arithmetic is not), max/median skew "
    "ratio x100, and recommended_salt = ceil(max/p50) — the salt "
    "fan-out that levels the hottest key to a median-sized partition. "
    " The only partition-less window runs over per-KEY counts "
    "(tiny-global-window: key cardinality, orders below corpus size; "
    "at trillions of keys swap in the o1 bucket-offset rank).  All "
    "arithmetic BIGINT; the one report row is exact.",
)
def ops_partition_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    per_key = events.groupBy("user_id").agg(F.count("*").alias("n"))
    wr = W.orderBy("n", "user_id")
    ranked = per_key.select(
        "n",
        F.row_number().over(wr).cast("long").alias("rn"),
        F.count("*").over(W.partitionBy()).cast("long").alias("nk"),
    )
    quant = ranked.agg(
        F.max(F.when(F.col("rn") == F.expr("(nk + 1) div 2"), F.col("n"))).alias(
            "p50"
        ),
        F.max(
            F.when(F.col("rn") == F.expr("(nk * 9 + 9) div 10"), F.col("n"))
        ).alias("p90"),
        F.max(
            F.when(F.col("rn") == F.expr("(nk * 99 + 99) div 100"), F.col("n"))
        ).alias("p99"),
    )
    return per_key.crossJoin(F.broadcast(quant)).groupBy(
        "p50", "p90", "p99"
    ).agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum("n").cast("long").alias("total_rows"),
        F.min("n").cast("long").alias("min_rows"),
        F.max("n").cast("long").alias("max_rows"),
        F.expr("max(n) * 100 div greatest(first(p50), 1)")
        .cast("long")
        .alias("skew_x100"),
        F.expr(
            "(max(n) + greatest(first(p50), 1) - 1) div greatest(first(p50), 1)"
        )
        .cast("long")
        .alias("recommended_salt"),
    ).select(
        "n_keys",
        "total_rows",
        "min_rows",
        "max_rows",
        F.col("p50").cast("long").alias("p50_rows"),
        F.col("p90").cast("long").alias("p90_rows"),
        F.col("p99").cast("long").alias("p99_rows"),
        "skew_x100",
        "recommended_salt",
    )
