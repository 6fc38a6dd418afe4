"""Round-11 extension wave (sixth batch): held-out LM evaluation —
unigram surprisal of validation-split documents under a model
estimated ONLY from the train split.

``text_unigram_surprisal`` scores every doc against corpus-wide counts
(fine for outlier detection, but self-contaminated as an eval: a doc's
own tokens inflate its own counts).  The held-out form is the number a
mix change is actually judged by: score val docs under train-split
counts, OOV tokens floored at count 1.  Composes two already-verified
primitives (the LCG split assigner and the integer-bits surprisal
family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register


def _heldout_oracle_sql() -> str:
    from ..extensions.sampling import split_case_oracle_sql

    return rf"""
    WITH s AS (
        SELECT doc_id, text,
               {split_case_oracle_sql(indent=15)}
        FROM documents
    ),
    w AS (
        SELECT doc_id, split,
               unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        FROM s
    ),
    cf AS (
        SELECT w, COUNT(*) AS cf FROM w
        WHERE split = 'train' AND w <> '' GROUP BY w
    ),
    n AS (SELECT SUM(cf) AS n_train FROM cf)
    SELECT v.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN cf.cf IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
           CAST(SUM((length(bin(n.n_train)) - 1)
                    - (length(bin(coalesce(cf.cf, 1))) - 1)) AS BIGINT)
               AS sum_surprisal_bits,
           CAST(SUM((length(bin(n.n_train)) - 1)
                    - (length(bin(coalesce(cf.cf, 1))) - 1)) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS mean_surprisal_bits
    FROM w v
    LEFT JOIN cf ON cf.w = v.w
    CROSS JOIN n
    WHERE v.split = 'val' AND v.w <> ''
    GROUP BY v.doc_id
    """


@register(
    "lm_heldout_surprisal",
    _heldout_oracle_sql(),
    tags=("textstats", "lm", "eval", "tiny-bnlj"),
    doc="Held-out unigram surprisal: validation-split docs scored "
    "under counts estimated ONLY from the train split (LCG doc-level "
    "split — the same assignment sample_train_val_test declares), OOV "
    "tokens floored at count 1 so their surprisal is the full "
    "ilog2(N_train) bits.  This is the decontaminated form of "
    "text_unigram_surprisal — the eval a data-mix change is actually "
    "judged by, where scoring docs against counts that include "
    "themselves would reward duplication.  Integer bit-length "
    "surprisal (fp log2 is not cross-engine-stable), exact per-doc "
    "sums, one final division.  Scale shape: one train-vocab shuffle "
    "+ one val-token join-back (AQE skew guard on Zipf hot keys); the "
    "train total is a one-row broadcast (tiny-bnlj); both splits come "
    "from scan-stage CASEs, no extra pass over the corpus.",
)
def lm_heldout_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.sampling import assign_splits

    docs = assign_splits(load_table(spark, "documents", sf_dir), "doc_id")
    ilog2 = lambda c: (F.length(F.bin(c)) - F.lit(1)).cast("long")  # noqa: E731
    w = docs.select(
        "doc_id",
        "split",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")
    cf = (
        w.filter(F.col("split") == "train")
        .groupBy("w")
        .agg(F.count("*").alias("cf"))
    )
    n = cf.agg(F.sum("cf").alias("n_train"))
    val = w.filter(F.col("split") == "val")
    joined = val.join(cf, "w", "left").crossJoin(F.broadcast(n))
    bits = ilog2(F.col("n_train")) - ilog2(F.coalesce(F.col("cf"), F.lit(1)))
    return joined.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("cf").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
        F.sum(bits).cast("long").alias("sum_surprisal_bits"),
        (F.sum(bits).cast("double") / F.count("*").cast("double")).alias(
            "mean_surprisal_bits"
        ),
    )
