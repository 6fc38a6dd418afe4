"""Learned quality filtering with spark.ml — the fastText-classifier
stand-in of production curation pipelines (the CCNet / GPT-3 "quality
filter" stage): train a logistic regression on (weak) labels over
cheap per-doc features, then score the whole corpus JVM-side.

Why a LEARNED stage when `text_quality_score` / `text_gopher_flags`
exist: hand rules give a hard gate; the model turns the same signals
into a calibrated probability, which is what temperature sampling and
threshold sweeps actually consume.  The features deliberately mirror
the heuristic gate (length, token stats, alpha/punct ratios, bigram
repetition) so the model's marginal value is the learned WEIGHTING —
the role the fastText filter plays over hand rules in public
pipelines.

Scale shape:

* Feature extraction is scan-stage Catalyst (reuses the textstats
  column expressions) — no shuffle, no Python.
* Training runs spark.ml's distributed LBFGS over the labeled set —
  at 100 TB the labeled/weakly-labeled sample is corpus-tiny (e.g.
  0.1%), so fitting is cheap; the model object is a handful of
  coefficients on the driver.
* Scoring is a Transformer pass: features + a broadcast coefficient
  dot product per row.  One projection, fully JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FEATURE_COLS = [
    "n_chars_f",
    "n_tokens_f",
    "mean_token_len",
    "alpha_ratio",
    "punct_ratio",
    "dup_bigram_frac",
]


def quality_feature_cols(text: Column) -> dict[str, Column]:
    """Per-doc numeric features as scan-stage expressions.  All ratios
    are guarded for empty/1-word docs (ANSI mode throws on 0/0)."""
    from .textstats import word_bigrams

    n_chars = F.length(text)
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    n_tokens = F.size(F.filter(toks, lambda w: w != ""))
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    bg = word_bigrams(text)
    return {
        "n_chars_f": n_chars.cast("double"),
        "n_tokens_f": n_tokens.cast("double"),
        "mean_token_len": F.when(
            n_tokens > 0, n_chars.cast("double") / n_tokens.cast("double")
        ).otherwise(F.lit(0.0)),
        "alpha_ratio": F.when(
            n_chars > 0, n_alpha.cast("double") / n_chars.cast("double")
        ).otherwise(F.lit(0.0)),
        "punct_ratio": F.when(
            n_chars > 0, n_punct.cast("double") / n_chars.cast("double")
        ).otherwise(F.lit(0.0)),
        "dup_bigram_frac": F.when(
            F.size(bg) > 0,
            F.lit(1.0)
            - F.size(F.array_distinct(bg)).cast("double")
            / F.size(bg).cast("double"),
        ).otherwise(F.lit(0.0)),
    }


def quality_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    cols = quality_feature_cols(F.col(text_col))
    return docs.select(F.col(id_col), *[c.alias(n) for n, c in cols.items()])


def train_quality_model(
    labeled_docs: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Fit assembler + logistic regression on labeled docs; returns a
    PipelineModel whose transform() adds probability/prediction."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feats = quality_features(labeled_docs, text_col, id_col).join(
        labeled_docs.select(F.col(id_col), F.col(label_col)), id_col
    )
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=FEATURE_COLS, outputCol="features"),
            LogisticRegression(
                featuresCol="features",
                labelCol=label_col,
                maxIter=50,
                regParam=0.01,
                standardization=True,
            ),
        ]
    )
    return pipe.fit(feats)


def score_quality(
    model, docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, quality_prob, quality_keep): P(label=1) per doc via the
    fitted pipeline — one scan-stage feature projection + a broadcast
    coefficient dot product, fully JVM-side."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(quality_features(docs, text_col, id_col))
    return scored.select(
        F.col(id_col),
        vector_to_array(F.col("probability"))[1].alias("quality_prob"),
        (F.col("prediction") == 1.0).alias("quality_keep"),
    )


def weakly_supervised_quality(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The self-supervised composition the curation loop runs: weak
    labels from the Gopher rule gate -> learned calibrated scorer ->
    every doc scored.  Output: (id, weak_label, quality_prob,
    quality_keep)."""
    from .textstats import gopher_flags

    weak = gopher_flags(docs, text_col, id_col).select(
        F.col(id_col), F.col("keep").cast("int").alias("label")
    )
    labeled = docs.join(weak, id_col)
    model = train_quality_model(labeled, "label", text_col, id_col)
    return (
        score_quality(model, docs, text_col, id_col)
        .join(weak.withColumnRenamed("label", "weak_label"), id_col)
        .select(id_col, "weak_label", "quality_prob", "quality_keep")
    )
