"""Train/eval decontamination: flag training documents that share
word n-grams with a held-out evaluation set.

The canonical pretraining hygiene step (reference analog: the engine's
dedup surface, generalized to cross-corpus overlap): any training
document that contains a long-enough n-gram from an eval benchmark is
suspect — keeping it inflates eval scores.  The industry-standard rule
is "drop a training doc if it shares any N-gram (N≈8..13 words) with
the eval set"; smaller corpora use smaller N.

Scale shape (the part that must survive 100 TB):

* The eval side is SMALL by construction (benchmarks are a few MB) —
  its distinct n-gram set is built once and **broadcast**, so the
  train side never shuffles: tokenize -> n-gram -> explode is
  scan-stage, the join is a broadcast hash join, and the per-doc
  overlap count is a partial-aggregated groupBy on doc_id (the same
  key the explode preserved, so AQE coalesces it cheaply).
* n-grams join on their **xxhash64**, not the string — 8 bytes per
  key in the broadcast table instead of the raw n-gram text.  (The
  oracle joins on the string; the hash is injective enough at eval-set
  sizes that both give identical results — collisions would only
  ever ADD a flagged doc, and a 64-bit collision inside a few-MB eval
  set has probability ~1e-10.)
* Everything is native Catalyst (split/transform/explode/join/agg):
  no Python, no UDF, whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_ngrams(text: Column, n: int) -> Column:
    """Distinct word n-grams of ``text`` as an array<string>.

    Tokenization is whitespace-split (matching the corpus' generator
    and the DuckDB oracle's string_split); the n-gram is the
    space-joined window so it round-trips to exactly the source slice.
    """
    # Drop empty tokens rather than trim(): trim strips only ASCII
    # spaces in both engines, so "\n"-padded text would otherwise
    # yield empty words and junk grams like " " (found by hypothesis).
    words = F.filter(F.split(text, r"\s+"), lambda w: w != F.lit(""))
    # Zip the word array against its own n-1 shifted tails, then concat
    # each strip — O(len) work per row.  The obvious alternative
    # (transform over sequence(1, len-n+1) with slice(words, i, n) +
    # array_join per element) is O(len) PER ELEMENT inside an
    # interpreted higher-order lambda: measured 2.5s vs 0.6s warm on
    # 5k docs for identical output.  Trailing zip entries (where the
    # shifted tails ran out) have a NULL last word and are filtered.
    big = 1 << 30
    z = F.arrays_zip(*[F.slice(words, k + 1, big).alias(f"w{k}") for k in range(n)])
    return F.array_distinct(
        F.filter(
            F.transform(
                z,
                lambda s: F.when(
                    s[f"w{n-1}"].isNotNull(),
                    F.concat_ws(" ", *[s[f"w{k}"] for k in range(n)]),
                ),
            ),
            lambda x: x.isNotNull(),
        )
    )


def flag_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-training-doc contamination report against ``eval_df``.

    Returns one row per train doc that shares >=1 word n-gram with the
    eval set: (id_col, n_shared_ngrams, n_ngrams, share) where
    ``share`` = fraction of the doc's distinct n-grams found in the
    eval set.  Docs with zero overlap are absent (anti-join them back
    for the clean list); callers drop or down-weight by ``share``.

    ``broadcast_eval=False`` switches the membership probe to a
    shuffle hash join on the gram hash — the corpus-vs-corpus
    configuration (e.g. overlap between two crawls), where the right
    side no longer fits a broadcast.  Results are identical; the
    cost adds one shuffle of the exploded gram stream, and AQE's
    skew splitting covers hot grams.
    """
    eval_grams = (
        eval_df.select(F.explode(word_ngrams(F.col(text_col), n)).alias("__g"))
        .select(F.xxhash64("__g").alias("__gh"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    # One explode per train doc; the per-doc gram count is recovered from
    # the exploded stream itself (grams are already distinct per doc), NOT
    # via a second size(word_ngrams(...)) projection — CollapseProject
    # would inline that array expression into the post-explode plan and
    # recompute the whole array once per exploded row (O(grams^2) per
    # doc; measured 16s vs 0.7s on 500 docs).
    train_grams = train.select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), n)).alias("__g")
    ).select(F.col(id_col), F.xxhash64("__g").alias("__gh"))
    probe = F.broadcast(eval_grams) if broadcast_eval else eval_grams
    hits = train_grams.join(probe, "__gh", "left")
    return (
        hits.groupBy(id_col)
        .agg(
            F.count("*").alias("n_ngrams"),
            F.count("__hit").alias("n_shared_ngrams"),
        )
        .filter(F.col("n_shared_ngrams") > 0)
        .select(
            F.col(id_col),
            F.col("n_shared_ngrams").cast("bigint"),
            F.col("n_ngrams").cast("bigint"),
            (F.col("n_shared_ngrams") / F.col("n_ngrams")).alias("share"),
        )
    )


def contamination_spans(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 3,
    min_grams: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Contiguous contaminated spans per training doc: maximal runs of
    consecutive word positions whose ``n``-grams all appear in the eval
    set, reported as (doc, span_start, span_grams, span_words).

    :func:`flag_contamination` answers "how much of this doc overlaps
    the eval set"; this answers "WHERE, and in how long a block" — the
    distinction the published decontamination protocols draw (PaLM /
    GPT-3 drop docs on long verbatim collisions, not scattered n-gram
    hits, precisely because isolated hits are chance at web scale
    while a 13-gram run is quotation).  ``span_words`` =
    ``span_grams + n - 1`` is the verbatim-shared word count.

    Shape: positional (non-distinct) n-grams via one zip/posexplode
    pass, membership probe against the broadcast eval gram-hash set,
    then the gaps-and-islands trick — ``pos - row_number()`` is
    constant exactly on consecutive-position runs — with a window
    partitioned BY DOC (never global).  The train side never shuffles
    before the per-doc window, and only hit positions (two longs) ride
    it, never text.
    """
    big = 1 << 30
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit(""))
    z = F.arrays_zip(
        *[F.slice(words, k + 1, big).alias(f"w{k}") for k in range(n)]
    )
    tr = (
        train.select(F.col(id_col), F.posexplode(z).alias("__pos", "__s"))
        .filter(F.col(f"__s.w{n-1}").isNotNull())
        .select(
            F.col(id_col),
            F.col("__pos"),
            F.xxhash64(
                F.concat_ws(" ", *[F.col(f"__s.w{k}") for k in range(n)])
            ).alias("__gh"),
        )
    )
    ev = (
        eval_df.select(F.explode(word_ngrams(F.col(text_col), n)).alias("__g"))
        .select(F.xxhash64("__g").alias("__gh"))
        .distinct()
    )
    hits = tr.join(F.broadcast(ev), "__gh").select(id_col, "__pos")
    from pyspark.sql import Window as W

    rn = F.row_number().over(W.partitionBy(id_col).orderBy("__pos"))
    runs = hits.withColumn("__grp", F.col("__pos") - rn)
    return (
        runs.groupBy(id_col, "__grp")
        .agg(
            (F.min("__pos") + 1).cast("long").alias("span_start"),
            F.count("*").cast("long").alias("span_grams"),
            (F.count("*") + (n - 1)).cast("long").alias("span_words"),
        )
        .filter(F.col("span_grams") >= min_grams)
        .select(id_col, "span_start", "span_grams", "span_words")
    )
