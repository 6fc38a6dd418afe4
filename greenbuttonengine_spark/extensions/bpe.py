"""BPE tokenizer TRAINING (Sennrich et al., ACL'16) — the full merge
loop, Spark-first.

``lm_bpe_pair_counts`` exposes one counting round; this module runs
the whole training: repeatedly find the most frequent adjacent symbol
pair and merge it corpus-wide.  The Sennrich trick makes this cheap
at any corpus size: training operates on the DISTINCT-WORD vocabulary
weighted by word frequency (vocab size grows ~sub-linearly with the
corpus, and the 100 TB corpus collapses to one word-count aggregate
before the loop starts), so each merge round is:

1. one pair-count aggregate over the vocab (map-side combined,
   weighted by word count) + a TakeOrdered top-1 — the only action;
2. one lookaround-regex replace over the vocab's padded symbol
   strings (``(?<= )a b(?= )`` -> ``ab``) — boundary spaces stay
   unconsumed, so Java's left-to-right non-overlapping matching
   reproduces greedy BPE on runs exactly (``a a a a`` ->
   ``(aa) (aa)``; a literal replace would eat the shared separator
   and skip every second pair).

The driver loop is control flow only (n_merges rounds, one scalar
collect each); vocab lineage is truncated per round with
localCheckpoint, the same iterative-operator posture as
``dedup.duplicate_clusters``.  Ties break (count DESC, pair ASC) —
deterministic across partitionings and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) distinct-word frequencies — the training input."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.trim(text_col)), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("n"))
    )


def _to_symbols(word_col):
    """' h e l l o ' — char symbols joined and padded with single
    spaces so literal pair replacement is anchor-safe."""
    return F.concat(
        F.lit(" "),
        F.concat_ws(" ", F.split(word_col, "")),
        F.lit(" "),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges; returns (merges, final_vocab).

    merges: [(left_symbol, right_symbol, weighted_count), ...] in
    learned order.  final_vocab: (word, n, syms) with the trained
    segmentation (syms = padded symbol string).  Stops early when no
    pair reaches ``min_pair_count``.
    """
    vocab = (
        word_vocab(docs, text_col)
        .withColumn("syms", _to_symbols(F.col("word")))
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        syms_arr = F.split(F.trim(F.col("syms")), " ")
        pairs = (
            vocab.withColumn("__arr", syms_arr)
            .filter(F.size("__arr") >= 2)
            .select(
                F.col("n"),
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(__arr) - 1),"
                        " i -> struct(element_at(__arr, i) as a,"
                        "             element_at(__arr, i + 1) as b))"
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("n").cast("long").alias("cnt"))
        )
        top = (
            pairs.orderBy(F.desc("cnt"), "a", "b").limit(1).collect()
        )
        if not top or top[0].cnt < min_pair_count:
            break
        a, b, cnt = top[0].a, top[0].b, int(top[0].cnt)
        merges.append((a, b, cnt))
        # lookarounds keep the boundary spaces UNconsumed so back-to-
        # back occurrences (' a a a a ') merge in one pass exactly like
        # greedy BPE — a literal ' a b '->' ab ' replace would eat the
        # shared separator and skip every second pair in a run.
        # \Q..\E quotes symbols that contain regex metacharacters.
        pat = f"(?<= )\\Q{a} {b}\\E(?= )"
        # Java replacement strings treat \ and $ as group references
        repl = (a + b).replace("\\", "\\\\").replace("$", "\\$")
        vocab = vocab.withColumn(
            "syms", F.regexp_replace(F.col("syms"), pat, repl)
        ).localCheckpoint(eager=False)
    return merges, vocab.select("word", "n", "syms")


def bpe_merge_table(docs: DataFrame, n_merges: int = 10,
                    text_col: str = "text") -> DataFrame:
    """The learned merge sequence as a DataFrame: (step, left, right,
    merged, weighted_count) — the artifact a tokenizer ships."""
    merges, _ = bpe_train(docs, n_merges, text_col)
    spark = docs.sparkSession
    rows = [
        (i + 1, a, b, a + b, c) for i, (a, b, c) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "step int, left string, right string, merged string, "
              "weighted_count long",
    )


def bpe_tokenize(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge sequence: (id, tokens array<string>,
    n_tokens) per document — the inference half of BPE.

    The merge rules compile into a fixed chain of per-word
    regexp_replace expressions inside one ``transform`` lambda (the
    same lookaround/greedy semantics training used), so tokenization
    is a single scan-stage projection: no shuffle, no Python, no
    per-row interpretation — the rule program IS the Catalyst
    expression tree, exactly how a trained tokenizer should ship to a
    100 TB corpus.  Word boundaries are preserved (BPE merges never
    cross words, matching training's per-word vocabulary).
    """
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")

    def merge_word(w):
        s = F.concat(F.lit(" "), F.concat_ws(" ", F.split(w, "")), F.lit(" "))
        for m in merges:
            a, b = m[0], m[1]
            pat = f"(?<= )\\Q{a} {b}\\E(?= )"
            repl = (a + b).replace("\\", "\\\\").replace("$", "\\$")
            s = F.regexp_replace(s, pat, repl)
        return F.split(F.trim(s), " ")

    toks = F.flatten(
        F.transform(F.filter(words, lambda w: w != ""), merge_word)
    )
    return docs.select(
        F.col(id_col),
        toks.alias("tokens"),
        F.size(toks).cast("long").alias("n_tokens"),
    )
