"""Sequence packing: group documents into fixed token-budget bins —
the standard trainer-prep step (maximize tokens per training sequence,
minimize padding) before writing examples.

Global bin packing is inherently sequential, so the operator uses the
standard scale decomposition:

  1. docs are assigned to independent PACKING GROUPS by a deterministic
     key bucket (extensions.sampling.hash_bucket) — groups are the unit
     of parallelism, sized so one group's metadata fits one task;
  2. within a group, first-fit-decreasing runs in an
     ``applyInPandas`` task (classic FFD: <= 11/9·OPT + 1 bins) —
     Python is appropriate here: the loop is over one group's rows,
     Arrow-batched, and no built-in operator expresses it;
  3. bin ids are globally unique by construction
     ((group << 32) | local_bin) — no post-pass, no shuffle beyond the
     one groupBy.

Packing quality loses only at group boundaries (each group wastes at
most one partial bin per bin-size class), so efficiency approaches the
global FFD as groups grow.  Oversized docs (n_tokens > budget) are
emitted as single-doc bins flagged ``oversize`` — callers chunk or drop.

Determinism: bucket assignment is a pure key function and FFD sorts by
(n_tokens desc, id), so output is independent of partitioning — same
property as extensions.sampling.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .sampling import hash_bucket
from .textstats import token_count_cols

PACKED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("group", T.LongType()),
        T.StructField("bin_id", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("oversize", T.BooleanType()),
    ]
)


def pack_oracle_sql(budget: int = 512, n_groups: int = 8) -> str:
    r"""DuckDB oracle for ``pack_sequences`` over the documents table:
    first-fit-decreasing is a SEQUENTIAL FOLD over each group's
    (n_tokens desc, doc_id) order, and a recursive CTE replays a fold
    exactly — iteration r consumes each group's rank-r doc, carrying
    the open-bin remaining-capacity list as state and EMITTING that
    doc's assignment as the iteration row (the recursive CTE's result
    is the union of all iterations, so no assignment accumulator is
    needed).  All groups advance in lockstep; recursion depth = the
    largest group (~n_docs/n_groups).  hash_bucket is the same
    integer-LCG arithmetic both engines compute exactly."""
    return rf"""
    WITH RECURSIVE d AS MATERIALIZED (
        SELECT doc_id, n_tokens, grp,
               ROW_NUMBER() OVER (PARTITION BY grp
                                  ORDER BY n_tokens DESC, doc_id) AS r
        FROM (
            SELECT doc_id,
                   CAST(len(regexp_split_to_array(trim(text), '\s+'))
                        AS BIGINT) AS n_tokens,
                   (((((doc_id % 2147483648) + 2147483648) % 2147483648)
                     * 1103515245 + 12345) >> 16)
                       % {n_groups} AS grp
            FROM documents
        )
    ),
    st(grp, r, loads, doc_id, pos, n_tokens, oversize) AS (
        SELECT grp, CAST(0 AS BIGINT), CAST([] AS BIGINT[]),
               CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
               CAST(NULL AS BIGINT), CAST(NULL AS BOOLEAN)
        FROM (SELECT DISTINCT grp FROM d)
        UNION ALL
        SELECT st.grp, st.r + 1,
               CASE
                   WHEN d.n_tokens > {budget}
                       THEN list_append(st.loads, CAST(0 AS BIGINT))
                   WHEN fit.i IS NULL
                       THEN list_append(st.loads,
                                        CAST({budget} - d.n_tokens AS BIGINT))
                   ELSE [CASE WHEN gi = fit.i
                              THEN st.loads[gi] - d.n_tokens
                              ELSE st.loads[gi] END
                         for gi in generate_series(1, len(st.loads))]
               END,
               d.doc_id,
               CASE WHEN d.n_tokens > {budget} OR fit.i IS NULL
                    THEN len(st.loads)
                    ELSE fit.i - 1 END,
               d.n_tokens,
               d.n_tokens > {budget}
        FROM st
        JOIN d ON d.grp = st.grp AND d.r = st.r + 1
        LEFT JOIN LATERAL (
            SELECT CASE WHEN d.n_tokens > {budget} THEN NULL
                        ELSE nullif(list_position(
                            list_transform(st.loads,
                                           c -> c >= d.n_tokens), true), 0)
                   END AS i
        ) fit ON true
    )
    SELECT doc_id, CAST(grp AS BIGINT) AS "group",
           CAST(grp * 4294967296 + pos AS BIGINT) AS bin_id,
           n_tokens, oversize
    FROM st WHERE r >= 1
    """


def _pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
    budget = int(pdf["__budget"].iloc[0])
    group = int(pdf["group"].iloc[0])
    pdf = pdf.sort_values(["n_tokens", "doc_id"], ascending=[False, True])

    bins: list[int] = []  # remaining capacity per open bin
    out_bin: list[int] = []
    oversize: list[bool] = []
    for tok in pdf["n_tokens"]:
        tok = int(tok)
        if tok > budget:
            bins.append(0)  # oversized: its own (full) bin
            out_bin.append(len(bins) - 1)
            oversize.append(True)
            continue
        # first fit
        for i, cap in enumerate(bins):
            if cap >= tok:
                bins[i] = cap - tok
                out_bin.append(i)
                break
        else:
            bins.append(budget - tok)
            out_bin.append(len(bins) - 1)
        oversize.append(False)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].to_numpy(),
            "group": group,
            "bin_id": [(group << 32) | b for b in out_bin],
            "n_tokens": pdf["n_tokens"].to_numpy(),
            "oversize": oversize,
        }
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    n_groups: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_col: str | None = None,
) -> DataFrame:
    """(doc_id, group, bin_id, n_tokens, oversize): every doc assigned
    to exactly one bin; sum(n_tokens) per non-oversize bin <= budget.

    ``token_col`` supplies precomputed token counts; otherwise the
    native whitespace tokenizer (textstats) runs in the scan stage.
    ``n_groups`` trades parallelism against boundary waste — at 100 TB
    pick n_groups >> executors with ~10^5-10^6 docs per group.
    """
    toks = (
        F.col(token_col)
        if token_col
        else token_count_cols(F.col(text_col))["n_tokens"]
    )
    prepared = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        toks.cast("long").alias("n_tokens"),
        hash_bucket(F.col(id_col), n_groups).alias("group"),
        F.lit(budget).alias("__budget"),
    )
    return prepared.groupBy("group").applyInPandas(_pack_group, schema=PACKED_SCHEMA)
