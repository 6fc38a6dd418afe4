"""Round-9 extension wave (third batch): the retrieval half of the
PQ family (asymmetric-distance top-k), perceptual-hash pair mining
for the multimodal column, and a key-range compaction planner for the
lakehouse-ops family.

Same cross-engine rules as wave9_queries.py: seeded md5-60 hashes,
exact BIGINT arithmetic end to end, scan-stage Catalyst higher-order
functions for per-row math, and keyed (never corpus-global) windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register
from .wave9_queries import (
    _PQ_DIM,
    _PQ_GRID,
    _PQ_K,
    _PQ_SUBS,
    pq_codes_pandas,
    pq_dists_pandas,
    _pq_quantized,
)

# ---------------------------------------------------------------------------
# PQ asymmetric-distance (ADC) top-k retrieval
# ---------------------------------------------------------------------------

_ADC_NQ = 16  # queries = vec_id < 16, the ANN-family convention
_ADC_K = 10


def _adc_oracle_sql(k: int = _ADC_K, nq: int = _ADC_NQ) -> str:
    return f"""
    WITH q AS MATERIALIZED (
        SELECT vec_id,
               list_transform(embedding::DOUBLE[],
                   u -> CAST(floor(u * {float(_PQ_GRID)!r}) AS BIGINT)) AS qv
        FROM embeddings
    ), cent AS MATERIALIZED (
        SELECT j, s, d,
               CAST(concat('0x', substr(md5(concat('pq:',
                   CAST(j AS VARCHAR), ':', CAST(s AS VARCHAR), ':',
                   CAST(d AS VARCHAR))), 1, 15)) AS BIGINT) % 8192 - 4096
                   AS cv
        FROM generate_series(0, {_PQ_SUBS - 1}) gj(j)
        CROSS JOIN generate_series(0, {_PQ_K - 1}) gs(s)
        CROSS JOIN generate_series(0, {_PQ_DIM - 1}) gd(d)
    ), exq AS MATERIALIZED (
        SELECT vec_id, unnest(qv) AS qe,
               CAST(generate_subscripts(qv, 1) AS BIGINT) - 1 AS i
        FROM q
    ), dist AS MATERIALIZED (
        SELECT e.vec_id, c.j, c.s,
               SUM((e.qe - c.cv) * (e.qe - c.cv)) AS d2
        FROM exq e
        JOIN cent c ON c.j = e.i // {_PQ_DIM} AND c.d = e.i % {_PQ_DIM}
        GROUP BY 1, 2, 3
    ), codes AS MATERIALIZED (
        SELECT vec_id, j, s AS code FROM (
            SELECT vec_id, j, s,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, j
                                      ORDER BY d2, s) AS rn
            FROM dist
        ) t WHERE rn = 1
    ), lut AS MATERIALIZED (
        SELECT vec_id AS query_id, j, s, d2 FROM dist
        WHERE vec_id < {nq}
    ), adc AS (
        SELECT l.query_id, c.vec_id AS neighbor_id, SUM(l.d2) AS adc
        FROM codes c
        JOIN lut l ON l.j = c.j AND l.s = c.code
        WHERE c.vec_id != l.query_id
        GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, CAST(adc AS BIGINT) AS adc, rank FROM (
        SELECT adc.*, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY adc, neighbor_id)
            AS BIGINT) AS rank
        FROM adc
    ) t WHERE rank <= {k}
    """


@register(
    "ann_pq_adc_topk",
    _adc_oracle_sql(),
    tags=("ann", "pq", "tiny-bnlj"),
    doc="PQ asymmetric-distance (ADC) retrieval (Jegou et al. 2011), "
    "the search half that makes ann_pq_codes useful: each query "
    "precomputes its 8x16 lookup table of exact sub-distances to the "
    "codebook (the SAME Catalyst expression that encodes the corpus — "
    "one code path, no drift), and a corpus vector's distance "
    "estimate is just 8 table lookups summed: "
    "adc = sum_j lut[j][code_v[j]].  The corpus side therefore scans "
    "its 32-bit codes — never the float vectors — and the queries "
    "(with LUTs, ~1 KB each) broadcast; at 100 TB that is FAISS's "
    "IVF-PQ scan re-expressed in Catalyst: map-only over the code "
    "column, integer adds only.  Top-k is the two-phase salted rank "
    "(per-(query,salt) local top-k, then per-query final top-k), so "
    "no single reducer ever sees more than 16*k rows per query.  All "
    "distances are exact BIGINTs on the shared 2^-12 grid, ties break "
    "on neighbor_id — bit-identical to the relational oracle.",
)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    k, nq = _ADC_K, _ADC_NQ
    q = _pq_quantized(spark, sf_dir)
    # corpus side: argmin codes reduced INSIDE the Arrow kernel (8
    # ints/row over the wire — the 100 TB encode shape); query side:
    # the full 8x16 LUT tables from the full-table kernel, <= nq rows
    # by construction.  Same int64 math, pytest-pinned twins.
    codes = pq_codes_pandas(q)
    lut = pq_dists_pandas(q.filter(F.col("vec_id") < nq)).select(
        F.col("vec_id").alias("query_id"),
        *[F.col("subs")[j].alias(f"l{j}") for j in range(_PQ_SUBS)],
    )
    adc = " + ".join(f"l{j}[c{j}]" for j in range(_PQ_SUBS))
    scored = (
        codes.withColumnRenamed("vec_id", "neighbor_id")
        .crossJoin(F.broadcast(lut))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.expr(adc).cast("long").alias("adc"),
        )
    )
    # two-phase top-k: a salted local rank bounds every reducer's input
    # to <= 16*k rows per query before the final per-query rank
    salted = scored.withColumn(
        "__salt", F.pmod(F.xxhash64("neighbor_id"), F.lit(16))
    )
    w1 = W.partitionBy("query_id", "__salt").orderBy("adc", "neighbor_id")
    local = (
        salted.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .drop("__salt", "__r1")
    )
    w2 = W.partitionBy("query_id").orderBy("adc", "neighbor_id")
    return (
        local.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("adc").cast("long").alias("adc"),
                "rank")
    )


# ---------------------------------------------------------------------------
# Perceptual-hash (dHash) pair mining over the multimodal blobs
# ---------------------------------------------------------------------------

_PHASH_BITS = 63  # 64 fake-blob bytes -> 63 gradient bits
_PHASH_HAM_T = 2
_PHASH_BAND_BITS = 16  # 4 bands x 16 bits: the dedup_simhash geometry


@register(
    "multimodal_phash_pairs",
    f"""
    WITH hx AS (
        SELECT doc_id, concat(md5(text), md5(text || '#2'),
                              md5(text || '#3'), md5(text || '#4')) AS h
        FROM documents WHERE text IS NOT NULL
    ), ph AS MATERIALIZED (
        SELECT doc_id,
               list_sum([CASE WHEN
                   CAST(concat('0x', substr(h, 2*i-1, 2)) AS BIGINT) >
                   CAST(concat('0x', substr(h, 2*i+1, 2)) AS BIGINT)
                   THEN 1 << (i - 1) ELSE 0 END
                   for i in generate_series(1, {_PHASH_BITS})]) AS phash
        FROM hx
    ), banded AS (
        SELECT doc_id, phash, b.b AS band,
               (phash >> ({_PHASH_BAND_BITS} * b.b)) & 65535 AS band_val
        FROM ph CROSS JOIN generate_series(0, 3) AS b(b)
    ), cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               a.phash AS ph_a, b.phash AS ph_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.band_val = b.band_val
             AND a.doc_id < b.doc_id
    )
    SELECT CAST(bit_count(xor(ph_a, ph_b)) AS BIGINT) AS hamming,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(MIN(id_a) AS BIGINT) AS example_id_a,
           CAST(CASE WHEN bit_count(xor(ph_a, ph_b)) <= {_PHASH_HAM_T}
                THEN 1 ELSE 0 END AS BIGINT) AS is_duplicate_bin
    FROM cand
    GROUP BY 1, 4
    """,
    tags=("multimodal", "dedup"),
    doc="Perceptual-hash near-duplicate mining for the binary media "
    "column: a dHash-style gradient hash (bit i = byte_i > byte_i+1 "
    "over the 64-byte blob -> 63 bits), bucketed by 4 16-bit bands "
    "(the simhash/LSH banding guarantee: hamming <= 3 always agrees "
    "on >= 1 full band, so banding loses nothing at the declared "
    "threshold 2), candidates verified by bit_count(xor).  Band WIDTH "
    "is the scale knob the 100x measurement pinned down: the first "
    "cut used 8-bit bands (256 buckets), whose ~n^2/256 candidate "
    "blow-up filled the shuffle disk at 500k docs; 16-bit bands keep "
    "expected bucket occupancy at n/65536 and the measured run at "
    "2.9s for the same corpus (SCALING.md).  The "
    "declared result is the hamming HISTOGRAM of band-colliding "
    "candidate pairs with the <= 2 bins marked is_duplicate_bin — on "
    "the dup-free sf0.01 gate corpus the dup bins are absent but the "
    "collision histogram still value-checks the whole banding join "
    "(a pairs-only projection would be vacuously empty there; the "
    "espi_egd_golden_parity lesson).  Production keeps the pair rows "
    "where hamming <= t — same plan minus the final aggregate.  "
    "Plan: scan-stage hash -> explode x4 bands -> equi-join on "
    "(band, value) -> exact verify + tiny aggregate; identical shape "
    "to dedup_simhash, so the same hot-bucket analysis applies at "
    "100 TB — no all-pairs anywhere.  The blob is the established "
    "deterministic fake (unhex of 4 chained md5s — "
    "multimodal_byte_histogram's construction widened to 64 bytes; a "
    "real decoder drops into the same plan), which makes exact "
    "duplicate media collide at hamming 0 (8 planted pairs at sf0.1) "
    "while unrelated blobs land ~31.5 bits apart — pinned by pytest.",
)
def multimodal_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).filter(F.col("text").isNotNull())
    hexpr = (
        "concat(md5(text), md5(text || '#2'), "
        "md5(text || '#3'), md5(text || '#4'))"
    )
    # conv() returns STRING — cast to BIGINT or the compare is lexicographic
    bit = (
        "CASE WHEN CAST(conv(substr(h, 2*i-1, 2), 16, 10) AS BIGINT) > "
        "CAST(conv(substr(h, 2*i+1, 2), 16, 10) AS BIGINT) "
        "THEN shiftleft(1L, i - 1) ELSE 0L END"
    )
    ph = docs.select(
        "doc_id", F.expr(hexpr).alias("h")
    ).select(
        "doc_id",
        F.expr(
            f"aggregate(transform(sequence(1, {_PHASH_BITS}), i -> {bit}), "
            "0L, (a, b) -> a + b)"
        ).alias("phash"),
    )
    banded = ph.select(
        "doc_id",
        "phash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band"),
    ).withColumn(
        "band_val", F.expr(f"(phash >> ({_PHASH_BAND_BITS} * band)) & 65535")
    )
    a = banded.select(
        F.col("doc_id").alias("id_a"), F.col("phash").alias("ph_a"),
        "band", "band_val",
    )
    b = banded.select(
        F.col("doc_id").alias("id_b"), F.col("phash").alias("ph_b"),
        "band", "band_val",
    )
    cand = (
        a.join(b, ["band", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ph_a", "ph_b")
        .distinct()
    )
    verified = cand.select(
        "id_a",
        F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
        .cast("long")
        .alias("hamming"),
    )
    return verified.groupBy(
        "hamming",
        (F.col("hamming") <= _PHASH_HAM_T).cast("long").alias("is_duplicate_bin"),
    ).agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.min("id_a").cast("long").alias("example_id_a"),
    ).select("hamming", "n_pairs", "example_id_a", "is_duplicate_bin")


# ---------------------------------------------------------------------------
# Key-range compaction planner (lakehouse ops)
# ---------------------------------------------------------------------------

_COMPACT_TARGET = 4000  # rows per output file (sf-scaled stand-in)


@register(
    "ops_compaction_plan",
    f"""
    WITH per_day AS (
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_rows
        FROM events GROUP BY 1
    ), planned AS (
        SELECT day, n_rows,
               SUM(n_rows) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS cum_before
        FROM per_day
    )
    SELECT day, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(coalesce(cum_before, 0) // {_COMPACT_TARGET} AS BIGINT)
               AS compaction_group,
           CAST(SUM(n_rows) OVER (
               PARTITION BY coalesce(cum_before, 0) // {_COMPACT_TARGET})
               AS BIGINT) AS group_rows
    FROM planned
    """,
    tags=("ops", "tiny-global-window"),
    doc="Key-range compaction planner, the action that follows "
    "ops_file_layout_report on a real lake: assign contiguous "
    "date-partitions to output-file groups of ~TARGET rows by quota "
    "striping the running total (group = cum_before // target — "
    "deterministic, order-preserving, each group lands within one "
    "partition of the target so rewritten files are size-uniform and "
    "key-range-sorted, which is what keeps min/max pruning effective "
    "after the rewrite).  The only windows run over the O(days) "
    "per-day aggregate (tiny-global-window), never the event rows: "
    "the corpus pass is one map-side-combined count per day.  At "
    "100 TB the same plan emits the rewrite manifest; execution is "
    "``events.repartitionByRange(compaction_group)`` + a sorted "
    "write, both already exercised by the sink family.",
)
def ops_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    per_day = events.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").alias("n_rows")
    )
    win = W.orderBy("day").rowsBetween(W.unboundedPreceding, -1)
    planned = per_day.withColumn(
        "cum_before", F.coalesce(F.sum("n_rows").over(win), F.lit(0))
    ).withColumn(
        "compaction_group",
        F.expr(f"cum_before div {_COMPACT_TARGET}").cast("long"),
    )
    return planned.select(
        "day",
        F.col("n_rows").cast("long").alias("n_rows"),
        "compaction_group",
        F.sum("n_rows")
        .over(W.partitionBy("compaction_group"))
        .cast("long")
        .alias("group_rows"),
    )
