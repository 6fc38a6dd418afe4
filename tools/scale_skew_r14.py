"""r13 VERDICT items 5 + 2 (measurement leg): degenerate-skew behavior
of the two documented hot-key valves, measured instead of asserted.

Part B — plain n-gram Jaccard under a boilerplate corpus (item 5).
`ngram_jaccard_pairs`'s docstring claims AQE skew-join splitting
handles frequent-shingle hot keys; nothing in SCALING.md ever measured
it.  Corpus: 20,000 docs, each = ONE shared 8-char boilerplate block +
unique filler, so exactly one shingle is shared by ALL docs -> the
token join's hot key alone yields C(20k, 2) ≈ 2.0e8 candidate rows.
Measured: plain form (AQE on, the session default) vs the
prefix-filtered exact refinement, warm runs, noop sink; afterwards the
EXECUTED plan is grepped for `isSkew`/`skew=` markers to verify
whether AQE's OptimizeSkewedJoin actually engaged.  Expected (to be
recorded either way): AQE can only parallelize the straggler
partition — the 2e8-row candidate WORK is unchanged — while the
prefix filter removes the hot key from the join entirely.

Part C — the blocked-IVF auto hot-cell valve (item 2).  Corpus:
512k vectors where HALF are tight perturbations of one direction ->
one seeded cell holds ~256k rows (4x the 65,536-row
HOT_CELL_ROWS_DEFAULT trigger).  20k queries from the same
distribution, so ~half probe the hub.  Measured: valve off
(hot_cell_rows=None) vs auto (HOT_CELL_ROWS_DEFAULT -> the hub splits
into ceil(est/65536) sub-cells), warm runs.  Output equality is
pytest-pinned (split-invariance); this measures the straggler wall.

Usage: python tools/scale_skew_r14.py  (idle box; ~15 min)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF = "/root/testdata/sf0.1"
N_DOCS = 20_000
N_VEC = 512_000
N_QUERIES = 20_000
CELLS = 1024


def part_b(spark) -> None:
    from pyspark.sql import functions as F

    from greenbuttonengine_spark.extensions import dedup

    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("BOILER8!"),  # exactly k=8 chars -> ONE universal shingle
            # unique filler: hex of id padded -> no cross-doc shingles
            F.lpad(F.conv(F.col("id").cast("string"), 10, 16), 40, "x"),
        ).alias("text"),
    )
    docs = docs.repartition(64).localCheckpoint()  # freeze input cost
    print(f"partB: {docs.count()} docs, one universal shingle", flush=True)

    def run(fn, name):
        walls = []
        for trial in range(2):
            t0 = time.time()
            out = fn(docs, threshold=0.8, k=8)
            out.write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
            print(f"partB {name} trial {trial}: {walls[-1]:.1f}s", flush=True)
        return out  # last DataFrame (for plan inspection)

    plain = run(dedup.ngram_jaccard_pairs, "plain")
    run(dedup.ngram_jaccard_pairs_prefix, "prefix")

    # did AQE's OptimizeSkewedJoin actually engage on the plain form?
    plan = plain._jdf.queryExecution().executedPlan().toString()
    skew_markers = [ln.strip()[:120] for ln in plan.splitlines() if "kew" in ln]
    print(f"partB plain executed-plan skew markers: {len(skew_markers)}", flush=True)
    for ln in skew_markers[:8]:
        print(f"  {ln}", flush=True)


def part_c(spark) -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from greenbuttonengine_spark.extensions import similarity

    base = spark.read.parquet(f"{SF}/embeddings.parquet")
    hub_vec = [float(x) for x in base.filter("vec_id = 0").collect()[0]["embedding"]]
    n_emb = base.count()
    reps = max(1, N_VEC // n_emb)
    rdf = spark.range(reps).withColumnRenamed("id", "k")
    hub_lit = "array(" + ", ".join(f"{x!r}F" for x in hub_vec) + ")"
    emb = (
        base.crossJoin(F.broadcast(rdf))
        .select(
            (F.col("vec_id") + F.col("k") * n_emb).alias("vec_id"),
            F.col("embedding"),
        )
        .selectExpr(
            "vec_id",
            # half the corpus collapses onto one direction (tiny per-row
            # tweak keeps vectors distinct); the rest keeps the wave9
            # perturbed-replica spread
            f"""CASE WHEN pmod(xxhash64(vec_id), 2) = 0
                THEN transform({hub_lit}, (u, i) ->
                     u + CAST(pmod(vec_id, 97) AS FLOAT) / 5000.0F)
                ELSE transform(embedding, (u, i) ->
                     u + CAST(pmod(vec_id, 7) - 3 AS FLOAT) / 1000.0F)
                END AS embedding""",
        )
    )
    emb.repartition(64).write.mode("overwrite").parquet("/tmp/scale_skew_emb.parquet")
    emb = spark.read.parquet("/tmp/scale_skew_emb.parquet")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    print(f"partC: {emb.count()} vectors ({queries.count()} queries), "
          f"~half in one hub cell; trigger {similarity.HOT_CELL_ROWS_DEFAULT}",
          flush=True)

    def run(name, hot):
        walls = []
        for trial in range(2):
            t0 = time.time()
            similarity.ivf_topk_blocked(
                emb, queries, k=10, n_centroids=CELLS, n_probe=4,
                hot_cell_rows=hot,
            ).write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
            print(f"partC {name} trial {trial}: {walls[-1]:.1f}s", flush=True)
        return walls[1]

    off = run("valve-off", None)
    on = run("valve-auto", similarity.HOT_CELL_ROWS_DEFAULT)
    print(f"partC RESULT: off {off:.1f}s vs auto {on:.1f}s "
          f"({off/on:.2f}x)", flush=True)


def main() -> None:
    from greenbuttonengine_spark.session import get_spark

    spark = get_spark(app_name="scale-skew-r14", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    part_b(spark)
    part_c(spark)
    spark.stop()


if __name__ == "__main__":
    main()
