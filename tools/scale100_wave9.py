"""100x-scale measurement for the round-9 wave-9/10/11 operators.

Builds perturbed replicas of the sf0.1 documents/embeddings tables
(fresh ids, per-replica text prefix / element rotation — the
measurement-trap rule: replicas must not be bit-identical or dedup
families collapse them for free) under /tmp/scale100, then times each
new operator warm (second of two runs).

Usage: python tools/scale100_wave9.py [n_doc_replicas] [n_vec_replicas]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF = "/root/testdata/sf0.1"
OUT = Path("/tmp/scale100")


def build(spark, n_doc: int, n_vec: int) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    reps = spark.range(n_doc).withColumnRenamed("id", "k")
    big = (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("k") * n_docs).alias("doc_id"),
            F.concat(F.format_string("r%d ", "k"), "text").alias("text"),
            "lang",
            "source",
            (F.col("n_chars") + 3).alias("n_chars"),
        )
    )
    big.repartition(32).write.mode("overwrite").parquet(str(OUT / "documents.parquet"))

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n_emb = emb.count()
    reps_v = spark.range(n_vec).withColumnRenamed("id", "k")
    bigv = (
        emb.crossJoin(F.broadcast(reps_v))
        .select(
            (F.col("vec_id") + F.col("k") * n_emb).alias("vec_id"),
            F.expr(
                "transform(embedding, (u, i) -> "
                "u + CAST((k % 7) - 3 AS FLOAT) / 1000.0F)"
            ).alias("embedding"),
            "label",
        )
    )
    bigv.repartition(32).write.mode("overwrite").parquet(str(OUT / "embeddings.parquet"))
    # events pass through (the new ops that read events are O(days) anyway)
    spark.read.parquet(f"{SF}/events.parquet").write.mode("overwrite").parquet(
        str(OUT / "events.parquet")
    )
    print(
        f"built {n_docs * n_doc} docs, {n_emb * n_vec} vectors -> {OUT}",
        flush=True,
    )


def main() -> None:
    n_doc = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_vec = int(sys.argv[2]) if len(sys.argv) > 2 else 400

    from greenbuttonengine_spark.session import get_spark

    spark = get_spark(app_name="scale100-wave9", shuffle_partitions=64)
    build(spark, n_doc, n_vec)

    import __spark_entry__ as e

    qs = e.queries()
    names = [
        "code_fim_transform",
        "sample_softdedup",
        "decontam_bloom",
        "rlhf_bon_curve",
        "pack_context_sweep",
        "corpus_prefix_sharing",
        "pipeline_epoch_schedule",
        "multimodal_phash_pairs",
        "ann_pq_codes",
        "ann_pq_adc_topk",
    ]
    for name in names:
        fn = qs[name]
        for attempt in ("cold", "warm"):
            t0 = time.time()
            df = fn(spark, str(OUT))
            n = df.count()
            dt = time.time() - t0
            if attempt == "warm":
                print(f"{name}: {n} rows, {dt:.2f}s warm", flush=True)


if __name__ == "__main__":
    main()
