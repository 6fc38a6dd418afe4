"""100x measurements for the round-10 operators (SCALING.md protocol:
perturbed replicas, warm second run).

Uses the two prebuilt corpora:
  /tmp/scale100          500k docs (replica-token prefix; word-level ops)
                         + 800k embeddings (element perturbation)
  /tmp/scale100_minhash  500k docs (bijective char substitution; the
                         char-shingle-safe corpus)

Usage: python tools/scale100_round10.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

WORDS = "/tmp/scale100"
CHARS = "/tmp/scale100_minhash"


def timed(label, fn, runs=2):
    walls = []
    for _ in range(runs):
        t0 = time.time()
        out = fn()
        walls.append(round(time.time() - t0, 1))
    print(f"{label}: cold {walls[0]}s warm {walls[-1]}s ({out})", flush=True)


def main() -> None:
    import greenbuttonengine_spark.plans.registry as reg
    from greenbuttonengine_spark.session import get_spark
    import __spark_entry__ as entry

    entry._registry()
    spark = get_spark(app_name="scale100-round10")
    spark.sparkContext.setLogLevel("ERROR")

    def run_query(name, sf_dir):
        def go():
            df = reg.QUERIES[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            return "noop"
        return go

    timed("pipeline_learned_quality @500k (perceptron, 8 epochs)",
          run_query("pipeline_learned_quality", WORDS))
    timed("pack_sequences_docs @500k (FFD, 8 groups)",
          run_query("pack_sequences_docs", WORDS))
    timed("pipeline_rag_index @500k docs (~1.6M chunks)",
          run_query("pipeline_rag_index", WORDS))
    timed("approx_set_overlap_kmv @500k (Caesar corpus)",
          run_query("approx_set_overlap_kmv", CHARS))
    timed("dedup_incremental_near @500k (Caesar corpus, seeded family)",
          run_query("dedup_incremental_near", CHARS))

    # BPE: unpruned vs certified-pruned vocab collect
    from pyspark.sql import functions as F

    from greenbuttonengine_spark.extensions.bpe import bpe_train, word_vocab

    docs = spark.read.parquet(f"{CHARS}/documents.parquet")
    nv = word_vocab(docs).count()

    def bpe(minc):
        def go():
            merges, _ = bpe_train(docs, n_merges=20, min_word_count=minc)
            return f"{len(merges)} merges"
        return go

    timed(f"lm_bpe_train @500k (full vocab = {nv} words)", bpe(1))
    kept = word_vocab(docs).filter(F.col("n") >= 3).count()
    timed(f"lm_bpe_train @500k (min_word_count=3, vocab {nv} -> {kept})",
          bpe(3))

    # fixed-point PCA projection at 800k vectors.  grid drops a notch
    # per the documented overflow bound (|pc| <= 2*n*64*grid*xscale):
    # n = 800k = 2^19.6 needs grid <= 2^10 for BIGINT headroom.
    from greenbuttonengine_spark.extensions.embeddings import pca_project_fixed

    emb = spark.read.parquet(f"{WORDS}/embeddings.parquet")

    def pca():
        out = pca_project_fixed(emb, keep_cols=("vec_id", "label"), k=8,
                                grid=1024)
        out.write.format("noop").mode("overwrite").save()
        return "noop"

    timed("pca_project_fixed @800k vectors (k=8, grid=2^10)", pca)
    spark.stop()


if __name__ == "__main__":
    main()
