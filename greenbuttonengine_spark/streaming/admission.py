"""Streaming corpus admission: continuous JSONL ingest where every
micro-batch is deduplicated against the corpus accepted so far.

The composition a production crawl pipeline runs end to end:

    drop dir --stream_jsonl--> good lines
        --foreachBatch--> incremental_dedup(batch, fingerprint store)
            accept        -> append to the accepted corpus + store
            dup_in_batch  -> dropped (batch-internal copy)
            dup_of_corpus -> dropped (already accepted in a past batch)

State is the FINGERPRINT STORE, not Spark streaming state: admission
history must outlive any one query (restarts, reprocessing, multiple
writers), so it lives as a parquet table appended per batch — the
bounded-state streaming dedup (`stateful.dedup_stream`) covers the
in-flight window; this covers forever.

Failure posture: foreachBatch is at-least-once.  A crash AFTER the
store append (but before checkpoint commit) is self-healing: the
replayed batch finds its fingerprints in the store and classifies
every row dup_of_corpus.  A crash BETWEEN the corpus append and the
store append re-admits that batch's rows on replay — duplicate rows
in the accepted corpus, which the downstream exact-dedup pass removes
(never silent loss; the write order is corpus-first deliberately,
since store-first would drop the batch's rows forever on the same
crash).  The bronze module's epoch-commit pattern
(`streaming/bronze.py`) is the exactly-once upgrade.  Store appends
are idempotent-by-distinct at read time.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..extensions.dedup import (
    band_buckets,
    incremental_dedup,
    incremental_near_dedup,
    minhash_signatures,
)
from ..sources.text_corpus import DOCUMENTS_SCHEMA, stream_jsonl


def _read_store(
    spark: SparkSession, store_dir: str, schema: str = "fingerprint string"
) -> DataFrame:
    if os.path.isdir(store_dir) and any(
        f.endswith(".parquet") for f in os.listdir(store_dir)
    ):
        return spark.read.parquet(store_dir)
    return spark.createDataFrame([], schema)


def admission_decision(
    batch: DataFrame, store: DataFrame, materialize: bool = False
) -> tuple[DataFrame, DataFrame]:
    """The per-micro-batch admission decision of
    :func:`start_admission_stream`, as a pure frame transform:
    ``(accepted_ids, accepted_rows)`` for a new batch against the
    persistent fingerprint store.

    ``accepted_ids`` is (doc_id, fingerprint) of the admitted docs —
    what the stream appends to the store; ``accepted_rows`` is the
    batch rows that may land in the corpus.  The (doc_id, fingerprint)
    semi-join (not doc_id alone) matters when a batch carries two
    different texts under one doc_id: only the row whose fingerprint
    was actually accepted may land.

    ``materialize=True`` localCheckpoints the verdict ids — the stream
    passes it because the ids feed two writes (otherwise each write
    re-reads the store and re-runs the join/window); the batch-parity
    oracle query leaves the plan lazy."""
    from ..extensions.textstats import fingerprint_col

    verdicts = incremental_dedup(batch, store)
    accepted_ids = verdicts.filter(F.col("verdict") == "accept").select(
        "doc_id", "fingerprint"
    )
    if materialize:
        accepted_ids = accepted_ids.localCheckpoint()
    keyed = batch.withColumn("fingerprint", fingerprint_col(F.col("text")))
    accepted = keyed.join(
        accepted_ids, ["doc_id", "fingerprint"], "left_semi"
    ).drop("fingerprint")
    return accepted_ids, accepted


def start_admission_stream(
    spark: SparkSession,
    drop_dir: str,
    accepted_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    schema=DOCUMENTS_SCHEMA,
    available_now: bool = False,
) -> StreamingQuery:
    """Watch ``drop_dir`` for JSONL shards; append admitted rows to
    ``accepted_dir`` and their fingerprints to ``store_dir``."""
    good, _errors = stream_jsonl(spark, drop_dir, schema=schema)

    def admit(batch: DataFrame, epoch_id: int) -> None:
        if not batch.columns:
            return
        sess = batch.sparkSession
        store = _read_store(sess, store_dir)
        accepted_ids, accepted = admission_decision(
            batch, store, materialize=True
        )
        accepted.write.mode("append").parquet(accepted_dir)
        accepted_ids.select("fingerprint").write.mode("append").parquet(store_dir)

    writer = good.writeStream.foreachBatch(admit).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_near_dup_admission_stream(
    spark: SparkSession,
    drop_dir: str,
    accepted_dir: str,
    band_store_dir: str,
    sig_store_dir: str,
    checkpoint_dir: str,
    schema=DOCUMENTS_SCHEMA,
    threshold: float = 0.8,
    num_perm: int = 32,
    bands: int = 8,
    available_now: bool = False,
) -> StreamingQuery:
    """NEAR-dup streaming admission: like
    :func:`start_admission_stream`, but each micro-batch is LSH-probed
    against the accepted corpus's persistent band store and verified
    by MinHash signature agreement (``incremental_near_dedup``) — the
    continuous-crawl path where a re-crawled page differs by a date
    stamp or ad block and exact fingerprints never match.

    State is TWO parquet tables keyed by the accepted corpus:

    * ``band_store_dir`` — (band_idx, band_hash, doc_id) LSH buckets;
      at scale, bucket by exactly (band_idx, band_hash) — the full
      join key — so the store never shuffles and each micro-batch's
      probe co-locates (plan-asserted in test_bucketing.py).
    * ``sig_store_dir`` — (doc_id, sig) MinHash signatures, touched
      only for band-collision candidates (semi-pruned join).

    Both grow one row-set per ACCEPTED doc — state is linear in the
    admitted corpus, never in the crawl.  Failure posture matches the
    exact stream: corpus-first write order, so a crash between writes
    re-admits one batch (downstream dedup removes it; replay after
    the store write classifies everything near_dup_of_corpus — never
    silent loss).  Batch contract: one row per doc_id (physical
    double-delivery is collapsed by an exact (doc_id, text) distinct
    before signing; same-id-different-text is an upstream error).
    """
    good, _errors = stream_jsonl(spark, drop_dir, schema=schema)

    def admit(batch: DataFrame, epoch_id: int) -> None:
        if not batch.columns:
            return
        sess = batch.sparkSession
        batch = batch.dropDuplicates(["doc_id", "text"])
        store_bands = _read_store(
            sess, band_store_dir, "band_idx int, band_hash bigint, doc_id bigint"
        )
        store_sigs = _read_store(
            sess, sig_store_dir, "doc_id bigint, sig array<bigint>"
        )
        # signatures feed the verdict pipeline AND the store append —
        # checkpoint once (eager: reused across three writes)
        sigs = minhash_signatures(batch, num_perm=num_perm).localCheckpoint()
        verdicts = incremental_near_dedup(
            batch,
            store_bands,
            store_sigs,
            threshold=threshold,
            num_perm=num_perm,
            bands=bands,
            batch_sigs=sigs,
        ).localCheckpoint()
        acc_ids = verdicts.filter(F.col("verdict") == "accept").select("doc_id")
        batch.join(acc_ids, "doc_id", "left_semi").write.mode("append").parquet(
            accepted_dir
        )
        acc_sigs = sigs.join(acc_ids, "doc_id", "left_semi")
        # sig store BEFORE band store: bands are the probe key, so the
        # store must never hold bands whose signatures are missing — a
        # crash between the writes in THAT order would make replayed
        # docs band-collide with themselves, find no signature to
        # verify against, and be re-accepted with every store row
        # duplicated forever.  Sigs-without-bands (a crash in this
        # order) are harmless orphans: undiscoverable via any probe,
        # and the replayed batch re-accepts once (corpus-first posture,
        # downstream exact dedup removes it) then repairs both stores.
        acc_sigs.write.mode("append").parquet(sig_store_dir)
        band_buckets(acc_sigs, num_perm=num_perm, bands=bands).write.mode(
            "append"
        ).parquet(band_store_dir)

    writer = good.writeStream.foreachBatch(admit).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
