"""Round-9 extension wave (eighth batch): event-log -> dialogue
flattening, the transform that turns interaction logs into SFT-ready
multi-turn training rows (ordered turns, alternating-role loss-mask
accounting, a per-dialogue fingerprint for dedup/decontam joins).

Same cross-engine rules as wave9_queries.py; the one subtlety here is
NULL discipline in string building: Spark's concat is NULL-absorbing
while DuckDB's skips NULLs, so every concat input is coalesced first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register


@register(
    "sft_dialogue_flatten",
    """
    WITH t AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               concat(coalesce(event_type, ''), ':',
                   CAST(CAST(floor(coalesce(value, 0.0) * 100)
                       AS BIGINT) AS VARCHAR)) AS turn,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, CAST(ts AS DATE)
                   ORDER BY ts, event_id) AS pos
        FROM events
    )
    SELECT user_id, day,
           CAST(COUNT(*) AS BIGINT) AS n_turns,
           md5(string_agg(turn, '|' ORDER BY pos)) AS dialogue_fp,
           CAST(SUM(CASE WHEN pos % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS assistant_turns,
           CAST(SUM(CASE WHEN pos % 2 = 0 THEN length(turn) ELSE 0 END)
               AS BIGINT) AS assistant_chars
    FROM t GROUP BY 1, 2
    """,
    tags=("trainer", "sft", "window"),
    doc="Event-log -> SFT dialogue flattening: each (user, day) is one "
    "dialogue, events in (ts, event_id) order are its turns "
    "(rendered 'type:cents' with exact integer cents — double->string "
    "rendering is engine-dependent, integer rendering is not), and "
    "1-based even positions play the assistant role (the "
    "sft_loss_mask_stats convention), giving per-dialogue trained-"
    "turn/char accounting plus an md5 fingerprint of the full ordered "
    "transcript for exact dedup and decontam joins downstream.  "
    "Deterministic ordered aggregation: the oracle's "
    "string_agg(... ORDER BY pos) is mirrored in Spark by "
    "concat_ws over transform(sort_array(collect_list(struct(pos, "
    "turn)))) — the sort is by the explicit pos key, never "
    "accumulation order.  NULL values are coalesced BEFORE concat "
    "(Spark concat is NULL-absorbing, DuckDB's skips NULLs — a "
    "silent cross-engine trap).  Plan: one keyed window (dialogue "
    "key) + one hash aggregate on the same key — AQE coalesces the "
    "two stages onto one exchange; dialogues are bounded (one user-"
    "day), so no skew cliff at 100 TB.",
)
def sft_dialogue_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    t = events.select(
        "user_id",
        F.col("ts").cast("date").alias("day"),
        F.concat(
            F.coalesce(F.col("event_type"), F.lit("")),
            F.lit(":"),
            F.expr(
                "CAST(CAST(floor(coalesce(value, 0.0D) * 100) AS BIGINT)"
                " AS STRING)"
            ),
        ).alias("turn"),
        F.row_number()
        .over(
            W.partitionBy("user_id", F.col("ts").cast("date")).orderBy(
                "ts", "event_id"
            )
        )
        .alias("pos"),
    )
    return t.groupBy("user_id", "day").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.md5(
            F.expr(
                "concat_ws('|', transform(sort_array("
                "collect_list(struct(pos, turn))), x -> x.turn))"
            )
        ).alias("dialogue_fp"),
        F.sum(F.when(F.col("pos") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("assistant_turns"),
        F.sum(
            F.when(F.col("pos") % 2 == 0, F.length("turn")).otherwise(0)
        )
        .cast("long")
        .alias("assistant_chars"),
    )
