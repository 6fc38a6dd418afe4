"""Re-execution determinism pins for the range-partition + mid rank
machinery — r7's one red row.

``repartitionByRange`` samples its boundaries with a seed drawn per
RDD *instance*, and ``monotonically_increasing_id`` depends on the
resulting layout, so a plan that consumes that lineage from more than
one downstream branch could see DIFFERENT boundaries per branch when
the exchange is re-executed (stage retry, broken exchange reuse, AQE
replan).  The r7 driver gate caught ts2_mean_shift_detect returning
76/78/77/77 rows across four identical runs.  The fix is an eager
``localCheckpoint`` that freezes the ranked lineage before fan-out
(``_series_rn`` / ``o1_multikey_sort_rank``); these tests pin it shut
by executing each plan repeatedly — fresh DataFrame each time, many
range partitions to stress boundary placement — and asserting
bit-identical canonical results.

The older seg==unseg pin (test_wave7_queries.py) compares two plans
inside ONE lineage and stayed green through the real bug; only
run-vs-run identity catches this class.
"""

from __future__ import annotations

import datetime as dt
import random
import tempfile

import pytest
from pyspark.sql import Row


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def many_partitions(spark):
    """Stress range-boundary placement: more partitions than the
    8-partition test session default => every series spans several
    range partitions and boundary drift would move results."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", old)


def test_ts2_mean_shift_three_runs_identical(spark, many_partitions):
    """The exact r7 failure shape: a long drifting series whose NMS
    peaks sit near partition boundaries.  Three independent runs of
    the identical plan must agree row-for-row."""
    from greenbuttonengine_spark.plans.wave7_queries import (
        ts2_mean_shift_detect,
    )

    rng = random.Random(8)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for series in ("view", "click"):
        level = 10.0
        for i in range(6000):
            if i % 700 == 350:
                level += rng.choice([-5.0, 5.0])
            level += rng.uniform(-0.05, 0.05)  # drift => NMS ties matter
            rows.append(
                Row(
                    event_id=eid,
                    ts=t0 + dt.timedelta(minutes=i),
                    user_id=1,
                    event_type=series,
                    value=level + rng.uniform(-0.4, 0.4),
                    props="{}",
                )
            )
            eid += 1
    df = spark.createDataFrame(rows)
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        runs = [
            _canon(ts2_mean_shift_detect(spark, d, seg_rows=500))
            for _ in range(3)
        ]
    assert runs[0], "planted steps must produce change points"
    assert runs[0] == runs[1] == runs[2]


def test_o1_rank_three_runs_identical_on_skew(spark, many_partitions):
    """o1 carried the same defect latently (second independent
    repartitionByRange for the counts branch) and was green only
    because uniform test data made both samplings agree.  Skewed keys
    + repeated runs pin the fixed single-lineage construction, and the
    ranks must equal the single-partition row_number truth."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from greenbuttonengine_spark.plans.relational_queries import (
        o1_multikey_sort_rank,
    )

    rng = random.Random(99)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for eid in range(20000):
        # 90% of rows share one event_type => heavily skewed ranges
        etype = "hot" if rng.random() < 0.9 else rng.choice("abcdefgh")
        rows.append(
            Row(
                event_id=eid,
                ts=t0 + dt.timedelta(seconds=rng.randrange(3600)),
                user_id=1,
                event_type=etype,
                value=1.0,
                props="{}",
            )
        )
    df = spark.createDataFrame(rows)
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        runs = [_canon(o1_multikey_sort_rank(spark, d)) for _ in range(3)]
        truth = _canon(
            spark.read.parquet(f"{d}/events.parquet").select(
                "event_id",
                F.row_number()
                .over(W.orderBy("event_type", "ts", "event_id"))
                .cast("bigint")
                .alias("global_rank"),
            )
        )
    assert runs[0] == runs[1] == runs[2]
    assert runs[0] == truth
