"""100x measurements for the round-11 wave-23/24 operators
(SCALING.md protocol: perturbed replicas, warm second run).

Corpora:
  /tmp/scale100          500k docs (replica-token prefix; word-level ops)
                         built by scale100_wave9.py
  /tmp/scale100_minhash  500k docs (bijective char substitution; the
                         char-shingle-safe corpus) built by
                         scale100_minhash.py
  /tmp/scale100_events   10M events / 150k users (fresh event_id +
                         user_id per replica so per-user fan-out stays
                         constant) built here

Usage: python tools/scale100_round11.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF = "/root/testdata/sf0.1"
WORDS = "/tmp/scale100"
CHARS = "/tmp/scale100_minhash"
EVENTS = Path("/tmp/scale100_events")


def build_events(spark, n: int = 100) -> None:
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_ev = ev.count()
    n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    reps = spark.range(n).withColumnRenamed("id", "k")
    big = ev.crossJoin(F.broadcast(reps)).select(
        (F.col("event_id") + F.col("k") * n_ev).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("k") * n_users).alias("user_id"),
        "event_type",
        (F.col("value") + F.col("k").cast("double") / 1000.0).alias("value"),
        "props",
    )
    big.repartition(32).write.mode("overwrite").parquet(
        str(EVENTS / "events.parquet")
    )
    print(f"built {n_ev * n} events / {n_users * n} users -> {EVENTS}", flush=True)


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
    spark = get_spark(app_name="scale100-round11", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    for path, builder in ((WORDS, "tools/scale100_wave9.py"),
                          (CHARS, "tools/scale100_minhash.py")):
        if not Path(path, "documents.parquet").exists():
            print(f"MISSING {path} — run `python {builder}` first", flush=True)
            sys.exit(1)
    if not (EVENTS / "events.parquet").exists():
        build_events(spark)

    def run_query(name, sf_dir):
        def go():
            df = reg.QUERIES[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            return "noop"
        return go

    # word-level wave-23/24 ops on the 500k-doc replica corpus
    timed("approx_cms_heavy_hitters @500k docs",
          run_query("approx_cms_heavy_hitters", WORDS))
    timed("lm_stupid_backoff_trigram @500k docs",
          run_query("lm_stupid_backoff_trigram", WORDS))
    timed("corpus_diversity_indices @500k docs",
          run_query("corpus_diversity_indices", WORDS))
    timed("sample_systematic_pps @500k docs",
          run_query("sample_systematic_pps", WORDS))
    timed("drift_tvd_sources @500k docs",
          run_query("drift_tvd_sources", WORDS))
    timed("eval_quality_calibration @500k docs",
          run_query("eval_quality_calibration", WORDS))
    # char-shingle ops on the Caesar corpus (bijective substitution so
    # replicas do not band-collide for free)
    timed("eval_split_leakage @500k docs (Caesar corpus)",
          run_query("eval_split_leakage", CHARS))
    timed("eval_minhash_precision @500k docs (Caesar corpus)",
          run_query("eval_minhash_precision", CHARS))
    # event-stream ops on the 10M-event / 150k-user replica corpus
    timed("assoc_rules_events @10M events / 150k users",
          run_query("assoc_rules_events", str(EVENTS)))
    timed("ts3_ohlc_daily @10M events",
          run_query("ts3_ohlc_daily", str(EVENTS)))


if __name__ == "__main__":
    main()
