"""BASELINE.md variance protocol: warm, n=6, per-query MEDIAN.

Single-run bench numbers swing 5-30% with session/ambient state (see
BASELINE.md round-6 note: o4 read 1.53s cold vs 0.72s warm median), so
regressions are only actionable on warm medians.  This runs each
headline query n times in ONE warmed session and reports
min/median/max plus the ratio vs the recorded round-1 baseline.

Run on an idle machine: python tools/bench_variance.py [sf_dir] [n]
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# Recorded round-1 baseline at sf0.1 (BASELINE.md tables).
BASELINE = {
    "q1_pricing_summary": 1.72, "s1_scan_filter_project": 0.24,
    "j3_fact_dim_denormalize": 0.98, "j5_left_join_enrich": 0.93,
    "j2_two_hop_fk_resolution": 0.42, "p10_enum_decode_broadcast": 0.35,
    "a1_minmax_extent": 0.41, "o4_run_length_split": 1.07,
    "o5_topk_limit": 0.35, "w3_rank_per_group": 1.12,
    "d1_date_trunc_rollup": 0.42, "q3_shipping_priority": 1.14,
    "q5_local_supplier_volume": 1.41, "sessionize_events": 0.66,
    "asof_last_click_before_purchase": 0.77, "q6_forecast_revenue": 0.32,
    "q10_returned_items": 0.78, "q13_customer_distribution": 0.53,
    "q18_large_volume_customer": 1.18, "q21_waiting_suppliers": 1.48,
    "dedup_exact": 1.91, "dedup_minhash_lsh": 6.17,
    "ann_bruteforce_topk": 1.03, "text_quality_score": 0.37,
}


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    n = int(args[1]) if len(args) > 1 else 6

    import __spark_entry__ as entrymod
    from bench import HEADLINE
    from greenbuttonengine_spark.session import get_spark
    from greenbuttonengine_spark.sources.catalog import TABLES, load_table

    spark = get_spark(app_name="gbe-bench-variance")
    spark.sparkContext.setLogLevel("OFF")
    qs = entrymod.queries()
    names = [x for x in HEADLINE if x in qs]
    for extra in ("dedup_exact", "dedup_minhash_lsh", "ann_bruteforce_topk",
                  "text_quality_score"):
        if extra in qs and extra not in names:
            names.append(extra)

    for t in TABLES:
        load_table(spark, t, sf_dir).write.format("noop").mode("overwrite").save()

    out = {}
    for name in names:
        trials = []
        for _ in range(n):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            trials.append(round(time.time() - t0, 3))
        med = round(statistics.median(trials), 3)
        base = BASELINE.get(name)
        out[name] = {
            "median": med, "min": min(trials), "max": max(trials),
            "trials": trials,
            "vs_baseline": round(med / base, 2) if base else None,
        }
        flag = ""
        if base and med / base > 1.5:
            flag = "  <-- >1.5x baseline, needs a plan diff"
        print(f"{name}: median={med}s min={min(trials)} max={max(trials)} "
              f"ratio={out[name]['vs_baseline']}{flag}", flush=True)

    # totals compare only queries that HAVE a baseline row, so adding a
    # new headline query without a baseline entry degrades to
    # ratio=None per-query instead of crashing the summary
    based = [x for x in out if x in BASELINE]
    total = round(sum(out[x]["median"] for x in based), 3)
    base_total = round(sum(BASELINE[x] for x in based), 3)
    print(json.dumps({
        "metric": "headline_warm_median_total", "value": total, "unit": "sec",
        "n": n, "sf_dir": sf_dir, "baseline_total": base_total,
        "n_compared": len(based),
        "ratio": round(total / base_total, 3) if base_total else None,
        "queries": {k: v["median"] for k, v in out.items()},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
