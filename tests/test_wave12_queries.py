"""Planted/invariant tests for the round-9 wave-12 batch: pairwise
win-rate matrix and the partition-skew report."""

from __future__ import annotations

import hashlib


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_eval_pairwise_winrate_replay(spark, sf_dir):
    from greenbuttonengine_spark.plans.wave12_queries import (
        eval_pairwise_winrate,
    )

    rows = eval_pairwise_winrate(spark, sf_dir).collect()
    assert rows
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    best: dict[tuple[str, str, int], int] = {}
    for d in docs:
        pool = (d.source or "", d.lang or "")
        m = _md5_60(f"mdl:{d.doc_id}") % 4
        r = _md5_60(f"rw:{d.doc_id}") % 1000000
        key = (*pool, m)
        best[key] = max(best.get(key, -1), r)
    got = {(r.model_a, r.model_b): r for r in rows}
    pools = {(s, l) for s, l, _ in best}
    for a in range(4):
        for b in range(a + 1, 4):
            n = wins = ties = 0
            for s, l in pools:
                ra, rb = best.get((s, l, a)), best.get((s, l, b))
                if ra is None or rb is None:
                    continue
                n += 1
                wins += ra > rb
                ties += ra == rb
            if n == 0:
                assert (a, b) not in got
                continue
            r = got[(a, b)]
            assert (r.n_battles, r.wins_a, r.ties) == (n, wins, ties)
            assert abs(r.winrate_a - wins / n) < 1e-12
    # with a symmetric seeded reward, no model should sweep
    for r in rows:
        assert 0.0 < r.winrate_a < 1.0


def test_ops_partition_skew_report_exact_quantiles(spark, sf_dir):
    from greenbuttonengine_spark.plans.wave12_queries import (
        ops_partition_skew_report,
    )

    rows = ops_partition_skew_report(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    counts: dict[int, int] = {}
    for x in ev:
        counts[x.user_id] = counts.get(x.user_id, 0) + 1
    ns = sorted(counts.values())
    nk = len(ns)
    assert r.n_keys == nk
    assert r.total_rows == len(ev)
    assert (r.min_rows, r.max_rows) == (ns[0], ns[-1])
    # nearest-rank order statistics (1-based ranks)
    assert r.p50_rows == ns[(nk + 1) // 2 - 1]
    assert r.p90_rows == ns[(nk * 9 + 9) // 10 - 1]
    assert r.p99_rows == ns[(nk * 99 + 99) // 100 - 1]
    assert r.skew_x100 == ns[-1] * 100 // max(r.p50_rows, 1)
    assert r.recommended_salt == -(-ns[-1] // max(r.p50_rows, 1))
    assert r.p50_rows <= r.p90_rows <= r.p99_rows <= r.max_rows
