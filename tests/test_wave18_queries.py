"""Invariant test for wave-18 PQ codebook training: the trained
codebook must decisively beat the random one, and the accounting must
be internally consistent."""

from __future__ import annotations


def test_eval_pq_recall_trained_beats_random(spark, sf_dir):
    from greenbuttonengine_spark.plans.wave18_queries import (
        eval_pq_recall_trained,
    )

    rows = eval_pq_recall_trained(spark, sf_dir).collect()
    assert len(rows) == 16
    for r in rows:
        assert 0 <= r.hits_trained <= 10 and 0 <= r.hits_random <= 10
        assert abs(r.recall_trained - r.hits_trained / 10) < 1e-12
        assert abs(r.recall_random - r.hits_random / 10) < 1e-12
    mt = sum(r.recall_trained for r in rows) / len(rows)
    mr = sum(r.recall_random for r in rows) / len(rows)
    # r11 (16x4 geometry + 100-wide exact re-rank shortlist): measured
    # 0.97/0.52 at sf0.01 and 0.79/0.30 at sf0.1 — demand the r10
    # VERDICT >=0.75 bar and a decisive trained-vs-random gap
    assert mt >= 0.75
    assert mt >= 1.5 * mr
