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
    # r10 (16x4 geometry + quantized-dot re-rank): measured 0.86/0.29
    # at sf0.01 and 0.65/0.19 at sf0.1 — demand the VERDICT >=0.6 bar
    # and a decisive trained-vs-random gap
    assert mt >= 0.6
    assert mt >= 2 * mr
