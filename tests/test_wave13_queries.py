"""Invariant test for the round-9 wave-13 composed IVF-PQ retriever:
the composition must equal the by-hand composition of its two
declared building blocks (cells from the seeded quantizer, scores
from the PQ codes)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_ann_ivf_pq_topk_equals_manual_composition(spark, sf_dir):
    from greenbuttonengine_spark.extensions.similarity import (
        _as_double,
        seeded_cell_scores,
        seeded_centroids,
    )
    from greenbuttonengine_spark.plans.wave9_queries import (
        _pq_centroids,
        ann_pq_codes,
    )
    from greenbuttonengine_spark.plans.wave13_queries import ann_ivf_pq_topk

    rows = ann_ivf_pq_topk(spark, sf_dir).collect()
    assert rows

    emb_df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    seeds = seeded_centroids(emb_df, 16)
    scores = seeded_cell_scores(seeds)
    cells = {
        r.vec_id: r.cell
        for r in emb_df.select(
            "vec_id",
            (-F.element_at(scores(_as_double("embedding")), 1)["nc"]).alias(
                "cell"
            ),
        ).collect()
    }
    probe = {
        r.vec_id: [int(-s["nc"]) for s in r.pr]
        for r in emb_df.filter(F.col("vec_id") < 16)
        .select(
            "vec_id",
            F.slice(scores(_as_double("embedding")), 1, 4).alias("pr"),
        )
        .collect()
    }
    codes: dict[int, dict[int, int]] = {}
    for r in ann_pq_codes(spark, sf_dir).collect():
        codes.setdefault(r.vec_id, {})[r.sub] = r.code
    cent = _pq_centroids()
    emb = {
        r.vec_id: [int(math.floor(float(u) * 4096.0)) for u in r.embedding]
        for r in emb_df.collect()
    }

    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(probe)
    for qid, rs in by_q.items():
        lut = [
            [
                sum((emb[qid][j * 8 + d] - cent[j][s][d]) ** 2 for d in range(8))
                for s in range(16)
            ]
            for j in range(8)
        ]
        pc = set(probe[qid])
        cand = [
            (sum(lut[j][codes[v][j]] for j in range(8)), v)
            for v in emb
            if v != qid and cells[v] in pc
        ]
        truth = sorted(cand)[:10]
        got = sorted((r.adc, r.neighbor_id) for r in rs)
        assert got == truth
        ranks = [r.rank for r in sorted(rs, key=lambda r: r.rank)]
        assert ranks == list(range(1, len(ranks) + 1))
        # every returned neighbor really lives in a probed cell
        for r in rs:
            assert cells[r.neighbor_id] in pc


def test_eval_pq_recall_bounds(spark, sf_dir):
    from greenbuttonengine_spark.plans.wave13_queries import eval_pq_recall

    rows = eval_pq_recall(spark, sf_dir).collect()
    assert len(rows) == 16
    for r in rows:
        assert 0 <= r.n_hits <= 10
        assert abs(r.recall - r.n_hits / 10) < 1e-12
    # isotropic corpus + random codebook: nonzero but well under the
    # ~0.25 probe ceiling (the doc's honest-reading numbers)
    mean = sum(r.recall for r in rows) / len(rows)
    assert 0.0 < mean < 0.35
