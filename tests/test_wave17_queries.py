"""Invariant test for wave-17 fixed-point k-means: the Spark
labelling must equal an independent pure-Python Lloyd replay."""

from __future__ import annotations

import math


def test_embedding_kmeans_fixed_replay(spark, sf_dir):
    from greenbuttonengine_spark.extensions.similarity import seeded_centroids
    from greenbuttonengine_spark.plans.wave17_queries import (
        embedding_kmeans_fixed,
    )

    rows = {r.vec_id: r for r in embedding_kmeans_fixed(spark, sf_dir).collect()}
    emb_df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb = {
        r.vec_id: [int(math.floor(float(u) * 4096.0)) for u in r.embedding]
        for r in emb_df.collect()
    }
    assert set(rows) == set(emb)
    cents = [
        [int(math.floor(x * 4096.0)) for x in sv]
        for _, sv, _ in seeded_centroids(emb_df, 16)
    ]

    def assign(q):
        d2 = [
            sum((q[d] - c[d]) ** 2 for d in range(64)) for c in cents
        ]
        best = min(range(16), key=lambda s: (d2[s], s))
        return best, d2[best]

    for _ in range(2):
        clusters: dict[int, list[list[int]]] = {}
        for v, q in emb.items():
            c, _ = assign(q)
            clusters.setdefault(c, []).append(q)
        new = [list(c) for c in cents]
        for c, members in clusters.items():
            n = len(members)
            for d in range(64):
                s = sum(m[d] for m in members)
                new[c][d] = -((-s) // n) if s < 0 else s // n
        cents = new
    moved = 0
    for v, q in emb.items():
        c, d2 = assign(q)
        assert (rows[v].cluster, rows[v].dist2) == (c, d2)
        moved += rows[v].cluster != v % 16
    # Lloyd actually updated centroids: assignments use trained cells
    sizes: dict[int, int] = {}
    for r in rows.values():
        sizes[r.cluster] = sizes.get(r.cluster, 0) + 1
    assert len(sizes) > 1
