"""Invariant test for wave-14 label propagation: the Spark labelling
must equal an independent pure-Python LPA replay over the declared
kNN edges."""

from __future__ import annotations


def test_graph_label_propagation_replay(spark, sf_dir):
    from greenbuttonengine_spark.plans.extension_queries import (
        graph_knn_cosine,
    )
    from greenbuttonengine_spark.plans.wave14_queries import (
        graph_label_propagation,
    )

    rows = graph_label_propagation(spark, sf_dir).collect()
    assert rows
    edges: dict[int, list[int]] = {}
    nodes = set()
    for r in graph_knn_cosine(spark, sf_dir).collect():
        edges.setdefault(r.vec_id, []).append(r.neighbor_id)
        nodes.add(r.vec_id)
        nodes.add(r.neighbor_id)
    labels = {u: u for u in nodes}
    for _ in range(4):
        new = {}
        for u in nodes:
            votes: dict[int, int] = {}
            for v in edges.get(u, []):
                votes[labels[v]] = votes.get(labels[v], 0) + 1
            votes[labels[u]] = votes.get(labels[u], 0) + 1
            new[u] = min(
                votes, key=lambda lbl: (-votes[lbl], lbl)
            )
        labels = new
    sizes: dict[int, int] = {}
    for lbl in labels.values():
        sizes[lbl] = sizes.get(lbl, 0) + 1
    got = {r.vec_id: (r.community, r.community_size) for r in rows}
    assert got == {u: (lbl, sizes[lbl]) for u, lbl in labels.items()}
    # propagation actually merged some singletons
    assert len(sizes) < len(nodes)
