"""Round-13 wave 30: the hierarchical IVF retriever must equal an
independent pure-Python replay of its whole pipeline (seed selection,
cell->super map, two-level assignment, quota probing, scoring,
top-k), not just the DuckDB oracle; the recall eval must equal the
overlap recomputed from the declared queries' own outputs."""

from __future__ import annotations

import math

import pytest

pytestmark = pytest.mark.usefixtures("spark")

SF = "/root/testdata/sf0.001"
C, S, SUPER_PROBE, CELLS_PER_SUPER, K = 16, 4, 2, 2, 10


def _queries():
    import __spark_entry__

    __spark_entry__._registry()

    from greenbuttonengine_spark.plans.registry import QUERIES

    return QUERIES


def _fold_dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


@pytest.fixture(scope="module")
def replay(spark):
    """Pure-Python hierarchical retrieval over sf0.001 embeddings."""
    from greenbuttonengine_spark.sources.catalog import load_table

    rows = load_table(spark, "embeddings", SF).select("vec_id", "embedding").collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}
    nrm = {i: math.sqrt(_fold_dot(v, v)) for i, v in vecs.items()}

    # seed selection: n smallest (LCG(vec_id), vec_id)
    def lcg(i):
        return ((i % 2147483648) * 1103515245 + 12345) % 2147483648

    order = sorted(vecs, key=lambda i: (lcg(i), i))
    seeds = order[:C]  # seed of cell c = seeds[c]
    sup = seeds[:S]

    def best(v, cand, quota):
        scored = sorted(
            ((-_fold_dot(v, vecs[seeds[c]]) / nrm[seeds[c]], c) for c in cand)
        )
        return [c for _, c in scored[:quota]]

    def best_sup(v, quota):
        scored = sorted(
            ((-_fold_dot(v, vecs[sup[s]]) / nrm[sup[s]], s) for s in range(S))
        )
        return [s for _, s in scored[:quota]]

    cell2sup = {c: best_sup(vecs[seeds[c]], 1)[0] for c in range(C)}
    cells_of = {s: [c for c in range(C) if cell2sup[c] == s] for s in range(S)}

    assign = {}
    for i, v in vecs.items():
        s = best_sup(v, 1)[0]
        assign[i] = best(v, cells_of[s], 1)[0]

    out = {}
    for qid in (i for i in vecs if i < 16):
        qv = vecs[qid]
        probed_cells = []
        for s in best_sup(qv, SUPER_PROBE):
            probed_cells += best(qv, cells_of[s], CELLS_PER_SUPER)
        cand = [
            n for n, c in assign.items() if c in probed_cells and n != qid
        ]
        scored = sorted(
            (
                (-_fold_dot(qv, vecs[n]) / (nrm[qid] * nrm[n]), n)
                for n in cand
            )
        )
        out[qid] = [
            (n, -negcos, rank + 1)
            for rank, (negcos, n) in enumerate(scored[:K])
        ]
    return out


def test_hier_matches_python_replay(spark, replay):
    got = {}
    for r in _queries()["ann_ivf_hier_topk"].fn(spark, SF).collect():
        got.setdefault(r.query_id, []).append((r.neighbor_id, r.cosine, r.rank))
    for qid in got:
        got[qid].sort(key=lambda t: t[2])
    assert set(got) == set(q for q in replay if replay[q])
    for qid, want in replay.items():
        if want:
            assert got[qid] == want  # ids, exact cosines, ranks


def test_hier_recall_eval_composes_declared_queries(spark, replay):
    qs = _queries()
    brute = {}
    for r in qs["ann_bruteforce_topk"].fn(spark, SF).collect():
        brute.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {r.query_id: r.recall_at_k
           for r in qs["eval_ann_hier_recall"].fn(spark, SF).collect()}
    assert set(got) == set(brute)
    for qid in brute:
        hits = len(brute[qid] & {n for n, _, _ in replay.get(qid, [])})
        assert got[qid] == hits / K
        assert 0.0 <= got[qid] <= 1.0


def test_hier_empty_corpus_returns_empty(spark):
    from greenbuttonengine_spark.extensions import similarity

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    out = similarity.ivf_topk_hier_blocked(empty, queries, k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "cosine", "rank"]
