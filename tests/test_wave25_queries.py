"""Wave-25 invariants: link prediction must equal brute-force
neighborhood set arithmetic on the same kNN graph; readability must
equal the textbook formulas on hand-countable text."""

from __future__ import annotations

import re


def _knn_und(spark, sf_dir):
    import numpy as np

    from greenbuttonengine_spark.sources.catalog import load_table

    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", "embedding").collect()
    ids = [r.vec_id for r in emb]
    v = np.array([r.embedding for r in emb])
    nrm = np.linalg.norm(v, axis=1)
    cos = (v @ v.T) / (nrm[:, None] * nrm[None, :])
    np.fill_diagonal(cos, -np.inf)
    und = set()
    for i, vid in enumerate(ids):
        order = sorted(range(len(ids)), key=lambda j: (-cos[i, j], ids[j]))
        for j in order[:5]:
            und.add((min(vid, ids[j]), max(vid, ids[j])))
    return und


def test_link_prediction_matches_bruteforce(spark, sf_dir):
    from greenbuttonengine_spark.plans import wave25_queries as w25
    from greenbuttonengine_spark.plans.registry import QUERIES

    rows = QUERIES["graph_link_prediction"].fn(spark, sf_dir).collect()
    und = _knn_und(spark, sf_dir)
    adj: dict[int, set] = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if (u, v) in und:
                continue
            common = len(adj[u] & adj[v])
            if common >= w25._LP_MIN_COMMON:
                want[(u, v)] = common
    got = {(r.u, r.v): r for r in rows}
    assert set(got) == set(want)
    for (u, v), r in got.items():
        assert r.n_common == want[(u, v)]
        assert r.deg_u == len(adj[u]) and r.deg_v == len(adj[v])
        union = len(adj[u] | adj[v])
        assert r.jaccard == r.n_common / union
        # predicted pairs are never existing edges
        assert (u, v) not in und
        assert 0.0 < r.jaccard <= 1.0


def test_readability_matches_textbook(spark, tmp_path):
    from pyspark.sql import Row

    from greenbuttonengine_spark.plans.registry import QUERIES

    texts = [
        "The cat sat. The dog ran! Did it rain?",
        "Incomprehensibility characterizes bureaucratic documentation.",
        "no punctuation here just words flowing on and on",
        "",
    ]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
         for i, t in enumerate(texts)]
    )
    d = str(tmp_path / "sfrd")
    docs.write.parquet(f"{d}/documents.parquet")
    got = {r.doc_id: r for r in QUERIES["text_readability"].fn(spark, d).collect()}

    for i, t in enumerate(texts):
        ws = re.split(r"\s+", t.strip().lower())
        n_words = sum(1 for w in ws if w)
        n_sents = max(
            sum(1 for s in re.split(r"[.!?]+", t) if s.strip()), 1)
        n_syl = sum(len(re.findall(r"[aeiouy]+", w)) for w in ws)
        r = got[i]
        assert r.n_words == n_words
        assert r.n_sentences == n_sents
        assert r.n_syllables == n_syl
        if n_words == 0:
            assert r.fk_grade is None and r.flesch_ease is None
        else:
            wps, spw = n_words / n_sents, n_syl / n_words
            assert r.fk_grade == 0.39 * wps + 11.8 * spw - 15.59
            assert r.flesch_ease == 206.835 - 1.015 * wps - 84.6 * spw
    # the bureaucratic doc must read as harder than the simple one
    assert got[1].fk_grade > got[0].fk_grade
    assert got[1].flesch_ease < got[0].flesch_ease
