"""Planted/invariant tests for the round-9 wave-10 batch: PQ ADC
retrieval, perceptual-hash candidate mining, compaction planning."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def test_ann_pq_adc_topk_matches_code_replay(spark, sf_dir):
    from greenbuttonengine_spark.plans.wave9_queries import (
        _pq_centroids,
        ann_pq_codes,
    )
    from greenbuttonengine_spark.plans.wave10_queries import ann_pq_adc_topk

    rows = ann_pq_adc_topk(spark, sf_dir).collect()
    assert rows
    codes = {}
    for r in ann_pq_codes(spark, sf_dir).collect():
        codes.setdefault(r.vec_id, {})[r.sub] = r.code
    cent = _pq_centroids()
    import math

    emb = {
        r.vec_id: [int(math.floor(float(u) * 4096.0)) for u in r.embedding]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    # independent ADC replay: lut from query vector, sum of 8 lookups
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {v for v in emb if v < 16}
    for qid, rs in by_q.items():
        lut = [
            [
                sum(
                    (emb[qid][j * 8 + d] - cent[j][s][d]) ** 2
                    for d in range(8)
                )
                for s in range(16)
            ]
            for j in range(8)
        ]
        truth = sorted(
            (
                (sum(lut[j][codes[v][j]] for j in range(8)), v)
                for v in emb
                if v != qid
            ),
        )[:10]
        got = sorted((r.adc, r.neighbor_id) for r in rs)
        assert got == truth
        assert [r.rank for r in sorted(rs, key=lambda r: r.rank)] == list(
            range(1, 11)
        )


def test_multimodal_phash_hist_replay(spark, sf_dir):
    from greenbuttonengine_spark.plans.wave10_queries import (
        multimodal_phash_pairs,
    )

    rows = multimodal_phash_pairs(spark, sf_dir).collect()
    assert rows
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .collect()
    )
    # independent Python replay of phash + banding + histogram
    def phash(text: str) -> int:
        h = "".join(
            hashlib.md5((text + suf).encode()).hexdigest()
            for suf in ("", "#2", "#3", "#4")
        )
        by = [int(h[2 * i : 2 * i + 2], 16) for i in range(64)]
        return sum(1 << i for i in range(63) if by[i] > by[i + 1])

    ph = {d.doc_id: phash(d.text) for d in docs}
    buckets: dict[tuple[int, int], set[int]] = {}
    for did, p in ph.items():
        for b in range(4):
            buckets.setdefault((b, (p >> (16 * b)) & 65535), set()).add(did)
    pairs = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                pairs.add((a, b))
    hist: dict[int, int] = {}
    for a, b in pairs:
        d = bin(ph[a] ^ ph[b]).count("1")
        hist[d] = hist.get(d, 0) + 1
    got = {r.hamming: r.n_pairs for r in rows}
    assert got == hist
    for r in rows:
        assert r.is_duplicate_bin == int(r.hamming <= 2)
    # dup-free corpus: no bin at or under the dedup threshold,
    # and random band collisions sit far apart (>= 4 bits)
    if all(p1 != p2 for p1, p2 in [(ph[a], ph[b]) for a, b in pairs]):
        assert all(r.hamming > 2 for r in rows)


def test_ops_compaction_plan_quota_striping(spark, sf_dir):
    from greenbuttonengine_spark.plans.wave10_queries import ops_compaction_plan

    rows = sorted(ops_compaction_plan(spark, sf_dir).collect(), key=lambda r: r.day)
    assert rows
    events_n = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r.n_rows for r in rows) == events_n
    # groups are contiguous over days and nondecreasing
    cum = 0
    for r in rows:
        assert r.compaction_group == cum // 4000
        cum += r.n_rows
    # per-group totals consistent and near target (each group over-target
    # by at most one day's rows, under only for the final group)
    by_g: dict[int, int] = {}
    for r in rows:
        by_g[r.compaction_group] = by_g.get(r.compaction_group, 0) + r.n_rows
        assert r.group_rows == sum(
            x.n_rows for x in rows if x.compaction_group == r.compaction_group
        )
    gs = sorted(by_g)
    for g in gs[:-1]:
        assert by_g[g] >= 4000 - max(r.n_rows for r in rows)
