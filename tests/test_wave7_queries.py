"""Planted-data tests for the round-6 wave-7 batch (hamming ANN,
recall eval, matryoshka eval, CCNet buckets, mix rebalance, padding
waste, PIT interval join)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def test_hamming_topk_sign_bits_and_ranking(spark):
    """Hand-checkable 4-vector corpus: hamming distances to the query
    must equal the hand-computed sign-bit differences, nearest first."""
    from greenbuttonengine_spark.plans.wave7_queries import (
        _sign_bits_spark,
    )

    # 64-dim vectors: v0 all positive; v1 flips dim 0; v2 flips dims
    # 0..3; v3 all negative
    def vec(flips):
        return [(-1.0 if i in flips else 1.0) for i in range(64)]

    emb = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=vec(set())),
            Row(vec_id=1, embedding=vec({0})),
            Row(vec_id=2, embedding=vec({0, 1, 2, 3})),
            Row(vec_id=3, embedding=vec(set(range(64)))),
        ]
    )
    sig = emb.select(
        "vec_id",
        _sign_bits_spark(F.col("embedding"), 0, 32).alias("blo"),
        _sign_bits_spark(F.col("embedding"), 32, 64).alias("bhi"),
    ).collect()
    by_id = {r.vec_id: (r.blo, r.bhi) for r in sig}
    assert by_id[0] == ((1 << 32) - 1, (1 << 32) - 1)
    assert by_id[1][0] == (1 << 32) - 2
    assert by_id[3] == (0, 0)

    ham = {
        (a, b): bin(by_id[a][0] ^ by_id[b][0]).count("1")
        + bin(by_id[a][1] ^ by_id[b][1]).count("1")
        for a in by_id
        for b in by_id
    }
    assert ham[(0, 1)] == 1 and ham[(0, 2)] == 4 and ham[(0, 3)] == 64
    assert ham[(1, 2)] == 3


def test_eval_ann_recall_bounds_and_self_consistency(spark, sf_dir):
    """recall@10 per query is in [0,1]; macro average matches the
    set-overlap recall computed independently from the two operators."""
    from greenbuttonengine_spark.extensions.similarity import (
        cosine_topk,
        lsh_topk,
    )
    from greenbuttonengine_spark.plans.wave7_queries import eval_ann_recall
    from greenbuttonengine_spark.sources import load_table

    rows = eval_ann_recall(spark, sf_dir).collect()
    assert len(rows) == 16
    assert all(0.0 <= r.recall_at_k <= 1.0 for r in rows)

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 16)
    brute = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, queries, k=10).collect()
    }
    lsh = {
        (r.query_id, r.neighbor_id)
        for r in lsh_topk(emb, queries, k=10, planes=4).collect()
    }
    expect = {}
    for q in range(16):
        b = {n for (qq, n) in brute if qq == q}
        l = {n for (qq, n) in lsh if qq == q}
        expect[q] = len(b & l) / 10.0
    got = {r.query_id: r.recall_at_k for r in rows}
    assert got == expect


def test_matryoshka_full_dim_is_identity(spark, sf_dir):
    """The d=64 rows are recall 1.0 by construction; smaller prefixes
    are monotonically noisier on average (not strictly per query)."""
    from greenbuttonengine_spark.plans.wave7_queries import (
        embedding_matryoshka_eval,
    )

    rows = embedding_matryoshka_eval(spark, sf_dir).collect()
    by_dim = {}
    for r in rows:
        by_dim.setdefault(r.dim, []).append(r.recall_vs_full)
    assert set(by_dim) == {8, 16, 32, 64}
    assert all(v == 1.0 for v in by_dim[64])
    avg = {d: sum(v) / len(v) for d, v in by_dim.items()}
    assert avg[8] <= avg[64] and avg[16] <= avg[64]


def test_ccnet_buckets_partition_docs(spark, sf_dir):
    """Buckets tile each language: bucket doc counts sum to the
    language's doc count and differ by at most 1 (NTILE contract),
    and surprisal ranges are ordered head <= middle <= tail."""
    from greenbuttonengine_spark.plans.wave7_queries import text_ccnet_buckets
    from greenbuttonengine_spark.sources import load_table

    rows = text_ccnet_buckets(spark, sf_dir).collect()
    docs = load_table(spark, "documents", sf_dir)
    per_lang = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.bucket] = r
    for lang, buckets in by_lang.items():
        counts = [b.n_docs for b in buckets.values()]
        assert sum(counts) == per_lang[lang]
        assert max(counts) - min(counts) <= 1
        if {"head", "middle", "tail"} <= set(buckets):
            assert buckets["head"].max_mean_bits <= buckets["middle"].min_mean_bits + 1e-9
            assert buckets["middle"].max_mean_bits <= buckets["tail"].min_mean_bits + 1e-9


def test_corpus_mix_rebalance_caps_and_budget(spark, tmp_path):
    """Over-represented languages are rate-limited to the uniform
    budget; under-represented ones keep rate 1.0 — exercised through
    the registered query itself."""
    from greenbuttonengine_spark.plans.wave7_queries import corpus_mix_rebalance

    docs = spark.createDataFrame(
        [Row(doc_id=i, text="x", lang=("big" if i < 90 else "small"),
             source="s", n_chars=100) for i in range(100)]
    )
    d = str(tmp_path)
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    rows = {r.lang: r for r in corpus_mix_rebalance(spark, d).collect()}
    # total 10000 chars, 2 langs -> 5000 budget; big has 9000 -> 5/9
    assert rows["small"].sample_rate == 1.0
    assert abs(rows["big"].sample_rate - 5000.0 / 9000.0) < 1e-12
    assert abs(rows["big"].expected_chars - 5000.0) < 1e-9
    assert rows["small"].expected_chars == 1000.0


def test_pack_padding_waste_buckets_exact(spark):
    """Hand-planted token counts land in the right pow2 buckets with
    exact padding arithmetic."""
    from greenbuttonengine_spark.plans.wave7_queries import _pow2_cap_spark

    df = spark.createDataFrame(
        [Row(n=1), Row(n=2), Row(n=3), Row(n=4), Row(n=5), Row(n=100),
         Row(n=1024), Row(n=1025)]
    )
    got = {
        r.n: r.cap
        for r in df.select("n", _pow2_cap_spark(F.col("n")).alias("cap")).collect()
    }
    assert got == {1: 1, 2: 2, 3: 4, 4: 4, 5: 8, 100: 128, 1024: 1024,
                   1025: 2048}


def test_pit_interval_join_planted(spark):
    """Planted purchase history: clicks attach to exactly the interval
    active at their timestamp; pre-first-purchase clicks drop."""
    from greenbuttonengine_spark.plans import wave7_queries

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, user, typ, minutes, value=0.0):
        return Row(event_id=eid, ts=t0 + dt.timedelta(minutes=minutes),
                   user_id=user, event_type=typ, value=value, props="{}")

    rows = [
        ev(1, 7, "purchase", 10, 1.0),   # interval [10, 50)
        ev(2, 7, "purchase", 50, 2.0),   # interval [50, inf)
        ev(3, 7, "click", 5),            # before first purchase -> drops
        ev(4, 7, "click", 10),           # boundary: ts == valid_from -> 1st
        ev(5, 7, "click", 30),           # inside 1st
        ev(6, 7, "click", 50),           # boundary -> 2nd
        ev(7, 7, "click", 99),           # inside open 2nd
        ev(8, 8, "click", 30),           # user with no purchases -> drops
    ]
    df = spark.createDataFrame(rows)

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        got = {
            r.event_id: r.interval_id
            for r in wave7_queries.pit_interval_join(spark, d).collect()
        }
    assert got == {4: 1, 5: 1, 6: 2, 7: 2}


def test_mean_shift_detect_planted_step(spark):
    """A planted level step is localized to (near) the step position;
    a flat series yields no change points."""
    from greenbuttonengine_spark.plans.wave7_queries import (
        _MS_W,
        ts2_mean_shift_detect,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # stepped series: 200 points at 1.0 then 200 points at 8.0
    for i in range(400):
        rows.append(Row(event_id=eid, ts=t0 + dt.timedelta(minutes=i),
                        user_id=1, event_type="stepped",
                        value=(1.0 if i < 200 else 8.0), props="{}"))
        eid += 1
    # flat series: constant value -> zero shift everywhere
    for i in range(400):
        rows.append(Row(event_id=eid, ts=t0 + dt.timedelta(minutes=i),
                        user_id=2, event_type="flat", value=3.0, props="{}"))
        eid += 1
    df = spark.createDataFrame(rows)

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        got = ts2_mean_shift_detect(spark, d).collect()
    by_type = {}
    for r in got:
        by_type.setdefault(r.event_type, []).append(r)
    assert "flat" not in by_type
    stepped = by_type["stepped"]
    # the peak shift is exactly at the step (index 200: before-window
    # all 1.0, after-window all 8.0 -> shift 7.0)
    assert any(abs(r.shift_size - 7.0) < 1e-9 for r in stepped)
    # every reported point is within W of the true step position
    for r in stepped:
        assert abs(r.event_id - 200) <= _MS_W, r


def test_mean_shift_segmented_equals_unsegmented(spark):
    """The halo-sliced windows (scale path) must reproduce the
    unsegmented per-series computation EXACTLY.  A random walk with
    planted level steps produces many change points crossing segment
    boundaries; seg_rows=120 forces ~10 segments per 1200-row series
    while seg_rows=10**9 degenerates to one segment per series (the
    unsegmented semantics)."""
    import random

    from greenbuttonengine_spark.plans.wave7_queries import (
        ts2_mean_shift_detect,
    )

    rng = random.Random(77)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for series in ("alpha", "beta", "gamma"):
        level = 5.0
        for i in range(1200):
            if i % 180 == 97:  # planted steps, deliberately off-grid
                level += rng.choice([-4.0, 4.0])
            rows.append(
                Row(
                    event_id=eid,
                    ts=t0 + dt.timedelta(minutes=i),
                    user_id=1,
                    event_type=series,
                    value=level + rng.uniform(-0.3, 0.3),
                    props="{}",
                )
            )
            eid += 1
    df = spark.createDataFrame(rows)

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        seg = {
            (r.event_type, r.event_id, r.mean_before, r.mean_after, r.shift_size)
            for r in ts2_mean_shift_detect(spark, d, seg_rows=120).collect()
        }
        unseg = {
            (r.event_type, r.event_id, r.mean_before, r.mean_after, r.shift_size)
            for r in ts2_mean_shift_detect(spark, d, seg_rows=10**9).collect()
        }
    assert seg, "planted steps must produce change points"
    assert seg == unseg


def test_hamming_histogram_threshold_equals_naive_rank(spark):
    """Property test: the histogram-threshold top-k (shipped plan) must
    equal the naive full-rank on randomized corpora — ties at the
    cutoff distance and duplicate vectors are the hazard cases, so
    they are planted densely (few distinct values => many ties)."""
    import random

    from pyspark.sql import Window
    from greenbuttonengine_spark.plans.wave7_queries import ann_hamming_topk

    rng = random.Random(1234)
    import tempfile

    for trial in range(3):
        # tiny alphabet of sign patterns -> massive hamming ties
        patterns = [
            [rng.choice([-1.0, 1.0]) for _ in range(64)] for _ in range(6)
        ]
        rows = [
            Row(vec_id=i, embedding=patterns[rng.randrange(len(patterns))],
                label=0)
            for i in range(120)
        ]
        df = spark.createDataFrame(rows)
        with tempfile.TemporaryDirectory() as d:
            df.write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
            got = {
                (r.query_id, r.neighbor_id, r.hamming, r.rank)
                for r in ann_hamming_topk(spark, d).collect()
            }
        # naive reference in pure Python
        sig = {
            r.vec_id: tuple(1 if x > 0 else 0 for x in r.embedding)
            for r in rows
        }
        want = set()
        for q in range(16):
            cand = sorted(
                (
                    (sum(a != b for a, b in zip(sig[q], sig[n])), n)
                    for n in sig
                    if n != q
                ),
            )[:10]
            want |= {(q, n, h, i + 1) for i, (h, n) in enumerate(cand)}
        assert got == want, f"trial {trial}"


def test_hll_rollup_bounds_and_associativity(spark, sf_dir):
    """The seeded declared form reproduces an independent pure-Python
    HLL bit for bit (register max-merge is order-invariant), both forms
    stay within their HLL error envelopes of exact distinct counts, and
    the native Datasketches daily-union equals sketching directly (the
    re-aggregation property)."""
    import hashlib

    from greenbuttonengine_spark.plans.wave7_queries import (
        _HLL_M,
        _HLL_NUM,
        _HLL_P,
        agg_hll_rollup,
        agg_hll_rollup_native,
    )
    from greenbuttonengine_spark.sources import load_table

    est = {r.event_type: r.distinct_users_est
           for r in agg_hll_rollup(spark, sf_dir).collect()}
    ev = load_table(spark, "events", sf_dir)
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n")).collect()
    }
    assert set(est) == set(exact)

    # exact replay: independent Python HLL over the same md5-60 hash
    rows = ev.select("event_type", "user_id").collect()
    regs: dict[str, list[int]] = {}
    for r in rows:
        h = int(hashlib.md5(str(r.user_id).encode()).hexdigest()[:15], 16)
        idx, w = h % _HLL_M, h >> _HLL_P
        rho = 56 - len(bin(w)[2:] if w else "0")
        m = regs.setdefault(r.event_type, [0] * _HLL_M)
        m[idx] = max(m[idx], rho)
    for t, m in regs.items():
        s = sum(1 << (55 - v) for v in m)
        assert est[t] == float(_HLL_NUM) / float(s), t

    for t, n in exact.items():
        if n >= 2.5 * _HLL_M:
            # raw-estimator regime: m=32 -> rsd ~18%; allow ~2 sigma
            assert abs(est[t] - n) <= max(3, 0.40 * n), (t, est[t], n)
        else:
            # linear-counting zone (sf0.001: ~15 users/type): the RAW
            # estimate is biased by design; check the registers still
            # carry the cardinality via test-side linear counting
            import math

            v = sum(1 for x in regs[t] if x == 0)
            lc = _HLL_M * math.log(_HLL_M / max(v, 1))
            assert abs(lc - n) <= max(3, 0.40 * n), (t, lc, n)

    # native Datasketches form keeps the old envelope + associativity
    nat = {r.event_type: r.distinct_users_est
           for r in agg_hll_rollup_native(spark, sf_dir).collect()}
    for t, n in exact.items():
        assert abs(nat[t] - n) <= max(3, 0.08 * n), (t, nat[t], n)
    direct = {
        r.event_type: r.e
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
             .cast("long").alias("e")).collect()
    }
    assert nat == direct, "daily-union must equal direct sketch"

    # partition invariance: estimates are stable across re-runs
    reparted = {
        r.event_type: r.distinct_users_est
        for r in agg_hll_rollup(spark, sf_dir).collect()
    }
    assert reparted == est


def test_variant_extract_matches_string_path(spark, sf_dir):
    """The Variant-typed extraction must agree with the legacy
    get_json_object string path on the same rows."""
    from greenbuttonengine_spark.plans.wave7_queries import var1_variant_extract
    from greenbuttonengine_spark.sources import load_table

    got = {r.event_type: (r.n, r.sum_k, r.min_k, r.max_k)
           for r in var1_variant_extract(spark, sf_dir).collect()}
    ev = load_table(spark, "events", sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    want = {
        r.event_type: (r.n, r.sum_k, r.min_k, r.max_k)
        for r in ev.select("event_type", k.alias("k"))
        .filter(F.col("k") >= 50)
        .groupBy("event_type")
        .agg(F.count("*").cast("long").alias("n"),
             F.sum("k").cast("long").alias("sum_k"),
             F.min("k").cast("long").alias("min_k"),
             F.max("k").cast("long").alias("max_k"))
        .collect()
    }
    assert got == want


def test_grouped_split_user_disjoint_and_deterministic(spark, sf_dir):
    """No user appears in two splits; assignment is a pure function of
    user_id (re-run identical); split masses are plausible 80/10/10."""
    from greenbuttonengine_spark.plans.wave7_queries import sample_grouped_split
    from greenbuttonengine_spark.sources import load_table

    ev = load_table(spark, "events", sf_dir)
    h = ((F.col("user_id") % F.lit(2147483648)) * F.lit(1103515245)
         + F.lit(12345)) % F.lit(2147483648)
    split = (F.when(h % 10 < 8, "train").when(h % 10 < 9, "val")
             .otherwise("test"))
    assign = ev.select("user_id", split.alias("split")).distinct()
    per_user = assign.groupBy("user_id").count().filter("count > 1").count()
    assert per_user == 0, "a user must belong to exactly one split"

    r1 = {(r.split, r.n_events, r.n_users)
          for r in sample_grouped_split(spark, sf_dir).collect()}
    r2 = {(r.split, r.n_events, r.n_users)
          for r in sample_grouped_split(spark, sf_dir).collect()}
    assert r1 == r2
    masses = {s: u for s, _, u in r1}
    total = sum(masses.values())
    assert masses.get("train", 0) / total > 0.5


def test_hard_negatives_semantics_and_bruteforce(spark, sf_dir):
    """No same-label pair ever surfaces, ranks are dense per vector,
    and the blocked miner equals a brute-force different-label top-k
    under the same (cosine desc, id asc) order."""
    import numpy as np

    from greenbuttonengine_spark.extensions.similarity import hard_negatives
    from greenbuttonengine_spark.sources import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    got = hard_negatives(emb, k=3).collect()
    assert got, "non-empty corpus must yield negatives"
    assert all(r.label != r.neighbor_label for r in got)
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r.vec_id, []).append(r)
    for q, rows in by_q.items():
        assert sorted(x.rank for x in rows) == list(range(1, len(rows) + 1)), q

    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    lbl = np.array([r.label for r in rows])
    mat = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    d = mat.shape[1]
    acc = np.zeros(len(ids))
    for kk in range(d):
        acc += mat[:, kk] * mat[:, kk]
    nrm = np.sqrt(acc)
    dots = np.zeros((len(ids), len(ids)))
    for kk in range(d):
        dots += np.outer(mat[:, kk], mat[:, kk])
    cos = dots / np.outer(nrm, nrm)
    cos[np.equal.outer(lbl, lbl)] = -np.inf
    want = set()
    for i in range(len(ids)):
        order = np.lexsort((ids, -cos[i]))
        order = [j for j in order if np.isfinite(cos[i][j])][:3]
        for rk, j in enumerate(order):
            want.add((int(ids[i]), int(ids[j]), rk + 1))
    assert {(r.vec_id, r.neighbor_id, r.rank) for r in got} == want


def test_curriculum_interleave_schedule(spark, sf_dir):
    """sched_key is a bijection onto a prefix-interleaved order: keys
    are unique, every window of n_strata consecutive ranks holds at
    most one doc per stratum, and within a stratum the order is
    easy-to-hard (n_chars asc)."""
    from greenbuttonengine_spark.plans.wave7_queries import curriculum_interleave
    from greenbuttonengine_spark.sources import load_table

    rows = curriculum_interleave(spark, sf_dir).collect()
    docs = load_table(spark, "documents", sf_dir).collect()
    assert len(rows) == len(docs)
    keys = [r.sched_key for r in rows]
    assert len(set(keys)) == len(keys)
    strata = {(r.lang or "") for r in rows}
    ns = len(strata)
    # round-robin: key mod n_strata identifies the stratum
    by_mod = {}
    for r in rows:
        by_mod.setdefault(r.sched_key % ns, set()).add(r.lang or "")
    assert all(len(v) == 1 for v in by_mod.values())
    # easy-to-hard within stratum
    n_chars = {d.doc_id: d.n_chars for d in docs}
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang or "", []).append(r)
    for lang, rs in by_lang.items():
        rs = sorted(rs, key=lambda r: r.stratum_rank)
        lens = [n_chars[r.doc_id] for r in rs]
        assert lens == sorted(lens), lang
