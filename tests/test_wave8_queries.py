"""Planted/invariant tests for the round-9 wave-8 batch: training-shard
assignment, DPO preference pairs, SFT loss-mask accounting."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_train_shard_assign_balanced_and_deterministic(spark, sf_dir):
    from greenbuttonengine_spark.plans.wave8_queries import train_shard_assign

    rows = train_shard_assign(spark, sf_dir).collect()
    n = len(rows)
    assert n > 0
    # every doc exactly once
    assert len({r.doc_id for r in rows}) == n
    # round-robin striping => shard sizes equal +-1, positions dense per shard
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos_in_shard)
    sizes = {s: len(p) for s, p in by_shard.items()}
    assert set(by_shard) == set(range(8))
    assert max(sizes.values()) - min(sizes.values()) <= 1
    for s, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss)))
    # shuffle_key matches the Python md5-60 reference and global order
    # (shuffle_key, doc_id) reproduces (shard, pos) via rank striping
    for r in rows[:50]:
        assert r.shuffle_key == _md5_60(f"sh:{r.doc_id}")
    order = sorted(rows, key=lambda r: (r.shuffle_key, r.doc_id))
    for rank, r in enumerate(order):
        assert r.shard == rank % 8 and r.pos_in_shard == rank // 8


def test_rlhf_preference_pairs_margins_and_argmax(spark, sf_dir):
    from greenbuttonengine_spark.plans.wave8_queries import (
        rlhf_preference_pairs,
    )

    rows = rlhf_preference_pairs(spark, sf_dir).collect()
    assert rows
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source", "lang")
        .collect()
    )
    pool_rewards: dict[tuple[str, str], list[tuple[int, int]]] = {}
    for d in docs:
        key = (d.source or "", d.lang or "")
        pool_rewards.setdefault(key, []).append(
            (_md5_60(f"rw:{d.doc_id}") % 1000000, d.doc_id)
        )
    by_pool: dict[tuple[str, str], list] = {}
    for r in rows:
        assert r.margin == r.chosen_reward - r.rejected_reward
        assert r.margin >= 0
        assert r.chosen_id != r.rejected_id
        by_pool.setdefault((r.source_key, r.lang_key), []).append(r)
    for key, pairs in by_pool.items():
        ranked = sorted(pool_rewards[key], key=lambda t: (-t[0], t[1]))
        # chosen is the pool argmax; rejected are ranks 2..4 in order
        assert all(p.chosen_id == ranked[0][1] for p in pairs)
        assert len(pairs) == min(3, len(ranked) - 1)
        got = {p.pair_rank: p.rejected_id for p in pairs}
        for i, (_, did) in enumerate(ranked[1 : 1 + len(pairs)], start=1):
            assert got[i] == did


def test_sft_loss_mask_stats_planted(spark, tmp_path):
    from greenbuttonengine_spark.plans.wave8_queries import sft_loss_mask_stats

    # turns: "hi there"(user,2) / "ok good"(asst,2) / "bye"(user,1)
    # doc2: "a"(user,1) / "b c d"(asst,3)
    docs = spark.createDataFrame(
        [
            (1, "hi there. ok good. bye", "en", "web", 22),
            (2, "a. b c d", "en", "web", 8),
            (3, None, "fr", "web", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "sf")
    docs.write.parquet(f"{d}/documents.parquet")
    out = {r.lang: r for r in sft_loss_mask_stats(spark, d).collect()}
    assert set(out) == {"en"}  # null-text doc filtered
    en = out["en"]
    assert en.n_docs == 2
    assert en.n_turns == 5
    assert en.total_tokens == 2 + 2 + 1 + 1 + 3
    assert en.trained_tokens == 2 + 3  # 1-based even turns
    assert abs(en.trained_frac - 5 / 9) < 1e-15


def test_pca_power_agrees_with_eigh_on_gapped_data(spark):
    """On data with a real eigengap (planted dominant direction), 12
    fixed-point power steps must recover the numpy-eigh top component:
    |pearson corr| > 0.999 between pc1n and the eigh projection."""
    import numpy as np

    from greenbuttonengine_spark.extensions.embeddings import pca_power_fixed

    rng = np.random.default_rng(7)
    d, n = 16, 300
    u = rng.normal(size=d)
    u /= np.linalg.norm(u)
    v = np.outer(rng.normal(scale=0.3, size=n), u) + rng.normal(
        scale=0.02, size=(n, d)
    )
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v[i]], 0) for i in range(n)],
        "vec_id long, embedding array<float>, label int",
    )
    fx = {r.vec_id: r.pc1n for r in pca_power_fixed(emb).collect()}
    vf = np.array(
        [[np.float64(np.float32(x)) for x in row] for row in v]
    )  # float32 round-trip like parquet
    mu = vf.mean(0)
    cov = (vf - mu).T @ (vf - mu) / n
    w, uu = np.linalg.eigh(cov)
    top = uu[:, np.argmax(w)]
    ref = (vf - mu) @ top
    got = np.array([float(fx[i]) for i in range(n)])
    corr = np.corrcoef(ref, got)[0, 1]
    assert abs(corr) > 0.999, corr


def test_pca_power_rayleigh_near_top_on_corpus(spark, sf_dir):
    """On the (near-isotropic) synthetic corpus the top PC is nearly
    degenerate, so eigh agreement is not meaningful — instead pin that
    the direction the fixed-point iteration lands on captures variance
    close to lambda_1 (Rayleigh quotient >= 0.9 * lambda_1)."""
    import numpy as np

    from greenbuttonengine_spark.extensions.embeddings import pca_power_fixed

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    fx = {r.vec_id: r.pc1n for r in pca_power_fixed(emb).collect()}
    rows = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in emb.select("vec_id", "embedding").collect()
    }
    ids = sorted(fx)
    v = np.array([rows[i] for i in ids])
    mu = v.mean(0)
    cov = (v - mu).T @ (v - mu) / len(v)
    lam1 = np.linalg.eigvalsh(cov)[-1]
    # recover the direction from the projections: pc1n is an exact
    # linear functional q -> n*(q.x) - m.x, so regress it back
    got = np.array([float(fx[i]) for i in ids])
    # Rayleigh of the implied direction x: var(got) scales as x' C x
    # with the same scale factors on both sides of the ratio
    # x = argmax corr; reconstruct via least squares (v-mu) beta = got
    beta, *_ = np.linalg.lstsq(v - mu, got, rcond=None)
    beta /= np.linalg.norm(beta)
    rayleigh = beta @ cov @ beta
    assert rayleigh >= 0.9 * lam1, (rayleigh, lam1)


def test_pca_power_empty_input_raises(spark):
    import pytest as _pytest

    from greenbuttonengine_spark.extensions.embeddings import pca_power_fixed

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )
    with _pytest.raises(ValueError, match="empty input"):
        pca_power_fixed(empty)
