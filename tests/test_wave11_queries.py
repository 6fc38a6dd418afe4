"""Planted/invariant tests for the round-9 wave-11 batch: the
data-constrained epoch scheduler and prefix-sharing analysis."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_pipeline_epoch_schedule_waterfill(spark, sf_dir):
    from greenbuttonengine_spark.plans.wave11_queries import (
        pipeline_epoch_schedule,
    )

    rows = pipeline_epoch_schedule(spark, sf_dir).collect()
    assert rows
    total = sum(r.toks for r in rows)
    budget = 2 * total
    spent = sum(r.alloc_tokens for r in rows)
    # allocation respects the budget and uses nearly all of it
    # (bisection resolves lambda to ~4e-6 -> slack < n_sources + B*4e-6)
    assert spent <= budget
    assert spent >= budget - len(rows) - budget // 100000 - sum(
        r.cap_epochs for r in rows
    )
    saturated = unsaturated_rates = 0
    rates = []
    for r in rows:
        cap = 1 + _md5_60(f"cap:{r.source_key}") % 4
        assert r.cap_epochs == cap
        assert 0 <= r.alloc_tokens <= cap * r.toks
        assert r.epochs_ppm == r.alloc_tokens * 1000000 // r.toks
        if r.alloc_tokens == cap * r.toks:
            saturated += 1
        else:
            rates.append(r.epochs_ppm)
    # waterfill shape: capped sources saturate; every unsaturated
    # source repeats at (nearly) the same common rate
    assert saturated > 0
    if rates:
        # every unsaturated source repeats at the common lambda rate up
        # to the integer floors: alloc = (lambda*toks)>>20 loses < 1
        # token and epochs_ppm floors once more -> per-source deviation
        # is bounded by 1e6/toks + 1 ppm
        min_toks = min(r.toks for r in rows)
        assert max(rates) - min(rates) <= 1000000 // min_toks + 2
        # the common rate exceeds every saturated cap's epoch count
        # only when that cap bound (not the rate) was the binder
        assert min(rates) > 1000000  # budget 2x => rate > 1 epoch


def test_corpus_prefix_sharing_replay(spark, sf_dir):
    from greenbuttonengine_spark.plans.wave11_queries import (
        corpus_prefix_sharing,
    )

    rows = {r.prefix_len: r for r in corpus_prefix_sharing(spark, sf_dir).collect()}
    assert set(rows) == {8, 16, 32}
    docs = [
        r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .collect()
    ]
    for L, r in rows.items():
        groups: dict[str, int] = {}
        for t in docs:
            if len(t) >= L:
                groups[t[:L]] = groups.get(t[:L], 0) + 1
        assert r.n_docs == sum(groups.values())
        assert r.n_prefixes == len(groups)
        assert r.n_shared_docs == sum(n for n in groups.values() if n > 1)
        assert r.cacheable_chars == sum(
            (n - 1) * L for n in groups.values() if n > 1
        )
    # longer prefixes can only shrink sharing
    assert rows[8].n_shared_docs >= rows[16].n_shared_docs >= rows[32].n_shared_docs
