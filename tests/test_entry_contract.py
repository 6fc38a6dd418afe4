"""Smoke tests for the driver contract (__spark_entry__)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert "sum_qty" in df.columns


def test_queries_and_oracles_aligned():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 40
    # every oracle key must have a query
    assert set(oracles) <= set(qs)


def test_each_query_runs_smoke(spark, sf_dir):
    qs = entrymod.queries()
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        assert df.schema is not None, name
        assert df.limit(1).count() >= 0, name
