"""Round-11 additions: batch-parity oracle row for the streaming
interval join, trained-PQ residual encoding, CLI fast path."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_attribution_interval_join_replays_static_join(spark, sf_dir):
    """The declared batch form (which calls the PRODUCTION streaming
    function on batch frames) equals an independently-built static
    time-range join, row for row, with exact delay accounting."""
    from greenbuttonengine_spark.plans.wave20_queries import (
        attribution_interval_join)
    from greenbuttonengine_spark.sources.catalog import load_table

    got = {
        (r.key, r.l_id, r.r_id, r.delay_sec)
        for r in attribution_interval_join(spark, sf_dir).collect()
    }

    ev = load_table(spark, "events", sf_dir)
    imps = ev.filter(F.col("event_type") == "view").selectExpr(
        "user_id k", "event_id i_id", "ts i_ts")
    convs = ev.filter(F.col("event_type") == "purchase").selectExpr(
        "user_id ck", "event_id c_id", "ts c_ts")
    want = {
        (r.k, r.i_id, r.c_id,
         (r.c_ts - r.i_ts).total_seconds())
        for r in imps.join(
            convs,
            (imps.k == convs.ck)
            & (convs.c_ts >= imps.i_ts)
            & (convs.c_ts <= F.expr("i_ts + INTERVAL 60 minutes")),
        ).collect()
    }
    assert want, "corpus has no view->purchase pairs within the window"
    assert got == want
    assert all(0 <= d <= 3600 for *_, d in got)


def test_bpe_tokenize_stats_degenerate_lang_parity(spark):
    """A lang whose docs ALL tokenize to zero tokens (empty /
    whitespace-only text) must produce IDENTICAL rows on both engines:
    total_tokens 0 (not NULL), chars_per_token NULL (not NaN/inf) —
    the r10 ADVICE degenerate case."""
    import duckdb
    import math
    import pandas as pd

    from greenbuttonengine_spark.extensions.bpe import (
        bpe_tokenize, bpe_tokenize_stats_oracle_sql, bpe_train)
    from pyspark.sql import functions as F

    rows = [
        (0, "aa bb aa bb", "en", 11),
        (1, "aa aa bb", "en", 8),
        (2, "", "zz", 0),          # degenerate lang: no tokens at all
        (3, "   ", "zz", 3),       # whitespace-only still has chars
    ]
    cols = ["doc_id", "text", "lang", "n_chars"]
    sdf = spark.createDataFrame(rows, "doc_id long, text string, "
                                      "lang string, n_chars long")
    merges, _ = bpe_train(sdf, n_merges=4)
    toks = bpe_tokenize(sdf, merges)
    got = {
        r.lang: (r.n_docs, r.total_tokens, r.chars_per_token)
        for r in sdf.select("doc_id", "lang", "n_chars")
        .join(toks, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.when(
                F.sum("n_tokens") > 0,
                F.sum("n_chars").cast("double")
                / F.sum("n_tokens").cast("double"),
            ).alias("chars_per_token"),
        )
        .collect()
    }
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=cols))
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            bpe_tokenize_stats_oracle_sql(n_merges=4)).fetchall()
    }
    assert set(got) == {"en", "zz"}
    assert got["zz"] == (2, 0, None), got["zz"]
    for lang in got:
        g, w = got[lang], want[lang]
        assert g[:2] == w[:2], (lang, g, w)
        if g[2] is None or w[2] is None:
            assert g[2] == w[2], (lang, g, w)
        else:
            assert not math.isnan(g[2]) and g[2] == w[2], (lang, g, w)
