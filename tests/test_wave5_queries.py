"""Wave-5 planted-corpus tests: BPE pair counts, containment dedup,
n-gram novelty, file-layout report.  Planted tests pin INTENT; the
DuckDB oracle gate pins cross-engine agreement."""

from __future__ import annotations

from pyspark.sql import Row


def test_bpe_pair_counts_planted(spark):
    from greenbuttonengine_spark.plans.wave5_queries import bpe_pair_counts

    # "abab" -> pairs ab, ba, ab; "ab" -> ab.  Totals: ab=3, ba=1.
    # The 1-char word "x" contributes nothing (length >= 2 filter).
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="abab ab"), Row(doc_id=2, text="x")]
    )
    rows = [(r.pair, r.n, r.rank) for r in bpe_pair_counts(docs).collect()]
    assert rows == [("ab", 3, 1), ("ba", 1, 2)]


def test_bpe_pair_counts_tie_break_is_lexicographic(spark):
    from greenbuttonengine_spark.plans.wave5_queries import bpe_pair_counts

    # "cd" and "ab" both appear once: equal n must order by pair asc.
    docs = spark.createDataFrame([Row(doc_id=1, text="cd ab")])
    rows = [(r.pair, r.rank) for r in bpe_pair_counts(docs).collect()]
    assert rows == [("ab", 1), ("cd", 2)]


def test_doc_containment_is_asymmetric(spark):
    from greenbuttonengine_spark.plans.wave5_queries import doc_containment

    # doc 1's trigram set ("p q r","q r s","r s t") is fully inside
    # doc 2 (which has 8 trigrams): containment(1 in 2) = 3/3 = 1.0,
    # but containment(2 in 1) = 3/8 < 0.8 — only the ordered pair
    # (1, 2) may appear.  doc 3 shares nothing.
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="p q r s t"),
            Row(doc_id=2, text="p q r s t u v w x y"),
            Row(doc_id=3, text="zz yy xx ww vv"),
        ]
    )
    got = {(r.doc_a, r.doc_b): (r.n_shared, r.sz_a, r.containment)
           for r in doc_containment(docs).collect()}
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] == (3, 3, 1.0)


def test_doc_containment_df_cap_drops_boilerplate(spark):
    from greenbuttonengine_spark.plans.wave5_queries import doc_containment

    # The trigram "the same line" appears in ALL four docs; with
    # df_cap=2 it is boilerplate and carries no containment evidence,
    # so docs sharing ONLY it must not pair.  Docs 1/2 additionally
    # share their informative tail and must still pair both ways
    # (equal capped sizes -> containment 1.0 in both directions).
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the same line aa bb cc"),
            Row(doc_id=2, text="the same line aa bb cc"),
            Row(doc_id=3, text="the same line qq rr ss"),
            Row(doc_id=4, text="the same line mm nn oo"),
        ]
    )
    got = {(r.doc_a, r.doc_b) for r in doc_containment(docs, df_cap=2).collect()}
    assert got == {(1, 2), (2, 1)}


def test_ngram_novelty_planted(spark):
    from greenbuttonengine_spark.plans.wave5_queries import ngram_novelty

    # doc 1 introduces "a b c","b c d" (novelty 1.0); doc 2 repeats
    # doc 1 verbatim (novelty 0.0); doc 3 repeats one trigram and
    # introduces one ("c d e") -> 0.5.
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d"),
            Row(doc_id=2, text="a b c d"),
            Row(doc_id=3, text="b c d e"),
        ]
    )
    got = {r.doc_id: (r.n_shingles, r.n_novel, r.novelty_frac)
           for r in ngram_novelty(docs).collect()}
    assert got[1] == (2, 2, 1.0)
    assert got[2] == (2, 0, 0.0)
    assert got[3] == (2, 1, 0.5)


def test_file_layout_report_consistent(spark, sf_dir):
    import __spark_entry__ as entry

    q = entry.queries()["ops_file_layout_report"]
    row = q(spark, sf_dir).collect()[0]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert row.total_rows == li.count()
    assert row.n_files >= 1
    assert 0 < row.min_rows_per_file <= row.max_rows_per_file
    assert row.global_min_key <= row.global_max_key
    assert 0 <= row.small_files <= row.n_files


def test_knn_classify_planted_clusters(spark):
    from greenbuttonengine_spark.plans.wave5_queries import knn_classify

    # two well-separated clusters of 6 in R^4; vec 100 sits in the
    # label-0 cluster but is labelled 1 (a planted label error): its
    # neighbors all vote 0, so label 1 scores 0/1 while every other
    # vector's neighborhood agrees with its label.
    def v(base, i):
        out = [0.0, 0.0, 0.0, 0.0]
        out[base] = 10.0
        out[3] = float(i % 3)  # small within-cluster spread
        return out

    rows = (
        [(i, v(0, i), 0) for i in range(6)]
        + [(10 + i, v(1, i), 1) for i in range(6)]
        + [(100, v(0, 1), 1)]
    )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    got = {r.label: (r.n, r.n_correct, r.accuracy)
           for r in knn_classify(emb, k=3).collect()}
    assert got[0] == (6, 6, 1.0)
    # label 1 has 7 members; the planted mislabel is predicted 0
    assert got[1] == (7, 6, 6 / 7)
