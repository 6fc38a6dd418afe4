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


def test_ngram_novelty_matches_python_reference(spark):
    """Seeded random corpus: per-doc novelty must equal a pure-Python
    reference computation exactly, and the conservation law must hold:
    sum(n_novel) over docs == number of distinct shingles in the
    corpus (every shingle is novel exactly once, in its min-doc_id
    doc)."""
    import random

    from pyspark.sql import Row

    from greenbuttonengine_spark.plans.wave5_queries import ngram_novelty

    rng = random.Random(0)
    vocab = [f"w{i}" for i in range(10)]
    docs = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 12))))
            for i in range(30)]

    def trigrams(text):
        ws = text.split()
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    first = {}
    for doc_id, text in docs:
        for s in sorted(trigrams(text)):
            first.setdefault(s, doc_id)
    expect = {}
    for doc_id, text in docs:
        sh = trigrams(text)
        expect[doc_id] = (len(sh), sum(1 for s in sh if first[s] == doc_id))

    got = {r.doc_id: (r.n_shingles, r.n_novel)
           for r in ngram_novelty(
               spark.createDataFrame([Row(doc_id=d, text=t) for d, t in docs])
           ).collect()}
    assert got == expect
    assert sum(n for _, n in got.values()) == len(first)


def test_contribution_bounding_planted(spark):
    import datetime

    from pyspark.sql import Row

    from greenbuttonengine_spark.plans.wave5_queries import agg_contribution_bounded

    base = datetime.datetime(2026, 1, 1)

    # user 1: 25 'view' events (value 1.0 each) then 2 'late' events —
    # the cap keeps the FIRST 20 views and drops both lates entirely;
    # user 2: 3 'view' events, all kept.
    rows = (
        [Row(event_id=i, ts=base + datetime.timedelta(minutes=i), user_id=1,
             event_type="view", value=1.0, props="{}") for i in range(25)]
        + [Row(event_id=100 + i, ts=base + datetime.timedelta(hours=1, minutes=i),
               user_id=1, event_type="late", value=5.0, props="{}")
           for i in range(2)]
        + [Row(event_id=200 + i, ts=base + datetime.timedelta(minutes=i),
               user_id=2, event_type="view", value=2.0, props="{}")
           for i in range(3)]
    )
    ev = spark.createDataFrame(rows)
    import tempfile, os
    d = tempfile.mkdtemp()
    ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {r.event_type: r for r in agg_contribution_bounded(spark, d).collect()}
    v = got["view"]
    assert (v.n_total, v.n_capped) == (28, 23)          # 20 of 25 + 3 of 3
    assert (v.sum_cents_total, v.sum_cents_capped) == (3100, 2600)
    assert v.kept_frac == 23 / 28
    late = got["late"]
    assert (late.n_total, late.n_capped, late.kept_frac) == (2, 0, 0.0)
    assert late.sum_cents_capped == 0


def test_pmi_collocations_planted(spark):
    from pyspark.sql import Row

    from greenbuttonengine_spark.plans.wave5_queries import pmi_collocations

    # "new york" always co-occurs (lift 12.0); "the" pairs with two
    # different words so its pairs have half the lift (6.0) despite
    # equal raw counts — PMI must rank the true phrase first.
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="new york") for i in range(5)]
        + [Row(doc_id=10 + i, text="the cat") for i in range(5)]
        + [Row(doc_id=20 + i, text="the dog") for i in range(5)]
    )
    # N=30 tokens, P=15 pairs; pmi(new york)=5*30^2/(15*5*5)=12.0;
    # pmi(cat the)=5*30^2/(15*5*10)=6.0 (pair is least/greatest order)
    rows = [(r.pair, r.n12, r.pmi_ratio, r.rank)
            for r in pmi_collocations(docs).collect()]
    assert rows == [
        ("new york", 5, 12.0, 1),
        ("cat the", 5, 6.0, 2),
        ("dog the", 5, 6.0, 3),
    ]


def test_wave5_queries_tolerate_empty_and_degenerate_docs(spark):
    """ANSI-mode hardening: empty corpus and degenerate docs (empty
    string, 1-2 word docs with no trigram) must yield empty/clean
    results, never DIVIDE_BY_ZERO / descending-sequence errors."""
    from pyspark.sql import Row

    from greenbuttonengine_spark.plans.wave5_queries import (
        bpe_pair_counts, doc_containment, ngram_novelty, pmi_collocations)

    empty = spark.createDataFrame([], "doc_id long, text string")
    for fn in (bpe_pair_counts, doc_containment, ngram_novelty,
               pmi_collocations):
        assert fn(empty).count() == 0, fn.__name__

    degen = spark.createDataFrame(
        [Row(doc_id=1, text=""), Row(doc_id=2, text="one"),
         Row(doc_id=3, text="two words")]
    )
    assert bpe_pair_counts(degen).count() >= 1      # "one"->on,ne ...
    assert doc_containment(degen).count() == 0      # no trigrams at all
    assert ngram_novelty(degen).count() == 0
    assert pmi_collocations(degen).count() == 0     # min_count 5 unmet


def test_repeated_substring_spans_planted(spark):
    """Two docs share a 60-char verbatim passage at different offsets:
    both must report exactly one span at the right position with
    span_chars == 60.  A within-doc self-repeat must NOT flag (the
    signal is cross-doc), nor must an unrelated doc."""
    from pyspark.sql import Row

    from greenbuttonengine_spark.extensions.dedup import repeated_substring_spans

    shared = ("the quick brown fox jumps over the lazy dog and then "
              "sits up")                      # exactly 60 chars
    assert len(shared) == 60
    inner = "".join(chr(ord("a") + (i * 7) % 26) for i in range(50))
    docs = spark.createDataFrame([
        Row(doc_id=1, text="x" * 10 + shared + "y" * 20),   # span at 11
        Row(doc_id=2, text="z" * 5 + shared + "w" * 30),    # span at 6
        Row(doc_id=3, text=inner + inner),                   # self-repeat only
        Row(doc_id=4, text="totally different content here " * 4),
    ])
    got = {(r.doc_id): (r.span_start, r.span_windows, r.span_chars)
           for r in repeated_substring_spans(docs, k=40, min_windows=5).collect()}
    assert got == {1: (11, 21, 60), 2: (6, 21, 60)}, got


def test_repeated_substring_spans_hashed_path_identical(spark):
    """The 100 TB hashed-window path must produce exactly the spans
    the raw-substring (oracle) path does."""
    from pyspark.sql import Row

    from greenbuttonengine_spark.extensions.dedup import repeated_substring_spans

    shared = ("the quick brown fox jumps over the lazy dog and then "
              "sits up")
    docs = spark.createDataFrame([
        Row(doc_id=1, text="x" * 10 + shared + "y" * 20),
        Row(doc_id=2, text="z" * 5 + shared + "w" * 30),
        Row(doc_id=3, text="totally different content here " * 4),
    ])
    raw = {tuple(r) for r in
           repeated_substring_spans(docs, k=40, min_windows=5).collect()}
    hashed = {tuple(r) for r in
              repeated_substring_spans(docs, k=40, min_windows=5,
                                       hashed=True).collect()}
    assert raw == hashed and raw


def test_trigram_consumers_hashed_path_identical(spark, sf_correct_dir):
    """The hashed word-trigram path (_word_trigram_shingles hashed=True,
    the declared scale form of dedup_doc_containment /
    corpus_ngram_novelty) must emit exactly the raw-string result on
    the real corpus."""
    from greenbuttonengine_spark.plans.wave5_queries import (
        doc_containment,
        ngram_novelty,
    )

    from greenbuttonengine_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_correct_dir)
    for fn, keys in ((doc_containment, ("doc_a", "doc_b", "containment")),
                     (ngram_novelty, ("doc_id", "novelty_frac"))):
        raw = {tuple(getattr(r, k) for k in keys)
               for r in fn(docs).collect()}
        hashed = {tuple(getattr(r, k) for k in keys)
                  for r in fn(docs, hashed=True).collect()}
        assert raw == hashed and raw, fn.__name__


def test_compression_ratio_orders_text_classes(spark):
    """Repetitive text must compress far below natural prose, and
    random bytes must barely compress; empty docs yield NULL (pandas
    NaN crosses Arrow as null) without aborting the stage."""
    import random
    import string

    from pyspark.sql import Row

    from greenbuttonengine_spark.extensions.textstats import compression_ratio

    rng = random.Random(4)
    docs = spark.createDataFrame([
        Row(doc_id=1, text="spam ham " * 200),
        Row(doc_id=2, text=("the quick brown fox jumps over the lazy dog "
                            "while autumn rain settles on the quiet roofs "
                            "of the sleeping town and distant hills ") * 10),
        Row(doc_id=3, text="".join(rng.choice(string.printable)
                                   for _ in range(1600))),
        Row(doc_id=4, text=""),
    ])
    got = {r.doc_id: r for r in compression_ratio(docs).collect()}
    assert got[1].compression_ratio < got[2].compression_ratio < got[3].compression_ratio
    assert got[1].compression_ratio < 0.05
    assert got[3].compression_ratio > 0.5
    assert got[4].compression_ratio is None and got[4].n_bytes == 0
    for r in got.values():
        if r.n_bytes:
            assert r.n_compressed > 0


import pytest


@pytest.mark.parametrize("seeded", [False, True])
def test_rag_index_retrieves_verbatim_duplicate(spark, seeded):
    """End-to-end index composition: a query chunk must retrieve the
    verbatim-identical chunk of ANOTHER doc at rank 1 with cosine 1.0
    and exact provenance (self-matches are excluded by the scorer) —
    on BOTH the MLlib k-means retriever and the seeded oracle-backed
    one (the r10 declared form)."""
    import random

    from pyspark.sql import Row

    from greenbuttonengine_spark.plans.wave5_queries import rag_index_and_query

    rng = random.Random(13)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "theta", "kappa"]
    base = " ".join(rng.choice(words) for _ in range(60))
    docs = spark.createDataFrame(
        [Row(doc_id=0, text=base), Row(doc_id=1, text=base)]  # verbatim pair
        + [Row(doc_id=2 + i,
               text=" ".join(rng.choice(words) for _ in range(60)))
           for i in range(10)]
    )
    hits = rag_index_and_query(docs, n_queries=2, k=3, n_centroids=4,
                               n_probe=4, seeded=seeded).collect()
    top = {r.query_id: r for r in hits if r.rank == 1}
    # query = doc 0 chunk 0 (vec 0) must hit doc 1 chunk 0 (vec 2^20)
    v1 = 1 << 20
    assert top[0].neighbor_id == v1 and abs(top[0].cosine - 1.0) < 1e-9
    assert (top[0].hit_doc_id, top[0].hit_chunk_id) == (1, 0)
    assert top[v1].neighbor_id == 0 and abs(top[v1].cosine - 1.0) < 1e-9


def test_bootstrap_ci_statistical_sanity(spark):
    """The CI must bracket the point estimate, and a 16x-smaller
    stratum must get a wider interval (~1/sqrt(n) scaling, allowing
    generous slack).  The Poisson weight draw matches the pure-Python
    LCG/inverse-CDF reference exactly."""
    import datetime
    import os
    import random
    import tempfile

    from pyspark.sql import Row

    from greenbuttonengine_spark.plans.wave5_queries import (
        _BOOT_B, _POIS_T, stats_bootstrap_ci_events)

    rng = random.Random(21)
    base = datetime.datetime(2026, 1, 1)

    def ev(i, etype, val):
        return Row(event_id=i, ts=base, user_id=1, event_type=etype,
                   value=val, props="{}")

    rows = ([ev(i, "big", rng.gauss(50.0, 10.0)) for i in range(3200)]
            + [ev(10_000 + i, "small", rng.gauss(50.0, 10.0))
               for i in range(200)])
    d = tempfile.mkdtemp()
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet"))
    got = {r.event_type: r for r in
           stats_bootstrap_ci_events(spark, d).collect()}
    for r in got.values():
        assert r.ci_lo_cents < r.mean_cents < r.ci_hi_cents, r
    w_big = got["big"].ci_hi_cents - got["big"].ci_lo_cents
    w_small = got["small"].ci_hi_cents - got["small"].ci_lo_cents
    assert w_small > 2.0 * w_big, (w_small, w_big)  # sqrt(16)=4, slack 2

    # weight draw == pure-Python reference
    from pyspark.sql import functions as F

    from greenbuttonengine_spark.extensions.sampling import hash_bucket

    def py_weight(key):
        u = (((key % 2147483648) * 1103515245 + 12345) >> 16) % 10000
        for k, t in enumerate(_POIS_T):
            if u < t:
                return k
        return 7

    keys = [0, 1, 99, 12345, 2**40 + 7]
    df = spark.createDataFrame([(k,) for k in keys], "key long")
    u = hash_bucket(F.col("key"), 10000)
    wt = F.lit(7)
    for k in range(len(_POIS_T) - 1, -1, -1):
        wt = F.when(u < _POIS_T[k], F.lit(k)).otherwise(wt)
    got_w = {r.key: r.w for r in df.select("key", wt.alias("w")).collect()}
    assert got_w == {k: py_weight(k) for k in keys}


def test_curation_v2_each_gate_fires(spark, tmp_path):
    """Planted corpus where each gate drops exactly its target: a
    verbatim re-post falls to the novelty floor, a quoted-inside doc
    falls to containment, punctuation junk falls to quality — the
    survivors make the mix table."""
    import os

    from pyspark.sql import Row

    from greenbuttonengine_spark.plans.wave5_queries import pipeline_curation_v2

    good = ("analysis of the weekly report shows steady growth across "
            "all regions with notable gains in the northern markets "
            "and continued expansion of the service tier")
    bigger = good + (" further commentary repeats the conclusions with "
                     "extra context about seasonal variation in demand")

    def doc(i, text, lang="en"):
        return Row(doc_id=i, text=text, lang=lang, source="s",
                   n_chars=len(text))

    fresh = ("fresh unrelated prose about gardens rivers and the "
             "quiet architecture of small mountain towns in autumn")
    # mosaic of doc 1's and doc 5's halves: nearly every trigram was
    # first seen in a LOWER-id doc (novelty ~ seam-only < 0.3), yet
    # neither source contains >= 80% of it (containment ~ 0.5 each)
    mosaic = " ".join(bigger.split()[:14] + fresh.split()[:9])
    rows = [
        doc(1, bigger),          # keeps (novel, not contained, quality ok)
        doc(2, good),            # CONTAINED in doc 1 -> dropped
        doc(4, "!!! ??? ;;; ,,, ... !!! ??? ;;; ,,, ..."),  # quality drop
        doc(5, fresh, lang="fr"),  # keeps
        doc(6, mosaic),          # novelty floor -> dropped
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet"))
    got = {r.lang: r for r in pipeline_curation_v2(spark, d).collect()}
    assert got["en"].n_docs == 1 and got["fr"].n_docs == 1, got
    assert abs(got["en"].share - 0.5) < 1e-12
    assert got["en"].total_chars == len(bigger)
