"""BPE tokenizer training: the Spark merge loop must reproduce an
independent pure-Python Sennrich implementation (same tie-break)
exactly — merges AND final segmentations."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Row


def py_bpe(vocab_counts, n_merges, min_pair_count=2):
    """Reference Sennrich BPE: vocab as {word: count}; ties break
    (count desc, pair asc)."""
    vocab = {tuple(w): c for w, c in vocab_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merges.append((a, b, cnt))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges, vocab


def test_bpe_train_matches_python_reference(spark):
    import random

    from greenbuttonengine_spark.extensions.bpe import bpe_train

    rng = random.Random(17)
    words = ["low", "lower", "newest", "widest", "newer", "widely",
             "lowest", "news", "wide", "nest"]
    corpus = [rng.choice(words) for _ in range(300)]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=w) for i, w in enumerate(corpus)])

    merges, vocab = bpe_train(docs, n_merges=12)
    counts = Counter(corpus)
    ref_merges, ref_vocab = py_bpe(counts, 12)
    assert merges == ref_merges

    got_seg = {r.word: tuple(r.syms.split()) for r in vocab.collect()}
    ref_seg = {}
    for syms, c in ref_vocab.items():
        ref_seg["".join(syms)] = syms
    assert got_seg == ref_seg


def test_bpe_classic_example_and_merge_table(spark):
    from greenbuttonengine_spark.extensions.bpe import bpe_merge_table

    corpus = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=w) for i, w in enumerate(corpus)])
    rows = [(r.step, r.merged, r.weighted_count)
            for r in bpe_merge_table(docs, n_merges=4).collect()]
    # greedy order on this vocabulary: es(9), est(9), lo(7), low(7)
    assert rows == [(1, "es", 9), (2, "est", 9), (3, "lo", 7), (4, "low", 7)]


def test_bpe_overlapping_run_merges_greedily(spark):
    """'a a a a' must merge left-to-right: (aa)(aa), then (aaaa) —
    the literal-replace implementation matches greedy BPE on runs."""
    from greenbuttonengine_spark.extensions.bpe import bpe_train

    docs = spark.createDataFrame([Row(doc_id=i, text="aaaa")
                                  for i in range(3)])
    merges, vocab = bpe_train(docs, n_merges=3)
    assert [(m[0], m[1]) for m in merges] == [("a", "a"), ("aa", "aa")]
    assert vocab.collect()[0].syms.strip() == "aaaa"


def test_bpe_metacharacter_symbols(spark):
    """Symbols containing regex/replacement metacharacters ($, \\, .)
    must merge correctly — the pattern is \\Q-quoted and the
    replacement escaped."""
    from pyspark.sql import Row

    from greenbuttonengine_spark.extensions.bpe import bpe_train

    docs = spark.createDataFrame([Row(doc_id=i, text="$5.")
                                  for i in range(4)])
    merges, vocab = bpe_train(docs, n_merges=2)
    assert [(m[0], m[1]) for m in merges] == [("$", "5"), ("$5", ".")]
    assert vocab.collect()[0].syms.strip() == "$5."


def test_bpe_tokenize_matches_trained_segmentation(spark):
    """Applying the learned merges to the TRAINING corpus must
    reproduce exactly the segmentation training ended with, word for
    word — train/apply consistency (the tokenizer-shipping contract)."""
    import random

    from greenbuttonengine_spark.extensions.bpe import bpe_tokenize, bpe_train

    rng = random.Random(23)
    words = ["low", "lower", "newest", "widest", "newer", "wide"]
    corpus = [" ".join(rng.choice(words) for _ in range(5))
              for _ in range(40)]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(corpus)])
    merges, vocab = bpe_train(docs, n_merges=8)
    seg = {r.word: r.syms.split() for r in vocab.collect()}

    out = {r.doc_id: list(r.tokens)
           for r in bpe_tokenize(docs, merges).collect()}
    for i, text in enumerate(corpus):
        expect = [t for w in text.split() for t in seg[w]]
        assert out[i] == expect, (i, out[i], expect)


def test_bpe_local_loop_matches_spark_loop(spark):
    """The scale-shaped driver-local merge loop (bpe_train) and the
    all-Spark r5 loop (bpe_train_spark_loop) must learn identical
    merge sequences and segmentations — the cross-check that lets the
    local loop own the training path."""
    import random

    from greenbuttonengine_spark.extensions.bpe import (
        bpe_train,
        bpe_train_spark_loop,
    )

    rng = random.Random(41)
    words = ["low", "lower", "newest", "widest", "est", "blow",
             "widely", "news", "lowly", "wider"]
    corpus = [" ".join(rng.choice(words) for _ in range(4))
              for _ in range(120)]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(corpus)])

    merges_local, vocab_local = bpe_train(docs, n_merges=10)
    merges_spark, vocab_spark = bpe_train_spark_loop(docs, n_merges=10)
    assert merges_local == merges_spark
    seg_local = {r.word: r.syms.split() for r in vocab_local.collect()}
    seg_spark = {r.word: r.syms.split() for r in vocab_spark.collect()}
    assert seg_local == seg_spark


def test_bpe_many_merges_incremental_vs_reference(spark):
    """300 merges over a synthetic 60-word weighted vocab: the
    incremental lazy-heap loop must track the O(vocab)-per-merge
    reference exactly (this is where stale-heap or delta-accounting
    bugs would surface)."""
    import random

    from greenbuttonengine_spark.extensions.bpe import (
        _merge_loop_local_incremental,
    )

    rng = random.Random(7)
    alpha = "abcdef"
    vocab_counts = []
    seen = set()
    while len(vocab_counts) < 60:
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(3, 12)))
        if w in seen:
            continue
        seen.add(w)
        vocab_counts.append((tuple(w), rng.randint(1, 50)))

    merges, seg = _merge_loop_local_incremental(vocab_counts, 300, 1)
    ref_merges, ref_vocab = py_bpe(
        {"".join(s): c for s, c in vocab_counts}, 300, 1)
    assert merges == ref_merges
    ref_seg = {"".join(s): s for s in ref_vocab}
    assert seg == ref_seg


def test_tokenize_stats_lookup_matches_regex_chain(spark):
    """r16 twin: lm_bpe_tokenize_stats now tokenizes by joining the
    trained vocabulary segmentation instead of replaying the merge
    regex program per word occurrence.  Pin the per-lang stats of the
    lookup form against a recomputation through bpe_tokenize (the
    regex-chain form) on the sf0.001 corpus — identical rows."""
    from pyspark.sql import functions as F

    from greenbuttonengine_spark.extensions.bpe import bpe_tokenize, bpe_train
    from greenbuttonengine_spark.plans.wave5_queries import lm_bpe_tokenize_stats
    from greenbuttonengine_spark.sources.catalog import load_table

    sf_dir = "/root/testdata/sf0.001"
    docs = load_table(spark, "documents", sf_dir)
    merges, _ = bpe_train(docs, n_merges=20)
    toks = bpe_tokenize(docs, merges)
    old = (
        docs.select("doc_id", "lang", "n_chars")
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
    )
    new = lm_bpe_tokenize_stats(spark, sf_dir)
    key = lambda r: r.lang  # noqa: E731
    old_rows = sorted(old.collect(), key=key)
    new_rows = sorted(new.collect(), key=key)
    assert [r.asDict() for r in old_rows] == [r.asDict() for r in new_rows]
