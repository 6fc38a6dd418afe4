"""Wave-26 invariants: held-out surprisal must equal a Python replay
that trains on the train split only, and OOV handling must floor at
count 1."""

from __future__ import annotations

import re
from collections import Counter


def _lcg_split(doc_id: int) -> str:
    b = ((doc_id % 2147483648) * 1103515245 + 12345) // 65536 % 10000
    return "val" if b < 500 else ("test" if b < 1000 else "train")


def test_heldout_surprisal_matches_bruteforce(spark, sf_dir):
    from greenbuttonengine_spark.plans import wave26_queries  # noqa: F401
    from greenbuttonengine_spark.plans.registry import QUERIES
    from greenbuttonengine_spark.sources.catalog import load_table

    rows = QUERIES["lm_heldout_surprisal"].fn(spark, sf_dir).collect()
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "text").collect()
    cf: Counter = Counter()
    val_docs = {}
    for d in docs:
        toks = [w for w in re.split(r"\s+", d.text.strip().lower()) if w]
        split = _lcg_split(d.doc_id)
        if split == "train":
            cf.update(toks)
        elif split == "val":
            val_docs[d.doc_id] = toks
    n_train = sum(cf.values())
    ilog2 = lambda x: x.bit_length() - 1  # noqa: E731

    got = {r.doc_id: r for r in rows}
    # every non-empty val doc scored, nothing else
    assert set(got) == {d for d, t in val_docs.items() if t}
    for doc_id, toks in val_docs.items():
        if not toks:
            continue
        r = got[doc_id]
        assert r.n_tokens == len(toks)
        assert r.n_oov == sum(1 for t in toks if t not in cf)
        want_bits = sum(ilog2(n_train) - ilog2(cf.get(t, 1)) for t in toks)
        assert r.sum_surprisal_bits == want_bits
        assert r.mean_surprisal_bits == want_bits / len(toks)
        # an OOV token contributes the maximum per-token surprisal
        if r.n_oov:
            assert r.sum_surprisal_bits >= r.n_oov  # strictly positive bits


def test_heldout_scores_oov_above_common(spark, tmp_path):
    """A val doc full of train-unseen tokens must out-surprise a val
    doc of train-common tokens (the property that makes this an eval,
    not a tautology)."""
    from pyspark.sql import Row

    from greenbuttonengine_spark.plans import wave26_queries  # noqa: F401
    from greenbuttonengine_spark.plans.registry import QUERIES

    # doc_ids chosen so the LCG puts them where the test needs them:
    # train docs supply counts; two val docs get scored
    train_ids = [i for i in range(200) if _lcg_split(i) == "train"][:8]
    val_ids = [i for i in range(200) if _lcg_split(i) == "val"][:2]
    assert len(val_ids) == 2
    rows = [
        Row(doc_id=i, text="the common words appear here often", lang="en",
            source="s", n_chars=10)
        for i in train_ids
    ]
    rows.append(Row(doc_id=val_ids[0], text="the common words appear",
                    lang="en", source="s", n_chars=10))
    rows.append(Row(doc_id=val_ids[1], text="xylo qwerty zonk blurf",
                    lang="en", source="s", n_chars=10))
    d = str(tmp_path / "sfho")
    spark.createDataFrame(rows).write.parquet(f"{d}/documents.parquet")
    got = {r.doc_id: r for r in
           QUERIES["lm_heldout_surprisal"].fn(spark, d).collect()}
    common, oov = got[val_ids[0]], got[val_ids[1]]
    assert common.n_oov == 0
    assert oov.n_oov == 4
    assert oov.mean_surprisal_bits > common.mean_surprisal_bits
