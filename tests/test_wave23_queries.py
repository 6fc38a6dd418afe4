"""Wave-23 invariants: the eval/audit tier must agree with
brute-force Python replays and hold its structural guarantees
(one-sided CMS error, telescoping PPS pick counts, TVD bounds)."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pytest

_P = (1 << 31) - 1


def _md5_32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % _P


def test_cms_matches_bruteforce_and_overestimates(spark, tmp_path):
    from pyspark.sql import Row

    from greenbuttonengine_spark.extensions.dedup import lcg_perm_params
    from greenbuttonengine_spark.plans import wave23_queries as w23
    from greenbuttonengine_spark.plans.registry import QUERIES

    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "a cat and a dog and a cat",
        "the the the end",
    ]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
         for i, t in enumerate(texts)]
    )
    d = str(tmp_path / "sfcms")
    docs.write.parquet(f"{d}/documents.parquet")
    got = {r.token: r for r in
           QUERIES["approx_cms_heavy_hitters"].fn(spark, d).collect()}

    # brute-force replay with the same hash family
    counts = Counter()
    for t in texts:
        counts.update(re.split(r"\s+", t.strip().lower()))
    params = lcg_perm_params(w23._CMS_D, seed=w23._CMS_SEED)
    ctr: Counter = Counter()
    for tok, n in counts.items():
        h0 = _md5_32(tok)
        for r, (a, b) in enumerate(params):
            ctr[(r, ((a * h0 + b) % _P) % w23._CMS_W)] += n
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[: w23._CMS_TOPK]
    assert set(got) == {tok for tok, _ in top}
    for tok, n in top:
        h0 = _md5_32(tok)
        est = min(
            ctr[(r, ((a * h0 + b) % _P) % w23._CMS_W)]
            for r, (a, b) in enumerate(params)
        )
        row = got[tok]
        assert row.n_exact == n
        assert row.cms_estimate == est
        assert row.cms_estimate >= row.n_exact  # one-sided error, always
        assert row.overcount == est - n


def test_systematic_pps_exactly_k_per_stratum(spark, sf_dir):
    """The floor-crossing counts telescope: every language stratum
    yields exactly K picks, each doc at most once per stride span."""
    from greenbuttonengine_spark.plans import wave23_queries as w23
    from greenbuttonengine_spark.plans.registry import QUERIES
    from greenbuttonengine_spark.sources.catalog import load_table

    rows = QUERIES["sample_systematic_pps"].fn(spark, sf_dir).collect()
    assert rows
    per_lang: Counter = Counter()
    for r in rows:
        assert r.n_picks >= 1
        per_lang[r.lang] += r.n_picks
    langs = {
        r.lang for r in load_table(spark, "documents", sf_dir)
        .select("lang").distinct().collect()
    }
    assert set(per_lang) == langs
    assert all(v == w23._PPS_K for v in per_lang.values()), per_lang

    # replay the traversal order + floor crossings in Python
    docs = load_table(spark, "documents", sf_dir).select(
        "lang", "doc_id", "n_chars").collect()
    by_lang: dict[str, list] = {}
    for r in docs:
        by_lang.setdefault(r.lang, []).append(r)
    want = {}
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: (r.doc_id % w23._PPS_B, r.doc_id))
        tw = sum(max(r.n_chars, 1) for r in rs)
        cum = 0
        for r in rs:
            w = max(r.n_chars, 1)
            picks = (cum + w) * w23._PPS_K // tw - cum * w23._PPS_K // tw
            cum += w
            if picks > 0:
                want[(lang, r.doc_id)] = (w, cum, picks)
    got = {(r.lang, r.doc_id): (r.weight, r.cum_weight, r.n_picks) for r in rows}
    assert got == want


def test_minhash_precision_exact_jaccard_planted(spark, tmp_path):
    """exact_jaccard must equal the Python shingle-set Jaccard for
    every candidate pair, and the planted near-identical pair must be
    a candidate flagged is_true_dup."""
    from pyspark.sql import Row

    from greenbuttonengine_spark.plans import wave23_queries as w23
    from greenbuttonengine_spark.plans.registry import QUERIES

    base = "the quick brown fox jumps over the lazy dog " * 8
    # the near-dup is planted at ids (0, 3): the declared query keeps a
    # deterministic LCG sample of candidate PAIRS, and (0, 3) is in the
    # kept set while e.g. (0, 1) is not — the planted pair must both
    # band-collide AND survive the sample to appear
    texts = [
        base,
        "completely different content about spark engines " * 8,
        "unrelated third document with its own words " * 8,
        base + "tail",  # near-identical to doc 0
    ]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
         for i, t in enumerate(texts)]
    )
    d = str(tmp_path / "sfmp")
    docs.write.parquet(f"{d}/documents.parquet")
    rows = QUERIES["eval_minhash_precision"].fn(spark, d).collect()
    assert rows

    def hset(t: str) -> set:
        k = w23._MP_K
        return {_md5_32(t[i:i + k]) for i in range(max(len(t) - k + 1, 1))}

    def pair_sampled(ia: int, ib: int) -> bool:
        mixed = ((ia * 100003 + ib) % 2147483648) * 1103515245 + 12345
        return (mixed >> 16) % 10000 < w23._MP_SAMPLE_BP

    assert pair_sampled(0, 3) and not pair_sampled(0, 1)
    sets = [hset(t) for t in texts]
    got = {(r.id_a, r.id_b): r for r in rows}
    assert (0, 3) in got, "planted near-dup pair not a candidate"
    for (ia, ib), r in got.items():
        assert pair_sampled(ia, ib), "unsampled pair leaked into the eval"
        inter = len(sets[ia] & sets[ib])
        union = len(sets[ia] | sets[ib])
        assert r.n_inter == inter
        assert r.n_union == union
        assert r.exact_jaccard == inter / union
        assert r.is_true_dup == (inter / union >= w23._MP_TRUE_J)
    assert got[(0, 3)].is_true_dup


def test_assoc_rules_match_bruteforce(spark, sf_dir):
    from greenbuttonengine_spark.plans import wave23_queries as w23
    from greenbuttonengine_spark.plans.registry import QUERIES
    from greenbuttonengine_spark.sources.catalog import load_table

    rows = QUERIES["assoc_rules_events"].fn(spark, sf_dir).collect()
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_type").collect()
    per_user: dict[int, set] = {}
    for r in ev:
        per_user.setdefault(r.user_id, set()).add(r.event_type)
    n_users = len(per_user)
    n_t: Counter = Counter()
    n_ab: Counter = Counter()
    for types in per_user.values():
        for t in types:
            n_t[t] += 1
        ts = sorted(types)
        for i in range(len(ts)):
            for j in range(i + 1, len(ts)):
                n_ab[(ts[i], ts[j])] += 1
    want = {k: v for k, v in n_ab.items() if v >= w23._AR_MIN_AB}
    got = {(r.ant, r.cons): r for r in rows}
    assert set(got) == set(want)
    for (a, b), r in got.items():
        assert r.n_both == want[(a, b)]
        assert r.n_ant == n_t[a] and r.n_cons == n_t[b]
        assert r.n_users == n_users
        assert r.support == r.n_both / n_users
        assert r.confidence == r.n_both / n_t[a]
        assert r.lift == (r.n_both * n_users) / (n_t[a] * n_t[b])
        # lift > 1 iff co-occurrence beats independence
        assert (r.lift > 1) == (r.n_both / n_users > (n_t[a] / n_users) *
                                (n_t[b] / n_users))


def test_quality_calibration_partitions_corpus(spark, sf_dir):
    """Bins partition the scored corpus; counts and fractions must
    replay exactly from the fixed-point scores."""
    from greenbuttonengine_spark.extensions.quality_model import (
        fixed_point_quality,
    )
    from greenbuttonengine_spark.plans.registry import QUERIES
    from greenbuttonengine_spark.sources.catalog import load_table

    rows = QUERIES["eval_quality_calibration"].fn(spark, sf_dir).collect()
    scored = fixed_point_quality(
        load_table(spark, "documents", sf_dir)).collect()

    def mbin(m: int) -> int:
        # sign(m) * (ilog2(|m|) + 1); bin 0 reserved for margin 0, so
        # margins -1 / +1 land in bins -1 / +1 (sign preserved)
        if m == 0:
            return 0
        return m.bit_length() if m > 0 else -((-m).bit_length())

    want: dict[int, list] = {}
    for r in scored:
        want.setdefault(mbin(r.quality_score), []).append(r)
    got = {r.margin_bin: r for r in rows}
    assert set(got) == set(want)
    assert sum(r.n_docs for r in rows) == len(scored)
    for b, rs in want.items():
        g = got[b]
        assert g.n_docs == len(rs)
        assert g.n_weak_pos == sum(r.weak_label for r in rs)
        assert g.n_keep == sum(1 for r in rs if r.quality_keep)
        assert g.frac_weak_pos == g.n_weak_pos / g.n_docs
        assert g.min_margin == min(r.quality_score for r in rs)
        assert g.max_margin == max(r.quality_score for r in rs)
        # every margin in the bin must actually fall in the bin
        assert all(mbin(r.quality_score) == b for r in rs)


def test_drift_tvd_invariants_and_bruteforce(spark, sf_dir):
    from greenbuttonengine_spark.plans import wave23_queries as w23
    from greenbuttonengine_spark.plans.registry import QUERIES
    from greenbuttonengine_spark.sources.catalog import load_table

    rows = QUERIES["drift_tvd_sources"].fn(spark, sf_dir).collect()
    docs = load_table(spark, "documents", sf_dir).select(
        "source", "n_chars").collect()
    binof = lambda n: min(max(n, 0) // w23._TVD_BIN_W, w23._TVD_MAX_BIN)  # noqa: E731
    cnt: Counter = Counter()
    for r in docs:
        cnt[(r.source, binof(r.n_chars))] += 1
    src_tot: Counter = Counter()
    bin_tot: Counter = Counter()
    for (s, b), n in cnt.items():
        src_tot[s] += n
        bin_tot[b] += n
    n_all = sum(cnt.values())

    by_src: dict[str, float] = {}
    for r in rows:
        n_src = src_tot[r.source]
        n_rest = n_all - n_src
        nsb = cnt.get((r.source, r.bin), 0)
        nrb = bin_tot[r.bin] - nsb
        assert r.n_src_bin == nsb
        assert r.n_rest_bin == nrb
        assert r.abs_scaled == abs(nsb * n_rest - nrb * n_src)
        assert r.tvd_contrib == pytest.approx(
            r.abs_scaled / (2.0 * n_src * n_rest), abs=0.0
        )
        by_src[r.source] = by_src.get(r.source, 0.0) + r.tvd_contrib
    # TVD is a metric in [0, 1]; the grid covers every populated bin
    assert set(by_src) == set(src_tot)
    for s, tvd in by_src.items():
        assert 0.0 <= tvd <= 1.0, (s, tvd)
    bins_per_src = Counter(r.source for r in rows)
    assert len(set(bins_per_src.values())) == 1  # full source x bin grid
