"""Deterministic sampling operators for training-data mixing.

A 100 TB corpus is never used whole: training mixes draw per-stratum
rates (by language, quality band, source).  These samplers are
DETERMINISTIC — membership is a pure function of the row key, not an
RNG stream — so re-runs, backfills, and cross-engine audits select the
same rows (the property ``df.sample()`` cannot give you across engines
or even across partition layouts).

  hash_bucket          key -> stable bucket in [0, buckets)
  sample_stratified    per-stratum keep-rates via key bucketing

Bucketing is an LCG mix kept strictly inside non-overflowing BIGINT
range ((key % 2^31) * 1103515245 + 12345 < 2^62), discarding the weak
low 16 bits — chosen over 64-bit multiplicative hashing because engines
disagree on i64 overflow (Spark wraps, DuckDB raises), and a sampler's
value is exactly its cross-engine reproducibility.  Validated
bit-identical Spark vs DuckDB at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 10_000


def hash_bucket(key: Column, buckets: int = _BUCKETS) -> Column:
    """Stable pseudo-uniform bucket in [0, buckets) from an integer key.

    All-integer arithmetic (the mix never exceeds 2^62, and the /65536
    is a shift) — float division would round: 2^62 doesn't fit a
    double's 53-bit mantissa."""
    mixed = F.pmod(key.cast("long"), F.lit(2147483648)) * F.lit(1103515245) + F.lit(
        12345
    )
    return F.pmod(F.shiftright(mixed, 16), F.lit(buckets).cast("long"))


def split_case_oracle_sql(
    key_expr: str = "doc_id",
    val_rate: float = 0.05,
    test_rate: float = 0.05,
    buckets: int = _BUCKETS,
    indent: int = 15,
) -> str:
    """DuckDB fragment of :func:`assign_splits`' split CASE, generated
    from the SAME val_rate/test_rate/buckets literals the Spark
    assigner uses — one source of truth, so a rate or bucket-count
    change can never silently leave an oracle encoding the old split
    (r11 ADVICE).  The key reduction uses the pmod-exact form
    ``((k % m) + m) % m``: DuckDB's ``%`` truncates toward zero while
    :func:`hash_bucket` uses ``F.pmod``, so a negative key would
    otherwise diverge (synthetic keys are non-negative today, but the
    shared fragment must not depend on that).  ``indent`` aligns the
    continuation lines with the embedding oracle's layout."""
    val_hi = int(round(val_rate * buckets))
    test_hi = val_hi + int(round(test_rate * buckets))
    pad = " " * indent
    b = (
        f"(((({key_expr} % 2147483648) + 2147483648) % 2147483648)"
        f" * 1103515245 + 12345) // 65536 % {buckets}"
    )
    return (
        f"CASE WHEN {b}\n"
        f"{pad}          < {val_hi} THEN 'val'\n"
        f"{pad}     WHEN {b}\n"
        f"{pad}          < {test_hi} THEN 'test'\n"
        f"{pad}     ELSE 'train' END AS split"
    )


def sample_stratified(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    key_col: str,
    default_rate: float = 0.0,
    buckets: int = _BUCKETS,
) -> DataFrame:
    """Keep each row iff its key's bucket falls under its stratum's
    rate: stratum s keeps ~rates[s] of its rows, deterministically.

    Scale shape: a scan-stage filter — no shuffle, no RNG state, no
    broadcast; the rate map rides the plan as a literal CASE
    (O(strata)).  Composable with any downstream operator because
    membership never changes across retries or repartitioning.
    """
    rate = F.lit(float(default_rate))
    for s, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == s, F.lit(float(r))).otherwise(rate)
    keep = hash_bucket(F.col(key_col), buckets) < (
        rate * F.lit(float(buckets))
    ).cast("long")
    return df.filter(keep)


def sample_temperature(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    coefficient: float = 2.0,
    buckets: int = _BUCKETS,
) -> DataFrame:
    """Temperature-flattened sampling (the multilingual-training mix
    rule): each stratum keeps rate_s = min(1, c / sqrt(n_s)), so a
    stratum 4x the size contributes only 2x the rows — small languages
    are up-weighted relative to proportional sampling, exactly the
    alpha = 0.5 temperature mix.  ``c`` is the caller's budget knob (at
    scale you tune it to hit a token target).

    The rate formula deliberately avoids any cross-stratum reduction
    over doubles: sqrt is IEEE-correctly-rounded and the division is a
    single exact operation, so rates — and therefore membership — are
    bit-identical across engines and partition layouts.  The bucket
    cutoff uses floor() (Spark's long cast truncates, DuckDB's rounds;
    floor agrees everywhere).

    Scale shape: one tiny stratum-count aggregate broadcast back onto
    the scan-stage filter; no shuffle of the kept rows, no RNG state.
    NULL strata are a stratum like any other (null-safe join), matching
    ``sample_stratified``'s keep-NULL behavior.
    """
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("__n"))
    rate = F.least(
        F.lit(1.0), F.lit(float(coefficient)) / F.sqrt(F.col("__n").cast("double"))
    )
    rated = counts.select(F.col(stratum_col).alias("__stratum"), rate.alias("__rate"))
    keep = hash_bucket(F.col(key_col), buckets) < F.floor(
        F.col("__rate") * F.lit(float(buckets))
    ).cast("long")
    return (
        df.join(
            F.broadcast(rated), df[stratum_col].eqNullSafe(F.col("__stratum"))
        )
        .filter(keep)
        .drop("__rate", "__stratum")
    )


def assign_splits(
    df: DataFrame,
    key_col: str,
    val_rate: float = 0.05,
    test_rate: float = 0.05,
    buckets: int = _BUCKETS,
) -> DataFrame:
    """Deterministic train/val/test assignment: the key's bucket falls
    into [0, val), [val, val+test) or the remainder — every engine,
    retry, and backfill assigns the same row to the same split, and a
    row can never leak between splits across runs (the failure mode of
    RNG-based splitting).  Scan-stage CASE, no shuffle."""
    b = hash_bucket(F.col(key_col), buckets)
    # round, don't truncate: 0.29 * 10000 is 2899.999... in fp
    val_hi = int(round(val_rate * buckets))
    test_hi = val_hi + int(round(test_rate * buckets))
    split = (
        F.when(b < val_hi, F.lit("val"))
        .when(b < test_hi, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn("split", split)


def sample_fixed_per_stratum(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    n_per_stratum: int,
    buckets: int = _BUCKETS,
) -> DataFrame:
    """Exactly min(n, stratum size) rows per stratum, deterministically:
    rows ranked inside each stratum by (hash bucket, key) and the first
    ``n`` kept.  The fixed-size eval-set draw: unlike rate-based
    sampling the output size is exact, and the (bucket, key) order
    makes the draw pseudo-random but stable under reruns and
    repartitioning.  One shuffle (the per-stratum rank window)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(stratum_col).orderBy(
        hash_bucket(F.col(key_col), buckets), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def sample_token_budget(
    docs: DataFrame,
    stratum_col: str,
    order_col: str,
    token_col: str,
    budget: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy per-stratum token-budget selection: within each stratum,
    rank docs by (order_col DESC, id) — highest-quality first — and
    keep the ordered prefix whose cumulative token count stays within
    ``budget``.  The standard "best N tokens per language" training-mix
    builder: token budgets, not doc counts, are what trainer epochs
    are priced in.

    Semantics are the simple ordered PREFIX (first doc whose cumulative
    count exceeds the budget ends the stratum's selection) — not
    first-fit-decreasing packing, which back-fills smaller docs and
    needs iteration; :mod:`packing` covers that shape.  One shuffle
    keyed by stratum (the cumulative-sum window; ties impossible — the
    order key ends in the unique id); nothing is global, so 100 TB
    scales by stratum count and the skew ceiling is the largest
    stratum.

    Output: the selected input rows plus ``cum_tokens`` (the running
    total through each kept row — the budget consumed so far).
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(stratum_col)
        .orderBy(F.col(order_col).desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = docs.withColumn("cum_tokens", F.sum(F.col(token_col)).over(w))
    return out.filter(F.col("cum_tokens") <= budget)


def sample_weighted(
    df: DataFrame,
    weight_col: str,
    key_col: str,
    rate_per_max: float = 0.5,
    buckets: int = _BUCKETS,
) -> DataFrame:
    """Weight-proportional Bernoulli sampling: row i is kept with
    probability ``rate_per_max * w_i / max(w)`` — the importance-
    weighted corpus thinning (keep long/high-quality docs more often)
    that a fixed-k weighted reservoir cannot do deterministically.
    Bernoulli (independent per row) rather than exact-k because exact-k
    selection orders on ``u^(1/w)`` whose libm ``pow`` is not
    bit-identical across engines, while this membership rule is:
    ``w_i / max_w`` is one correctly-rounded division, the scaling by
    ``rate_per_max * buckets`` one correctly-rounded multiply, and the
    floor/compare against the integer LCG bucket is exact — the same
    determinism contract as :func:`sample_stratified`.

    Output keeps the input row plus ``keep_prob`` for downstream
    Horvitz-Thompson reweighting (1/p importance weights).

    Scale shape: one scalar max() aggregate broadcast back onto a
    scan-stage filter (one-row build side — the j6 scalar-dim shape);
    no shuffle of kept rows, no RNG state, reproducible across
    retries, partition layouts, and engines.
    """
    mx = df.select(F.max(F.col(weight_col)).cast("double").alias("__maxw"))
    scaled = F.floor(
        F.col(weight_col).cast("double")
        * F.lit(float(rate_per_max) * buckets)
        / F.col("__maxw")
    ).cast("long")
    cutoff = F.least(scaled, F.lit(buckets).cast("long"))
    return (
        df.crossJoin(F.broadcast(mx))
        .filter(hash_bucket(F.col(key_col), buckets) < cutoff)
        .withColumn(
            "keep_prob",
            cutoff.cast("double") / F.lit(float(buckets)),
        )
        .drop("__maxw")
    )
