"""Similarity search over an embedding column (array<float>).

  cosine_topk   brute-force exact top-k: broadcast the query set against
                the corpus — the corpus is scanned once, never shuffled;
                per-query k is a partitioned window.  The correct
                baseline at any scale where queries are few.
  lsh_topk      random-hyperplane LSH bucketing: corpus hashed once into
                sign-pattern buckets; each query probes its own bucket
                (+ optional multi-probe neighbors).  The 100 TB path:
                candidate set per query is ~corpus/2^planes.

Hyperplanes are deterministic pseudo-random (xxhash64 of
(plane, dimension) -> uniform in [-1, 1]) so results are reproducible
with no stored model.  All math native (zip_with/aggregate fold in
double).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _as_double(vec_col: str):
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(v):
    return F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Output: (query_id, neighbor_id, cosine, rank). Self-matches are
    excluded. Ties broken by neighbor id for determinism."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv"))
    return _score_and_rank(c.crossJoin(F.broadcast(q)), k)


def _score_and_rank(candidates: DataFrame, k: int) -> DataFrame:
    """Shared tail of every ANN variant: exact cosine over the
    candidate (query, neighbor) pairs, deterministic per-query top-k."""
    cos = _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))
    scored = (
        candidates.filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def _bucket_signature(v, planes: int, dim: int):
    """Sign pattern of the vector against `planes` deterministic
    hyperplanes, packed into a long.

    plane_w[p][d] = xxhash64(p, d) scaled to [-1, 1] — reproducible
    everywhere, no stored model."""
    def plane_weights(p: int):
        # single-arg lambda: an arity-2 lambda would receive the array
        # INDEX as its second argument, shadowing p and collapsing all
        # planes to identical weights
        return F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: (F.xxhash64(F.lit(p), d).cast("double") / F.lit(float(1 << 63))),
        )

    sig = F.lit(0).cast("long")
    for p in range(planes):
        proj = _dot(v, plane_weights(p))
        sig = sig + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    fit_sample_fraction: float | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means centroids
    partition the corpus into cells; each query scans only its
    ``n_probe`` nearest cells.

    The coarse quantizer is MLlib KMeans (fixed seed -> deterministic
    model); assignment and probing are native joins.  At 100 TB pass
    ``fit_sample_fraction`` so the centroid model is trained on a
    seeded sample (the fit is otherwise itself a full-corpus job; cell
    quality needs only a representative sample), the corpus is written
    partitioned by cell, and a query touches n_probe/n_centroids of
    the data — the classic IVF trade (recall vs cells scanned)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv"))
    with_vec = c.withColumn("features", array_to_vector(F.col("cv")))
    km = KMeans(k=n_centroids, seed=seed, maxIter=10)
    fit_input = (
        with_vec
        if fit_sample_fraction is None
        else with_vec.sample(fraction=fit_sample_fraction, seed=seed)
    )
    model = km.fit(fit_input)
    assigned = model.transform(with_vec).select(
        "neighbor_id", "cv", F.col("prediction").alias("cell")
    )

    centroids = [list(map(float, cc)) for cc in model.clusterCenters()]
    centroid_rows = [(i, centroids[i]) for i in range(len(centroids))]
    cdf = corpus.sparkSession.createDataFrame(centroid_rows, "cell int, centroid array<double>")

    q = queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv"))
    qc = q.crossJoin(F.broadcast(cdf))
    dist2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("centroid"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wq = W.partitionBy("query_id").orderBy(dist2.asc(), F.col("cell"))
    probes = (
        qc.withColumn("cell_rank", F.row_number().over(wq))
        .filter(F.col("cell_rank") <= n_probe)
        .select("query_id", "qv", "cell")
    )

    return _score_and_rank(assigned.join(F.broadcast(probes), "cell"), k)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    planes: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket, then exact cosine rank within.

    ``multiprobe`` additionally probes every bucket at Hamming
    distance 1 from the query's signature (flip one plane's sign) —
    the standard recall fix for sign-LSH: a near neighbor that falls
    on the wrong side of ONE hyperplane is still found.  Candidates
    grow from 1 to (1+planes) buckets of 2^planes — still a small
    corpus fraction at scale."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv"))
    c = c.withColumn("bucket", _bucket_signature(F.col("cv"), planes, dim))
    q = queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv"))
    q = q.withColumn("bucket", _bucket_signature(F.col("qv"), planes, dim))
    if multiprobe:
        probe_buckets = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << p).cast("long")) for p in range(planes)],
        )
        q = q.select(
            "query_id", "qv", F.explode(probe_buckets).alias("bucket")
        )
    return _score_and_rank(c.join(F.broadcast(q), "bucket"), k)
