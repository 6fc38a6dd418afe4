"""Embedding-column utilities for training-data pipelines.

  quantize_int8   symmetric per-vector int8 quantization — the standard
                  4x storage/bandwidth reduction before ANN index build
                  or shipping embeddings to a trainer.
  l2_normalize    unit-norm projection (cosine == dot after this).

All math is native Catalyst higher-order functions in DOUBLE, with
rounding expressed as floor(x + 0.5) so results are bit-deterministic
across engines (Spark's round() and DuckDB's round() disagree on
half-way ties; floor does not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_double(vec_col: str):
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def quantize_int8(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-vector symmetric int8 quantization.

    scale = max(|v|) / 127;  q_i = floor(v_i / scale + 0.5)  (so the
    largest-magnitude component maps to ±127).  Output is EXPLODED to
    (id, dim, q, scale) scalar rows — array columns don't canonicalize
    identically across engines, scalars do.

    Scale shape: one narrow projection + posexplode, no shuffle at all;
    at 100 TB this runs in the scan stage and writes a table 4x
    smaller than the float32 input.
    """
    base = emb.select(F.col(id_col), _as_double(vec_col).alias("v")).withColumn(
        "scale",
        F.array_max(F.transform(F.col("v"), lambda x: F.abs(x))) / F.lit(127.0),
    )
    # all-zero vector -> scale 0: quantize to 0 instead of dividing by
    # zero (nullif/coalesce, mirrored exactly in the oracle SQL)
    q = F.transform(
        F.col("v"),
        lambda x: F.coalesce(
            F.floor(x / F.nullif(F.col("scale"), F.lit(0.0)) + F.lit(0.5)).cast(
                "int"
            ),
            F.lit(0),
        ),
    )
    return base.select(F.col(id_col), F.col("scale"), F.posexplode(q).alias("dim", "q")).select(
        F.col(id_col),
        F.col("dim").cast("int").alias("dim"),
        F.col("q"),
        F.col("scale"),
    )


def l2_normalize(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Unit-L2 vectors: v / ||v||; dot products become cosines."""
    base = emb.select(F.col(id_col), _as_double(vec_col).alias("v")).withColumn(
        "norm",
        F.sqrt(
            F.aggregate(
                F.transform(F.col("v"), lambda x: x * x),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        ),
    )
    return base.select(
        F.col(id_col),
        F.transform(F.col("v"), lambda x: x / F.col("norm")).alias("unit"),
        F.col("norm"),
    )


def label_centroids(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    grid: int = 64,
) -> DataFrame:
    """Per-label embedding centroids via fixed-point accumulation.

    Floating-point SUM is partition-order dependent — the one thing a
    reproducible corpus statistic cannot be.  So each component is
    snapped to a 1/``grid`` fixed-point lattice (floor(v*grid + 0.5),
    exact: grid is a power of two so v*grid is a lossless scale), the
    lattice integers are summed (associative, order-free), and ONE
    exact double division sum/(grid*count) converts back at the end.
    Result: bit-identical centroids on any cluster layout, any retry,
    any engine, at 1/128-precision — plenty for routing/monitoring
    (IVF seeding, per-source drift dashboards).

    Output is exploded (label, dim, centroid, n_vecs) scalar rows.
    Scale shape: posexplode in the scan stage, then one (label, dim)
    hash agg with map-side partial sums — the wire carries
    labels x dims rows, independent of corpus size.
    """
    q = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(
            F.transform(
                _as_double(vec_col),
                lambda x: F.floor(x * F.lit(float(grid)) + F.lit(0.5)).cast("long"),
            )
        ).alias("dim", "qg"),
    )
    agg = q.groupBy("label", "dim").agg(
        F.sum("qg").alias("__s"), F.count("*").alias("__c")
    )
    return agg.select(
        F.col("label").cast("long").alias("label"),
        F.col("dim").cast("long").alias("dim"),
        (
            F.col("__s").cast("double")
            / (F.lit(float(grid)) * F.col("__c").cast("double"))
        ).alias("centroid"),
        F.col("__c").cast("long").alias("n_vecs"),
    )


def pca_fit(
    emb: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    dim: int | None = None,
):
    """Fit a PCA basis distributed: per-partition Gram/mean partials
    via one Arrow-batched ``mapInPandas`` pass (each partition emits a
    single (n, d*d, d) row — numpy does the O(rows * d^2) flops), the
    O(partitions) partials are reduced driver-side (the classic
    allreduce shape: what rides the wire is d^2 doubles per partition,
    independent of corpus size), and the d x d eigenproblem is solved
    once on the driver with ``numpy.linalg.eigh`` — at d=64 that is
    microseconds; even d=4096 is a single-machine problem.  This is
    the standard scalable-PCA decomposition (distribute the moment
    computation, centralize the tiny eigensolve).

    Component signs are canonicalized (largest-|loading| coordinate
    positive) so the basis is reproducible run-to-run; eigh is
    deterministic for a fixed input matrix, and the partial-sum
    reduction is the only float-order-sensitive step (documented: the
    basis is stable to ~1e-12 across partition layouts, which is why
    the declared query is rows-only rather than value-hashed).

    Returns ``(mu, components, explained_variance_ratio)`` as numpy
    arrays (components is d x k, columns = principal axes).
    """
    import numpy as np
    import pandas as pd

    if dim is None:
        probe = emb.select(vec_col).first()
        if probe is None or probe[0] is None:
            # empty input (or a NULL lead vector) would otherwise die
            # on len(None) before the n==0 ValueError below
            raise ValueError("pca_fit: empty input")
        dim = len(probe[0])
    src = emb.select(F.col(vec_col).cast("array<double>").alias("__v"))

    def partial(it):
        n = 0
        s = np.zeros((dim, dim))
        m = np.zeros(dim)
        for pdf in it:
            v = np.array(pdf["__v"].tolist(), dtype=np.float64)
            if len(v):
                n += len(v)
                s += v.T @ v
                m += v.sum(0)
        yield pd.DataFrame(
            {"n": [n], "s": [s.ravel().tolist()], "m": [m.tolist()]}
        )

    parts = src.mapInPandas(
        partial, "n long, s array<double>, m array<double>"
    ).collect()
    n = sum(r.n for r in parts)
    if n == 0:
        raise ValueError("pca_fit: empty input")
    s = sum(np.array(r.s) for r in parts).reshape(dim, dim)
    m = sum(np.array(r.m) for r in parts)
    mu = m / n
    cov = s / n - np.outer(mu, mu)
    w, u = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = u[:, order].copy()
    for j in range(comps.shape[1]):
        i = int(np.argmax(np.abs(comps[:, j])))
        if comps[i, j] < 0:
            comps[:, j] = -comps[:, j]
    evr = w[order] / max(w.sum(), 1e-300)
    return mu, comps, evr


def pca_project(
    emb: DataFrame,
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = ("vec_id", "label"),
    k: int = 8,
) -> DataFrame:
    """Project every vector onto the top-``k`` PCA axes as columns
    ``pc1..pck`` — the whitening / dimensionality-reduction stage in
    front of clustering, dedup cells, and drift dashboards.

    The fitted basis rides the plan as LITERAL arrays (d*k doubles,
    ~4 KB at d=64 k=8), so the projection is pure JVM codegen:
    ``zip_with`` center, ``zip_with`` multiply, ``aggregate`` fold per
    component — no Python stage, no shuffle, scan-side only.  The fit
    itself is one extra pass (see :func:`pca_fit`); at 100 TB you fit
    on a sampled/bounded slice and project the full corpus, which this
    API supports by passing a different ``emb`` to each step.
    """
    mu, comps, _ = pca_fit(emb, vec_col=vec_col, k=k)
    dim = comps.shape[0]
    # dot(v - mu, w_j) = dot(v, w_j) - dot(mu, w_j): the second term is
    # a plan-time CONSTANT, so no per-row centering pass — each
    # component is one zip_with multiply + fold over the RAW vector.
    # CollapseProject re-inlined the shared centered array into all k
    # component expressions (k zip_with-subtract array allocations per
    # row); dropping it measured 16.2s -> 0.7s on 200k x 64 for
    # identical output.
    offsets = mu @ comps
    vec = F.col(vec_col).cast("array<double>")
    cols = []
    for j in range(comps.shape[1]):
        axis = F.array(*[F.lit(float(comps[i, j])) for i in range(dim)])
        cols.append(
            (
                F.aggregate(
                    F.zip_with(vec, axis, lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                - F.lit(float(offsets[j]))
            ).alias(f"pc{j + 1}")
        )
    return emb.select(*keep_cols, *cols)


def _fixed_moments(qdf: DataFrame, dim: int):
    """Exact integer moments ``(n, S = sum q q^T, m = sum q)`` of a
    quantized-vector column ``q`` (array<long>) in ONE distributed
    Arrow pass: each partition emits a single (n, d*d, d) int64 row
    (numpy does the O(rows*d^2) flops), the O(partitions) partials are
    reduced driver-side with exact Python ints.  Integer addition
    commutes, so the result is layout-invariant — the foundation of
    every oracle-reproducible eigensolve here.

    Overflow: the numpy int64 accumulation WRAPS silently (no ANSI
    throw), so each partition checks the exact bound
    ``n_rows * max|q|^2 < 2^63`` with Python ints after accumulating —
    every intermediate partial sum of S is bounded by that product, so
    the post-hoc check proves no wrap occurred (~2^39 rows/partition at
    the 2^12 grid); it raises OverflowError instead of corrupting."""
    import numpy as np
    import pandas as pd

    def partial(it):
        n = 0
        maxabs = 0
        s = np.zeros((dim, dim), dtype=np.int64)
        m = np.zeros(dim, dtype=np.int64)
        for pdf in it:
            v = np.array(pdf["q"].tolist(), dtype=np.int64)
            if len(v):
                n += len(v)
                maxabs = max(maxabs, int(np.abs(v).max()))
                s += v.T @ v
                m += v.sum(0)
        if n and n * maxabs * maxabs >= 2**63:
            raise OverflowError(
                f"_fixed_moments int64 bound exceeded: {n} rows x "
                f"max|q|={maxabs} in one partition; repartition finer"
            )
        yield pd.DataFrame(
            {"n": [n], "s": [s.ravel().tolist()], "m": [m.tolist()]}
        )

    parts = qdf.select("q").mapInPandas(
        partial, "n long, s array<long>, m array<long>"
    ).collect()
    n = sum(int(r.n) for r in parts)
    s_mat = [
        [sum(int(r.s[i * dim + j]) for r in parts) for j in range(dim)]
        for i in range(dim)
    ]
    m_vec = [sum(int(r.m[i]) for r in parts) for i in range(dim)]
    return n, s_mat, m_vec


def _tdiv(a: int, num: int, den: int) -> int:
    """Sign-explicit truncating scale — identical to the SQL CASE form
    ``CASE WHEN a<0 THEN -(((-a)*num)//den) ELSE (a*num)//den END``."""
    return -((-a) * num // den) if a < 0 else (a * num) // den


def power_deflate_components(
    n: int,
    s_mat: list[list[int]],
    m_vec: list[int],
    k: int,
    ascale: int = 1 << 16,
    xscale: int = 1 << 20,
    iters: int = 12,
) -> list[list[int]]:
    """Top-``k`` eigenvector directions of ``A = n*S - m m^T`` by
    FIXED-POINT power iteration with Hotelling deflation — pure Python
    ints, bit-reproducible by an unrolled SQL CTE chain.

    Per component: 12 power steps (``y = A x``; rescale to |x|<=2^20
    with sign-explicit truncating division), canonical sign (max-|x|
    coordinate, lowest index on ties, made positive), then deflate
    ``A <- A*(w.w)^2 - (w.A.w) * w w^T`` and rescale back to
    |A|<=2^16.  Deflation intermediates reach ~2^109 (A*(w.w)^2 with
    w.w <= 64*2^40), so the SQL twin carries them as HUGEINT; the
    rescale product stays under 2^126.  Python ints are exact at any
    width, so both engines replay identically."""
    dim = len(m_vec)
    a_raw = [
        [n * s_mat[i][j] - m_vec[i] * m_vec[j] for j in range(dim)]
        for i in range(dim)
    ]
    amax = max(abs(v) for row in a_raw for v in row)
    if amax == 0:
        raise ValueError("power_deflate_components: zero covariance")
    a = [[_tdiv(v, ascale, amax) for v in row] for row in a_raw]
    comps: list[list[int]] = []
    for c in range(k):
        x = [xscale] * dim
        for _ in range(iters):
            y = [sum(a[i][j] * x[j] for j in range(dim)) for i in range(dim)]
            ymax = max(abs(v) for v in y)
            if ymax == 0:
                raise ValueError(
                    "power_deflate_components: iteration collapsed to zero"
                )
            x = [_tdiv(v, xscale, ymax) for v in y]
        lead = min(range(dim), key=lambda i: (-abs(x[i]), i))
        if x[lead] < 0:
            x = [-v for v in x]
        comps.append(x)
        if c + 1 < k:
            w2 = sum(v * v for v in x)
            waw = sum(
                x[i] * a[i][j] * x[j]
                for i in range(dim)
                for j in range(dim)
            )
            raw = [
                [
                    a[i][j] * w2 * w2 - waw * x[i] * x[j]
                    for j in range(dim)
                ]
                for i in range(dim)
            ]
            amax = max(abs(v) for row in raw for v in row)
            if amax == 0:
                raise ValueError(
                    "power_deflate_components: deflated matrix is zero"
                )
            a = [[_tdiv(v, ascale, amax) for v in row] for row in raw]
    return comps


def pca_project_fixed(
    emb: DataFrame,
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = ("vec_id", "label"),
    k: int = 8,
    grid: int = 4096,
    ascale: int = 1 << 16,
    xscale: int = 1 << 20,
    iters: int = 12,
) -> DataFrame:
    """Project every vector onto ``k`` fixed-point principal directions
    as integer columns ``pc1n..pckn`` — the oracle-reproducible twin of
    :func:`pca_project` (which stays the float production path; LAPACK
    eigh is neither cross-engine- nor cross-platform-bit-stable, this
    is).

    Same recipe as :func:`pca_power_fixed` extended to k components via
    :func:`power_deflate_components` (Hotelling deflation between power
    solves).  The corpus passes are (1) the exact-integer-moments Arrow
    pass and (2) the projection scan ``pc_cn = n*(q.w_c) - (m.w_c)``,
    emitted as FLAT unrolled literal expressions over per-dim scalar
    columns (the measured 52x-over-HOF-lambda pattern from the PQ
    encode, SCALING.md) — no Python, no shuffle, scan-stage only.

    Overflow bounds (ANSI throws): |q_i| <= grid, |w_i| <= 2^20 so
    |q.w| <= 64*4096*2^20 = 2^44 and |pc_cn| <= 2*n*2^44 — safe to
    n ~= 2^17 rows; drop grid/xscale a notch each 4x beyond (the
    pca_power_fixed bound).
    """
    dim_probe = emb.select(vec_col).first()
    if dim_probe is None or dim_probe[0] is None:
        raise ValueError("pca_project_fixed: empty input")
    dim = len(dim_probe[0])
    qexpr = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.floor(x * F.lit(float(grid))).cast("long"),
    )
    n, s_mat, m_vec = _fixed_moments(emb.select(qexpr.alias("q")), dim)
    if n == 0:
        raise ValueError("pca_project_fixed: empty input")
    comps = power_deflate_components(
        n, s_mat, m_vec, k, ascale=ascale, xscale=xscale, iters=iters
    )
    qcols = [
        F.expr(
            f"CAST(floor(CAST({vec_col}[{i}] AS DOUBLE) * "
            f"{float(grid)!r}D) AS BIGINT)"
        ).alias(f"__q{i}")
        for i in range(dim)
    ]
    base = emb.select(*keep_cols, *qcols)
    proj = []
    for c, w in enumerate(comps):
        mdot = sum(m_vec[i] * w[i] for i in range(dim))
        terms = " + ".join(
            f"__q{i} * {w[i]}L" for i in range(dim) if w[i] != 0
        )
        proj.append(
            F.expr(f"CAST({n}L * ({terms}) - {mdot}L AS BIGINT)").alias(
                f"pc{c + 1}n"
            )
        )
    return base.select(*keep_cols, *proj)


def pca_power_fixed(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    keep_cols: tuple[str, ...] = ("label",),
    grid: int = 4096,
    ascale: int = 1 << 16,
    xscale: int = 1 << 20,
    iters: int = 12,
) -> DataFrame:
    """Top principal component by FIXED-POINT power iteration — the
    deterministic, oracle-reproducible twin of :func:`pca_fit` (which
    stays the production path; LAPACK ``eigh`` is neither
    cross-engine- nor cross-platform-bit-stable, this is).

    Construction (every step exact integer arithmetic, identical in
    Spark, Python, and ANSI SQL):

    1. Quantize vectors to the 2^-12 grid: ``q_i = floor(v_i * 4096)``
       (power-of-two scaling of a float-widened double is exact; floor
       is IEEE-identical in both engines).
    2. One distributed Arrow pass accumulates the exact integer moments
       ``n``, ``m = sum q``, ``S = sum q q^T`` (int64; per-partition
       partials are order-free because integer addition commutes).
       Collect is O(partitions * d^2) — the proven pca_fit shape.
    3. ``A = n*S - m m^T`` (the covariance times n^2 — same
       eigenvectors, no division) is rescaled to ``|A'| <= 2^16`` with
       sign-explicit truncating division (``-((-a)*s//amax)`` for
       negatives, so engine floor-vs-truncate conventions can't
       diverge), then 12 power-iteration steps run on the driver in
       pure Python ints: ``y = A' x``; ``x' = sign(y)*(|y|*2^20//ymax)``.
       d x d = 64 x 64 — driver cost is microseconds; the DATA never
       leaves the cluster.
    4. Sign canonicalization: flip so the max-|x| coordinate (lowest
       index on ties) is positive.
    5. Distributed projection: ``pc1n = n * (q . x) - (m . x)`` — the
       centered projection scaled by n*grid*xscale, one zip_with +
       aggregate fold per row, no shuffle, scan-stage only.

    Overflow bounds (ANSI mode throws, so these are load-bearing):
    |q_i| <= grid, |x_i| <= 2^20, so |q.x| <= 64*4096*2^20 = 2^44 and
    |pc1n| <= 2*n*2^44 — safe for n up to ~2^17 corpus rows per the
    gate scales and ~2^18 beyond; raise ``grid`` down / ``xscale``
    down one notch each 4x beyond that.
    """
    qexpr = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.floor(x * F.lit(float(grid))).cast("long"),
    )
    qdf = emb.select(F.col(id_col), *keep_cols, qexpr.alias("q"))
    probe = qdf.select("q").first()
    if probe is None or probe[0] is None:
        raise ValueError("pca_power_fixed: empty input")
    dim = len(probe[0])
    n, s_mat, m_vec = _fixed_moments(qdf, dim)
    if n == 0:
        raise ValueError("pca_power_fixed: empty input")

    a_raw = [
        [n * s_mat[i][j] - m_vec[i] * m_vec[j] for j in range(dim)]
        for i in range(dim)
    ]
    amax = max(abs(v) for row in a_raw for v in row)
    if amax == 0:
        raise ValueError("pca_power_fixed: zero covariance")
    a = [[_tdiv(v, ascale, amax) for v in row] for row in a_raw]
    x = [xscale] * dim
    for _ in range(iters):
        y = [sum(a[i][j] * x[j] for j in range(dim)) for i in range(dim)]
        ymax = max(abs(v) for v in y)
        if ymax == 0:
            raise ValueError("pca_power_fixed: iteration collapsed to zero")
        x = [_tdiv(v, xscale, ymax) for v in y]
    lead = min(range(dim), key=lambda i: (-abs(x[i]), i))
    if x[lead] < 0:
        x = [-v for v in x]
    mdotx = sum(m_vec[i] * x[i] for i in range(dim))
    xlit = F.array(*[F.lit(v).cast("long") for v in x])
    dot = F.aggregate(
        F.zip_with(F.col("q"), xlit, lambda qi, wi: qi * wi),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    return qdf.select(
        F.col(id_col),
        *keep_cols,
        (F.lit(n).cast("long") * dot - F.lit(mdotx).cast("long"))
        .cast("long")
        .alias("pc1n"),
    )
