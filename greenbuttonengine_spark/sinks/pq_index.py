"""Materialized IVF-PQ index: the write-once form of what
``ann_ivf_pq_topk`` computes inline.

At 100 TB the index is not rebuilt per query — the codes table is
written ONCE, partitioned by coarse cell, and every query's probe
becomes a partition-pruned scan of n_probe/n_cells of the files.
This module is that write path plus the probe-side reader; the
partition-pruning claim is pinned by tests/test_pq_index.py, which
asserts the probed read's physical plan carries a cell PartitionFilter
and returns results identical to the inline plan's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extensions.similarity import seeded_cell_scores, seeded_centroids
from ..plans.wave9_queries import pq_encode_codes


def build_pq_index(
    spark: SparkSession,
    emb: DataFrame,
    path: str,
    n_cells: int = 16,
) -> list:
    """Encode the corpus (coarse cell + 8 PQ code columns) and write it
    ``partitionBy("cell")`` — one directory per Voronoi cell, so cell
    predicates prune at the FILE level before any row is read.

    Returns the seed list so the query side probes the same quantizer
    (in production the seeds/codebook are the index metadata file)."""
    seeds = seeded_centroids(emb, n_cells)
    cell_scores = seeded_cell_scores(seeds)
    # Same encode projection as the inline ann_ivf_pq_topk plan — one
    # definition, so sink and query cannot drift.
    codes = pq_encode_codes(emb, cell_scores)
    codes.write.mode("overwrite").partitionBy("cell").parquet(path)
    return seeds


def probe_pq_index(
    spark: SparkSession,
    path: str,
    cells: list[int],
) -> DataFrame:
    """Read ONLY the probed cells' partitions of a built index.

    The ``cell IN (...)`` predicate is a partition filter (cell is a
    directory column), so Spark lists and reads just those
    directories — the scan cost is n_probe/n_cells of the index no
    matter how large the corpus is."""
    return spark.read.parquet(path).filter(F.col("cell").isin(cells))
