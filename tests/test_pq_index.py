"""Materialized IVF-PQ index: partition pruning + parity with the
inline plan."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_pq_index_partition_pruning_and_parity(spark, sf_dir, tmp_path):
    from greenbuttonengine_spark.extensions.similarity import (
        _as_double,
        seeded_cell_scores,
    )
    from greenbuttonengine_spark.sinks.pq_index import (
        build_pq_index,
        probe_pq_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "pq_index")
    seeds = build_pq_index(spark, emb, path, n_cells=16)

    # directory layout: one partition dir per cell
    import os

    cells_on_disk = sorted(
        int(d.split("=")[1])
        for d in os.listdir(path)
        if d.startswith("cell=")
    )
    assert cells_on_disk and set(cells_on_disk) <= set(range(16))

    probed = cells_on_disk[:3]
    reader = probe_pq_index(spark, path, probed)

    # 1) the physical plan prunes at the partition level
    plan = reader._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan

    # 2) the probed read returns exactly the inline plan's rows for
    #    those cells (same quantizer: seeds round-trip via return value)
    cell_scores = seeded_cell_scores(seeds)
    inline = emb.select(
        "vec_id",
        (-F.element_at(cell_scores(_as_double("embedding")), 1)["nc"]).alias(
            "cell"
        ),
    ).filter(F.col("cell").isin(probed))
    got = {(r.vec_id, r.cell) for r in reader.select("vec_id", "cell").collect()}
    want = {(r.vec_id, r.cell) for r in inline.collect()}
    assert got == want

    # 3) codes on disk are valid 4-bit codes
    row = reader.limit(1).collect()[0]
    for j in range(8):
        assert 0 <= row[f"c{j}"] < 16
