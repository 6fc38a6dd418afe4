"""Wave-19 invariants: the cross-engine sketch aggregates must be
honest approximations of the exact values they ride alongside."""

from __future__ import annotations


def test_kmv_and_hist_median_error_bounds(spark, sf_correct_dir):
    from greenbuttonengine_spark.plans.wave19_queries import (
        _KMV_K,
        approx_sketch_aggregates,
    )
    from greenbuttonengine_spark.sources.catalog import load_table

    import pyspark.sql.functions as F

    rows = approx_sketch_aggregates(spark, sf_correct_dir).collect()
    assert rows, "no groups"
    li = load_table(spark, "lineitem", sf_correct_dir)
    # exact LOWER median (the (n+1)//2-th smallest), the estimator's target
    exact_med = {
        r.l_returnflag: float(r.m)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "element_at(sort_array(collect_list(l_extendedprice)), "
                "CAST((count(*) + 1) div 2 AS INT))"
            ).alias("m")
        )
        .collect()
    }
    for r in rows:
        if r.n_exact_orders >= _KMV_K:
            # KMV rel error ~ 1/sqrt(k) = 6.25%; allow 4 sigma
            rel = abs(r.kmv_distinct_orders - r.n_exact_orders) / r.n_exact_orders
            assert rel < 0.25, (r.l_returnflag, rel)
        else:
            assert r.kmv_distinct_orders == float(r.n_exact_orders)
        # the floor-dollar bin of the exact lower median: within bin width
        assert 0 <= exact_med[r.l_returnflag] - r.hist_median_price < 1.0, (
            r, exact_med[r.l_returnflag])


def test_kmv_window_group_limit_plan(spark, sf_correct_dir):
    """The rank<=k filter must compile to WindowGroupLimit so the
    bottom-k prunes below the shuffle (the sketch's mergeability)."""
    from greenbuttonengine_spark.plans.wave19_queries import (
        approx_sketch_aggregates,
    )

    plan = (
        approx_sketch_aggregates(spark, sf_correct_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan[:2000]


def test_kmv_set_overlap_error_bounds(spark, sf_correct_dir):
    """Merged-sketch union and Jaccard estimates must track the exact
    columns within KMV error (~1/sqrt(k))."""
    from greenbuttonengine_spark.plans.wave19_queries import (
        _OVL_K,
        approx_set_overlap_kmv,
    )

    rows = approx_set_overlap_kmv(spark, sf_correct_dir).collect()
    assert rows, "no source pairs"
    for r in rows:
        exact_j = r.exact_common / r.exact_union
        if r.exact_union >= _OVL_K:
            assert abs(r.kmv_union_words - r.exact_union) / r.exact_union < 0.25, r
        else:
            assert r.kmv_union_words == float(r.exact_union)
        assert abs(r.kmv_jaccard - exact_j) < 0.2, (r, exact_j)
    # aggregate bias check: mean signed error should be small
    big = [r for r in rows if r.exact_union >= _OVL_K]
    if big:
        mean_rel = sum(
            (r.kmv_union_words - r.exact_union) / r.exact_union for r in big
        ) / len(big)
        assert abs(mean_rel) < 0.1, mean_rel
