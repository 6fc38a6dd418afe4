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
