"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full declared inventory (SURVEY.md §2 +
extension operators) for the DuckDB correctness gate.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def _registry():
    # Importing the query modules populates the registry. Import order IS
    # gate order (a budgeted correctness gate checks a prefix): reference
    # §2 operators first, then the LLM-pipeline extensions, then the
    # generic complex-type and TPC-H batches.
    from greenbuttonengine_spark.plans import registry
    from greenbuttonengine_spark.plans import core_queries  # noqa: F401
    from greenbuttonengine_spark.plans import relational_queries  # noqa: F401
    from greenbuttonengine_spark.plans import advanced_queries  # noqa: F401

    try:
        from greenbuttonengine_spark.plans import extension_queries  # noqa: F401
    except ImportError:
        pass
    from greenbuttonengine_spark.plans import search_queries  # noqa: F401
    from greenbuttonengine_spark.plans import complex_queries  # noqa: F401
    from greenbuttonengine_spark.plans import tpch_queries  # noqa: F401

    return registry


# Rows-only entries (no oracle -> weaker check) run after every
# oracle-backed query, so a time-budgeted gate spends its window on the
# hard signal first; the slow ESPI ingest runs dead last.
_LAST = ("espi_egd_timeseries",)

# The driver's gate checks a 50-row budget per round.  These names
# already have green rows in CORRECTNESS_r01/r03; rotating them to the
# back lets the budget fall on the queries the driver has never
# verified, so cumulative driver coverage grows round over round.
_DRIVER_CHECKED = frozenset(
    {
        "q1_pricing_summary", "s1_scan_filter_project", "p2_conditional_projection",
        "p3_regex_key_extract", "p4_prefix_strip", "p5_empty_default_cast",
        "p6_unit_scaling", "p7_cost_normalization", "p8_hex_roundtrip",
        "p9_rfc3339_roundtrip", "p10_enum_decode_broadcast", "p11_dst_calendar_rules",
        "p11_bitfield_decode", "p12_global_conditional_patch",
        "p13_sanitize_measurement", "p14_tag_escape", "p15_epoch_unit_conversion",
        "p16_dispatch_validate", "p17_composite_filter", "j2_two_hop_fk_resolution",
        "j3_fact_dim_denormalize", "j4_null_rejecting_denormalize",
        "j5_left_join_enrich", "j7_semi_join", "j8_anti_join",
        "j6_scalar_broadcast_join", "a1_minmax_extent", "a2_any_exists_aggregate",
        "a3_group_chunks", "a4_counts", "o1_multikey_sort_rank", "o2_union_all",
        "o3_first_of_group", "o4_run_length_split", "o5_topk_limit", "o6_intersect",
        "o7_except", "w1_running_sum", "w2_lag_lead_delta", "w3_rank_per_group",
        "d1_date_trunc_rollup", "str1_string_functions", "rj1_time_neighbor_pairs",
        "gs1_grouping_sets", "sessionize_events", "rollup_revenue", "cube_counts",
        "pivot_returnflag", "agg_percentiles", "asof_last_click_before_purchase",
    }
)


def _ordered_names(reg) -> list[str]:
    names = [n for n in reg.QUERIES if n not in _LAST]
    oracle_new = [n for n in names if n in reg.ORACLES and n not in _DRIVER_CHECKED]
    oracle_checked = [n for n in names if n in reg.ORACLES and n in _DRIVER_CHECKED]
    rows_only = [n for n in names if n not in reg.ORACLES]
    return oracle_new + oracle_checked + rows_only + [
        n for n in _LAST if n in reg.QUERIES
    ]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    reg = _registry()
    return reg.QUERIES["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    reg = _registry()
    return {name: reg.QUERIES[name].fn for name in _ordered_names(reg)}


def oracle_sql() -> dict[str, str]:
    reg = _registry()
    return {n: reg.ORACLES[n] for n in _ordered_names(reg) if n in reg.ORACLES}
