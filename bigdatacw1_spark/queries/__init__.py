"""Query modules. Importing this package populates the registry."""

from bigdatacw1_spark.queries.registry import REGISTRY, QuerySpec

# Each import registers its queries via the @q decorator.
from bigdatacw1_spark.queries import inventory  # noqa: F401  (reference ports)
from bigdatacw1_spark.queries import ops_suite  # noqa: F401  (per-operator micro-queries)
from bigdatacw1_spark.queries import extensions  # noqa: F401  (dedup/similarity/text/multimodal)
from bigdatacw1_spark.queries import streaming_suite  # noqa: F401  (event-time windows)
from bigdatacw1_spark.queries import tpch  # noqa: F401  (TPC-H-shaped headliners)
from bigdatacw1_spark.queries import sampling_suite  # noqa: F401  (deterministic sampling)
from bigdatacw1_spark.queries import warehouse  # noqa: F401  (lifecycle + behavioral)
from bigdatacw1_spark.queries import finance_suite  # noqa: F401  (FX + trader limits)

# ---------------------------------------------------------------------------
# Driver correctness-window rotation.
#
# The round driver oracle-checks the FIRST 50 registry entries, in order.
# Round 1-2 windows covered the ref_* ports plus the p/j/a/w/set/f operator
# micro-queries (all green in CORRECTNESS_r02.json); this round the window
# rotates onto the entries that have never had a driver verdict: the TPC-H
# suite, the event-time (ev_*) oracle entries, the warehouse-lifecycle
# (wh_*) entries, and the two new finance entries — keeping the 5 reference
# ports pinned first as the permanent parity anchor. Everything else keeps
# its registration order after the priority block (locally oracle-checked
# every run by tests/test_parity.py, which iterates the FULL registry).
# ---------------------------------------------------------------------------
_DRIVER_WINDOW = [
    # reference parity anchor (driver-green r1+r2; keep pinned)
    "ref_nosql1_top_group",
    "ref_sql1_conditional_pivot",
    "ref_sql2_portfolio",
    "ref_nosql2_screening",
    "ref_nosql2_hof",
    # new this round: described-but-unqueried reference data model
    "f21_fx_convert",
    "f22_trader_limit_breach",
    # TPC-H suite (never driver-checked)
    "tpch_q1_pricing_summary",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_parts",
    "tpch_q12_late_shipment_priority",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_counts",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_orders",
    "tpch_q19_discounted_revenue",
    "tpch_q20_excess_shippers",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_global_sales_opportunity",
    # event-time suite, oracle-bearing entries (never driver-checked)
    "ev_tumbling_10min",
    "ev_sliding_10_5",
    "ev_session_30min",
    "ev_stateful_user_totals",
    "ev_interval_join",
    "ev_dedup_ingest",
    "ev_sessionize_lag",
    "ev_enrich_static",
    "ev_resample_ffill",
    "ev_time_rollup",
    "ev_interval_join_outer",
    "ev_tws_topk",
    "ev_twap",
    "ev_resample_interp",
    "ev_anomaly_zscore",
    # warehouse lifecycle (never driver-checked); wh_snapshot_diff is entry
    # 51 — first in line for the round-4 rotation with the ext_* block
    "wh_scd2_history",
    "wh_merge_upsert",
    "wh_missing_minutes",
    "wh_rolling_reach_7d",
    "wh_funnel_conversion",
    "wh_cohort_retention",
    "wh_snapshot_diff",
]


def _rotate_registry() -> None:
    missing = [n for n in _DRIVER_WINDOW if n not in REGISTRY]
    if missing:  # fail loudly at import: a typo here silently shrinks coverage
        raise RuntimeError(f"driver-window entries not in REGISTRY: {missing}")
    rest = {k: v for k, v in REGISTRY.items() if k not in set(_DRIVER_WINDOW)}
    ordered = {k: REGISTRY[k] for k in _DRIVER_WINDOW}
    ordered.update(rest)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_rotate_registry()

__all__ = ["REGISTRY", "QuerySpec"]
