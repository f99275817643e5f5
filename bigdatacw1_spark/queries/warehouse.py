"""Warehouse-lifecycle + behavioral-analytics query entries.

Each entry exercises one operators/warehouse.py operator against the
driver tables, with an ANSI-SQL DuckDB oracle. Cross-engine notes:

  - events.ts is nanos parquet; both engines truncate to microseconds
    (catalog.load_table / DuckDB native), so timestamps compare equal.
  - DATE_TRUNC/day arithmetic stays in timestamps in both engines;
    DuckDB ``DATE_DIFF('day', a, b)`` ≡ Spark ``datediff(b, a)`` on
    day-truncated values.
  - ratios divide exact integer counts and stable_round, so value hashes
    match bitwise (see operators/relational.stable_round).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatacw1_spark.operators.relational import exact_sum, stable_round
from bigdatacw1_spark.operators.warehouse import (
    cohort_retention,
    funnel_steps,
    merge_upsert,
    missing_buckets,
    rolling_distinct_per_day,
    scd2_from_log,
)
from bigdatacw1_spark.queries.registry import q
from bigdatacw1_spark.queries.registry import t as _t


@q(
    "wh_scd2_history",
    oracle="""
        WITH o AS (
            SELECT user_id, event_type, ts, event_id,
                   LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
            FROM events
        ), ch AS (
            SELECT user_id, event_type, ts, event_id
            FROM o WHERE prev IS NULL OR prev <> event_type
        )
        SELECT user_id, event_type, ts AS valid_from,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
               CASE WHEN LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_current
        FROM ch
    """,
)
def wh_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension build: compress each user's event-type change log
    into validity intervals (operators/warehouse.scd2_from_log). Treats
    event_type as the tracked attribute — the same two-window pattern
    builds price/segment history from any change feed."""
    return scd2_from_log(
        _t(spark, sf_dir, "events"),
        key_cols=["user_id"],
        attr_col="event_type",
        ts_col="ts",
        tiebreak="event_id",
    )


@q(
    "wh_merge_upsert",
    oracle="""
        WITH tgt AS (
            SELECT c_custkey, c_name, c_acctbal, c_mktsegment
            FROM customer WHERE c_custkey <= 1200
        ), src AS (
            SELECT o_custkey AS k,
                   FLOOR(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) * 100.0 + 0.5) / 100.0 AS bal
            FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'
            GROUP BY o_custkey
        )
        SELECT COALESCE(c_custkey, k) AS c_custkey,
               COALESCE(c_name, 'Customer#new') AS c_name,
               COALESCE(bal, c_acctbal) AS c_acctbal,
               COALESCE(c_mktsegment, 'UNKNOWN') AS c_mktsegment,
               CASE WHEN c_custkey IS NOT NULL AND k IS NOT NULL THEN 'update'
                    WHEN k IS NOT NULL THEN 'insert'
                    ELSE 'keep' END AS merge_action
        FROM tgt FULL OUTER JOIN src ON c_custkey = k
    """,
)
def wh_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE upsert (operators/warehouse.merge_upsert): a stale dimension
    snapshot (custkeys ≤ 1200 — 'loaded before the last batch') receives
    per-customer balance updates aggregated from recent orders. All three
    branches fire: matched keys update, new keys insert with defaults,
    customers without recent orders keep. The merge relation is ONE
    full-outer join; write-back composes with sinks.upsert_partitions."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    target = c.where(F.col("c_custkey") <= 1200)
    source = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(exact_sum("o_totalprice", scale=2).alias("c_acctbal"))
    )
    return merge_upsert(
        target,
        source,
        key="c_custkey",
        set_cols=["c_acctbal"],
        insert_defaults={"c_name": "Customer#new", "c_mktsegment": "UNKNOWN"},
    )


@q(
    "wh_missing_minutes",
    oracle="""
        WITH b AS (
            SELECT DATE_TRUNC('minute', MIN(ts)) AS b0, DATE_TRUNC('minute', MAX(ts)) AS b1
            FROM events
        ), g AS (
            SELECT UNNEST(GENERATE_SERIES(b0, b1, INTERVAL '1 minute')) AS bucket FROM b
        )
        SELECT bucket FROM g
        WHERE NOT EXISTS (
            SELECT 1 FROM events e WHERE DATE_TRUNC('minute', e.ts) = g.bucket
        )
    """,
)
def wh_missing_minutes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-gap audit: minutes in the observed span with no events
    (operators/warehouse.missing_buckets). Dense calendar via
    sequence+explode, gap test as a pre-aggregated anti-join."""
    return missing_buckets(_t(spark, sf_dir, "events"), "ts", unit="minute")


@q(
    "wh_rolling_reach_7d",
    oracle="""
        WITH ud AS (
            SELECT DISTINCT DATE_TRUNC('day', ts) AS d, user_id FROM events
        ), days AS (
            SELECT DISTINCT d FROM ud
        ), cov AS (
            SELECT ud.user_id, ud.d + k * INTERVAL '1 day' AS cd
            FROM ud CROSS JOIN (SELECT UNNEST(RANGE(7)) AS k)
        )
        SELECT days.d AS day, COUNT(DISTINCT cov.user_id) AS ids_7d
        FROM days JOIN cov ON cov.cd = days.d
        GROUP BY days.d
    """,
)
def wh_rolling_reach_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day — exact sliding-window
    COUNT(DISTINCT) via interval-explode
    (operators/warehouse.rolling_distinct_per_day)."""
    return rolling_distinct_per_day(
        _t(spark, sf_dir, "events"), "ts", "user_id", window_days=7
    )


@q(
    "wh_funnel_conversion",
    oracle="""
        WITH v AS (
            SELECT user_id AS id, MIN(ts) AS view_ts
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ), c AS (
            SELECT e.user_id AS id, MIN(e.ts) AS click_ts
            FROM events e JOIN v ON e.user_id = v.id
            WHERE e.event_type = 'click'
              AND e.ts >= v.view_ts AND e.ts <= v.view_ts + INTERVAL '24 hours'
            GROUP BY e.user_id
        ), p AS (
            SELECT e.user_id AS id, MIN(e.ts) AS purchase_ts
            FROM events e
            JOIN v ON e.user_id = v.id
            JOIN c ON e.user_id = c.id
            WHERE e.event_type = 'purchase'
              AND e.ts >= c.click_ts AND e.ts <= v.view_ts + INTERVAL '24 hours'
            GROUP BY e.user_id
        )
        SELECT v.id AS user_id, v.view_ts, c.click_ts, p.purchase_ts,
               CASE WHEN p.purchase_ts IS NOT NULL THEN 1 ELSE 0 END AS converted
        FROM v LEFT JOIN c ON v.id = c.id LEFT JOIN p ON v.id = p.id
    """,
)
def wh_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential view→click→purchase funnel within 24h of the first view
    (operators/warehouse.funnel_steps): conditional-min per step, exact
    ordered semantics — not same-window co-occurrence."""
    return funnel_steps(
        _t(spark, sf_dir, "events"),
        id_col="user_id",
        ts_col="ts",
        type_col="event_type",
        steps=("view", "click", "purchase"),
        within_hours=24,
    )


@q(
    "wh_cohort_retention",
    oracle="""
        WITH ud AS (
            SELECT DISTINCT user_id AS id, DATE_TRUNC('day', ts) AS d FROM events
        ), cohorts AS (
            SELECT id, MIN(d) AS cohort_day FROM ud GROUP BY id
        ), j AS (
            SELECT ud.id, cohort_day, DATE_DIFF('day', cohort_day, d) AS k
            FROM ud JOIN cohorts ON ud.id = cohorts.id
        ), g AS (
            SELECT cohort_day, k, COUNT(*) AS n_active FROM j GROUP BY cohort_day, k
        )
        SELECT cohort_day, k, n_active,
               FLOOR((n_active / (MAX(CASE WHEN k = 0 THEN n_active END)
                                  OVER (PARTITION BY cohort_day))) * 10000.0 + 0.5) / 10000.0 AS retention
        FROM g
    """,
)
def wh_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-activity-day cohorts × day-offset retention matrix
    (operators/warehouse.cohort_retention); the denominator is the
    cohort's offset-0 size via a partition window."""
    return cohort_retention(_t(spark, sf_dir, "events"), "user_id", "ts")


@q(
    "wh_snapshot_diff",
    oracle="""
        WITH old AS (
            SELECT c_custkey, c_acctbal, c_mktsegment FROM customer WHERE c_custkey <= 1200
        ), new AS (
            SELECT c_custkey,
                   CASE WHEN c_mktsegment = 'BUILDING'
                        THEN FLOOR((c_acctbal + 10.0) * 100.0 + 0.5) / 100.0
                        ELSE c_acctbal END AS c_acctbal,
                   c_mktsegment
            FROM customer WHERE c_custkey > 100
        )
        SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
               CASE WHEN o.c_custkey IS NULL THEN 'insert'
                    WHEN n.c_custkey IS NULL THEN 'delete'
                    WHEN o.c_acctbal IS DISTINCT FROM n.c_acctbal
                      OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment THEN 'update'
               END AS change_type,
               o.c_acctbal AS old_c_acctbal, o.c_mktsegment AS old_c_mktsegment,
               n.c_acctbal AS new_c_acctbal, n.c_mktsegment AS new_c_mktsegment
        FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
        WHERE CASE WHEN o.c_custkey IS NULL THEN 'insert'
                   WHEN n.c_custkey IS NULL THEN 'delete'
                   WHEN o.c_acctbal IS DISTINCT FROM n.c_acctbal
                     OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment THEN 'update'
              END IS NOT NULL
        ORDER BY c_custkey
    """,
)
def wh_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (operators/warehouse.snapshot_diff): recover the
    CDC delta between two loads of the customer dimension — keys 1-100
    disappear (deletes), keys past 1200 appear (inserts), BUILDING-
    segment balances shift by 10 (updates); unchanged rows are filtered
    before emission so the delta is change-sized. The synthetic 'new'
    snapshot uses stable_round arithmetic so both engines derive the
    identical modified balances."""
    from bigdatacw1_spark.operators.relational import stable_round
    from bigdatacw1_spark.operators.warehouse import snapshot_diff

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal", "c_mktsegment")
    old = c.where(F.col("c_custkey") <= 1200)
    new = c.where(F.col("c_custkey") > 100).select(
        "c_custkey",
        F.when(
            F.col("c_mktsegment") == "BUILDING",
            stable_round(F.col("c_acctbal") + 10.0, 2),
        )
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
        "c_mktsegment",
    )
    return snapshot_diff(
        old, new, key="c_custkey", compare_cols=["c_acctbal", "c_mktsegment"]
    ).orderBy("c_custkey")


@q(
    "diag_join_size",
    oracle="""
        WITH lk AS (
            SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS n_l FROM orders GROUP BY 1
        ), rk AS (
            SELECT c_custkey AS k, CAST(COUNT(*) AS BIGINT) AS n_r FROM customer GROUP BY 1
        )
        SELECT CAST(SUM(n_l * n_r) AS BIGINT) AS est_rows,
               CAST(MAX(n_l * n_r) AS BIGINT) AS max_key_rows,
               CAST(COUNT(*) AS BIGINT) AS n_join_keys
        FROM lk JOIN rk USING (k)
    """,
)
def diag_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimator: the EXACT output cardinality of
    orders⋈customer computed from per-key counts (Σ n_l·n_r) WITHOUT
    running the join — plus the hottest key's contribution, the number
    that tells you whether a shuffle join will explode before you pay
    for it. Two map-side-combined counts + one key-sized join: at
    100 TB this costs two aggregations over the join keys, never the
    join itself. Companion of diag_key_skew."""
    o = _t(spark, sf_dir, "orders").groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n_l")
    )
    c = _t(spark, sf_dir, "customer").groupBy(F.col("c_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n_r")
    )
    j = o.join(c, "k")
    prod = F.col("n_l") * F.col("n_r")
    return j.agg(
        F.sum(prod).alias("est_rows"),
        F.max(prod).alias("max_key_rows"),
        F.count(F.lit(1)).alias("n_join_keys"),
    )


@q(
    "wh_scd2_lookup",
    oracle="""
        WITH t AS (
            SELECT o_orderkey, o_custkey, o_orderdate,
                   CASE WHEN o_totalprice > 300000 THEN 'gold'
                        WHEN o_totalprice > 100000 THEN 'silver'
                        ELSE 'bronze' END AS tier
            FROM orders
        ), u AS (
            SELECT o_orderkey, o_custkey, o_orderdate, tier FROM (
                SELECT t.*, ROW_NUMBER() OVER (
                    PARTITION BY o_custkey, o_orderdate
                    ORDER BY o_orderkey DESC) AS rn
                FROM t
            ) WHERE rn = 1
        ), ch AS (
            SELECT o_custkey, tier, o_orderdate AS valid_from FROM (
                SELECT u.*, LAG(tier) OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) AS prev
                FROM u
            ) WHERE prev IS NULL OR prev <> tier
        )
        SELECT f.o_orderkey, f.o_custkey, f.tier AS tier_now, h.tier AS tier_then
        FROM t f ASOF LEFT JOIN ch h
          ON f.o_custkey = h.o_custkey
         AND f.o_orderdate - INTERVAL 90 DAY >= h.valid_from
        ORDER BY f.o_orderkey
    """,
)
def wh_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup — the composition SCD2 history
    exists FOR: each order is enriched with the customer-tier version
    valid 90 days earlier ("was this placed by a then-premium
    customer"). Pipeline: derive a tier change log from the orders
    themselves (deduped to one row per (customer, instant) so both
    engines agree on ties), compress to SCD2 validity intervals
    (operators/warehouse.scd2_from_log), then as-of join facts at
    t - 90d (operators/relational.as_of_join) — NOT an interval join:
    the union+window as-of shuffles once on the customer key, O(1)
    state per row, no per-version fan-out. Orders inside their
    customer's first 90 days get NULL tier_then (left-outer). Oracle:
    DuckDB ASOF LEFT JOIN over the identically-derived intervals."""
    from bigdatacw1_spark.operators.relational import argmin_per_group, as_of_join
    from bigdatacw1_spark.operators.warehouse import scd2_from_log

    o = _t(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") > 300000, "gold")
        .when(F.col("o_totalprice") > 100000, "silver")
        .otherwise("bronze")
    )
    log = o.select("o_custkey", "o_orderdate", "o_orderkey", tier.alias("tier"))
    log = argmin_per_group(log, ["o_custkey", "o_orderdate"], [F.desc("o_orderkey")])
    hist = scd2_from_log(log, ["o_custkey"], "tier", "o_orderdate", tiebreak="o_orderkey")
    versions = hist.select(
        "o_custkey", "valid_from", F.col("tier").alias("tier_then")
    )
    facts = o.select(
        "o_orderkey",
        "o_custkey",
        tier.alias("tier_now"),
        (F.col("o_orderdate") - F.expr("INTERVAL 90 DAYS")).alias("asof_ts"),
    )
    out = as_of_join(
        facts, versions, ["o_custkey"], "asof_ts", "valid_from", ["tier_then"]
    )
    return out.select("o_orderkey", "o_custkey", "tier_now", "tier_then").orderBy(
        "o_orderkey"
    )


@q(
    "wh_incremental_refresh",
    oracle="""
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
               CAST(MIN(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS min_cents,
               CAST(MAX(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS max_cents
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
)
def wh_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance (IVM): the per-user
    rollup is built from facts BEFORE 2024-01-15, then the later facts
    are folded in as a delta via operators/warehouse.incremental_agg_refresh
    — O(delta) + O(groups), never rescanning the base. The oracle is the
    semantic contract itself: one plain GROUP BY over ALL events — if the
    distributive combine (sum+=sum, count+=count, min/max fold) is wrong
    anywhere, the value hash breaks. Measures are integer cents, so the
    refreshed sums are bit-identical to the recompute."""
    from bigdatacw1_spark.operators.warehouse import incremental_agg_refresh

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    split = F.lit("2024-01-15 00:00:00").cast("timestamp_ntz")
    measures = {
        "n": ("count", "cents"),
        "sum_cents": ("sum", "cents"),
        "min_cents": ("min", "cents"),
        "max_cents": ("max", "cents"),
    }
    base = (
        ev.where(F.col("ts") < split)
        .groupBy("user_id")
        .agg(
            F.count("cents").alias("n"),
            F.sum("cents").alias("sum_cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
    )
    delta = ev.where(F.col("ts") >= split)
    return incremental_agg_refresh(base, delta, ["user_id"], measures).orderBy("user_id")


@q(
    "wh_dq_checks",
    oracle="""
        WITH checks AS (
            SELECT 'orderkey_unique' AS rule,
                   COALESCE(SUM(n - 1), 0) AS n_violations
            FROM (SELECT o_orderkey, COUNT(*) AS n FROM orders GROUP BY o_orderkey) WHERE n > 1
            UNION ALL
            SELECT 'custkey_not_null', COUNT(*) FILTER (WHERE o_custkey IS NULL) FROM orders
            UNION ALL
            SELECT 'status_accepted', COUNT(*) FILTER (WHERE o_orderstatus IS NULL OR o_orderstatus NOT IN ('O', 'F', 'P')) FROM orders
            UNION ALL
            SELECT 'totalprice_positive', COUNT(*) FILTER (WHERE o_totalprice IS NULL OR NOT (o_totalprice >= 0.01 AND o_totalprice <= 1000000)) FROM orders
            UNION ALL
            SELECT 'priority_format', COUNT(*) FILTER (WHERE o_orderpriority IS NULL OR NOT REGEXP_MATCHES(o_orderpriority, '^[1-5]-[A-Z ]+$')) FROM orders
            UNION ALL
            SELECT 'custkey_references_customer', COUNT(*)
            FROM orders LEFT JOIN customer ON o_custkey = c_custkey
            WHERE o_custkey IS NOT NULL AND c_custkey IS NULL
        )
        SELECT rule, CAST(n_violations AS BIGINT) AS n_violations,
               n_violations = 0 AS passed
        FROM checks ORDER BY rule
    """,
)
def wh_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (operators/warehouse.dq_checks —
    the dbt-tests/Deequ pattern): six rules over orders validated in
    three passes total — the four row-level rules (not_null, accepted
    values, range, regex) fold into ONE conditional aggregation on a
    single scan; uniqueness is one hash aggregate on the key; the FK
    check is one LEFT ANTI join against broadcast customer keys. At
    100 TB the row-rule pass costs the same scan regardless of how many
    rules ride it — the reason the engine batches them."""
    from bigdatacw1_spark.operators.warehouse import dq_checks

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    rules = [
        {"name": "custkey_not_null", "type": "not_null", "column": "o_custkey"},
        {"name": "status_accepted", "type": "accepted_values", "column": "o_orderstatus",
         "values": ["O", "F", "P"]},
        {"name": "totalprice_positive", "type": "range", "column": "o_totalprice",
         "min": 0.01, "max": 1_000_000},
        {"name": "priority_format", "type": "regex", "column": "o_orderpriority",
         "pattern": r"^[1-5]-[A-Z ]+$"},
        {"name": "orderkey_unique", "type": "unique", "columns": ["o_orderkey"]},
        {"name": "custkey_references_customer", "type": "references",
         "column": "o_custkey", "ref": "customer", "ref_column": "c_custkey"},
    ]
    return dq_checks(orders, rules, references={"customer": customer}).orderBy("rule")


@q(
    "wh_drift_ks",
    oracle="""
        WITH s AS (
            SELECT event_type, value,
                   CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS fa
            FROM events
        ), c AS (
            SELECT event_type, value, fa,
                   SUM(fa) OVER (PARTITION BY event_type ORDER BY value
                                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
                   SUM(1 - fa) OVER (PARTITION BY event_type ORDER BY value
                                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
                   SUM(fa) OVER (PARTITION BY event_type) AS na,
                   SUM(1 - fa) OVER (PARTITION BY event_type) AS nb
            FROM s
        )
        SELECT event_type,
               CAST(MAX(na) AS BIGINT) AS n_a,
               CAST(MAX(nb) AS BIGINT) AS n_b,
               FLOOR(MAX(ABS(ca / CAST(na AS DOUBLE) - cb / CAST(nb AS DOUBLE)))
                     * 10000.0 + 0.5) / 10000.0 AS ks_stat
        FROM c GROUP BY event_type ORDER BY event_type
    """,
)
def wh_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor (operators/warehouse.ks_drift): exact
    two-sample KS statistic of the value distribution, first half of the
    month vs second, per event type. RANGE-framed ECDFs handle
    cross-sample ties identically in both engines; integer cumulative
    counts + one double division per row keep the rounded statistic
    hash-stable."""
    from bigdatacw1_spark.operators.warehouse import ks_drift

    ev = _t(spark, sf_dir, "events")
    return ks_drift(
        ev,
        "value",
        F.col("ts") < F.lit("2024-01-16").cast("timestamp"),
        ["event_type"],
    ).orderBy("event_type")


@q(
    "wh_drift_psi",
    oracle="""
        WITH s AS (
            SELECT event_type,
                   LEAST(GREATEST(CAST(FLOOR(value / 50.0) AS INT), 0), 9) AS bucket,
                   CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS fa
            FROM events
        ), cnt AS (
            SELECT event_type, bucket, SUM(fa) AS ca, SUM(1 - fa) AS cb
            FROM s GROUP BY event_type, bucket
        ), dense AS (
            SELECT et.event_type, d.bucket,
                   COALESCE(cnt.ca, 0) AS ca, COALESCE(cnt.cb, 0) AS cb
            FROM (SELECT DISTINCT event_type FROM s) et
            CROSS JOIN (SELECT UNNEST(RANGE(0, 10)) AS bucket) d
            LEFT JOIN cnt ON cnt.event_type = et.event_type AND cnt.bucket = d.bucket
        ), terms AS (
            SELECT event_type, bucket,
                   SUM(ca) OVER (PARTITION BY event_type) AS na,
                   SUM(cb) OVER (PARTITION BY event_type) AS nb,
                   ca, cb
            FROM dense
        ), t2 AS (
            SELECT event_type, bucket, na, nb,
                   ((ca + 1) / CAST(na + 10 AS DOUBLE) - (cb + 1) / CAST(nb + 10 AS DOUBLE))
                   * LN(((ca + 1) / CAST(na + 10 AS DOUBLE)) / ((cb + 1) / CAST(nb + 10 AS DOUBLE))) AS term
            FROM terms
        )
        SELECT event_type,
               CAST(MAX(na) AS BIGINT) AS n_a,
               CAST(MAX(nb) AS BIGINT) AS n_b,
               FLOOR(LIST_SUM(LIST(term ORDER BY bucket)) * 10000.0 + 0.5) / 10000.0 AS psi
        FROM t2 GROUP BY event_type ORDER BY event_type
    """,
)
def wh_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed PSI drift monitor (operators/warehouse.psi_drift) —
    one hash aggregation instead of KS's per-group sort: the
    scale-friendly half of the drift toolkit, same first-vs-second half
    split as wh_drift_ks. Laplace-smoothed exact counts, densified
    buckets, bucket-ordered float fold ⇒ hash-stable psi."""
    from bigdatacw1_spark.operators.warehouse import psi_drift

    ev = _t(spark, sf_dir, "events")
    return psi_drift(
        ev, "value", F.col("ts") < F.lit("2024-01-16").cast("timestamp"), ["event_type"]
    ).orderBy("event_type")


@q(
    "wh_ivm_join_delta",
    oracle="""
        WITH a_base AS (SELECT * FROM orders WHERE o_orderkey % 10 <> 0),
             a_delta AS (SELECT * FROM orders WHERE o_orderkey % 10 = 0),
             b_base AS (SELECT * FROM customer WHERE c_custkey % 7 <> 0),
             b_delta AS (SELECT * FROM customer WHERE c_custkey % 7 = 0),
             new_v AS (
                 SELECT o_orderkey, o_custkey, c_name, o_totalprice
                 FROM orders JOIN customer ON o_custkey = c_custkey
             ),
             old_v AS (
                 SELECT o_orderkey, o_custkey, c_name, o_totalprice
                 FROM a_base JOIN b_base ON o_custkey = c_custkey
             ),
             delta AS (SELECT * FROM new_v EXCEPT SELECT * FROM old_v)
        SELECT o_orderkey, o_custkey, c_name, o_totalprice,
               CASE WHEN o_orderkey % 10 = 0 THEN 'delta_fact'
                    ELSE 'delta_dim' END AS src
        FROM delta
        ORDER BY o_orderkey
    """,
)
def wh_ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-view maintenance (operators/warehouse.
    ivm_join_delta): orders ending in 0 and customers divisible by 7
    play the insert batches; the maintained delta for the denormalized
    orders-x-customer view comes from two delta-broadcast joins, never a
    full recompute. The oracle derives the same delta INDEPENDENTLY as
    full-new-view EXCEPT full-old-view, validating the incremental
    algebra, not mirroring it. Change-sized output."""
    from bigdatacw1_spark.operators.warehouse import ivm_join_delta

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    dv = ivm_join_delta(
        o.where(F.col("o_orderkey") % 10 != 0),
        o.where(F.col("o_orderkey") % 10 == 0),
        c.where(F.col("c_custkey") % 7 != 0),
        c.where(F.col("c_custkey") % 7 == 0),
        on=[("o_custkey", "c_custkey")],
    )
    return dv.select(
        "o_orderkey",
        "o_custkey",
        "c_name",
        "o_totalprice",
        F.when(F.col("o_orderkey") % 10 == 0, F.lit("delta_fact"))
        .otherwise(F.lit("delta_dim"))
        .alias("src"),
    ).orderBy("o_orderkey")


@q(
    "wh_bitemporal_lookup",
    oracle="""
        WITH versions AS (
            SELECT user_id, DATE_TRUNC('day', ts) AS valid_day, ts AS tx_ts, value
            FROM events
        ), known1 AS (
            SELECT user_id, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY valid_day DESC, tx_ts DESC) AS rn
            FROM versions
            WHERE valid_day <= TIMESTAMP '2024-01-10 00:00:00'
              AND tx_ts <= TIMESTAMP '2024-01-12 00:00:00'
        ), known2 AS (
            SELECT user_id, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY valid_day DESC, tx_ts DESC) AS rn
            FROM versions
            WHERE valid_day <= TIMESTAMP '2024-01-10 00:00:00'
              AND tx_ts <= TIMESTAMP '2024-01-25 00:00:00'
        )
        SELECT COALESCE(k1.user_id, k2.user_id) AS user_id,
               k1.value AS value_known_early,
               k2.value AS value_known_late,
               (k1.value IS DISTINCT FROM k2.value) AS corrected
        FROM (SELECT user_id, value FROM known1 WHERE rn = 1) k1
        FULL OUTER JOIN (SELECT user_id, value FROM known2 WHERE rn = 1) k2
          USING (user_id)
        ORDER BY user_id
    """,
)
def wh_bitemporal_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal audit query — "what did we believe THEN vs what do we
    believe NOW about the same business date": each event is a version
    (valid_day = business validity, tx_ts = when the warehouse learned
    it); the same business-time lookup runs at two transaction times and
    the diff flags values that late-arriving corrections changed. The
    missing axis in plain SCD2 (wh_scd2_lookup tracks validity only):
    regulators ask for as-known-at reports, and this is that query. Two
    rank windows sharing one partitioning + a full outer join; values
    pass through untouched so the hash is exact."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    versions = ev.select(
        "user_id",
        F.date_trunc("day", "ts").alias("valid_day"),
        F.col("ts").alias("tx_ts"),
        "value",
    )
    t_b = F.lit("2024-01-10 00:00:00").cast("timestamp")

    def known(tx_cut: str):
        w = Window.partitionBy("user_id").orderBy(
            F.desc("valid_day"), F.desc("tx_ts")
        )
        return (
            versions.where(
                (F.col("valid_day") <= t_b)
                & (F.col("tx_ts") <= F.lit(tx_cut).cast("timestamp"))
            )
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("user_id", "value")
        )

    k1 = known("2024-01-12 00:00:00").withColumnRenamed("value", "value_known_early")
    k2 = known("2024-01-25 00:00:00").withColumnRenamed("value", "value_known_late")
    return (
        k1.join(k2, "user_id", "full_outer")
        .select(
            "user_id",
            "value_known_early",
            "value_known_late",
            (~F.col("value_known_early").eqNullSafe(F.col("value_known_late"))).alias(
                "corrected"
            ),
        )
        .orderBy("user_id")
    )


@q(
    "wh_cuped_adjusted",
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   SUM(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                            THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS x,
                   SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                            THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS y
            FROM events GROUP BY user_id
        ), s AS (
            SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                   SUM(x * y) AS sxy, SUM(x * x) AS sxx
            FROM per_user
        ), t AS (
            SELECT *, CAST(n * sxy - sx * sy AS DOUBLE)
                        / CAST(n * sxx - sx * sx AS DOUBLE) AS theta
            FROM per_user CROSS JOIN s
        )
        SELECT user_id,
               FLOOR((x / 100.0) * 10000.0 + 0.5) / 10000.0 AS pre_metric,
               FLOOR((y / 100.0) * 10000.0 + 0.5) / 10000.0 AS post_metric,
               FLOOR(((y - theta * (x - CAST(sx AS DOUBLE) / n)) / 100.0) * 10000.0 + 0.5)
                 / 10000.0 AS post_adjusted
        FROM t
        ORDER BY user_id
    """,
)
def wh_cuped_adjusted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction — the experimentation-platform standard:
    adjust each user's post-period metric by theta*(pre - mean(pre)),
    theta = Cov(pre, post)/Var(pre), shrinking metric variance without
    biasing the treatment-effect estimate. Every moment is an exact
    BIGINT in integer cents (products stay far under 2^63), theta is one
    double division of exact integers, and the per-user adjustment runs
    the identical IEEE sequence in both engines before floor rounding.
    One per-user conditional aggregate + one broadcast stats row."""
    ev = _t(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    cents = F.round(F.col("value") * 100).cast("long")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, cents).otherwise(F.lit(0))).alias("x"),
        F.sum(F.when(F.col("ts") >= cut, cents).otherwise(F.lit(0))).alias("y"),
    )
    s = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    from bigdatacw1_spark.operators.relational import stable_round

    t = per_user.crossJoin(F.broadcast(s)).withColumn(
        "theta",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"),
    )
    return t.select(
        "user_id",
        stable_round(F.col("x") / 100.0, 4).alias("pre_metric"),
        stable_round(F.col("y") / 100.0, 4).alias("post_metric"),
        stable_round(
            (
                F.col("y")
                - F.col("theta") * (F.col("x") - F.col("sx").cast("double") / F.col("n"))
            )
            / 100.0,
            4,
        ).alias("post_adjusted"),
    ).orderBy("user_id")


@q(
    "wh_survival_km",
    oracle="""
        WITH life AS (
            SELECT user_id, event_type,
                   DATE_DIFF('day', MIN(DATE_TRUNC('day', ts)),
                             MAX(DATE_TRUNC('day', ts))) AS dur,
                   (MAX(DATE_TRUNC('day', ts)) <
                    (SELECT MAX(DATE_TRUNC('day', ts)) FROM events)
                      - INTERVAL 2 DAY) AS churned
            FROM events GROUP BY user_id, event_type
        ), by_t AS (
            SELECT dur AS t,
                   COUNT(*) AS ending,
                   COUNT(*) FILTER (churned) AS d
            FROM life GROUP BY dur
        ), risk AS (
            SELECT t, d,
                   SUM(ending) OVER (ORDER BY t DESC
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS n
            FROM by_t
        ), km AS (
            SELECT t, CAST(d AS BIGINT) AS d, CAST(n AS BIGINT) AS n,
                   SUM(LN(1.0 - CAST(d AS DOUBLE) / n))
                       OVER (ORDER BY t
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lns
            FROM risk
        )
        SELECT CAST(t AS INT) AS t, d, n,
               FLOOR(EXP(lns) * 10000.0 + 0.5) / 10000.0 AS survival
        FROM km
        ORDER BY t
    """,
)
def wh_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimation over (user, activity-type)
    lifetimes — the
    retention curve with CENSORING handled correctly: users still
    active near the observation edge (last activity within 2 days of
    the corpus end) are censored, not counted as churn, which is what
    separates KM from a naive retention ratio. Risk sets come from a
    reverse running sum over the duration axis, and the product
    Π(1 - d/n) folds as a RUNNING SUM OF LOGS over the same ordered
    frame — a sequential deterministic fold in both engines (the
    char_entropy discipline applied to a window), so the rounded curve
    hash-compares. Aggregation is duration-bounded (≤ observation
    days), tiny regardless of user count."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts")
    life = ev.groupBy("user_id", "event_type").agg(
        F.datediff(F.max(day), F.min(day)).alias("dur"),
        F.max(day).alias("last_day"),
    )
    max_day = ev.agg(F.max(day).alias("gmax"))
    life = life.crossJoin(F.broadcast(max_day)).select(
        "dur",
        (F.col("last_day") < F.col("gmax") - F.expr("INTERVAL 2 DAYS")).alias("churned"),
    )
    by_t = life.groupBy(F.col("dur").alias("t")).agg(
        F.count(F.lit(1)).alias("ending"),
        F.count_if("churned").alias("d"),
    )
    w_rev = Window.orderBy(F.desc("t")).rowsBetween(Window.unboundedPreceding, 0)
    w_fwd = Window.orderBy(F.asc("t")).rowsBetween(Window.unboundedPreceding, 0)
    from bigdatacw1_spark.operators.relational import stable_round

    risk = by_t.withColumn("n", F.sum("ending").over(w_rev))
    km = risk.withColumn(
        "lns",
        F.sum(F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n"))).over(w_fwd),
    )
    return km.select(
        F.col("t").cast("int").alias("t"),
        F.col("d").cast("long").alias("d"),
        F.col("n").cast("long").alias("n"),
        stable_round(F.exp("lns"), 4).alias("survival"),
    ).orderBy("t")


@q(
    "wh_association_rules",
    oracle="""
        WITH baskets AS (
            SELECT DISTINCT user_id, DATE_TRUNC('day', ts) AS day, event_type
            FROM events
        ), nb AS (
            SELECT COUNT(DISTINCT (user_id, day)) AS n_baskets FROM baskets
        ), item AS (
            SELECT event_type, COUNT(*) AS cnt FROM baskets GROUP BY event_type
        ), pair AS (
            SELECT a.event_type AS antecedent, b.event_type AS consequent,
                   COUNT(*) AS support_cnt
            FROM baskets a
            JOIN baskets b ON a.user_id = b.user_id AND a.day = b.day
                          AND a.event_type <> b.event_type
            GROUP BY 1, 2
        )
        SELECT p.antecedent, p.consequent,
               CAST(p.support_cnt AS BIGINT) AS support_cnt,
               FLOOR((CAST(p.support_cnt AS DOUBLE) / ia.cnt) * 10000.0 + 0.5)
                 / 10000.0 AS confidence,
               FLOOR(((CAST(p.support_cnt AS DOUBLE) * nb.n_baskets)
                      / (CAST(ia.cnt AS DOUBLE) * ic.cnt)) * 10000.0 + 0.5)
                 / 10000.0 AS lift
        FROM pair p
        JOIN item ia ON ia.event_type = p.antecedent
        JOIN item ic ON ic.event_type = p.consequent
        CROSS JOIN nb
        ORDER BY p.antecedent, p.consequent
    """,
)
def wh_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over (user, day) baskets of
    activity types: support, confidence = P(B|A), and lift =
    P(A∧B)/(P(A)P(B)) for every ordered pair — lift > 1 is genuine
    co-occurrence beyond popularity, the classic
    recommendation/cross-sell primitive. All counts are exact integers
    (pair fan-out bounded by |types|² per basket); the two float ratios
    divide the same exact integers in the same order, so rounded values
    hash-compare. Item and basket totals broadcast back onto the pair
    table."""
    from bigdatacw1_spark.operators.relational import stable_round

    ev = _t(spark, sf_dir, "events")
    baskets = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("day"), "event_type"
    ).distinct()
    nb = baskets.select("user_id", "day").distinct().agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    item = baskets.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    a = baskets.select(
        "user_id", "day", F.col("event_type").alias("antecedent")
    )
    b = baskets.select(
        "user_id", "day", F.col("event_type").alias("consequent")
    )
    pair = (
        a.join(b, ["user_id", "day"])
        .where(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).alias("support_cnt"))
    )
    ia = item.select(F.col("event_type").alias("antecedent"), F.col("cnt").alias("cnt_a"))
    ic = item.select(F.col("event_type").alias("consequent"), F.col("cnt").alias("cnt_c"))
    return (
        pair.join(F.broadcast(ia), "antecedent")
        .join(F.broadcast(ic), "consequent")
        .crossJoin(F.broadcast(nb))
        .select(
            "antecedent",
            "consequent",
            F.col("support_cnt").cast("long").alias("support_cnt"),
            stable_round(
                F.col("support_cnt").cast("double") / F.col("cnt_a"), 4
            ).alias("confidence"),
            stable_round(
                (F.col("support_cnt").cast("double") * F.col("n_baskets"))
                / (F.col("cnt_a").cast("double") * F.col("cnt_c")),
                4,
            ).alias("lift"),
        )
        .orderBy("antecedent", "consequent")
    )


@q(
    "wh_abc_analysis",
    oracle="""
        WITH rev AS (
            SELECT o_custkey AS custkey,
                   SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_cents
            FROM orders GROUP BY o_custkey
        ), tot AS (SELECT SUM(rev_cents) AS total FROM rev),
        ranked AS (
            SELECT custkey, rev_cents,
                   SUM(rev_cents) OVER (ORDER BY rev_cents DESC, custkey
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS cum
            FROM rev
        )
        SELECT custkey,
               CAST(rev_cents AS BIGINT) AS rev_cents,
               CASE WHEN cum * 100 <= total * 80 THEN 'A'
                    WHEN cum * 100 <= total * 95 THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM ranked CROSS JOIN tot
        ORDER BY custkey
    """,
)
def wh_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC revenue classification: customers sorted by revenue,
    classed A while the running share stays within 80% of total, B to
    95%, C after — the 'which 20% of customers carry 80% of revenue'
    analysis. Revenue and running totals stay exact integer cents and
    the class boundaries compare via integer cross-multiplication
    (cum*100 <= total*80), so the class assignment is exact in any
    engine — no float share anywhere. The running total is computed
    WITHOUT a partition-less window: global_order_columns range-shards
    the (rev DESC, custkey) order and adds broadcast per-shard sum
    offsets, so the prefix sum is exact and every task holds one shard
    (the per-customer input is localCheckpoint'd so the helper's three
    passes aggregate orders once)."""
    from bigdatacw1_spark.operators.warehouse import global_order_columns

    o = _t(spark, sf_dir, "orders")
    rev = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_cents")
    ).localCheckpoint(eager=False)
    tot = rev.agg(F.sum("rev_cents").alias("total"))
    ranked, _ = global_order_columns(
        rev, -F.col("rev_cents"), [F.col("custkey")], value=F.col("rev_cents")
    )
    return (
        ranked.withColumnRenamed("__runsum", "cum").drop("__rank")
        .crossJoin(F.broadcast(tot))
        .select(
            "custkey",
            F.col("rev_cents").cast("long").alias("rev_cents"),
            F.when(F.col("cum") * 100 <= F.col("total") * 80, F.lit("A"))
            .when(F.col("cum") * 100 <= F.col("total") * 95, F.lit("B"))
            .otherwise(F.lit("C"))
            .alias("abc_class"),
        )
        .orderBy("custkey")
    )


@q(
    "wh_rfm_segments",
    oracle="""
        WITH per_cust AS (
            SELECT o_custkey AS custkey,
                   DATE_DIFF('day', MAX(o_orderdate),
                             (SELECT MAX(o_orderdate) FROM orders)) AS recency_days,
                   COUNT(*) AS frequency,
                   SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS monetary_cents
            FROM orders GROUP BY o_custkey
        ), scored AS (
            SELECT custkey, recency_days, frequency, monetary_cents,
                   NTILE(4) OVER (ORDER BY recency_days ASC, custkey) AS r,
                   NTILE(4) OVER (ORDER BY frequency DESC, custkey) AS f,
                   NTILE(4) OVER (ORDER BY monetary_cents DESC, custkey) AS m
            FROM per_cust
        )
        SELECT custkey,
               CAST(recency_days AS BIGINT) AS recency_days,
               CAST(frequency AS BIGINT) AS frequency,
               CAST(monetary_cents AS BIGINT) AS monetary_cents,
               CAST(r AS INT) AS r, CAST(f AS INT) AS f, CAST(m AS INT) AS m,
               CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR)
                 AS segment
        FROM scored
        ORDER BY custkey
    """,
)
def wh_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic CRM scoring: per customer the
    Recency (days since last order vs the corpus edge), Frequency
    (order count) and Monetary (integer-cent revenue) quartiles, each
    from an NTILE over a TOTALLY ordered frame (metric then custkey),
    so bucket edges are deterministic and engine-identical; quartile 1
    is always the best (most recent / most frequent / highest spend).
    The '111' cell is the champions segment every lifecycle campaign
    starts from. The three NTILEs are computed WITHOUT partition-less
    windows: per metric, global_order_columns range-shards the total
    order and adds broadcast shard offsets to per-shard row_numbers
    (exact rank), then ntile_from_rank maps rank to the identical
    NTILE bucket; the per-customer aggregate and each chained rank
    stage are localCheckpoint'd so no pass recomputes upstream."""
    from bigdatacw1_spark.operators.warehouse import (
        global_order_columns,
        ntile_from_rank,
    )

    o = _t(spark, sf_dir, "orders")
    gmax = o.agg(F.max("o_orderdate").alias("gmax"))
    per_cust = (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "monetary_cents"
            ),
        )
        .crossJoin(F.broadcast(gmax))
        .select(
            "custkey",
            F.datediff("gmax", "last_order").alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    per_cust = per_cust.localCheckpoint(eager=False)
    ck = F.col("custkey")
    s1, total = global_order_columns(
        per_cust, F.col("recency_days"), [ck], rank_col="__r_rank"
    )
    s2, _ = global_order_columns(
        s1.localCheckpoint(eager=False), -F.col("frequency"), [ck], rank_col="__f_rank"
    )
    s3, _ = global_order_columns(
        s2.localCheckpoint(eager=False), -F.col("monetary_cents"), [ck], rank_col="__m_rank"
    )
    scored = (
        s3.withColumn("r", ntile_from_rank(F.col("__r_rank"), total, 4))
        .withColumn("f", ntile_from_rank(F.col("__f_rank"), total, 4))
        .withColumn("m", ntile_from_rank(F.col("__m_rank"), total, 4))
    )
    return (
        scored
        .select(
            "custkey",
            F.col("recency_days").cast("long").alias("recency_days"),
            F.col("frequency").cast("long").alias("frequency"),
            "monetary_cents",
            F.col("r").cast("int").alias("r"),
            F.col("f").cast("int").alias("f"),
            F.col("m").cast("int").alias("m"),
            F.concat(
                F.col("r").cast("string"), F.col("f").cast("string"), F.col("m").cast("string")
            ).alias("segment"),
        )
        .orderBy("custkey")
    )


@q(
    "wh_journey_ngrams",
    oracle="""
        WITH seq AS (
            SELECT user_id, LIST(event_type ORDER BY ts, event_id) AS s
            FROM events GROUP BY user_id
        ), tri AS (
            SELECT s[i] || '>' || s[i + 1] || '>' || s[i + 2] AS path
            FROM seq, UNNEST(GENERATE_SERIES(1, LEN(s) - 2)) AS t(i)
        )
        SELECT path, CAST(COUNT(*) AS BIGINT) AS n
        FROM tri
        GROUP BY path
        ORDER BY n DESC, path
        LIMIT 20
    """,
)
def wh_journey_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey mining: the 20 most common event-type TRIGRAMS
    across all users' time-ordered activity streams — 'what do people
    do right before X' without hand-specifying a funnel. The per-user
    sequence is an ordered collect (bounded by per-user history);
    trigrams come from the zip-with-shifted-slices trick (the
    word_ngrams machinery applied to behavior), then one corpus count
    and a fused top-k. Deterministic: total (ts, event_id) order and
    a (count, path) tie-break."""
    from bigdatacw1_spark.functions.text import word_ngrams

    ev = _t(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda x: x["event_type"],
        ).alias("s")
    )
    tri = seq.select(
        F.explode(word_ngrams(F.col("s"), 3)).alias("spaced")
    ).select(F.replace(F.col("spaced"), F.lit(" "), F.lit(">")).alias("path"))
    return (
        tri.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(20)
    )


@q(
    "wh_attribution_touch",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_type, ts, event_id,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM events
        ), purchases AS (
            SELECT user_id, ts, event_id, cents FROM ordered
            WHERE event_type = 'purchase'
        ), touches AS (
            SELECT o.user_id, o.event_type, o.ts, o.event_id,
                   p.ts AS p_ts, p.event_id AS p_eid, p.cents
            FROM ordered o
            JOIN purchases p ON o.user_id = p.user_id
            WHERE o.event_type <> 'purchase'
              AND (o.ts < p.ts OR (o.ts = p.ts AND o.event_id < p.event_id))
        ), ranked AS (
            SELECT user_id, p_ts, p_eid, cents, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id, p_eid
                                      ORDER BY ts, event_id) AS rn_first,
                   ROW_NUMBER() OVER (PARTITION BY user_id, p_eid
                                      ORDER BY ts DESC, event_id DESC) AS rn_last
            FROM touches
        ), picks AS (
            SELECT user_id, p_ts, p_eid, cents,
                   MAX(CASE WHEN rn_first = 1 THEN event_type END) AS first_touch,
                   MAX(CASE WHEN rn_last = 1 THEN event_type END) AS last_touch
            FROM ranked
            GROUP BY user_id, p_ts, p_eid, cents
        ), split AS (
            SELECT first_touch AS channel, cents FROM picks
            UNION ALL
            SELECT last_touch AS channel, cents FROM picks
        )
        SELECT channel,
               CAST(SUM(cents) AS BIGINT) AS attributed_cents_x2,
               CAST(COUNT(*) AS BIGINT) AS n_touches
        FROM split
        GROUP BY channel
        ORDER BY channel
    """,
)
def wh_attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution: every purchase's value credited to the
    FIRST and the LAST preceding touch (non-purchase event) of that
    user — the two bookend models every attribution debate starts
    from, reported side by side (summed together here, so a channel
    strong at opening and closing shows double weight). Touch picks
    come from rank windows over the total (ts, event_id) order —
    no ties possible. Exact integer cents; the
    per-purchase scan is user-bounded."""
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    ordered = ev.select(
        "user_id", "event_type", "ts", "event_id", cents.alias("cents")
    )
    purchases = ordered.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_eid"),
        "cents",
    )
    touches = (
        ordered.where(F.col("event_type") != "purchase")
        .drop("cents")
        .join(purchases, "user_id")
        .where(
            (F.col("ts") < F.col("p_ts"))
            | ((F.col("ts") == F.col("p_ts")) & (F.col("event_id") < F.col("p_eid")))
        )
    )
    from pyspark.sql import Window

    wp = Window.partitionBy("user_id", "p_eid")
    ranked = touches.withColumn(
        "rn_first", F.row_number().over(wp.orderBy(F.asc("ts"), F.asc("event_id")))
    ).withColumn(
        "rn_last", F.row_number().over(wp.orderBy(F.desc("ts"), F.desc("event_id")))
    )
    picks = ranked.groupBy("user_id", "p_ts", "p_eid", "cents").agg(
        F.max(F.when(F.col("rn_first") == 1, F.col("event_type"))).alias("first_touch"),
        F.max(F.when(F.col("rn_last") == 1, F.col("event_type"))).alias("last_touch"),
    )
    split = picks.select(
        F.col("first_touch").alias("channel"), "cents"
    ).unionByName(picks.select(F.col("last_touch").alias("channel"), "cents"))
    return (
        split.groupBy("channel")
        .agg(
            F.sum("cents").cast("long").alias("attributed_cents_x2"),
            F.count(F.lit(1)).cast("long").alias("n_touches"),
        )
        .orderBy("channel")
    )


@q(
    "wh_cdc_apply",
    oracle="""
        WITH log AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN event_type = 'signup' THEN 'I'
                        WHEN event_type = 'error' THEN 'D'
                        ELSE 'U' END AS op,
                   CASE WHEN event_type IN ('signup', 'click', 'purchase')
                        THEN CAST(ROUND(value * 100) AS BIGINT) END AS a_cents,
                   CASE WHEN event_type IN ('signup', 'view', 'purchase')
                        THEN CAST(ROUND(value * 100) AS BIGINT) END AS b_cents
            FROM events
        ), r AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
            FROM log
        ), f AS (
            SELECT *,
                   MAX(CASE WHEN op = 'D' THEN rn END) OVER (PARTITION BY user_id) AS md,
                   MAX(CASE WHEN op = 'I' THEN rn END) OVER (PARTITION BY user_id) AS mi
            FROM r
        ), keep AS (
            SELECT * FROM f
            WHERE mi IS NOT NULL AND mi > COALESCE(md, 0) AND rn >= mi
        )
        SELECT user_id,
               MAX(CASE WHEN a_cents IS NOT NULL THEN {'rn': rn, 'v': a_cents} END).v AS a_cents,
               MAX(CASE WHEN b_cents IS NOT NULL THEN {'rn': rn, 'v': b_cents} END).v AS b_cents,
               CAST(COUNT(*) AS BIGINT) AS applied_ops
        FROM keep
        GROUP BY user_id
        ORDER BY user_id
    """,
)
def wh_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC change-log replay (operators/warehouse.cdc_materialize):
    events become a Debezium-style log — signup=INSERT (full row),
    error=DELETE (tombstone), click/view/purchase=sparse UPDATEs
    touching only some columns — and the operator materializes the
    final table state: a key survives iff an insert follows the last
    tombstone; each column keeps its last non-null write since that
    insert. The whole replay is one keyed shuffle: row_number + two
    window maxima + a struct-max hash aggregate ('last non-null write'
    made associative, so partial aggregation applies). Exact integer
    cents throughout."""
    ev = _t(spark, sf_dir, "events")
    from bigdatacw1_spark.operators.warehouse import cdc_materialize

    cents = F.round(F.col("value") * 100).cast("long")
    log = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
        F.when(
            F.col("event_type").isin("signup", "click", "purchase"), cents
        ).alias("a_cents"),
        F.when(
            F.col("event_type").isin("signup", "view", "purchase"), cents
        ).alias("b_cents"),
    )
    return cdc_materialize(
        log,
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        op_col="op",
        value_cols=["a_cents", "b_cents"],
    ).orderBy("user_id")


@q(
    "wh_zorder_layout",
    oracle="""
        WITH base AS (
            SELECT o_orderkey, o_custkey,
                   DATE_DIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS dt
            FROM orders
        ), ext AS (
            SELECT MIN(o_custkey) AS ck_lo, MAX(o_custkey) AS ck_hi,
                   MIN(dt) AS dt_lo, MAX(dt) AS dt_hi
            FROM base
        ), norm AS (
            SELECT o_orderkey, o_custkey, dt,
                   CAST((o_custkey - ck_lo) * 1024 // (ck_hi - ck_lo + 1) AS BIGINT) AS an,
                   CAST((dt - dt_lo) * 1024 // (dt_hi - dt_lo + 1) AS BIGINT) AS bn
            FROM base CROSS JOIN ext
        ), z AS (
            SELECT o_orderkey, o_custkey, dt,
                   (  ((an >> 0) & 1) << 1)  + (((bn >> 0) & 1) << 0)
                 + (((an >> 1) & 1) << 3)  + (((bn >> 1) & 1) << 2)
                 + (((an >> 2) & 1) << 5)  + (((bn >> 2) & 1) << 4)
                 + (((an >> 3) & 1) << 7)  + (((bn >> 3) & 1) << 6)
                 + (((an >> 4) & 1) << 9)  + (((bn >> 4) & 1) << 8)
                 + (((an >> 5) & 1) << 11) + (((bn >> 5) & 1) << 10)
                 + (((an >> 6) & 1) << 13) + (((bn >> 6) & 1) << 12)
                 + (((an >> 7) & 1) << 15) + (((bn >> 7) & 1) << 14)
                 + (((an >> 8) & 1) << 17) + (((bn >> 8) & 1) << 16)
                 + (((an >> 9) & 1) << 19) + (((bn >> 9) & 1) << 18) AS zv
            FROM norm
        ), filed AS (
            SELECT *, NTILE(16) OVER (ORDER BY zv, o_orderkey) AS file_id
            FROM z
        )
        SELECT CAST(file_id AS INT) AS file_id,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(MIN(o_custkey) AS BIGINT) AS ck_min,
               CAST(MAX(o_custkey) AS BIGINT) AS ck_max,
               CAST(MIN(dt) AS BIGINT) AS dt_min,
               CAST(MAX(dt) AS BIGINT) AS dt_max
        FROM filed
        GROUP BY file_id
        ORDER BY file_id
    """,
)
def wh_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ZORDER layout planning (operators/warehouse.zorder_key):
    orders laid out along a Morton curve over (custkey, order date) —
    both dims exact-integer min-max scaled to 10 bits, bits interleaved
    by pure shift/mask arithmetic, rows NTILE'd into 16 'files' along
    the curve. The per-file min/max columns ARE the point: under
    z-order both dimensions' spans stay narrow per file, so min/max
    file statistics prune scans filtered on EITHER column (a date-
    sorted layout prunes only date). The 4-value extent aggregate
    broadcasts; the NTILE(16) file cut is computed WITHOUT a
    partition-less window via global_order_columns (range-sharded
    exact rank + broadcast shard offsets) + ntile_from_rank, so no
    task ever holds more than one shard. Engine-exact integers; the
    cut determinized by the unique orderkey tie-break."""
    from bigdatacw1_spark.operators.warehouse import (
        global_order_columns,
        minmax_normalize,
        ntile_from_rank,
        zorder_key,
    )

    o = _t(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")).alias("dt"),
    )
    ext = base.agg(
        F.min("o_custkey").alias("ck_lo"),
        F.max("o_custkey").alias("ck_hi"),
        F.min("dt").alias("dt_lo"),
        F.max("dt").alias("dt_hi"),
    )
    norm = base.crossJoin(F.broadcast(ext)).select(
        "o_orderkey",
        "o_custkey",
        "dt",
        minmax_normalize(F.col("o_custkey"), F.col("ck_lo"), F.col("ck_hi")).alias("an"),
        minmax_normalize(F.col("dt"), F.col("dt_lo"), F.col("dt_hi")).alias("bn"),
    )
    z = norm.withColumn("zv", zorder_key(F.col("an"), F.col("bn")))
    ranked, total = global_order_columns(z, F.col("zv"), [F.col("o_orderkey")])
    filed = ranked.withColumn(
        "file_id", ntile_from_rank(F.col("__rank"), total, 16)
    )
    return (
        filed.groupBy(F.col("file_id").cast("int").alias("file_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("o_custkey").cast("long").alias("ck_min"),
            F.max("o_custkey").cast("long").alias("ck_max"),
            F.min("dt").cast("long").alias("dt_min"),
            F.max("dt").cast("long").alias("dt_max"),
        )
        .orderBy("file_id")
    )


@q(
    "wh_compaction_plan",
    oracle="""
        WITH files AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   CAST(COUNT(*) * 128 AS BIGINT) AS bytes
            FROM orders GROUP BY day
        ), c AS (
            SELECT day, bytes,
                   COALESCE(SUM(bytes) OVER (ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
            FROM files
        )
        SELECT CAST(cum_before // 131072 AS BIGINT) AS bin_id,
               CAST(COUNT(*) AS BIGINT) AS n_files,
               CAST(SUM(bytes) AS BIGINT) AS total_bytes,
               CAST(MIN(day) AS VARCHAR) AS day_min,
               CAST(MAX(day) AS VARCHAR) AS day_max
        FROM c
        GROUP BY bin_id
        ORDER BY bin_id
    """,
)
def wh_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning — the metadata-only operation that
    keeps a 100 TB table scannable: daily ingests leave one small file
    per day (modeled here as per-day orders byte sizes at 128 B/row);
    the planner bin-packs consecutive days into ~128 KiB compaction
    groups via a cumulative-sum prefix division, so each group is a
    merge job touching adjacent files only (date locality preserved →
    partition pruning still works after compaction). Pure window +
    hash aggregate over a file INVENTORY, never the data — exactly how
    OPTIMIZE schedulers plan before touching a byte. Exact integers."""
    o = _t(spark, sf_dir, "orders")
    from pyspark.sql import Window

    files = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        (F.count(F.lit(1)) * 128).cast("long").alias("bytes")
    )
    cum_before = F.coalesce(
        F.sum("bytes").over(
            Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    c = files.withColumn("cum_before", cum_before)
    return (
        c.groupBy(
            F.floor(F.col("cum_before") / 131072).cast("long").alias("bin_id")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("bytes").cast("long").alias("total_bytes"),
            F.min("day").cast("string").alias("day_min"),
            F.max("day").cast("string").alias("day_max"),
        )
        .orderBy("bin_id")
    )


@q(
    "wh_time_to_convert",
    oracle="""
        WITH v0 AS (
            SELECT user_id, MIN(ts) AS first_view
            FROM events WHERE event_type = 'view'
            GROUP BY user_id
        ), conv AS (
            SELECT v.user_id, v.first_view, MIN(e.ts) AS first_purchase
            FROM v0 v JOIN events e
              ON e.user_id = v.user_id
             AND e.event_type = 'purchase'
             AND e.ts > v.first_view
            GROUP BY v.user_id, v.first_view
        ), lat AS (
            SELECT STRFTIME(DATE_TRUNC('month', first_view), '%Y-%m') AS cohort,
                   EPOCH_US(first_purchase) // 1000000
                 - EPOCH_US(first_view) // 1000000 AS latency_s
            FROM conv
        )
        SELECT cohort,
               CAST(COUNT(*) AS BIGINT) AS n_converted,
               MEDIAN(latency_s) AS median_s,
               QUANTILE_CONT(latency_s, 0.9) AS p90_s
        FROM lat
        GROUP BY cohort
        ORDER BY cohort
    """,
)
def wh_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution: per user, seconds from FIRST
    view to the first purchase strictly after it, summarized as
    median/p90 per first-view month cohort — the funnel-health metric
    behind 'how long does intent take to close'. Two keyed hash
    aggregates and one equi join on user_id (the first-view table is a
    per-user single row, broadcastable at any scale). Latencies are
    exact integer seconds; both engines linear-interpolate
    median/percentile over the same integer multiset, so the values
    hash-compare exactly (f15/f16 precedent)."""
    ev = _t(spark, sf_dir, "events")
    v0 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .join(F.broadcast(v0), "user_id")
        .where(F.col("ts") > F.col("first_view"))
        .groupBy("user_id", "first_view")
        .agg(F.min("ts").alias("first_purchase"))
    )
    sec = lambda c: F.floor(F.unix_micros(F.col(c).cast("timestamp")) / 1_000_000)  # noqa: E731
    lat = conv.select(
        F.date_format(F.date_trunc("month", "first_view"), "yyyy-MM").alias("cohort"),
        (sec("first_purchase") - sec("first_view")).cast("long").alias("latency_s"),
    )
    return (
        lat.groupBy("cohort")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_converted"),
            F.median("latency_s").alias("median_s"),
            F.percentile("latency_s", F.lit(0.9)).alias("p90_s"),
        )
        .orderBy("cohort")
    )


def _hilbert_cte_chain(bits: int = 10) -> str:
    """Generate the DuckDB CTE chain mirroring operators/warehouse.
    hilbert_key level by level — ONE source of truth for the iteration
    structure, so the oracle cannot drift from the Spark expression
    tree by hand-editing."""
    ctes = []
    prev = "norm0"
    for i, level in enumerate(range(bits - 1, -1, -1)):
        s = 1 << level
        name = f"it{i + 1}"
        ctes.append(f"""{name} AS (
            SELECT o_orderkey, o_custkey, dt,
                   d + {s * s} * XOR(3 * (CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END),
                                     (CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)) AS d,
                   CASE WHEN (y & {s}) > 0 THEN x
                        WHEN (x & {s}) > 0 THEN {s - 1} - y
                        ELSE y END AS x,
                   CASE WHEN (y & {s}) > 0 THEN y
                        WHEN (x & {s}) > 0 THEN {s - 1} - x
                        ELSE x END AS y
            FROM {prev}
        )""")
        prev = name
    return ",\n".join(ctes), prev


_HILBERT_CTES, _HILBERT_LAST = _hilbert_cte_chain(10)

@q(
    "wh_hilbert_layout",
    oracle=f"""
        WITH base AS (
            SELECT o_orderkey, o_custkey,
                   DATE_DIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS dt
            FROM orders
        ), ext AS (
            SELECT MIN(o_custkey) AS ck_lo, MAX(o_custkey) AS ck_hi,
                   MIN(dt) AS dt_lo, MAX(dt) AS dt_hi
            FROM base
        ), norm0 AS (
            SELECT o_orderkey, o_custkey, dt,
                   CAST((o_custkey - ck_lo) * 1024 // (ck_hi - ck_lo + 1) AS BIGINT) AS x,
                   CAST((dt - dt_lo) * 1024 // (dt_hi - dt_lo + 1) AS BIGINT) AS y,
                   CAST(0 AS BIGINT) AS d
            FROM base CROSS JOIN ext
        ),
        {_HILBERT_CTES},
        filed AS (
            SELECT *, NTILE(16) OVER (ORDER BY d, o_orderkey) AS file_id
            FROM {_HILBERT_LAST}
        )
        SELECT CAST(file_id AS INT) AS file_id,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(MIN(o_custkey) AS BIGINT) AS ck_min,
               CAST(MAX(o_custkey) AS BIGINT) AS ck_max,
               CAST(MIN(dt) AS BIGINT) AS dt_min,
               CAST(MAX(dt) AS BIGINT) AS dt_max
        FROM filed
        GROUP BY file_id
        ORDER BY file_id
    """,
)
def wh_hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering (operators/warehouse.hilbert_key) over
    the same (custkey, order date) plane as wh_zorder_layout — the
    jump-free curve liquid-clustering engines prefer: consecutive index
    ranges are compact regions, so the 16 'files' cut along the curve
    carry even tighter min/max stats than Morton on both dims. The key
    is 10 chained CASE/shift/mask expression layers (no UDF); the
    oracle's CTE chain is GENERATED from the same iteration spec, and
    the expression tree itself is property-tested against the textbook
    xy→d reference in tests/test_warehouse.py. Exact BIGINT end to
    end."""
    from bigdatacw1_spark.operators.warehouse import (
        global_order_columns,
        minmax_normalize,
        ntile_from_rank,
        with_hilbert_key,
    )

    o = _t(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")).alias("dt"),
    )
    ext = base.agg(
        F.min("o_custkey").alias("ck_lo"),
        F.max("o_custkey").alias("ck_hi"),
        F.min("dt").alias("dt_lo"),
        F.max("dt").alias("dt_hi"),
    )
    norm = base.crossJoin(F.broadcast(ext)).select(
        "o_orderkey",
        "o_custkey",
        "dt",
        minmax_normalize(F.col("o_custkey"), F.col("ck_lo"), F.col("ck_hi")).alias("x"),
        minmax_normalize(F.col("dt"), F.col("dt_lo"), F.col("dt_hi")).alias("y"),
    )
    keyed = with_hilbert_key(norm, "x", "y", out_col="d")
    ranked, total = global_order_columns(keyed, F.col("d"), [F.col("o_orderkey")])
    filed = ranked.withColumn(
        "file_id", ntile_from_rank(F.col("__rank"), total, 16)
    )
    return (
        filed.groupBy(F.col("file_id").cast("int").alias("file_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("o_custkey").cast("long").alias("ck_min"),
            F.max("o_custkey").cast("long").alias("ck_max"),
            F.min("dt").cast("long").alias("dt_min"),
            F.max("dt").cast("long").alias("dt_max"),
        )
        .orderBy("file_id")
    )


@q(
    "wh_fifo_allocation",
    oracle="""
        WITH dep AS (
            SELECT user_id, ts, event_id,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents,
                   SUM(CAST(ROUND(value * 100) AS BIGINT))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id) AS cum_hi
            FROM events WHERE event_type = 'view'
        ), wd AS (
            SELECT user_id, ts, event_id,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents,
                   SUM(CAST(ROUND(value * 100) AS BIGINT))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id) AS cum_hi
            FROM events WHERE event_type = 'purchase'
        ), d AS (
            SELECT user_id, event_id AS dep_id, cum_hi - cents AS lo, cum_hi AS hi FROM dep
        ), w AS (
            SELECT user_id, event_id AS wd_id, cum_hi - cents AS lo, cum_hi AS hi FROM wd
        ), matched AS (
            SELECT d.user_id, d.dep_id, w.wd_id,
                   LEAST(d.hi, w.hi) - GREATEST(d.lo, w.lo) AS m
            FROM d JOIN w ON d.user_id = w.user_id
                        AND d.lo < w.hi AND w.lo < d.hi
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_lots,
               CAST(COUNT(DISTINCT wd_id) AS BIGINT) AS n_withdrawals_touched,
               CAST(SUM(m) AS BIGINT) AS matched_cents,
               CAST(MAX(m) AS BIGINT) AS largest_lot
        FROM matched
        WHERE m > 0
        GROUP BY user_id
        ORDER BY user_id
    """,
)
def wh_fifo_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO lot matching WITHOUT iteration — the cost-basis / inventory
    allocation every finance warehouse needs: per user, 'view' events
    are deposits and 'purchase' events withdrawals; FIFO says each
    withdrawal consumes the OLDEST unconsumed deposit cents. The classic
    formulation is a sequential loop; the distributed identity is that a
    deposit maps to the interval [cum_before, cum_after) on the user's
    cumulative-deposit axis, a withdrawal likewise on the cumulative-
    withdrawal axis, and FIFO matches are EXACTLY the pairwise interval
    overlaps — so the whole allocation is two prefix-sum windows + one
    per-user interval join, associative and shuffle-keyed (the same
    trick as binned_range_join for the band condition at scale). Exact
    integer cents; per-user fan-out bounded by lots×withdrawals that
    actually overlap."""
    ev = _t(spark, sf_dir, "events")
    from pyspark.sql import Window

    cents = F.round(F.col("value") * 100).cast("long")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))

    def side(event_type: str, id_alias: str) -> DataFrame:
        return (
            ev.where(F.col("event_type") == event_type)
            .select("user_id", "ts", "event_id", cents.alias("cents"))
            .withColumn("hi", F.sum("cents").over(w))
            .select(
                "user_id",
                F.col("event_id").alias(id_alias),
                (F.col("hi") - F.col("cents")).alias("lo"),
                "hi",
            )
        )

    d = side("view", "dep_id").alias("d")
    wd = side("purchase", "wd_id").alias("w")
    matched = d.join(
        wd,
        (F.col("d.user_id") == F.col("w.user_id"))
        & (F.col("d.lo") < F.col("w.hi"))
        & (F.col("w.lo") < F.col("d.hi")),
    ).select(
        F.col("d.user_id").alias("user_id"),
        "dep_id",
        "wd_id",
        (
            F.least(F.col("d.hi"), F.col("w.hi"))
            - F.greatest(F.col("d.lo"), F.col("w.lo"))
        ).alias("m"),
    )
    return (
        matched.where(F.col("m") > 0)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lots"),
            F.countDistinct("wd_id").cast("long").alias("n_withdrawals_touched"),
            F.sum("m").cast("long").alias("matched_cents"),
            F.max("m").cast("long").alias("largest_lot"),
        )
        .orderBy("user_id")
    )


@q(
    "wh_file_stats",
    oracle="""
        WITH filed AS (
            SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority,
                   CAST(o_orderdate AS DATE) AS day,
                   NTILE(12) OVER (ORDER BY o_orderdate, o_orderkey) AS file_id
            FROM orders
        )
        SELECT CAST(file_id AS INT) AS file_id,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(MIN(o_custkey) AS BIGINT) AS ck_min,
               CAST(MAX(o_custkey) AS BIGINT) AS ck_max,
               CAST(MIN(day) AS VARCHAR) AS day_min,
               CAST(MAX(day) AS VARCHAR) AS day_max,
               CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS prio_ndv,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_cents_sum,
               CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT) AS price_nulls
        FROM filed
        GROUP BY file_id
        ORDER BY file_id
    """,
)
def wh_file_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-skipping manifest collection — the third leg of the
    lakehouse-metadata triangle next to wh_zorder_layout (where rows
    go) and wh_compaction_plan (when files merge): per 'file' (a
    date-ordered NTILE stand-in for the physical split), the stats a
    manifest stores so scans can prune without opening the file —
    row count, min/max per filterable column, exact NDV for the
    low-cardinality dictionary column, sum + null count for the
    measure. ONE hash aggregation per file population; every value
    exact integers/strings."""
    o = _t(spark, sf_dir, "orders")
    from pyspark.sql import Window

    filed = o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "o_orderpriority",
        F.col("o_orderdate").cast("date").alias("day"),
    ).withColumn(
        "file_id", F.ntile(12).over(Window.orderBy(F.asc("day"), F.asc("o_orderkey")))
    )
    return (
        filed.groupBy(F.col("file_id").cast("int").alias("file_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("o_custkey").cast("long").alias("ck_min"),
            F.max("o_custkey").cast("long").alias("ck_max"),
            F.min("day").cast("string").alias("day_min"),
            F.max("day").cast("string").alias("day_max"),
            F.countDistinct("o_orderpriority").cast("long").alias("prio_ndv"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("price_cents_sum"),
            (F.count(F.lit(1)) - F.count("o_totalprice")).cast("long").alias("price_nulls"),
        )
        .orderBy("file_id")
    )


@q(
    "wh_bt_preference",
    oracle="""
        WITH daily AS (
            SELECT user_id, DATE_TRUNC('day', ts) AS day, event_type,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
            FROM events GROUP BY 1, 2, 3
        ), duels AS (
            SELECT a.event_type AS t,
                   CASE WHEN a.cents > b.cents THEN 1 ELSE 0 END AS win
            FROM daily a JOIN daily b
              ON a.user_id = b.user_id AND a.day = b.day
             AND a.event_type <> b.event_type
        )
        SELECT t AS event_type,
               CAST(SUM(win) AS BIGINT) AS total_wins,
               TRUE AS strength_pos_ok,
               TRUE AS norm_ok,
               TRUE AS stationary_ok
        FROM duels GROUP BY t ORDER BY t
    """,
)
def wh_bt_preference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley–Terry preference ranking (operators/warehouse.
    bradley_terry_strengths): within each (user, day), event type A
    'beats' B when A's daily cents exceed B's; the distributed stage
    aggregates the items×items win matrix (ONE self-join on the tiny
    per-day type totals + a hash count), and the MM fixed point runs
    driver-side on that model-sized matrix — the same collect-the-
    model-not-the-data shape as kmeans/PCA. This is the estimator
    behind RLHF pair curation and eval win-rate leaderboards.

    PROMOTED from rows-only to the sketch-style invariant oracle
    (VERDICT r4 #6): per type the EXACT total win count (hash-checked —
    DuckDB replays the duel join), plus three MM-fit booleans the
    oracle pins TRUE: strength > 0, Σ strengths = 1 (normalization),
    and the MM stationarity residual < 1e-9 (one extra MM step moves
    no strength — the fixed point actually converged). The strengths
    themselves stay pinned value-wise (dominance recovery, two-item
    analytic solution) in tests/test_warehouse.py."""
    ev = _t(spark, sf_dir, "events")
    from bigdatacw1_spark.operators.warehouse import bradley_terry_strengths

    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    a, b = daily.alias("a"), daily.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .select(
            F.col("a.event_type").alias("ta"),
            F.col("b.event_type").alias("tb"),
            (F.col("a.cents") > F.col("b.cents")).alias("a_wins"),
            (F.col("b.cents") > F.col("a.cents")).alias("b_wins"),
        )
        .groupBy("ta", "tb")
        .agg(
            F.count_if("a_wins").cast("long").alias("nab"),
            F.count_if("b_wins").cast("long").alias("nba"),
        )
        .collect()
    )
    wins = [(r["ta"], r["tb"], r["nab"]) for r in pairs] + [
        (r["tb"], r["ta"], r["nba"]) for r in pairs
    ]
    strengths = bradley_terry_strengths(wins)
    total_wins: dict[str, int] = {}
    for t, _, c in wins:
        total_wins[t] = total_wins.get(t, 0) + c
    norm_ok = abs(sum(strengths.values()) - 1.0) < 1e-9
    # stationarity: one more MM step from the returned fixed point must
    # move nothing (same update rule as bradley_terry_strengths)
    items = sorted(strengths)
    w = {(a, b): 0.0 for a in items for b in items}
    for a, b, c in wins:
        w[(a, b)] += c
    resid = 0.0
    new_p = {}
    for i in items:
        wi = sum(w[(i, j)] for j in items)
        denom = sum(
            (w[(i, j)] + w[(j, i)]) / (strengths[i] + strengths[j])
            for j in items
            if j != i and (w[(i, j)] or w[(j, i)])
        )
        new_p[i] = wi / denom if denom > 0 else strengths[i]
    z = sum(new_p.values())
    for i in items:
        resid = max(resid, abs(new_p[i] / z - strengths[i]))
    stationary_ok = resid < 1e-9
    rows = [
        (
            t,
            int(total_wins.get(t, 0)),
            s > 0.0,
            norm_ok,
            stationary_ok,
        )
        for t, s in sorted(strengths.items())
    ]
    return spark.createDataFrame(
        rows,
        "event_type string, total_wins long, strength_pos_ok boolean, "
        "norm_ok boolean, stationary_ok boolean",
    ).orderBy("event_type")


_ZV_SQL = """(  ((an >> 0) & 1) << 1)  + (((bn >> 0) & 1) << 0)
                 + (((an >> 1) & 1) << 3)  + (((bn >> 1) & 1) << 2)
                 + (((an >> 2) & 1) << 5)  + (((bn >> 2) & 1) << 4)
                 + (((an >> 3) & 1) << 7)  + (((bn >> 3) & 1) << 6)
                 + (((an >> 4) & 1) << 9)  + (((bn >> 4) & 1) << 8)
                 + (((an >> 5) & 1) << 11) + (((bn >> 5) & 1) << 10)
                 + (((an >> 6) & 1) << 13) + (((bn >> 6) & 1) << 12)
                 + (((an >> 7) & 1) << 15) + (((bn >> 7) & 1) << 14)
                 + (((an >> 8) & 1) << 17) + (((bn >> 8) & 1) << 16)
                 + (((an >> 9) & 1) << 19) + (((bn >> 9) & 1) << 18)"""

_SKIP_ORACLE = f"""
    WITH base AS (
        SELECT o_orderkey, o_custkey,
               DATE_DIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS dt
        FROM orders
    ), ext AS (
        SELECT MIN(o_custkey) AS ck_lo, MAX(o_custkey) AS ck_hi,
               MIN(dt) AS dt_lo, MAX(dt) AS dt_hi
        FROM base
    ), probe AS (
        SELECT ck_lo + (ck_hi - ck_lo) // 2 AS ckq_lo,
               ck_lo + (ck_hi - ck_lo) // 2 + GREATEST((ck_hi - ck_lo) // 20, 0) AS ckq_hi,
               dt_lo + (dt_hi - dt_lo) // 2 AS dtq_lo,
               dt_lo + (dt_hi - dt_lo) // 2 + GREATEST((dt_hi - dt_lo) // 20, 0) AS dtq_hi
        FROM ext
    ), norm AS (
        SELECT o_orderkey, o_custkey, dt,
               CAST((o_custkey - ck_lo) * 1024 // (ck_hi - ck_lo + 1) AS BIGINT) AS an,
               CAST((dt - dt_lo) * 1024 // (dt_hi - dt_lo + 1) AS BIGINT) AS bn
        FROM base CROSS JOIN ext
    ), z AS (
        SELECT o_orderkey, o_custkey, dt, {_ZV_SQL} AS zv
        FROM norm
    ), filed AS (
        SELECT o_custkey, dt,
               NTILE(16) OVER (ORDER BY o_orderkey) AS f_nat,
               NTILE(16) OVER (ORDER BY dt, o_orderkey) AS f_dts,
               NTILE(16) OVER (ORDER BY zv, o_orderkey) AS f_zo
        FROM z
    ), stats AS (
        SELECT 'a_natural' AS layout, f_nat AS f,
               MIN(o_custkey) AS ckmin, MAX(o_custkey) AS ckmax,
               MIN(dt) AS dtmin, MAX(dt) AS dtmax
        FROM filed GROUP BY f_nat
        UNION ALL
        SELECT 'b_datesort', f_dts, MIN(o_custkey), MAX(o_custkey), MIN(dt), MAX(dt)
        FROM filed GROUP BY f_dts
        UNION ALL
        SELECT 'c_zorder', f_zo, MIN(o_custkey), MAX(o_custkey), MIN(dt), MAX(dt)
        FROM filed GROUP BY f_zo
    )
    SELECT layout,
           CAST(COUNT(*) AS INT) AS files_total,
           CAST(SUM(CASE WHEN ckmax < ckq_lo OR ckmin > ckq_hi THEN 1 ELSE 0 END) AS INT)
               AS skip_ck,
           CAST(SUM(CASE WHEN dtmax < dtq_lo OR dtmin > dtq_hi THEN 1 ELSE 0 END) AS INT)
               AS skip_dt
    FROM stats CROSS JOIN probe
    GROUP BY layout
    ORDER BY layout
"""


@q("wh_skipping_effectiveness", oracle=_SKIP_ORACLE)
def wh_skipping_effectiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-skipping effectiveness audit — the measurement that justifies
    the layout operators: cut orders into 16 files under THREE layouts
    (a_natural = insertion order, b_datesort = single-dim sort,
    c_zorder = Morton curve over (custkey, date)), collect per-file
    min/max stats, and count how many files a mid-extent 5%-band probe
    on EACH dimension can skip. The expected shape this entry pins:
    date-sort prunes date probes perfectly but custkey probes barely;
    z-order prunes BOTH — the whole point of multi-dim clustering
    (wh_zorder_layout / wh_hilbert_layout plan the layout; this entry
    proves the stats it yields actually skip).

    Scale: file cuts are exact NTILE-equivalent ranks via
    global_order_columns (never a partition-less window); stats are one
    hash aggregate per layout over the SAME checkpointed key frame; the
    probe band derives from the broadcast 4-value extent row, so the
    audit adds no driver traffic beyond it."""
    from bigdatacw1_spark.operators.warehouse import (
        global_order_columns,
        minmax_normalize,
        ntile_from_rank,
        zorder_key,
    )

    o = _t(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("dt"),
    )
    ext = base.agg(
        F.min("o_custkey").alias("ck_lo"),
        F.max("o_custkey").alias("ck_hi"),
        F.min("dt").alias("dt_lo"),
        F.max("dt").alias("dt_hi"),
    )
    norm = base.crossJoin(F.broadcast(ext)).select(
        "o_orderkey",
        "o_custkey",
        "dt",
        "ck_lo",
        "ck_hi",
        "dt_lo",
        "dt_hi",
        minmax_normalize(F.col("o_custkey"), F.col("ck_lo"), F.col("ck_hi")).alias("an"),
        minmax_normalize(F.col("dt"), F.col("dt_lo"), F.col("dt_hi")).alias("bn"),
    )
    keyed = norm.withColumn("zv", zorder_key(F.col("an"), F.col("bn"))).localCheckpoint(
        eager=False
    )

    div = lambda a, b: F.call_function("div", a, b)  # noqa: E731
    ckq_lo = F.col("ck_lo") + div(F.col("ck_hi") - F.col("ck_lo"), F.lit(2))
    ckq_hi = ckq_lo + F.greatest(div(F.col("ck_hi") - F.col("ck_lo"), F.lit(20)), F.lit(0))
    dtq_lo = F.col("dt_lo") + div(
        (F.col("dt_hi") - F.col("dt_lo")).cast("long"), F.lit(2)
    )
    dtq_hi = dtq_lo + F.greatest(
        div((F.col("dt_hi") - F.col("dt_lo")).cast("long"), F.lit(20)), F.lit(0)
    )

    def audit(label: str, key) -> DataFrame:
        ranked, total = global_order_columns(keyed, key, [F.col("o_orderkey")])
        filed = ranked.withColumn("f", ntile_from_rank(F.col("__rank"), total, 16))
        stats = filed.groupBy("f").agg(
            F.min("o_custkey").alias("ckmin"),
            F.max("o_custkey").alias("ckmax"),
            F.min("dt").alias("dtmin"),
            F.max("dt").alias("dtmax"),
            F.first("ck_lo").alias("ck_lo"),
            F.first("ck_hi").alias("ck_hi"),
            F.first("dt_lo").alias("dt_lo"),
            F.first("dt_hi").alias("dt_hi"),
        )
        skip_ck = (F.col("ckmax") < ckq_lo) | (F.col("ckmin") > ckq_hi)
        skip_dt = (F.col("dtmax") < dtq_lo) | (F.col("dtmin") > dtq_hi)
        return stats.agg(
            F.count(F.lit(1)).cast("int").alias("files_total"),
            F.sum(skip_ck.cast("int")).cast("int").alias("skip_ck"),
            F.sum(skip_dt.cast("int")).cast("int").alias("skip_dt"),
        ).select(F.lit(label).alias("layout"), "files_total", "skip_ck", "skip_dt")

    return (
        audit("a_natural", F.col("o_orderkey"))
        .unionAll(audit("b_datesort", F.col("dt")))
        .unionAll(audit("c_zorder", F.col("zv")))
        .orderBy("layout")
    )


@q(
    "wh_ivm_agg_delta",
    oracle="""
        WITH ev AS (
            SELECT event_type, event_id,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM events
        ), maintained AS (
            SELECT * FROM ev
            WHERE (event_id % 10 <> 0 AND event_id % 7 <> 0)  -- base minus deletes
               OR event_id % 10 = 0                           -- plus inserts
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS sum_cents
        FROM maintained GROUP BY event_type
        HAVING COUNT(*) > 0
        ORDER BY event_type
    """,
)
def wh_ivm_agg_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental AGGREGATE-view maintenance — the other half of the IVM
    toolkit (wh_ivm_join_delta maintains a join view): the materialized
    per-type (count, sum) view is updated under a mixed change batch
    (inserts = event_id%10=0, deletes = base rows with event_id%7=0)
    WITHOUT rescanning the base. COUNT/SUM are self-maintainable: the
    batch aggregates to signed per-group deltas (insert → +1/+cents,
    delete → −1/−cents) and merges into the old view as a BROADCAST
    left join (updated groups) plus an anti-join (brand-new groups) —
    a full-outer merge would reject the broadcast hint, since Spark
    cannot build a hash side that must also emit its own unmatched
    rows. Groups whose count reaches zero drop out. At 100 TB the
    refresh cost is one pass over the CHANGE BATCH plus two
    broadcast-delta joins against the group-sized view — the base
    table is never touched (contrast MIN/MAX, which deletes can break;
    those go through wh_cdc_apply's replay). The oracle recomputes the
    view from scratch on (base − deletes) ∪ inserts, so the hash
    asserts IVM ≡ recompute exactly."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    base = ev.where(F.col("event_id") % 10 != 0)
    inserts = ev.where(F.col("event_id") % 10 == 0)
    deletes = base.where(F.col("event_id") % 7 == 0)

    old_view = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("sum_cents")
    )
    signed = inserts.select(
        "event_type", F.lit(1).alias("w"), F.col("cents")
    ).unionAll(
        deletes.select("event_type", F.lit(-1).alias("w"), (-F.col("cents")).alias("cents"))
    )
    delta = signed.groupBy("event_type").agg(
        F.sum("w").alias("dn"), F.sum("cents").alias("ds")
    )
    updated = old_view.join(F.broadcast(delta), "event_type", "left").select(
        "event_type",
        (F.col("n") + F.coalesce(F.col("dn"), F.lit(0))).alias("n"),
        (F.col("sum_cents") + F.coalesce(F.col("ds"), F.lit(0))).alias("sum_cents"),
    )
    born = delta.join(
        F.broadcast(old_view.select("event_type")), "event_type", "left_anti"
    ).select("event_type", F.col("dn").alias("n"), F.col("ds").alias("sum_cents"))
    merged = updated.unionAll(born)
    return (
        merged.where(F.col("n") > 0)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("sum_cents").cast("long").alias("sum_cents"),
        )
        .orderBy("event_type")
    )


@q(
    "wh_ivm_joinagg_delta",
    oracle="""
        WITH o AS (
            SELECT o_orderkey, o_custkey,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ), maintained AS (
            SELECT * FROM o
            WHERE (o_orderkey % 10 <> 0 AND o_orderkey % 7 <> 0)  -- base minus deletes
               OR o_orderkey % 10 = 0                             -- plus inserts
        )
        SELECT n_name,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(cents) AS BIGINT) AS revenue_cents
        FROM maintained
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        HAVING COUNT(*) > 0
        ORDER BY n_name
    """,
)
def wh_ivm_joinagg_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN+AGGREGATE view maintenance — the standard
    warehouse IVM case (VERDICT r5 #5) completing the toolkit:
    wh_ivm_agg_delta maintains a single-table aggregate and
    wh_ivm_join_delta a denormalized join view; THIS entry maintains the
    revenue-per-nation rollup ``orders ⋈ customer ⋈ nation GROUP BY
    n_name`` under a mixed fact change batch (inserts = o_orderkey%10=0,
    deletes = base rows with o_orderkey%7=0; dims static — the 99% case:
    fact tables churn, dimensions trickle).

    The delta plan never rescans the base fact: the CHANGE BATCH alone
    joins the (broadcast) customer⋈nation dim map to pick up n_name,
    aggregates to signed per-group deltas (insert → +1/+cents, delete →
    −1/−cents), and merges into the group-sized old view as a broadcast
    left join (updated groups) plus an anti join (brand-new groups) —
    identical merge algebra to wh_ivm_agg_delta, and groups whose count
    reaches zero drop out. At 100 TB the refresh touches one pass over
    the change batch + dim lookups sized to that batch; the multi-TB
    fact history is never read (the full scan below only CONSTRUCTS the
    pre-existing materialized view this self-contained query starts
    from). The oracle recomputes the rollup from scratch on
    (base − deletes) ∪ inserts, so the hash asserts IVM ≡ recompute."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    dims = (
        _t(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation").select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "n_name")
    )
    base = o.where(F.col("o_orderkey") % 10 != 0)
    inserts = o.where(F.col("o_orderkey") % 10 == 0)
    deletes = base.where(F.col("o_orderkey") % 7 == 0)

    old_view = (
        base.join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("sum_cents"))
    )
    signed = inserts.select(
        "o_custkey", F.lit(1).alias("w"), F.col("cents")
    ).unionAll(
        deletes.select(
            "o_custkey", F.lit(-1).alias("w"), (-F.col("cents")).alias("cents")
        )
    )
    delta = (
        signed.join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(F.sum("w").alias("dn"), F.sum("cents").alias("ds"))
    )
    updated = old_view.join(F.broadcast(delta), "n_name", "left").select(
        "n_name",
        (F.col("n") + F.coalesce(F.col("dn"), F.lit(0))).alias("n"),
        (F.col("sum_cents") + F.coalesce(F.col("ds"), F.lit(0))).alias("sum_cents"),
    )
    born = delta.join(
        F.broadcast(old_view.select("n_name")), "n_name", "left_anti"
    ).select("n_name", F.col("dn").alias("n"), F.col("ds").alias("sum_cents"))
    return (
        updated.unionAll(born)
        .where(F.col("n") > 0)
        .select(
            "n_name",
            F.col("n").cast("long").alias("n_orders"),
            F.col("sum_cents").cast("long").alias("revenue_cents"),
        )
        .orderBy("n_name")
    )


# Per-process guard so the bucket-artifact cleanup hook registers once
# per application directory (wh_bucketed_colocated_join).
_BUCKET_CLEANUP_REGISTERED: set[str] = set()


@q(
    "wh_bucketed_colocated_join",
    oracle="""
        SELECT o_custkey,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY o_custkey
        ORDER BY o_custkey
    """,
)
def wh_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join — THE shuffle-elimination strategy for
    repeated fact⋈fact / fact⋈big-dim joins at 100 TB: both sides are
    written ONCE bucketed on the join key (sources/sinks.write_bucketed;
    8 buckets here, thousands on a cluster), after which every join and
    aggregation on that key reads pre-partitioned data and runs with
    ZERO exchange — the scan itself carries hashpartitioning(key, n).
    The per-customer revenue rollup below plans as bucketed-scan →
    sort-merge-join → hash-aggregate with the only Exchange being the
    final presentation sort (gated by
    tests/test_plans.py::test_bucketed_join_plan_has_no_hash_exchange).

    Bucket files live under a per-application temp path keyed by
    (application id, sf tag), so repeated runs in one session overwrite
    idempotently while two concurrent sessions on the same SF can never
    clobber each other's bucket files mid-read (ADVICE r6); the
    directory and catalog tables are cleaned up at interpreter exit.
    The oracle computes the same rollup from the raw parquet, proving
    the bucketed round-trip is lossless."""
    import atexit
    import os
    import shutil
    import tempfile

    app_id = spark.sparkContext.applicationId.replace("-", "_")
    tag = f"{os.path.basename(sf_dir.rstrip('/')).replace('.', '_')}_{app_id}"
    root = os.path.join(tempfile.gettempdir(), "bigdatacw1_bucketed", app_id)
    base = f"{root}/{tag}"
    if root not in _BUCKET_CLEANUP_REGISTERED:
        _BUCKET_CLEANUP_REGISTERED.add(root)
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    spark.sql(f"DROP TABLE IF EXISTS orders_bkt_{tag}")
    spark.sql(f"DROP TABLE IF EXISTS customer_bkt_{tag}")
    o.write.mode("overwrite").option("path", f"{base}/orders").bucketBy(
        8, "o_custkey"
    ).format("parquet").saveAsTable(f"orders_bkt_{tag}")
    c.write.mode("overwrite").option("path", f"{base}/customer").bucketBy(
        8, "c_custkey"
    ).format("parquet").saveAsTable(f"customer_bkt_{tag}")
    ob = spark.table(f"orders_bkt_{tag}")
    cb = spark.table(f"customer_bkt_{tag}")
    return (
        ob.hint("merge")  # pin SMJ so the gate tests the bucketed path, not AQE's BHJ
        .join(cb, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .orderBy("o_custkey")
    )


@q(
    "wh_table_checksum",
    oracle="""
        WITH h AS (
            SELECT CAST(('0x' || SUBSTR(MD5(
                       CAST(o_orderkey AS VARCHAR) || '|' ||
                       CAST(o_custkey AS VARCHAR) || '|' ||
                       o_orderstatus || '|' ||
                       CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR)
                   ), 1, 8)) AS BIGINT) AS rh
            FROM orders
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(rh) AS BIGINT) AS checksum_sum,
               CAST(MIN(rh) AS BIGINT) AS checksum_min,
               CAST(MAX(rh) AS BIGINT) AS checksum_max
        FROM h
    """,
)
def wh_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table content checksum — the migration /
    replication validation primitive at 100 TB: hash every row to a
    64-bit value and SUM the hashes, so two copies of a table compare
    by ONE number each, computed with a single scan + partial-agg
    (no sort, no shuffle of row data — only the combiner's scalars
    move). Sum (not XOR) also catches duplicated-row corruption, since
    x ⊕ x = 0 hides it but x + x does not; min/max give cheap extra
    discrimination. The row hash is the engine-portable idiom
    ('0x'||SUBSTR(MD5(canonical_string),1,8))::BIGINT ≡ Spark
    conv(substring(md5(s),1,8),16,10) — both engines hash the SAME
    canonical string (pipe-joined key columns + cents-quantized price),
    so the oracle proves the fingerprint is engine-independent: the
    number DuckDB computes over the same parquet equals Spark's, which
    is exactly what a cross-system migration check needs."""
    o = _t(spark, sf_dir, "orders")
    canonical = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
    )
    rh = F.conv(F.substring(F.md5(canonical), 1, 8), 16, 10).cast("long")
    return o.select(rh.alias("rh")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("rh").cast("long").alias("checksum_sum"),
        F.min("rh").cast("long").alias("checksum_min"),
        F.max("rh").cast("long").alias("checksum_max"),
    )


def _markov_oracle(iters: int = 20) -> str:
    """Generated replay of the Markov removal-effect attribution: the
    journey transition counts, then 5 unrolled 20-round value-iteration
    chains (full + one per removed channel) whose per-state update
    folds c(i,CONV) + Σ c(i,j)·v(j) in fixed channel order — the exact
    double sequence markov_value_iteration runs in Python."""
    from bigdatacw1_spark.operators.warehouse import MARKOV_CHANNELS, MARKOV_STATES

    tos = ["CONV"] + MARKOV_CHANNELS
    consts = []
    for s in MARKOV_STATES:
        for t in tos:
            consts.append(
                f"CAST(COALESCE(MAX(CASE WHEN from_s = '{s}' AND to_s = '{t}' "
                f"THEN c END), 0) AS DOUBLE) AS c_{s}_{t}"
            )
        consts.append(
            f"CAST(COALESCE(SUM(CASE WHEN from_s = '{s}' THEN c END), 0) "
            f"AS DOUBLE) AS n_{s}"
        )
    chains = []
    for variant in ["full"] + MARKOV_CHANNELS:
        sfx = "f" if variant == "full" else variant
        removed = None if variant == "full" else variant
        cols0 = ", ".join(f"0.0 AS v_{s}" for s in MARKOV_STATES)
        chains.append(f"v0{sfx} AS (SELECT {cols0})")
        for r in range(1, iters + 1):
            cols = []
            for s in MARKOV_STATES:
                if s == removed:
                    cols.append(f"0.0 AS v_{s}")
                    continue
                expr = f"c_{s}_CONV"
                for j in MARKOV_CHANNELS:
                    if j == removed:
                        continue
                    expr = f"({expr} + c_{s}_{j} * v_{j})"
                cols.append(
                    f"CASE WHEN n_{s} > 0 THEN {expr} / n_{s} ELSE 0.0 END AS v_{s}"
                )
            chains.append(
                f"v{r}{sfx} AS (SELECT {', '.join(cols)} "
                f"FROM v{r - 1}{sfx} CROSS JOIN k)"
            )
    effects = " + ".join(
        f"(vf.v_START - v{c}.v_START)" for c in MARKOV_CHANNELS
    )
    tot = (
        "tot AS (SELECT " + effects + " AS te FROM vf "
        + " ".join(f"CROSS JOIN v{c}" for c in MARKOV_CHANNELS)
        + ")"
    )
    rows = []
    for c in MARKOV_CHANNELS:
        rows.append(
            f"""SELECT '{c}' AS channel,
               FLOOR(vf.v_START * 1000000.0 + 0.5) / 1000000.0 AS conv_full,
               FLOOR(v{c}.v_START * 1000000.0 + 0.5) / 1000000.0 AS conv_removed,
               FLOOR((vf.v_START - v{c}.v_START) * 1000000.0 + 0.5) / 1000000.0
                   AS removal_effect,
               CASE WHEN tot.te > 0.0
                    THEN FLOOR((vf.v_START - v{c}.v_START) / tot.te
                               * 1000000.0 + 0.5) / 1000000.0
                    ELSE 0.0 END AS attribution_share
        FROM vf CROSS JOIN v{c} CROSS JOIN tot"""
        )
    finals = ", ".join(
        [f"vf AS (SELECT * FROM v{iters}f)"]
        + [f"v{c} AS (SELECT * FROM v{iters}{c})" for c in MARKOV_CHANNELS]
        + [tot]
    )
    return f"""
        WITH ev AS (
            SELECT user_id AS u, event_type AS t,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS i
            FROM events
        ), firstp AS (
            SELECT u, MIN(i) AS pi FROM ev WHERE t = 'purchase' GROUP BY u
        ), j AS (
            SELECT ev.u, ev.t, ev.i FROM ev LEFT JOIN firstp USING (u)
            WHERE firstp.pi IS NULL OR ev.i <= firstp.pi
        ), tr AS (
            SELECT COALESCE(LAG(t) OVER (PARTITION BY u ORDER BY i), 'START') AS from_s,
                   CASE WHEN t = 'purchase' THEN 'CONV' ELSE t END AS to_s
            FROM j
        ), lasts AS (
            SELECT u, MAX(i) AS mx FROM j GROUP BY u
        ), endtr AS (
            SELECT j.t AS from_s, 'END' AS to_s
            FROM j JOIN lasts ON j.u = lasts.u AND j.i = lasts.mx
            WHERE j.t <> 'purchase'
        ), cnt AS (
            SELECT from_s, to_s, COUNT(*) AS c FROM (
                SELECT * FROM tr UNION ALL SELECT * FROM endtr
            ) GROUP BY 1, 2
        ), k AS MATERIALIZED (
            -- MATERIALIZED is load-bearing: the 105 chain CTEs each
            -- CROSS JOIN k, and inlining would re-run the journey scan
            -- + windows per reference (measured 350 s -> ~2 s).
            SELECT {', '.join(consts)} FROM cnt
        ),
        {', '.join(chains)},
        {finals}
        SELECT * FROM (
        {' UNION ALL '.join(rows)}
        ) ORDER BY channel
    """


@q("wh_attribution_markov", oracle=_markov_oracle())
def wh_attribution_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain attribution with REMOVAL EFFECTS (the data-driven
    upgrade of wh_attribution_touch's first/last-touch rules): model
    user journeys as a first-order chain over event types (truncated at
    first purchase; START/CONV/END absorbing), estimate conversion
    probability by 20 rounds of value iteration, then re-run the chain
    with each channel's paths failing — a channel's attribution share
    is its removal effect, normalized. Transition counting is two
    windows + one hash aggregate (one user-keyed shuffle); the chain
    itself is a |channels|²-sized model collected to the driver
    (BT-preference precedent), iterated with a FIXED fold order the
    generated 5×20-round oracle CTE chain replays bit for bit.
    Output: (channel, conv_full, conv_removed, removal_effect,
    attribution_share)."""
    from bigdatacw1_spark.operators.warehouse import (
        MARKOV_CHANNELS,
        markov_transition_counts,
        markov_value_iteration,
    )

    counts = {
        (r["from_s"], r["to_s"]): r["c"]
        for r in markov_transition_counts(_t(spark, sf_dir, "events")).collect()
    }
    full = markov_value_iteration(counts)
    removed = {c: markov_value_iteration(counts, removed=c) for c in MARKOV_CHANNELS}
    total = sum(full - removed[c] for c in MARKOV_CHANNELS)

    def r6(x: float) -> float:
        import math

        return math.floor(x * 1_000_000.0 + 0.5) / 1_000_000.0

    rows = [
        (
            c,
            r6(full),
            r6(removed[c]),
            r6(full - removed[c]),
            r6((full - removed[c]) / total) if total > 0.0 else 0.0,
        )
        for c in MARKOV_CHANNELS
    ]
    return spark.createDataFrame(
        rows,
        "channel string, conv_full double, conv_removed double, "
        "removal_effect double, attribution_share double",
    ).orderBy("channel")


@q(
    "wh_diff_in_diff",
    oracle="""
        WITH base AS (
            SELECT user_id % 2 = 1 AS treated,
                   ts >= TIMESTAMP '2024-01-16' AS post,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM events
        ), cell AS (
            SELECT treated, post,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS s
            FROM base GROUP BY treated, post
        ), m AS (
            SELECT
                MAX(CASE WHEN treated AND post THEN CAST(s AS DOUBLE) / n END) AS tp,
                MAX(CASE WHEN treated AND NOT post THEN CAST(s AS DOUBLE) / n END) AS tb,
                MAX(CASE WHEN NOT treated AND post THEN CAST(s AS DOUBLE) / n END) AS cp,
                MAX(CASE WHEN NOT treated AND NOT post THEN CAST(s AS DOUBLE) / n END) AS cb,
                CAST(SUM(n) AS BIGINT) AS n_total
            FROM cell
        )
        SELECT n_total,
               FLOOR((tp - tb) / 100.0 * 10000.0 + 0.5) / 10000.0 AS delta_treated,
               FLOOR((cp - cb) / 100.0 * 10000.0 + 0.5) / 10000.0 AS delta_control,
               FLOOR(((tp - tb) - (cp - cb)) / 100.0 * 10000.0 + 0.5) / 10000.0 AS did
        FROM m
    """,
)
def wh_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimate — the workhorse quasi-
    experimental effect estimator (the causal companion to
    wh_cuped_adjusted's variance reduction): mean event value per
    (treated, pre/post) cell, the within-group deltas, and their
    difference. Treatment is the deterministic user_id parity split and
    the cutover the same date wh_drift_* uses, so the four cells are
    reproducible. ONE conditional hash aggregate over the fact table
    (integer-cents sums, four exact cells); per-cell means and the DiD
    subtraction are the only float steps, sequenced identically in both
    engines."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        (F.col("user_id") % 2 == 1).alias("treated"),
        (F.col("ts") >= F.lit("2024-01-16").cast("timestamp")).alias("post"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    cell = base.groupBy("treated", "post").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    mean = F.col("s").cast("double") / F.col("n")
    m = cell.agg(
        F.max(F.when(F.col("treated") & F.col("post"), mean)).alias("tp"),
        F.max(F.when(F.col("treated") & ~F.col("post"), mean)).alias("tb"),
        F.max(F.when(~F.col("treated") & F.col("post"), mean)).alias("cp"),
        F.max(F.when(~F.col("treated") & ~F.col("post"), mean)).alias("cb"),
        F.sum("n").cast("long").alias("n_total"),
    )
    from bigdatacw1_spark.operators.relational import stable_round

    return m.select(
        "n_total",
        stable_round((F.col("tp") - F.col("tb")) / F.lit(100.0), 4).alias("delta_treated"),
        stable_round((F.col("cp") - F.col("cb")) / F.lit(100.0), 4).alias("delta_control"),
        stable_round(
            ((F.col("tp") - F.col("tb")) - (F.col("cp") - F.col("cb"))) / F.lit(100.0), 4
        ).alias("did"),
    )


@q(
    "wh_gini_concentration",
    oracle="""
        WITH per_user AS (
            SELECT event_type, user_id,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS s
            FROM events GROUP BY event_type, user_id
        ), ranked AS (
            SELECT event_type, s,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY s, user_id) AS i
            FROM per_user
        ), agg AS (
            SELECT event_type,
                   CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
                   CAST(SUM(s) AS DECIMAL(38,0)) AS ts,
                   CAST(SUM(CAST(i AS DECIMAL(38,0)) * s) AS DECIMAL(38,0)) AS tis
            FROM ranked GROUP BY event_type
        )
        SELECT event_type, CAST(n AS BIGINT) AS n_users,
               FLOOR((CAST(2 * tis AS DOUBLE) / CAST(n * ts AS DOUBLE)
                      - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE))
                     * 1000000.0 + 0.5) / 1000000.0 AS gini
        FROM agg
        ORDER BY event_type
    """,
)
def wh_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of spend per event type — the whale-dependence
    metric every marketplace/revenue review reports: with per-user
    totals sorted ascending and ranked i = 1..n, G = 2·Σ(i·sᵢ)/(n·Σsᵢ)
    − (n+1)/n. One hash aggregate to per-user integer cents, one
    GROUP-partitioned rank window (never partition-less), and one more
    aggregate whose Σ i·sᵢ stays exact in DECIMAL(38) — the two output
    divisions are the only floats, sequenced identically in both
    engines."""
    from bigdatacw1_spark.operators.relational import stable_round
    from pyspark.sql import Window

    per_user = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"))
    )
    ranked = per_user.withColumn(
        "i",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("s", "user_id")
        ),
    )
    dec = "decimal(38,0)"
    agg = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("s").cast(dec).alias("ts"),
        F.sum(F.col("i").cast(dec) * F.col("s")).cast(dec).alias("tis"),
    )
    gini = (F.lit(2) * F.col("tis")).cast("double") / (F.col("n") * F.col("ts")).cast(
        "double"
    ) - (F.col("n") + F.lit(1)).cast("double") / F.col("n").cast("double")
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_users"),
        stable_round(gini, 6).alias("gini"),
    ).orderBy("event_type")


#: log10(1 + 1/d) for d = 1..9, precomputed once in Python and embedded
#: as the SAME literals in the Spark plan and the oracle SQL — neither
#: engine's log10 is consulted, so the expectation is definitionally
#: identical on both sides.
_BENFORD_P = {
    1: 0.3010299956639812, 2: 0.17609125905568124, 3: 0.12493873660829992,
    4: 0.09691001300805642, 5: 0.07918124604762482, 6: 0.06694678963061322,
    7: 0.05799194697768673, 8: 0.05115252244738129, 9: 0.04575749056067514,
}

_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN {p!r}" for d, p in _BENFORD_P.items()
)


@q(
    "wh_benford_check",
    oracle=f"""
        WITH c AS (
            SELECT CAST(SUBSTR(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                               AS VARCHAR), 1, 1) AS INT) AS digit
            FROM orders
            WHERE o_totalprice > 0
        ), obs AS (
            SELECT digit, CAST(COUNT(*) AS BIGINT) AS observed FROM c GROUP BY digit
        ), grid AS (
            SELECT UNNEST(RANGE(1, 10)) AS digit
        ), n AS (
            SELECT CAST(SUM(observed) AS DOUBLE) AS n FROM obs
        ), e AS (
            SELECT g.digit, COALESCE(obs.observed, 0) AS observed,
                   n.n * (CASE g.digit {_BENFORD_CASE} END) AS expected
            FROM grid g LEFT JOIN obs ON obs.digit = g.digit CROSS JOIN n
        )
        SELECT CAST(digit AS INT) AS digit, observed,
               FLOOR(expected * 10000.0 + 0.5) / 10000.0 AS expected,
               FLOOR((CAST(observed AS DOUBLE) - expected)
                     * (CAST(observed AS DOUBLE) - expected) / expected
                     * 10000.0 + 0.5) / 10000.0 AS chi2_contrib
        FROM e ORDER BY digit
    """,
)
def wh_benford_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit over order totals — the classic
    fabricated-numbers screen (invented amounts over-use mid digits;
    organic multiplicative processes follow log10(1 + 1/d)): observed
    vs expected count per leading digit plus the χ² contribution. The
    first digit comes from the INTEGER-CENTS string (no log10 on data,
    so no boundary ulp risk), and the nine Benford probabilities are
    Python-precomputed literals embedded identically in both engines.
    One conditional hash aggregate + a 9-row grid."""
    from bigdatacw1_spark.operators.relational import stable_round

    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
    ).cast("int")
    obs = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("observed")
    )
    grid = _t(spark, sf_dir, "orders").sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    n = obs.agg(F.sum("observed").cast("double").alias("n"))
    p = F.lit(None).cast("double")
    expr = None
    for d, pv in _BENFORD_P.items():
        expr = (
            F.when(F.col("digit") == d, F.lit(pv))
            if expr is None
            else expr.when(F.col("digit") == d, F.lit(pv))
        )
    e = (
        grid.join(obs, "digit", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "digit",
            F.coalesce(F.col("observed"), F.lit(0)).cast("long").alias("observed"),
            (F.col("n") * expr).alias("expected"),
        )
    )
    dev = F.col("observed").cast("double") - F.col("expected")
    return e.select(
        "digit",
        "observed",
        stable_round(F.col("expected"), 4).alias("expected"),
        stable_round(dev * dev / F.col("expected"), 4).alias("chi2_contrib"),
    ).orderBy("digit")


@q(
    "wh_hhi_concentration",
    oracle="""
        WITH rev AS (
            SELECT n.n_name AS nation, l.l_suppkey,
                   CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                                 AS BIGINT)) AS DECIMAL(38,0)) AS r
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            GROUP BY n.n_name, l.l_suppkey
        ), agg AS (
            SELECT nation,
                   CAST(COUNT(*) AS BIGINT) AS n_suppliers,
                   SUM(r) AS s,
                   SUM(r * r) AS s2
            FROM rev GROUP BY nation
        )
        SELECT nation, n_suppliers,
               FLOOR(100000000.0 * CAST(s2 AS DOUBLE)
                     / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) * 10000.0 + 0.5)
                   / 10000.0 AS hhi
        FROM agg WHERE s > 0
        ORDER BY nation
    """,
)
def wh_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman market concentration per nation — the
    antitrust screen beside wh_gini_concentration's inequality measure
    (Gini asks "how unequal", HHI asks "how few control it": the
    merger-review statistic on the 0-10000 scale). ORDER-FREE exact
    form: HHI = 10⁸·Σr²/S² needs only Σr and Σr² per market —
    DECIMAL(38) integer sums, no per-supplier share division, no sorted
    fold — so the whole metric is two hash aggregates and one final
    float expression."""
    from bigdatacw1_spark.operators.relational import stable_round

    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cents = F.round(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * 100
    ).cast("long")
    rev = (
        l.join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"), "l_suppkey")
        .agg(F.sum(cents).cast("decimal(38,0)").alias("r"))
    )
    agg = rev.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum("r").alias("s"),
        F.sum(F.col("r") * F.col("r")).alias("s2"),
    )
    hhi = (
        F.lit(100000000.0)
        * F.col("s2").cast("double")
        / (F.col("s").cast("double") * F.col("s").cast("double"))
    )
    return (
        agg.where(F.col("s") > 0)
        .select("nation", "n_suppliers", stable_round(hhi, 4).alias("hhi"))
        .orderBy("nation")
    )


@q(
    "wh_lead_time",
    oracle="""
        WITH lt AS (
            SELECT n.n_name AS nation,
                   DATE_DIFF('day', CAST(o.o_orderdate AS DATE),
                             CAST(l.l_shipdate AS DATE)) AS lead_days
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
        )
        SELECT nation,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               FLOOR(MEDIAN(lead_days) * 10000.0 + 0.5) / 10000.0 AS median_days,
               FLOOR(QUANTILE_CONT(lead_days, 0.9) * 10000.0 + 0.5) / 10000.0 AS p90_days,
               CAST(MAX(lead_days) AS BIGINT) AS max_days
        FROM lt GROUP BY nation
        ORDER BY nation
    """,
)
def wh_lead_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier lead-time SLA report per nation: order-to-ship latency
    percentiles (median/p90/max in days) — the fulfillment-health
    rollup a supply-chain review runs weekly. One fact-dim join chain
    (both dims broadcast), exact integer day deltas, interpolated
    percentiles over the same integer multiset both engines sort
    identically (the a15/time_to_convert idiom)."""
    from bigdatacw1_spark.operators.relational import stable_round

    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    lt = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select(
            F.col("n_name").alias("nation"),
            F.datediff(
                F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
            ).alias("lead_days"),
        )
    )
    return (
        lt.groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            stable_round(F.percentile("lead_days", F.lit(0.5)), 4).alias("median_days"),
            stable_round(F.percentile("lead_days", F.lit(0.9)), 4).alias("p90_days"),
            F.max("lead_days").cast("long").alias("max_days"),
        )
        .orderBy("nation")
    )


@q(
    "wh_dau_mau_stickiness",
    oracle="""
        WITH ud AS (
            SELECT DISTINCT DATE_TRUNC('day', ts) AS d, user_id FROM events
        ), days AS (
            SELECT DISTINCT d FROM ud
        ), dau AS (
            SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY d
        ), cov AS (
            SELECT ud.user_id, ud.d + k * INTERVAL '1 day' AS cd
            FROM ud CROSS JOIN (SELECT UNNEST(RANGE(28)) AS k)
        ), mau AS (
            SELECT days.d, CAST(COUNT(DISTINCT cov.user_id) AS BIGINT) AS mau
            FROM days JOIN cov ON cov.cd = days.d
            GROUP BY days.d
        )
        SELECT dau.d AS day, dau.dau, mau.mau,
               FLOOR(CAST(dau.dau AS DOUBLE) / mau.mau * 10000.0 + 0.5)
                   / 10000.0 AS stickiness
        FROM dau JOIN mau ON mau.d = dau.d
        ORDER BY day
    """,
)
def wh_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per day — THE product engagement ratio: daily
    actives over exact trailing-28-day actives. The trailing distinct
    uses the interval-explode shape wh_rolling_reach_7d verifies (each
    (user, day) observation covers the next 28 calendar days; the join
    is keyed by covered-day, so cost is 28× the distinct observations —
    never a per-day rescan); DAU is one grouped distinct; one integer
    ratio per day."""
    from bigdatacw1_spark.operators.warehouse import rolling_distinct_per_day
    from bigdatacw1_spark.operators.relational import stable_round

    ev = _t(spark, sf_dir, "events")
    ud = ev.select(
        F.date_trunc("day", "ts").alias("d"), "user_id"
    ).distinct()
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    mau = rolling_distinct_per_day(ev, "ts", "user_id", window_days=28).select(
        F.col("day").alias("d"), F.col("ids_28d").alias("mau")
    )
    return (
        dau.join(mau, "d")
        .select(
            F.col("d").alias("day"),
            F.col("dau").cast("long").alias("dau"),
            F.col("mau").cast("long").alias("mau"),
            stable_round(
                F.col("dau").cast("double") / F.col("mau").cast("double"), 4
            ).alias("stickiness"),
        )
        .orderBy("day")
    )


@q(
    "wh_conversion_wilson",
    oracle="""
        WITH active AS (
            SELECT DISTINCT event_type, user_id FROM events
            WHERE event_type <> 'purchase'
        ), buyers AS (
            SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        ), cnt AS (
            SELECT a.event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(b.user_id) AS BIGINT) AS k
            FROM active a LEFT JOIN buyers b ON b.user_id = a.user_id
            GROUP BY a.event_type
        ), w AS (
            SELECT event_type, n, k,
                   CAST(k AS DOUBLE) / n AS p,
                   1.96 * 1.96 AS z2
            FROM cnt
        )
        SELECT event_type, n AS n_users, k AS n_converted,
               FLOOR(p * 10000.0 + 0.5) / 10000.0 AS rate,
               FLOOR((p + z2 / (2.0 * n)
                      - 1.96 * SQRT(p * (1.0 - p) / n + z2 / (4.0 * n * n)))
                     / (1.0 + z2 / n) * 10000.0 + 0.5) / 10000.0 AS wilson_lo,
               FLOOR((p + z2 / (2.0 * n)
                      + 1.96 * SQRT(p * (1.0 - p) / n + z2 / (4.0 * n * n)))
                     / (1.0 + z2 / n) * 10000.0 + 0.5) / 10000.0 AS wilson_hi
        FROM w
        ORDER BY wilson_lo DESC, event_type
    """,
)
def wh_conversion_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion rates with Wilson 95% intervals, RANKED BY THE LOWER
    BOUND — the confidence-adjusted ordering that stops a 2/2 segment
    outranking a 480/1000 one (the standard fix for naive rate
    sorting): per touchpoint event type, users who also purchased over
    users active. Exact distinct counts (one dedup + one broadcastable
    buyer-set join); the Wilson closed form runs the identical literal
    z = 1.96 float sequence in both engines."""
    from bigdatacw1_spark.operators.relational import stable_round

    ev = _t(spark, sf_dir, "events")
    active = (
        ev.where(F.col("event_type") != "purchase")
        .select("event_type", "user_id")
        .distinct()
    )
    buyers = (
        ev.where(F.col("event_type") == "purchase").select("user_id").distinct()
    )
    cnt = (
        active.join(
            F.broadcast(buyers.withColumn("__b", F.lit(1))), "user_id", "left"
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count("__b").cast("long").alias("k"),
        )
    )
    n_d = F.col("n").cast("double")
    p = F.col("k").cast("double") / n_d
    z = F.lit(1.96)
    z2 = z * z
    half = z * F.sqrt(p * (F.lit(1.0) - p) / n_d + z2 / (F.lit(4.0) * n_d * n_d))
    denom = F.lit(1.0) + z2 / n_d
    center = p + z2 / (F.lit(2.0) * n_d)
    return cnt.select(
        "event_type",
        F.col("n").alias("n_users"),
        F.col("k").alias("n_converted"),
        stable_round(p, 4).alias("rate"),
        stable_round((center - half) / denom, 4).alias("wilson_lo"),
        stable_round((center + half) / denom, 4).alias("wilson_hi"),
    ).orderBy(F.desc("wilson_lo"), "event_type")


@q(
    "wh_ivm_minmax_delta",
    oracle="""
        WITH ev AS (
            SELECT event_type, event_id,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM events
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MIN(cents) AS BIGINT) AS min_cents,
               CAST(MAX(cents) AS BIGINT) AS max_cents
        FROM ev GROUP BY event_type
        ORDER BY event_type
    """,
)
def wh_ivm_minmax_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX incremental view maintenance under an INSERT-ONLY batch —
    the third IVM algebra beside COUNT/SUM (wh_ivm_agg_delta, fully
    self-maintainable under inserts AND deletes) and join views
    (wh_ivm_join_delta / wh_ivm_joinagg_delta): MIN/MAX are
    self-maintainable for INSERTS ONLY (new_min = LEAST(old, batch_min))
    — a DELETE of the current minimum forces a rescan of the group,
    which is why production IVM either keeps per-group heaps or routes
    deletes through replay (wh_cdc_apply). This entry maintains the
    per-type (count, min, max) view under the insert batch
    (event_id%10=0) with ONE pass over the batch plus a broadcast merge
    join against the group-sized view; the base is never rescanned. The
    oracle recomputes over base ∪ inserts, asserting IVM ≡ recompute."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    base = ev.where(F.col("event_id") % 10 != 0)
    inserts = ev.where(F.col("event_id") % 10 == 0)

    old_view = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
    )
    delta = inserts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("dn"),
        F.min("cents").alias("dmin"),
        F.max("cents").alias("dmax"),
    )
    updated = old_view.join(F.broadcast(delta), "event_type", "left").select(
        "event_type",
        (F.col("n") + F.coalesce(F.col("dn"), F.lit(0))).alias("n"),
        F.least(F.col("min_cents"), F.coalesce(F.col("dmin"), F.col("min_cents"))).alias("min_cents"),
        F.greatest(F.col("max_cents"), F.coalesce(F.col("dmax"), F.col("max_cents"))).alias("max_cents"),
    )
    born = delta.join(
        F.broadcast(old_view.select("event_type")), "event_type", "left_anti"
    ).select(
        "event_type",
        F.col("dn").alias("n"),
        F.col("dmin").alias("min_cents"),
        F.col("dmax").alias("max_cents"),
    )
    return (
        updated.unionAll(born)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("min_cents").cast("long").alias("min_cents"),
            F.col("max_cents").cast("long").alias("max_cents"),
        )
        .orderBy("event_type")
    )


@q(
    "wh_ivm_minmax_full",
    oracle="""
        WITH ev AS (
            SELECT event_type, event_id,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM events
        ),
        base AS (SELECT * FROM ev WHERE event_id % 10 <> 0),
        inserts AS (SELECT * FROM ev WHERE event_id % 10 = 0),
        final AS (
            SELECT * FROM base
            WHERE NOT (event_id % 7 = 3 AND event_type IN ('click', 'purchase'))
            UNION ALL
            SELECT * FROM inserts
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MIN(cents) AS BIGINT) AS min_cents,
               CAST(MAX(cents) AS BIGINT) AS max_cents
        FROM final GROUP BY event_type
        ORDER BY event_type
    """,
)
def wh_ivm_minmax_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX incremental view maintenance under a MIXED insert+delete
    batch — closes wh_ivm_minmax_delta's documented insert-only caveat
    (a delete of the current extremum cannot be merged with
    LEAST/GREATEST because the view holds no runner-up). The standard
    production answer is the AFFECTED-GROUP RECOUNT this entry
    implements: the delete batch's DISTINCT group keys (group-key-sized,
    broadcast) split the view in two —

      * UNAFFECTED groups never touch the base again: they take the
        insert-only merge path (broadcast insert-delta, LEAST/GREATEST +
        count add), exactly wh_ivm_minmax_delta;
      * AFFECTED groups are recounted from base rows SEMI-JOINED on the
        broadcast key set (at 100 TB with thousands of groups, the semi
        join prunes the rescan to the touched groups' rows — never a
        full-view recompute), minus the delete batch's row ids
        (broadcast anti join; a CDC batch is batch-sized, not
        base-sized), plus the batch's inserts for those keys.

    Groups whose last row is deleted vanish from the recount naturally;
    insert-born groups surface on either path. Every join is broadcast
    (plan-gated: tests/test_plans.py asserts the recount branch carries
    LeftSemi+LeftAnti broadcast joins and the plan has no shuffle join).
    The delete rule (event_id%7=3 AND type∈{click,purchase}) is chosen
    so only 2 of 5 groups are affected AND some deleted rows ARE current
    extrema — the oracle recomputes (base − deletes) ∪ inserts from
    scratch, so the value hash proves IVM ≡ recompute including the
    extremum-poisoning cases the insert-only path cannot merge."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    base = ev.where(F.col("event_id") % 10 != 0)
    inserts = ev.where(F.col("event_id") % 10 == 0)
    deletes = base.where(
        (F.col("event_id") % 7 == 3) & F.col("event_type").isin("click", "purchase")
    )

    old_view = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
    )
    affected = deletes.select("event_type").distinct()
    ins_delta = inserts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("dn"),
        F.min("cents").alias("dmin"),
        F.max("cents").alias("dmax"),
    )

    # --- Unaffected groups: insert-only merge, base never rescanned. ---
    unaff_view = old_view.join(F.broadcast(affected), "event_type", "left_anti")
    unaff_delta = ins_delta.join(F.broadcast(affected), "event_type", "left_anti")
    updated = unaff_view.join(F.broadcast(unaff_delta), "event_type", "left").select(
        "event_type",
        (F.col("n") + F.coalesce(F.col("dn"), F.lit(0))).alias("n"),
        F.least(
            F.col("min_cents"), F.coalesce(F.col("dmin"), F.col("min_cents"))
        ).alias("min_cents"),
        F.greatest(
            F.col("max_cents"), F.coalesce(F.col("dmax"), F.col("max_cents"))
        ).alias("max_cents"),
    )
    born = unaff_delta.join(
        F.broadcast(old_view.select("event_type")), "event_type", "left_anti"
    ).select(
        "event_type",
        F.col("dn").alias("n"),
        F.col("dmin").alias("min_cents"),
        F.col("dmax").alias("max_cents"),
    )

    # --- Affected groups: recount pruned to the touched keys only. ---
    recount_rows = (
        base.join(F.broadcast(affected), "event_type", "semi")
        .join(F.broadcast(deletes.select("event_id")), "event_id", "left_anti")
        .unionByName(inserts.join(F.broadcast(affected), "event_type", "semi"))
    )
    recount = recount_rows.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
    )

    return (
        updated.unionByName(born)
        .unionByName(recount)
        .where(F.col("n") > 0)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("min_cents").cast("long").alias("min_cents"),
            F.col("max_cents").cast("long").alias("max_cents"),
        )
        .orderBy("event_type")
    )


@q(
    "wh_ivm_topk_delta",
    oracle="""
        WITH ev AS (
            SELECT event_type, event_id,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM events
        ), ranked AS (
            SELECT event_type, event_id, cents,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY cents DESC, event_id) AS rnk
            FROM ev
        )
        SELECT event_type, CAST(rnk AS INT) AS rnk, event_id, cents
        FROM ranked WHERE rnk <= 3
        ORDER BY event_type, rnk
    """,
)
def wh_ivm_topk_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k incremental view maintenance under an insert batch — the
    materialized-leaderboard algebra beside COUNT/SUM (wh_ivm_agg_delta)
    and MIN/MAX (wh_ivm_minmax_delta/_full): top-k is insert-maintainable
    because top-k(A ∪ B) = top-k(top-k(A) ∪ top-k(B)) — the maintained
    view IS a sufficient summary, so the merge re-ranks at most 2k rows
    per group and the base is never rescanned (MIN/MAX is the k=1
    special case; deletes need wh_ivm_minmax_full's affected-group
    recount, same as there). Here k=3 by (cents DESC, event_id) — a
    total order, so ROW_NUMBER is deterministic cross-engine. Both the
    old view and the batch delta shuffle once on the group key; the
    merge union is 2k-per-group-sized, and at 100 TB the view side is
    groups×k rows — storage-trivial, maintenance-cost independent of
    base size. The oracle recomputes top-3 over base ∪ inserts from
    scratch, so the hash proves merge ≡ recompute including ties broken
    inside the overlap of old and batch candidates."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    base = ev.where(F.col("event_id") % 10 != 0)
    inserts = ev.where(F.col("event_id") % 10 == 0)

    w = Window.partitionBy("event_type").orderBy(F.desc("cents"), F.asc("event_id"))

    def topk(df: DataFrame, k: int = 3) -> DataFrame:
        return (
            df.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .drop("rnk")
        )

    old_view = topk(base)      # the maintained view (groups×k rows)
    batch_top = topk(inserts)  # map-side-summarizable batch candidates
    return (
        topk(old_view.unionByName(batch_top))  # re-rank ≤2k rows per group
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .select("event_type", "rnk", "event_id", "cents")
        .orderBy("event_type", "rnk")
    )


@q(
    "wh_ivm_topk_full",
    oracle="""
        WITH ev AS (
            SELECT event_type, event_id,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM events
        ),
        base AS (SELECT * FROM ev WHERE event_id % 10 <> 0),
        inserts AS (SELECT * FROM ev WHERE event_id % 10 = 0),
        final AS (
            SELECT * FROM base
            WHERE NOT (event_id % 7 = 3 AND event_type IN ('view', 'signup'))
            UNION ALL
            SELECT * FROM inserts
        ), ranked AS (
            SELECT event_type, event_id, cents,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY cents DESC, event_id) AS rnk
            FROM final
        )
        SELECT event_type, CAST(rnk AS INT) AS rnk, event_id, cents
        FROM ranked WHERE rnk <= 3
        ORDER BY event_type, rnk
    """,
)
def wh_ivm_topk_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k IVM under a MIXED insert+delete batch — completes the IVM
    matrix (COUNT/SUM, join+agg, MIN/MAX, top-k × insert-only vs
    mixed): a delete of a leaderboard row cannot be merged because the
    k-row view holds no runner-up (same poisoning as MIN/MAX, which is
    the k=1 case), so deletes route through wh_ivm_minmax_full's
    affected-group recount while unaffected groups keep the pure top-k
    merge algebra of wh_ivm_topk_delta:

      * UNAFFECTED groups: new view = top-k(old view ∪ top-k(batch
        inserts)) — ≤2k rows per group re-ranked, base never rescanned;
      * AFFECTED groups (the delete batch's distinct keys, broadcast):
        recount base rows semi-joined on the key set, minus the batch's
        row ids (broadcast anti), plus the batch's inserts for those
        keys, then re-rank — pruned to the touched groups' rows only.

    The delete rule (event_id%7=3 AND type∈{view,signup}) affects 2 of
    5 groups and — because cents ranks high-to-low and the rule hits
    ~1/7 of rows — removes leaderboard members at sf0.01, exercising
    the case the merge path cannot handle. Every join is broadcast
    (plan-gated alongside wh_ivm_minmax_full); the oracle re-ranks
    (base − deletes) ∪ inserts from scratch, proving IVM ≡ recompute."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    base = ev.where(F.col("event_id") % 10 != 0)
    inserts = ev.where(F.col("event_id") % 10 == 0)
    deletes = base.where(
        (F.col("event_id") % 7 == 3) & F.col("event_type").isin("view", "signup")
    )
    affected = deletes.select("event_type").distinct()

    w = Window.partitionBy("event_type").orderBy(F.desc("cents"), F.asc("event_id"))

    def topk(df: DataFrame, k: int = 3) -> DataFrame:
        return (
            df.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .drop("rnk")
        )

    # Unaffected groups: merge path, base never rescanned.
    merged = topk(
        topk(base).unionByName(topk(inserts))
    ).join(F.broadcast(affected), "event_type", "left_anti")

    # Affected groups: recount pruned to the touched keys.
    recount_rows = (
        base.join(F.broadcast(affected), "event_type", "semi")
        .join(F.broadcast(deletes.select("event_id")), "event_id", "left_anti")
        .unionByName(inserts.join(F.broadcast(affected), "event_type", "semi"))
    )
    recount = topk(recount_rows)

    return (
        merged.unionByName(recount)
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .select("event_type", "rnk", "event_id", "cents")
        .orderBy("event_type", "rnk")
    )


@q(
    "wh_ivm_zset_join",
    oracle="""
        WITH o AS (
            SELECT o_orderkey, o_custkey,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ),
        a_final AS (
            SELECT * FROM o
            WHERE (o_orderkey % 10 <> 0 AND o_orderkey % 11 <> 5)
               OR o_orderkey % 10 = 0
        ),
        b_final AS (
            SELECT c_custkey, c_nationkey FROM customer
            WHERE (c_custkey % 9 <> 4 AND c_custkey % 13 <> 2)
               OR c_custkey % 9 = 4
        )
        SELECT n_name,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(cents) AS BIGINT) AS revenue_cents
        FROM a_final
        JOIN b_final ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        HAVING COUNT(*) > 0
        ORDER BY n_name
    """,
)
def wh_ivm_zset_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-set (counting-algebra) join-view maintenance — the DBSP /
    Materialize formalism that subsumes the insert-only join IVM
    (wh_ivm_join_delta / wh_ivm_joinagg_delta): every change row
    carries a multiplicity w (+1 insert, −1 delete), deltas on BOTH
    join sides compose by the bilinear rule

        d(A⋈B) = dA⋈B₀ + A₀⋈dB + dA⋈dB     (weight = w_A · w_B)

    and the aggregate view folds Σw (count) and Σw·cents (sum) per
    group. The rule's cross term is what makes simultaneous deletes
    correct: an order deleted in dA whose customer is ALSO deleted in
    dB contributes (−1) + (−1) + (−1)(−1) = −1 — removed exactly once.

    Scale shape: the fact side (orders) is scanned twice — once for the
    view bootstrap, once as A₀ in term 2 — and NEVER shuffled: term 1
    broadcasts the dim side B₀ (customer⋈nation, dim-sized), terms 2-3
    broadcast the change batches, and the view merge broadcasts the
    group-sized delta (plan-gated: broadcast joins only). In production
    the bootstrap is the pre-existing materialized view, so maintenance
    cost is O(|dA|·b + |A₀| scan), independent of re-join of the full
    history. Change rules put deletes on both sides (orders %11=5,
    customers %13=2) and inserts on both (%10=0, %9=4); the oracle
    recomputes (A−dA⁻+dA⁺)⋈(B−dB⁻+dB⁺) from scratch, so the driver
    hash proves the bilinear fold ≡ recompute, double-delete overlap
    included."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    b_all = cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey).select(
        "c_custkey", "n_name"
    )

    # A₀/B₀ are the PRE-batch states: deletes are drawn FROM them (a view
    # maintained against the post-delete state would double-remove).
    a_old = o.where(F.col("o_orderkey") % 10 != 0)
    a_del = o.where(
        (F.col("o_orderkey") % 10 != 0)
        & (F.col("o_orderkey") % 11 == 5)
    ).withColumn("wa", F.lit(-1).cast("long"))
    a_ins = o.where(F.col("o_orderkey") % 10 == 0).withColumn(
        "wa", F.lit(1).cast("long")
    )
    da = a_del.unionByName(a_ins)

    b_old = b_all.where(F.col("c_custkey") % 9 != 4)
    b_del = b_all.where(
        (F.col("c_custkey") % 9 != 4) & (F.col("c_custkey") % 13 == 2)
    ).withColumn("wb", F.lit(-1).cast("long"))
    b_ins = b_all.where(F.col("c_custkey") % 9 == 4).withColumn(
        "wb", F.lit(1).cast("long")
    )
    db = b_del.unionByName(b_ins)

    # The materialized view (in production: pre-existing, not recomputed).
    v_old = (
        a_old.join(F.broadcast(b_old), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
    )

    # Bilinear delta: weight of each contribution row = wa * wb.
    t1 = da.join(
        F.broadcast(b_old), F.col("o_custkey") == F.col("c_custkey")
    ).select("n_name", F.col("wa").alias("w"), "cents")
    t2 = a_old.join(
        F.broadcast(db), F.col("o_custkey") == F.col("c_custkey")
    ).select("n_name", F.col("wb").alias("w"), "cents")
    t3 = da.join(
        F.broadcast(db), F.col("o_custkey") == F.col("c_custkey")
    ).select("n_name", (F.col("wa") * F.col("wb")).alias("w"), "cents")
    delta = (
        t1.unionByName(t2)
        .unionByName(t3)
        .groupBy("n_name")
        .agg(F.sum("w").alias("dn"), F.sum(F.col("w") * F.col("cents")).alias("ds"))
    )

    updated = v_old.join(F.broadcast(delta), "n_name", "left").select(
        "n_name",
        (F.col("n") + F.coalesce(F.col("dn"), F.lit(0))).alias("n"),
        (F.col("s") + F.coalesce(F.col("ds"), F.lit(0))).alias("s"),
    )
    born = delta.join(
        F.broadcast(v_old.select("n_name")), "n_name", "left_anti"
    ).select("n_name", F.col("dn").alias("n"), F.col("ds").alias("s"))
    return (
        updated.unionByName(born)
        .where(F.col("n") > 0)
        .select(
            "n_name",
            F.col("n").cast("long").alias("n_orders"),
            F.col("s").cast("long").alias("revenue_cents"),
        )
        .orderBy("n_name")
    )


@q(
    "wh_weighted_median",
    oracle="""
        WITH w AS (
            SELECT l_suppkey, l_extendedprice,
                   SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) OVER (
                       PARTITION BY l_suppkey
                       ORDER BY l_extendedprice, l_orderkey, l_linenumber
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cumw,
                   SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) OVER (
                       PARTITION BY l_suppkey) AS tot
            FROM lineitem WHERE l_suppkey <= 25
        )
        SELECT l_suppkey, MIN(l_extendedprice) AS weighted_median
        FROM w WHERE 2 * cumw >= tot
        GROUP BY l_suppkey ORDER BY l_suppkey
    """,
)
def wh_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median unit price per supplier (weight = quantity) — the
    robust price-point a procurement review reads instead of the
    quantity-blind AVG, and the aggregate SQL has no builtin for: the
    smallest price whose cumulative weight reaches half the total
    (lower-median convention, 2·cumw ≥ tot). Weights are scaled to
    exact integer centi-units, so the prefix sums carry no float
    accumulation drift, and the cumulative order is made TOTAL by the
    (price, orderkey, linenumber) tiebreak — without it, equal prices
    with different weights would make the crossing row
    engine-dependent. The reported median is a raw data value (no
    arithmetic), so it hashes exactly. Scale shape: both windows share
    one partition spec keyed by l_suppkey, whose cardinality grows
    with the data — one shuffle, bounded partitions; the suppkey
    predicate is pushed to the parquet scan."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 25)
    wgt = F.round(F.col("l_quantity") * 100).cast("long")
    w_cum = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("l_suppkey")
    crossed = li.select(
        "l_suppkey",
        "l_extendedprice",
        F.sum(wgt).over(w_cum).alias("cumw"),
        F.sum(wgt).over(w_tot).alias("tot"),
    ).where(2 * F.col("cumw") >= F.col("tot"))
    return (
        crossed.groupBy("l_suppkey")
        .agg(F.min("l_extendedprice").alias("weighted_median"))
        .orderBy("l_suppkey")
    )


@q(
    "wh_runs_test",
    oracle="""
        WITH daily AS (
            SELECT event_type, DATE_TRUNC('day', ts) AS day,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS x
            FROM events GROUP BY 1, 2
        ), med AS (
            SELECT event_type, QUANTILE_CONT(x, 0.5) AS m
            FROM daily GROUP BY 1
        ), signs AS (
            SELECT d.event_type, d.day, d.x > med.m AS s
            FROM daily d JOIN med USING (event_type)
            WHERE d.x <> med.m
        ), runs AS (
            SELECT event_type, s,
                   LAG(s) OVER (PARTITION BY event_type ORDER BY day) AS ps
            FROM signs
        ), agg AS (
            SELECT event_type,
                   CAST(COUNT(CASE WHEN s THEN 1 END) AS BIGINT) AS n_plus,
                   CAST(COUNT(CASE WHEN NOT s THEN 1 END) AS BIGINT) AS n_minus,
                   CAST(1 + COUNT(CASE WHEN ps IS NOT NULL AND s <> ps
                                       THEN 1 END) AS BIGINT) AS n_runs
            FROM runs GROUP BY 1
        )
        SELECT event_type, n_plus, n_minus, n_runs,
               FLOOR((CAST(n_runs AS DOUBLE)
                      - (2.0 * n_plus * n_minus / (n_plus + n_minus) + 1.0))
                     / SQRT(2.0 * n_plus * n_minus
                            * (2.0 * n_plus * n_minus - n_plus - n_minus)
                            / ((CAST(n_plus + n_minus AS DOUBLE))
                               * (n_plus + n_minus)
                               * (n_plus + n_minus - 1)))
                     * 10000.0 + 0.5) / 10000.0 AS z,
               ABS(FLOOR((CAST(n_runs AS DOUBLE)
                      - (2.0 * n_plus * n_minus / (n_plus + n_minus) + 1.0))
                     / SQRT(2.0 * n_plus * n_minus
                            * (2.0 * n_plus * n_minus - n_plus - n_minus)
                            / ((CAST(n_plus + n_minus AS DOUBLE))
                               * (n_plus + n_minus)
                               * (n_plus + n_minus - 1)))
                     * 10000.0 + 0.5) / 10000.0) > 1.96 AS nonrandom
        FROM agg ORDER BY event_type
    """,
)
def wh_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test — the nonparametric 'is this series
    actually random around its center' check that belongs next to
    Benford/KS/PSI in a data-quality arsenal: too FEW runs of
    above/below-median days means trending or level shifts, too MANY
    means oscillation (negative autocorrelation) — both invisible to
    marginal-distribution tests. Signs come from the exact per-type
    median (ties dropped, the textbook treatment); the run count is
    1 + sign changes via one keyed LAG; E[R] and Var[R] are closed
    forms over the exact integer (n₊, n₋) counts, so the z statistic
    is a deterministic double both engines round identically. The fact
    aggregates to a day-bounded series before any window — scale-safe."""
    from pyspark.sql import Window

    from bigdatacw1_spark.operators.relational import stable_round

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("x"))
    med = daily.groupBy("event_type").agg(F.percentile("x", 0.5).alias("m"))
    signs = (
        daily.join(F.broadcast(med), "event_type")
        .where(F.col("x") != F.col("m"))
        .select("event_type", "day", (F.col("x") > F.col("m")).alias("s"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    runs = signs.withColumn("ps", F.lag("s").over(w))
    cnt = lambda cond: F.count(F.when(cond, 1))  # noqa: E731
    agg = runs.groupBy("event_type").agg(
        cnt(F.col("s")).cast("long").alias("n_plus"),
        cnt(~F.col("s")).cast("long").alias("n_minus"),
        (1 + cnt(F.col("ps").isNotNull() & (F.col("s") != F.col("ps"))))
        .cast("long")
        .alias("n_runs"),
    )
    np_, nm, nr = F.col("n_plus"), F.col("n_minus"), F.col("n_runs")
    n = np_ + nm
    e_r = F.lit(2.0) * np_ * nm / n + F.lit(1.0)
    var_r = (
        F.lit(2.0)
        * np_
        * nm
        * (F.lit(2.0) * np_ * nm - np_ - nm)
        / (n.cast("double") * n * (n - 1))
    )
    z = stable_round((nr.cast("double") - e_r) / F.sqrt(var_r), 4)
    return agg.select(
        "event_type",
        "n_plus",
        "n_minus",
        "n_runs",
        z.alias("z"),
        (F.abs(z) > 1.96).alias("nonrandom"),
    ).orderBy("event_type")


@q(
    "wh_growth_accounting",
    oracle="""
        WITH ua AS (
            SELECT DISTINCT user_id,
                   DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
                       AS wk
            FROM events
        ), firsts AS (
            SELECT user_id, MIN(wk) AS first_wk FROM ua GROUP BY 1
        ), state AS (
            SELECT a.user_id, a.wk,
                   f.first_wk = a.wk AS is_new,
                   p.user_id IS NOT NULL AS was_prev
            FROM ua a
            JOIN firsts f USING (user_id)
            LEFT JOIN ua p ON p.user_id = a.user_id AND p.wk = a.wk - 1
        ), churn AS (
            SELECT a.wk + 1 AS wk, CAST(COUNT(*) AS BIGINT) AS n_churned
            FROM ua a
            LEFT JOIN ua nx ON nx.user_id = a.user_id AND nx.wk = a.wk + 1
            WHERE nx.user_id IS NULL
              AND a.wk + 1 <= (SELECT MAX(wk) FROM ua)
            GROUP BY 1
        )
        SELECT CAST(CAST(DATE '1970-01-01' + INTERVAL (s.wk * 7) DAY AS DATE)
                    AS VARCHAR) AS week_start,
               CAST(COUNT(*) AS BIGINT) AS n_active,
               CAST(COUNT(CASE WHEN is_new THEN 1 END) AS BIGINT) AS n_new,
               CAST(COUNT(CASE WHEN was_prev THEN 1 END) AS BIGINT)
                   AS n_retained,
               CAST(COUNT(CASE WHEN NOT is_new AND NOT was_prev THEN 1 END)
                   AS BIGINT) AS n_resurrected,
               COALESCE(ANY_VALUE(c.n_churned), 0) AS n_churned
        FROM state s LEFT JOIN churn c ON c.wk = s.wk
        GROUP BY s.wk ORDER BY s.wk
    """,
)
def wh_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting — the active-user decomposition every
    growth review opens with: actives(w) = new + retained +
    resurrected, with churned(w) = users active in w−1 who vanished
    (the identity actives(w) − actives(w−1) = new + resurrected −
    churned is the audit). States are pure set algebra on the DISTINCT
    (user, week) activity table: first-week join for NEW, a
    shifted-by-one self-equi-join for RETAINED/CHURNED (weeks as
    integer epoch-day // 7 indices, so 'previous week' is an exact key,
    robust to gaps), resurrected = the remainder. Every join is keyed
    by user_id — cardinality scales with the data, no windows, no
    collect; counts are exact BIGINTs. Complements wh_cohort_retention
    (fixed-cohort view) and wh_dau_mau_stickiness (intensity view) with
    the flow view."""
    ev = _t(spark, sf_dir, "events")
    wk = F.floor(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")) / 7
    ).alias("wk")
    ua = ev.select("user_id", wk).distinct()
    firsts = ua.groupBy("user_id").agg(F.min("wk").alias("first_wk"))
    prev = ua.select(F.col("user_id").alias("pu"), (F.col("wk") + 1).alias("pwk"))
    state = (
        ua.join(firsts, "user_id")
        .join(
            prev,
            (F.col("user_id") == F.col("pu")) & (F.col("wk") == F.col("pwk")),
            "left",
        )
        .select(
            "user_id",
            "wk",
            (F.col("first_wk") == F.col("wk")).alias("is_new"),
            F.col("pu").isNotNull().alias("was_prev"),
        )
    )
    max_wk = ua.agg(F.max("wk").alias("mx"))
    nxt = ua.select(F.col("user_id").alias("nu"), (F.col("wk") - 1).alias("nwk"))
    churn = (
        ua.join(
            nxt,
            (F.col("user_id") == F.col("nu")) & (F.col("wk") == F.col("nwk")),
            "left",
        )
        .where(F.col("nu").isNull())
        .crossJoin(F.broadcast(max_wk))
        .where(F.col("wk") + 1 <= F.col("mx"))
        .groupBy((F.col("wk") + 1).alias("cwk"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_churned"))
    )
    cnt = lambda cond: F.count(F.when(cond, 1))  # noqa: E731
    return (
        state.groupBy("wk")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_active"),
            cnt(F.col("is_new")).cast("long").alias("n_new"),
            cnt(F.col("was_prev")).cast("long").alias("n_retained"),
            cnt(~F.col("is_new") & ~F.col("was_prev"))
            .cast("long")
            .alias("n_resurrected"),
        )
        .join(F.broadcast(churn), F.col("wk") == F.col("cwk"), "left")
        .select(
            F.date_add(
                F.lit("1970-01-01").cast("date"), (F.col("wk") * 7).cast("int")
            )
            .cast("string")
            .alias("week_start"),
            "n_active",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce(F.col("n_churned"), F.lit(0).cast("long")).alias("n_churned"),
        )
        .orderBy("week_start")
    )


@q(
    "wh_shapley_attribution",
    oracle="""
        WITH first_purchase AS (
            SELECT user_id,
                   MIN(STRUCT_PACK(ts := ts, event_id := event_id)) AS fp
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id
        ), coalitions AS (
            SELECT e.user_id, e.event_type
            FROM events e JOIN first_purchase p ON e.user_id = p.user_id
            WHERE e.event_type <> 'purchase'
              AND (e.ts < p.fp.ts
                   OR (e.ts = p.fp.ts AND e.event_id < p.fp.event_id))
            GROUP BY e.user_id, e.event_type
        ), sized AS (
            SELECT user_id, event_type,
                   COUNT(*) OVER (PARTITION BY user_id) AS k
            FROM coalitions
        )
        SELECT event_type AS channel,
               CAST(SUM(12 / k) AS BIGINT) AS shapley_twelfths,
               FLOOR((SUM(12 / k) / 12.0) * 10000.0 + 0.5) / 10000.0
                   AS shapley_conversions,
               CAST(COUNT(*) AS BIGINT) AS n_coalitions
        FROM sized
        GROUP BY event_type
        ORDER BY channel
    """,
)
def wh_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value channel attribution — the third leg of the
    attribution stack next to wh_attribution_touch (bookend models) and
    wh_attribution_markov (removal effects). Each converting user's
    journey is the coalition S of DISTINCT non-purchase channels seen
    strictly before the FIRST purchase (total (ts, event_id) order, so
    no ties). The game v(T) = #conversions whose coalition ⊆ T is a sum
    of unanimity games u_S, so by Shapley linearity the EXACT Shapley
    value of channel c is Σ_{S ∋ c} 1/|S| — no 2^n subset enumeration
    needed, which is what makes this form the one that survives at
    100 TB: it is one bounded groupBy chain (user-keyed dedup, a
    user-bounded count, an explode-free per-row division). With 4
    non-purchase channels |S| ∈ {1..4}, so crediting 12/|S| integer
    twelfths keeps the sum EXACT (lcm(1..4) = 12) and order-free; the
    rounded double is derived from that integer once at the end.
    Users whose first purchase has no preceding touch contribute no
    coalition (nothing to split)."""
    ev = _t(spark, sf_dir, "events")
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id")).alias("fp"))
    )
    coalitions = (
        ev.where(F.col("event_type") != "purchase")
        .join(fp, "user_id")
        .where(
            (F.col("ts") < F.col("fp.ts"))
            | ((F.col("ts") == F.col("fp.ts")) & (F.col("event_id") < F.col("fp.event_id")))
        )
        .select("user_id", "event_type")
        .distinct()
    )
    from pyspark.sql import Window

    sized = coalitions.withColumn(
        "k", F.count(F.lit(1)).over(Window.partitionBy("user_id"))
    )
    return (
        sized.groupBy(F.col("event_type").alias("channel"))
        .agg(
            F.sum(F.lit(12) / F.col("k")).cast("long").alias("shapley_twelfths"),
            stable_round(F.sum(F.lit(12) / F.col("k")) / F.lit(12.0), 4).alias(
                "shapley_conversions"
            ),
            F.count(F.lit(1)).cast("long").alias("n_coalitions"),
        )
        .orderBy("channel")
    )


@q(
    "wh_uplift_stratified",
    oracle="""
        WITH outcome AS (
            SELECT c.c_custkey, c.c_mktsegment,
                   c.c_custkey % 2 = 0 AS treated,
                   COALESCE(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)), 0)
                       AS y_cents
            FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY c.c_custkey, c.c_mktsegment
        ), strata AS (
            SELECT c_mktsegment,
                   SUM(CASE WHEN treated THEN 1 ELSE 0 END) AS n_treat,
                   SUM(CASE WHEN treated THEN 0 ELSE 1 END) AS n_ctrl,
                   SUM(CASE WHEN treated THEN y_cents ELSE 0 END) AS sum_t,
                   SUM(CASE WHEN NOT treated THEN y_cents ELSE 0 END) AS sum_c
            FROM outcome
            GROUP BY c_mktsegment
        ), tot AS (SELECT SUM(n_treat + n_ctrl) AS n FROM strata)
        SELECT c_mktsegment,
               CAST(n_treat AS BIGINT) AS n_treat,
               CAST(n_ctrl AS BIGINT) AS n_ctrl,
               FLOOR((CAST(sum_t AS DOUBLE) / n_treat) * 10000.0 + 0.5) / 10000.0
                   AS mean_treat_cents,
               FLOOR((CAST(sum_c AS DOUBLE) / n_ctrl) * 10000.0 + 0.5) / 10000.0
                   AS mean_ctrl_cents,
               FLOOR((CAST(sum_t AS DOUBLE) / n_treat
                      - CAST(sum_c AS DOUBLE) / n_ctrl) * 10000.0 + 0.5) / 10000.0
                   AS effect_cents,
               FLOOR(((CAST(n_treat + n_ctrl AS DOUBLE) / tot.n)
                      * (CAST(sum_t AS DOUBLE) / n_treat
                         - CAST(sum_c AS DOUBLE) / n_ctrl)) * 10000.0 + 0.5)
                   / 10000.0 AS weighted_effect_cents
        FROM strata CROSS JOIN tot
        ORDER BY c_mktsegment
    """,
)
def wh_uplift_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-stratified treatment-effect estimate (standardization) — the
    experimentation companion to wh_cuped_adjusted (variance reduction)
    and wh_diff_in_diff (trend confounds): assignment here is the
    synthetic c_custkey parity, outcome is lifetime order value in
    integer cents (customers with no orders count as 0 — dropping them
    would bias both arms), and market segment is the stratum. Per
    stratum the effect is mean(treat) − mean(ctrl); the population ATE
    is the stratum-size-weighted sum of the per-stratum effects
    (Σ weighted_effect_cents), which removes any segment-mix imbalance
    between arms. All moments are exact BIGINT sums; the only floats
    are final divisions of exact integers, identical in both engines.
    Scale: one customer-keyed join + two bounded groupBys (strata are
    model-sized), broadcastable total."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    outcome = (
        cust.join(
            orders.select("o_custkey", cents.alias("cents")),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey", "c_mktsegment", (F.col("c_custkey") % 2 == 0).alias("treated"))
        .agg(F.coalesce(F.sum("cents"), F.lit(0)).alias("y_cents"))
    )
    strata = outcome.groupBy("c_mktsegment").agg(
        F.sum(F.when(F.col("treated"), 1).otherwise(0)).alias("n_treat"),
        F.sum(F.when(F.col("treated"), 0).otherwise(1)).alias("n_ctrl"),
        F.sum(F.when(F.col("treated"), F.col("y_cents")).otherwise(0)).alias("sum_t"),
        F.sum(F.when(~F.col("treated"), F.col("y_cents")).otherwise(0)).alias("sum_c"),
    )
    tot = strata.agg(F.sum(F.col("n_treat") + F.col("n_ctrl")).alias("n"))
    mean_t = F.col("sum_t").cast("double") / F.col("n_treat")
    mean_c = F.col("sum_c").cast("double") / F.col("n_ctrl")
    return (
        strata.crossJoin(F.broadcast(tot))
        .select(
            "c_mktsegment",
            F.col("n_treat").cast("long").alias("n_treat"),
            F.col("n_ctrl").cast("long").alias("n_ctrl"),
            stable_round(mean_t, 4).alias("mean_treat_cents"),
            stable_round(mean_c, 4).alias("mean_ctrl_cents"),
            stable_round(mean_t - mean_c, 4).alias("effect_cents"),
            stable_round(
                ((F.col("n_treat") + F.col("n_ctrl")).cast("double") / F.col("n"))
                * (mean_t - mean_c),
                4,
            ).alias("weighted_effect_cents"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Round 8: statistical-inference tail (rank tests, resampling, conformal,
# sequential testing) — the experiment-analysis layer over warehouse facts.
# ---------------------------------------------------------------------------


@q(
    "wh_mann_whitney",
    oracle="""
        WITH base AS (
            SELECT o_orderstatus AS status,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
                   CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
                       AS is_a
            FROM orders
            WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        ), byval AS (
            SELECT status, cents, COUNT(*) AS cnt,
                   SUM(is_a) AS cnt_a
            FROM base GROUP BY status, cents
        ), ranked AS (
            SELECT status, cnt, cnt_a,
                   SUM(cnt) OVER (PARTITION BY status ORDER BY cents
                                  ROWS UNBOUNDED PRECEDING) AS cum
            FROM byval
        ), stats AS (
            SELECT status,
                   CAST(SUM(cnt_a) AS BIGINT) AS n_a,
                   CAST(SUM(cnt - cnt_a) AS BIGINT) AS n_b,
                   SUM(cnt_a * (CAST(cum - cnt AS DOUBLE)
                                + CAST(cnt + 1 AS DOUBLE) / 2.0)) AS r_a,
                   CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_sum
            FROM ranked GROUP BY status
        )
        SELECT status, n_a AS n_urgent, n_b AS n_low,
               FLOOR((r_a - CAST(n_a AS DOUBLE) * CAST(n_a + 1 AS DOUBLE) / 2.0)
                     * 10000.0 + 0.5) / 10000.0 AS u_stat,
               FLOOR(((r_a - CAST(n_a AS DOUBLE) * CAST(n_a + 1 AS DOUBLE) / 2.0)
                      - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)
                     / SQRT((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0)
                            * (CAST(n_a + n_b + 1 AS DOUBLE)
                               - CAST(tie_sum AS DOUBLE)
                                 / (CAST(n_a + n_b AS DOUBLE)
                                    * CAST(n_a + n_b - 1 AS DOUBLE))))
                     * 1000000.0 + 0.5) / 1000000.0 AS z_score
        FROM stats ORDER BY status
    """,
)
def wh_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (tie-corrected normal approximation):
    the nonparametric two-sample test an experimentation platform reaches
    for when outcome distributions are heavy-tailed (order totals are) and
    a t-test's mean is not trustworthy. Per order status, compares URGENT
    vs LOW priority order totals. Shape: one hash aggregate to DISTINCT
    VALUE cells (cents, cnt, cnt_a), a cumulative-count window over those
    cells partitioned by status — midrank = cum_before + (cnt+1)/2 — then
    a per-status rollup; the window input is value-distinct, orders of
    magnitude smaller than the fact table, and every midrank/product is a
    half-integer, exact in IEEE doubles, so the rank-sum is order-free
    across partitions. U = R_a − n_a(n_a+1)/2; z uses the tie-corrected
    variance n_a·n_b/12·((n+1) − Σ(t³−t)/(n(n−1)))."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    base = o.where(F.col("o_orderpriority").isin("1-URGENT", "5-LOW")).select(
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_a"),
    )
    byval = base.groupBy("status", "cents").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("is_a").alias("cnt_a")
    )
    w = (
        Window.partitionBy("status")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = byval.withColumn("cum", F.sum("cnt").over(w))
    midrank = (F.col("cum") - F.col("cnt")).cast("double") + (
        F.col("cnt") + 1
    ).cast("double") / F.lit(2.0)
    stats = ranked.groupBy("status").agg(
        F.sum("cnt_a").cast("long").alias("n_a"),
        F.sum(F.col("cnt") - F.col("cnt_a")).cast("long").alias("n_b"),
        F.sum(F.col("cnt_a") * midrank).alias("r_a"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"))
        .cast("long")
        .alias("tie_sum"),
    )
    n_a = F.col("n_a").cast("double")
    n_b = F.col("n_b").cast("double")
    n = (F.col("n_a") + F.col("n_b")).cast("double")
    u_a = F.col("r_a") - n_a * (F.col("n_a") + 1).cast("double") / F.lit(2.0)
    var = (n_a * n_b / F.lit(12.0)) * (
        (F.col("n_a") + F.col("n_b") + 1).cast("double")
        - F.col("tie_sum").cast("double")
        / (n * (F.col("n_a") + F.col("n_b") - 1).cast("double"))
    )
    return stats.select(
        "status",
        F.col("n_a").alias("n_urgent"),
        F.col("n_b").alias("n_low"),
        stable_round(u_a, 4).alias("u_stat"),
        stable_round((u_a - n_a * n_b / F.lit(2.0)) / F.sqrt(var), 6).alias(
            "z_score"
        ),
    ).orderBy("status")


@q(
    "wh_chi_square",
    oracle="""
        WITH joined AS (
            SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        ), obs AS (
            SELECT seg, pri, CAST(COUNT(*) AS BIGINT) AS o
            FROM joined GROUP BY seg, pri
        ), rowt AS (SELECT seg, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY seg),
        colt AS (SELECT pri, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY pri),
        grand AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
        cells AS (
            SELECT obs.o,
                   CAST(rowt.r AS DOUBLE) * CAST(colt.c AS DOUBLE)
                       / CAST(grand.n AS DOUBLE) AS e,
                   grand.n
            FROM obs JOIN rowt USING (seg) JOIN colt USING (pri), grand
        ), agg AS (
            SELECT CAST(SUM(CAST(FLOOR((CAST(o AS DOUBLE) - e)
                                       * (CAST(o AS DOUBLE) - e) / e
                                       * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
                       AS chi2_micro,
                   MAX(n) AS n,
                   CAST(COUNT(*) AS BIGINT) AS n_cells
            FROM cells
        ), dims AS (
            SELECT (SELECT COUNT(*) FROM rowt) AS nr,
                   (SELECT COUNT(*) FROM colt) AS nc
        )
        SELECT agg.n, agg.n_cells,
               CAST((dims.nr - 1) * (dims.nc - 1) AS BIGINT) AS dof,
               CAST(agg.chi2_micro AS DOUBLE) / 1000000.0 AS chi2,
               FLOOR(SQRT((CAST(agg.chi2_micro AS DOUBLE) / 1000000.0)
                          / (CAST(agg.n AS DOUBLE)
                             * CAST(LEAST(dims.nr - 1, dims.nc - 1) AS DOUBLE)))
                     * 1000000.0 + 0.5) / 1000000.0 AS cramers_v
        FROM agg, dims
    """,
)
def wh_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence (market segment × order priority)
    with Cramér's V effect size — the categorical-association audit that
    complements ext_metadata_mi's information-theoretic view. Shape: one
    fact-side join orders→customer, one hash aggregate to the R×C
    contingency table (25 cells), then margins/expected counts on the
    CELL table — everything after the first aggregate is cell-sized and
    broadcastable. Per-cell (O−E)²/E terms are quantized to integer
    micro-units BEFORE the final sum so the statistic is independent of
    cell visit order (a float Σ over 25 doubles would be partition-order
    sensitive in the last ulp); chi2 re-derives from the exact integer."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    joined = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"), F.col("o_orderpriority").alias("pri")
    )
    obs = joined.groupBy("seg", "pri").agg(F.count(F.lit(1)).alias("o"))
    rowt = obs.groupBy("seg").agg(F.sum("o").cast("long").alias("r"))
    colt = obs.groupBy("pri").agg(F.sum("o").cast("long").alias("c"))
    grand = obs.agg(F.sum("o").cast("long").alias("n"))
    dims = rowt.agg(F.count(F.lit(1)).alias("nr")).crossJoin(
        colt.agg(F.count(F.lit(1)).alias("nc"))
    )
    e = F.col("r").cast("double") * F.col("c").cast("double") / F.col("n").cast(
        "double"
    )
    od = F.col("o").cast("double")
    term_micro = F.floor((od - e) * (od - e) / e * F.lit(1000000.0) + F.lit(0.5)).cast(
        "long"
    )
    cells = (
        obs.join(F.broadcast(rowt), "seg")
        .join(F.broadcast(colt), "pri")
        .crossJoin(F.broadcast(grand))
        .select(term_micro.alias("tm"), "n")
    )
    agg = cells.agg(
        F.sum("tm").cast("long").alias("chi2_micro"),
        F.max("n").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    chi2 = F.col("chi2_micro").cast("double") / F.lit(1000000.0)
    return agg.crossJoin(F.broadcast(dims)).select(
        "n",
        "n_cells",
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof"),
        chi2.alias("chi2"),
        stable_round(
            F.sqrt(
                chi2
                / (
                    F.col("n").cast("double")
                    * F.least(F.col("nr") - 1, F.col("nc") - 1).cast("double")
                )
            ),
            6,
        ).alias("cramers_v"),
    )


@q(
    "wh_poisson_bootstrap",
    oracle="""
        WITH fact AS (
            SELECT o.o_orderkey AS k, c.c_mktsegment AS seg,
                   CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        ), reps AS (
            SELECT f.seg, f.cents, b.b,
                   CAST((f.k * 2654435761 + (b.b + 1) * 40503) % 2147483647
                        AS DOUBLE) / 2147483647.0 AS u
            FROM fact f, (SELECT UNNEST(GENERATE_SERIES(0, 39)) AS b) b
        ), weighted AS (
            SELECT seg, b, cents,
                   CASE WHEN u < 0.36787944117144233 THEN 0
                        WHEN u < 0.7357588823428847 THEN 1
                        WHEN u < 0.9196986029286058 THEN 2
                        WHEN u < 0.9810118431238462 THEN 3
                        WHEN u < 0.9963401531726563 THEN 4
                        ELSE 5 END AS w
            FROM reps
        ), repmeans AS (
            SELECT seg, b,
                   CAST(FLOOR(CAST(SUM(w * cents) AS DOUBLE)
                              / CAST(SUM(w) AS DOUBLE) + 0.5) AS BIGINT) AS m
            FROM weighted GROUP BY seg, b
        ), ordered AS (
            SELECT seg, m,
                   ROW_NUMBER() OVER (PARTITION BY seg ORDER BY m, b) AS rn
            FROM repmeans
        ), stats AS (
            SELECT seg, CAST(SUM(m) AS BIGINT) AS s,
                   MAX(CASE WHEN rn = 1 THEN m END) AS lo,
                   MAX(CASE WHEN rn = 39 THEN m END) AS hi
            FROM ordered GROUP BY seg
        ), dev AS (
            SELECT o.seg,
                   SUM(CAST(40 * o.m - s.s AS DOUBLE)
                       * CAST(40 * o.m - s.s AS DOUBLE)) AS ss
            FROM ordered o JOIN stats s USING (seg) GROUP BY o.seg
        )
        SELECT s.seg AS c_mktsegment,
               FLOOR(CAST(s.s AS DOUBLE) / 40.0 / 100.0 * 10000.0 + 0.5)
                   / 10000.0 AS boot_mean,
               FLOOR(SQRT(d.ss / (1600.0 * 39.0)) / 100.0 * 10000.0 + 0.5)
                   / 10000.0 AS boot_se,
               FLOOR(CAST(s.lo AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0
                   AS ci_lo,
               FLOOR(CAST(s.hi AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0
                   AS ci_hi
        FROM stats s JOIN dev d USING (seg)
        ORDER BY c_mktsegment
    """,
)
def wh_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap (B=40 replicates) of mean order value per market
    segment — THE resampling scheme that scales: classic bootstrap needs
    n draws with global coordination, but Poisson(1) replicate weights
    are independent per row, so the whole thing is a map-side explode
    (row × 40 weights) plus one hash aggregate on (segment, replicate).
    No resampling shuffle, no driver loop; at 100 TB the explode factor
    is the only cost and B caps it. Weights derive from a deterministic
    multiplicative-hash uniform u = ((key·2654435761 + (b+1)·40503) mod
    2^31−1)/2^31−1 pushed through the Poisson(1) inverse CDF, so both
    engines draw the SAME bootstrap sample. Replicate means are rounded
    to integer cents; the se uses Σ(40m−S)² over those integers (exact in
    doubles, order-free) and the CI is the 1st/39th order statistic of
    the 40 replicate means (percentile bootstrap). The window runs over
    exactly B=40 rows per segment — bounded by construction."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    fact = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("o_orderkey").alias("k"),
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    reps = fact.withColumn("b", F.explode(F.sequence(F.lit(0), F.lit(39))))
    u = (
        (F.col("k") * F.lit(2654435761) + (F.col("b") + 1) * F.lit(40503))
        % F.lit(2147483647)
    ).cast("double") / F.lit(2147483647.0)
    w = (
        F.when(u < 0.36787944117144233, 0)
        .when(u < 0.7357588823428847, 1)
        .when(u < 0.9196986029286058, 2)
        .when(u < 0.9810118431238462, 3)
        .when(u < 0.9963401531726563, 4)
        .otherwise(5)
    )
    weighted = reps.select("seg", "b", "cents", w.alias("w"))
    repmeans = weighted.groupBy("seg", "b").agg(
        F.floor(
            F.sum(F.col("w") * F.col("cents")).cast("double")
            / F.sum("w").cast("double")
            + F.lit(0.5)
        )
        .cast("long")
        .alias("m")
    )
    rn = F.row_number().over(Window.partitionBy("seg").orderBy("m", "b"))
    ordered = repmeans.select("seg", "m", "b").withColumn("rn", rn)
    stats = ordered.groupBy("seg").agg(
        F.sum("m").cast("long").alias("s"),
        F.max(F.when(F.col("rn") == 1, F.col("m"))).alias("lo"),
        F.max(F.when(F.col("rn") == 39, F.col("m"))).alias("hi"),
    )
    dev = (
        ordered.join(F.broadcast(stats.select("seg", "s")), "seg")
        .select(
            "seg",
            ((F.lit(40) * F.col("m") - F.col("s")).cast("double")).alias("d"),
        )
        .groupBy("seg")
        .agg(F.sum(F.col("d") * F.col("d")).alias("ss"))
    )
    return (
        stats.join(F.broadcast(dev), "seg")
        .select(
            F.col("seg").alias("c_mktsegment"),
            stable_round(
                F.col("s").cast("double") / F.lit(40.0) / F.lit(100.0), 4
            ).alias("boot_mean"),
            stable_round(
                F.sqrt(F.col("ss") / F.lit(1600.0 * 39.0)) / F.lit(100.0), 4
            ).alias("boot_se"),
            stable_round(F.col("lo").cast("double") / F.lit(100.0), 4).alias(
                "ci_lo"
            ),
            stable_round(F.col("hi").cast("double") / F.lit(100.0), 4).alias(
                "ci_hi"
            ),
        )
        .orderBy("c_mktsegment")
    )


@q(
    "wh_conformal_intervals",
    oracle="""
        WITH base AS (
            SELECT o_orderpriority AS pri, o_orderkey % 4 AS split,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ), model AS (
            SELECT pri, CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS pred,
                   CAST(COUNT(*) AS BIGINT) AS n_train
            FROM base WHERE split IN (0, 1) GROUP BY pri
        ), cal AS (
            SELECT b.pri, ABS(CAST(b.cents AS DOUBLE) - m.pred) AS resid
            FROM base b JOIN model m USING (pri) WHERE b.split = 2
        ), caln AS (
            SELECT pri, CAST(COUNT(*) AS BIGINT) AS n_cal FROM cal GROUP BY pri
        ), ranked AS (
            SELECT pri, resid,
                   ROW_NUMBER() OVER (PARTITION BY pri ORDER BY resid) AS rn
            FROM cal
        ), qhat AS (
            SELECT r.pri, r.resid AS q
            FROM ranked r JOIN caln n USING (pri)
            WHERE r.rn = CAST(CEIL(0.9 * CAST(n.n_cal + 1 AS DOUBLE)) AS BIGINT)
        ), test AS (
            SELECT b.pri,
                   CASE WHEN ABS(CAST(b.cents AS DOUBLE) - m.pred) <= q.q
                        THEN 1 ELSE 0 END AS covered
            FROM base b JOIN model m USING (pri) JOIN qhat q USING (pri)
            WHERE b.split = 3
        )
        SELECT m.pri AS o_orderpriority, m.n_train, n.n_cal,
               CAST(COUNT(*) AS BIGINT) AS n_test,
               FLOOR(q.q / 100.0 * 10000.0 + 0.5) / 10000.0 AS q_hat,
               FLOOR(CAST(SUM(t.covered) AS DOUBLE) / COUNT(*) * 10000.0 + 0.5)
                   / 10000.0 AS coverage
        FROM test t JOIN model m USING (pri) JOIN caln n USING (pri)
             JOIN qhat q USING (pri)
        GROUP BY m.pri, m.n_train, n.n_cal, q.q
        ORDER BY o_orderpriority
    """,
)
def wh_conformal_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split conformal prediction: the distribution-free interval wrapper
    every production model-eval pipeline should run. Train split
    (orderkey%4∈{0,1}) fits the per-priority mean; calibration split (=2)
    yields |y−ŷ| residuals; q̂ is the ⌈(n_cal+1)·0.9⌉-th smallest residual
    (the finite-sample-valid conformal quantile, NOT the plug-in 90th
    percentile); the test split (=3) then measures empirical coverage of
    ŷ±q̂, which conformal theory guarantees ≥90% in expectation regardless
    of the outcome distribution. Shape: model and q̂ are group-sized and
    broadcast; the only fact-sized passes are hash aggregates and one
    rank window partitioned by priority over the calibration split —
    at 100 TB the exact order statistic would range-shard the way
    global_order_columns does, or swap to the GK sketch with a quantile
    offset (ext_sketch_quantiles), trading the finite-sample guarantee
    for a bounded-error one."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderpriority").alias("pri"),
        (F.col("o_orderkey") % 4).alias("split"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    model = (
        base.where(F.col("split").isin(0, 1))
        .groupBy("pri")
        .agg(
            (F.sum("cents").cast("double") / F.count(F.lit(1))).alias("pred"),
            F.count(F.lit(1)).cast("long").alias("n_train"),
        )
    )
    cal = (
        base.where(F.col("split") == 2)
        .join(F.broadcast(model), "pri")
        .select("pri", F.abs(F.col("cents").cast("double") - F.col("pred")).alias("resid"))
    )
    caln = cal.groupBy("pri").agg(F.count(F.lit(1)).cast("long").alias("n_cal"))
    ranked = cal.withColumn(
        "rn", F.row_number().over(Window.partitionBy("pri").orderBy("resid"))
    )
    qhat = (
        ranked.join(F.broadcast(caln), "pri")
        .where(
            F.col("rn")
            == F.ceil(F.lit(0.9) * (F.col("n_cal") + 1).cast("double")).cast("long")
        )
        .select("pri", F.col("resid").alias("q"))
    )
    test = (
        base.where(F.col("split") == 3)
        .join(F.broadcast(model), "pri")
        .join(F.broadcast(qhat), "pri")
        .select(
            "pri",
            "n_train",
            "q",
            F.when(
                F.abs(F.col("cents").cast("double") - F.col("pred")) <= F.col("q"), 1
            )
            .otherwise(0)
            .alias("covered"),
        )
    )
    return (
        test.groupBy("pri", "n_train", "q")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum("covered").alias("n_cov"),
        )
        .join(F.broadcast(caln), "pri")
        .select(
            F.col("pri").alias("o_orderpriority"),
            "n_train",
            "n_cal",
            "n_test",
            stable_round(F.col("q") / F.lit(100.0), 4).alias("q_hat"),
            stable_round(
                F.col("n_cov").cast("double") / F.col("n_test").cast("double"), 4
            ).alias("coverage"),
        )
        .orderBy("o_orderpriority")
    )


@q(
    "wh_sprt_sequential",
    oracle="""
        WITH daily AS (
            SELECT event_type, DATE_TRUNC('day', ts) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_d,
                   CAST(SUM(CASE WHEN value > 40.0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS s_d
            FROM events GROUP BY 1, 2
        ), cum AS (
            SELECT event_type, day,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
                       AS t,
                   SUM(n_d) OVER (PARTITION BY event_type ORDER BY day
                                  ROWS UNBOUNDED PRECEDING) AS n,
                   SUM(s_d) OVER (PARTITION BY event_type ORDER BY day
                                  ROWS UNBOUNDED PRECEDING) AS s
            FROM daily
        ), llrd AS (
            SELECT event_type, t, n, s,
                   CAST(s AS DOUBLE) * 0.22314355131420976
                   + CAST(n - s AS DOUBLE) * (-0.1823215567939546) AS llr,
                   CAST(s AS DOUBLE) * 0.22314355131420976
                     + CAST(n - s AS DOUBLE) * (-0.1823215567939546) >= 2.9444389791664403
                   OR CAST(s AS DOUBLE) * 0.22314355131420976
                     + CAST(n - s AS DOUBLE) * (-0.1823215567939546) <= -2.9444389791664403
                       AS crossed
            FROM cum
        ), pick AS (
            SELECT event_type,
                   COALESCE(MIN(CASE WHEN crossed THEN t END), MAX(t)) AS t_pick
            FROM llrd GROUP BY event_type
        )
        SELECT l.event_type,
               CASE WHEN l.llr >= 2.9444389791664403 THEN 'accept_h1'
                    WHEN l.llr <= -2.9444389791664403 THEN 'accept_h0'
                    ELSE 'continue' END AS decision,
               CAST(l.t AS BIGINT) AS days_observed,
               CAST(l.n AS BIGINT) AS n_obs,
               CAST(l.s AS BIGINT) AS n_success,
               FLOOR(l.llr * 1000000.0 + 0.5) / 1000000.0 AS llr
        FROM llrd l JOIN pick p
          ON p.event_type = l.event_type AND l.t = p.t_pick
        ORDER BY l.event_type
    """,
)
def wh_sprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's Sequential Probability Ratio Test — the always-valid
    stopping rule that lets an experiment end the day the evidence is
    in rather than at a fixed horizon. Per event type, daily Bernoulli
    trials (value > 40) test H0: p=0.4 vs H1: p=0.5 at α=β=0.05: the
    cumulative log-likelihood ratio S·ln(p1/p0) + (N−S)·ln((1−p1)/(1−p0))
    stops the first day it exits (−ln 19, ln 19). Complements
    ev_cusum_changepoint (detects shifts) and wh_conversion_wilson
    (fixed-horizon CI): SPRT is the sequential DECISION. Shape: one hash
    aggregate to per-day cells, cumulative windows partitioned by
    event_type over the DAY series (calendar-bounded, like
    ev_cusum_changepoint), and the first-crossing pick is a per-type
    min — the llr re-derives from exact cumulative integers at every
    step, so crossing detection is order-free."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_d"),
        F.sum(F.when(F.col("value") > 40.0, 1).otherwise(0))
        .cast("long")
        .alias("s_d"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    cum = daily.select(
        "event_type",
        F.row_number().over(wo).alias("t"),
        F.sum("n_d").over(w).alias("n"),
        F.sum("s_d").over(w).alias("s"),
    )
    la = F.lit(math.log(0.5 / 0.4))
    lb = F.lit(math.log(0.5 / 0.6))
    bound = F.lit(math.log(19.0))
    llr = F.col("s").cast("double") * la + (F.col("n") - F.col("s")).cast(
        "double"
    ) * lb
    llrd = cum.select(
        "event_type",
        "t",
        "n",
        "s",
        llr.alias("llr"),
        ((llr >= bound) | (llr <= -bound)).alias("crossed"),
    )
    pick = llrd.groupBy("event_type").agg(
        F.coalesce(
            F.min(F.when(F.col("crossed"), F.col("t"))), F.max("t")
        ).alias("t_pick")
    ).select(F.col("event_type").alias("et_pick"), "t_pick")
    return (
        llrd.join(
            F.broadcast(pick),
            (llrd.event_type == F.col("et_pick")) & (llrd.t == F.col("t_pick")),
        )
        .select(
            "event_type",
            F.when(F.col("llr") >= bound, "accept_h1")
            .when(F.col("llr") <= -bound, "accept_h0")
            .otherwise("continue")
            .alias("decision"),
            F.col("t").cast("long").alias("days_observed"),
            F.col("n").cast("long").alias("n_obs"),
            F.col("s").cast("long").alias("n_success"),
            stable_round(F.col("llr"), 6).alias("llr"),
        )
        .orderBy("event_type")
    )


@q(
    "wh_ipw_ate",
    oracle="""
        WITH cust AS (
            SELECT c_custkey AS k,
                   CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bucket,
                   CASE WHEN c_custkey % 2 = 0 THEN 1 ELSE 0 END AS t
            FROM customer
        ), outcome AS (
            SELECT c.k, c.bucket, c.t,
                   COALESCE(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)), 0)
                       AS y
            FROM cust c LEFT JOIN orders o ON o.o_custkey = c.k
            GROUP BY c.k, c.bucket, c.t
        ), strata AS (
            SELECT bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_d,
                   CAST(SUM(t) AS BIGINT) AS nt,
                   CAST(SUM(1 - t) AS BIGINT) AS nc,
                   CAST(SUM(CASE WHEN t = 1 THEN y ELSE 0 END) AS BIGINT) AS syt,
                   CAST(SUM(CASE WHEN t = 0 THEN y ELSE 0 END) AS BIGINT) AS syc
            FROM outcome GROUP BY bucket
        ), keep AS (SELECT * FROM strata WHERE nt > 0 AND nc > 0),
        terms AS (
            SELECT n_d, nt, nc, syt, syc,
                   CAST(FLOOR(CAST(syt AS DOUBLE) * CAST(n_d AS DOUBLE)
                              / CAST(nt AS DOUBLE) * 100.0 + 0.5) AS BIGINT)
                       AS ct_c,
                   CAST(FLOOR(CAST(syc AS DOUBLE) * CAST(n_d AS DOUBLE)
                              / CAST(nc AS DOUBLE) * 100.0 + 0.5) AS BIGINT)
                       AS cc_c,
                   CAST(FLOOR(CAST(n_d AS DOUBLE) * CAST(n_d AS DOUBLE)
                              / CAST(nt AS DOUBLE) * 100.0 + 0.5) AS BIGINT)
                       AS wsq_c
            FROM keep
        )
        SELECT CAST(SUM(n_d) AS BIGINT) AS n,
               CAST(SUM(nt) AS BIGINT) AS n_treat,
               CAST((SELECT COALESCE(SUM(n_d), 0) FROM strata
                     WHERE nt = 0 OR nc = 0) AS BIGINT) AS n_excluded,
               FLOOR((CAST(SUM(ct_c) AS DOUBLE) - CAST(SUM(cc_c) AS DOUBLE))
                     / 100.0 / CAST(SUM(n_d) AS DOUBLE) / 100.0
                     * 10000.0 + 0.5) / 10000.0 AS ate_ipw,
               FLOOR((CAST(SUM(syt) AS DOUBLE) / CAST(SUM(nt) AS DOUBLE)
                      - CAST(SUM(syc) AS DOUBLE) / CAST(SUM(nc) AS DOUBLE))
                     / 100.0 * 10000.0 + 0.5) / 10000.0 AS ate_naive,
               FLOOR(CAST(SUM(n_d) AS DOUBLE) * CAST(SUM(n_d) AS DOUBLE)
                     / (CAST(SUM(wsq_c) AS DOUBLE) / 100.0)
                     * 10000.0 + 0.5) / 10000.0 AS ess_treat
        FROM terms
    """,
)
def wh_ipw_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-weighted average treatment effect
    (Horvitz-Thompson): the causal estimator for when treatment
    assignment correlates with a covariate — propensity e(x) is
    estimated per account-balance bucket as the observed treated share,
    and each outcome is weighted by 1/e (treated) or 1/(1−e) (control),
    so buckets where treatment is rare count each treated customer
    more. DELIBERATELY uses a different stratification (balance bucket)
    from the outcome heterogeneity (segment), which is where IPW earns
    its keep over the stratified estimator (wh_uplift_stratified) —
    with propensity strata == outcome strata the two coincide.
    Completes the causal stack: CUPED (variance), DiD (trends), uplift
    (stratified), Shapley (attribution), IPW (confounding). Positivity:
    strata with no treated or no control units are EXCLUDED and
    reported (n_excluded) — the honest handling of overlap violations.
    ESS_treat = (Σw)²/Σw² diagnoses weight concentration. Shape: one
    left join + two hash aggregates; per-stratum HT contributions are
    integer-quantized before the stratum sum so the estimate is exact
    and order-free; everything after the first aggregate is
    bucket-count-sized."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    cust = c.select(
        F.col("c_custkey").alias("k"),
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("long").alias("bucket"),
        F.when(F.col("c_custkey") % 2 == 0, 1).otherwise(0).alias("t"),
    )
    outcome = (
        cust.join(o, cust.k == o.o_custkey, "left")
        .groupBy("k", "bucket", "t")
        .agg(
            F.coalesce(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")), F.lit(0)
            ).alias("y")
        )
    )
    strata = outcome.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_d"),
        F.sum("t").cast("long").alias("nt"),
        F.sum(F.lit(1) - F.col("t")).cast("long").alias("nc"),
        F.sum(F.when(F.col("t") == 1, F.col("y")).otherwise(0))
        .cast("long")
        .alias("syt"),
        F.sum(F.when(F.col("t") == 0, F.col("y")).otherwise(0))
        .cast("long")
        .alias("syc"),
    )
    keep = strata.where((F.col("nt") > 0) & (F.col("nc") > 0))
    excluded = strata.where((F.col("nt") == 0) | (F.col("nc") == 0)).agg(
        F.coalesce(F.sum("n_d"), F.lit(0)).cast("long").alias("n_excluded")
    )
    nd_d = F.col("n_d").cast("double")
    ct_c = F.floor(
        F.col("syt").cast("double") * nd_d / F.col("nt").cast("double") * F.lit(100.0)
        + F.lit(0.5)
    ).cast("long")
    cc_c = F.floor(
        F.col("syc").cast("double") * nd_d / F.col("nc").cast("double") * F.lit(100.0)
        + F.lit(0.5)
    ).cast("long")
    wsq_c = F.floor(
        nd_d * nd_d / F.col("nt").cast("double") * F.lit(100.0) + F.lit(0.5)
    ).cast("long")
    terms = keep.select(
        "n_d", "nt", "nc", "syt", "syc",
        ct_c.alias("ct_c"), cc_c.alias("cc_c"), wsq_c.alias("wsq_c"),
    )
    agg = terms.agg(
        F.sum("n_d").cast("long").alias("n"),
        F.sum("nt").cast("long").alias("n_treat"),
        F.sum("nc").cast("long").alias("n_ctrl"),
        F.sum("syt").cast("long").alias("syt"),
        F.sum("syc").cast("long").alias("syc"),
        F.sum("ct_c").cast("long").alias("sct"),
        F.sum("cc_c").cast("long").alias("scc"),
        F.sum("wsq_c").cast("long").alias("swsq"),
    )
    nd = F.col("n").cast("double")
    return agg.crossJoin(F.broadcast(excluded)).select(
        "n",
        "n_treat",
        "n_excluded",
        stable_round(
            (F.col("sct").cast("double") - F.col("scc").cast("double"))
            / F.lit(100.0)
            / nd
            / F.lit(100.0),
            4,
        ).alias("ate_ipw"),
        stable_round(
            (
                F.col("syt").cast("double") / F.col("n_treat").cast("double")
                - F.col("syc").cast("double") / F.col("n_ctrl").cast("double")
            )
            / F.lit(100.0),
            4,
        ).alias("ate_naive"),
        stable_round(
            nd * nd / (F.col("swsq").cast("double") / F.lit(100.0)), 4
        ).alias("ess_treat"),
    )


# ---------------------------------------------------------------------------
# Round 8 (second batch): the classical-experimentation completion — Welch's
# t, multiple-testing control (Benjamini-Hochberg), power/MDE planning, and
# propensity-style caliper matching. Together with the rank/chi-square/
# bootstrap/conformal/SPRT tail above, this is the full analysis toolbox an
# experimentation platform runs nightly over warehouse facts.
# ---------------------------------------------------------------------------


@q(
    "wh_welch_ttest",
    oracle="""
        WITH base AS (
            SELECT o_orderstatus AS status,
                   CAST(o_custkey % 2 AS BIGINT) AS grp,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ), sums AS (
            SELECT status,
                   CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                   CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
                   CAST(SUM(CASE WHEN grp = 0 THEN CAST(cents AS DECIMAL(38,0))
                                 ELSE CAST(0 AS DECIMAL(38,0)) END) AS DOUBLE) AS s1,
                   CAST(SUM(CASE WHEN grp = 1 THEN CAST(cents AS DECIMAL(38,0))
                                 ELSE CAST(0 AS DECIMAL(38,0)) END) AS DOUBLE) AS s2,
                   CAST(SUM(CASE WHEN grp = 0 THEN CAST(cents * cents AS DECIMAL(38,0))
                                 ELSE CAST(0 AS DECIMAL(38,0)) END) AS DOUBLE) AS ss1,
                   CAST(SUM(CASE WHEN grp = 1 THEN CAST(cents * cents AS DECIMAL(38,0))
                                 ELSE CAST(0 AS DECIMAL(38,0)) END) AS DOUBLE) AS ss2
            FROM base GROUP BY status
        ), stats AS (
            SELECT status, n1, n2,
                   s1 / CAST(n1 AS DOUBLE) AS m1,
                   s2 / CAST(n2 AS DOUBLE) AS m2,
                   (ss1 - s1 * s1 / CAST(n1 AS DOUBLE)) / CAST(n1 - 1 AS DOUBLE) AS v1,
                   (ss2 - s2 * s2 / CAST(n2 AS DOUBLE)) / CAST(n2 - 1 AS DOUBLE) AS v2
            FROM sums
        ), welch AS (
            SELECT status, n1, n2, m1, m2,
                   v1 / CAST(n1 AS DOUBLE) AS q1,
                   v2 / CAST(n2 AS DOUBLE) AS q2
            FROM stats
        )
        SELECT status,
               n1 AS n_even, n2 AS n_odd,
               FLOOR((m1 - m2) * 10000.0 + 0.5) / 10000.0 AS mean_diff_cents,
               FLOOR((m1 - m2) / SQRT(q1 + q2) * 1000000.0 + 0.5) / 1000000.0
                   AS t_stat,
               FLOOR((q1 + q2) * (q1 + q2)
                     / (q1 * q1 / CAST(n1 - 1 AS DOUBLE)
                        + q2 * q2 / CAST(n2 - 1 AS DOUBLE))
                     * 10000.0 + 0.5) / 10000.0 AS df_welch
        FROM welch ORDER BY status
    """,
)
def wh_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test, the default two-sample mean test
    of every experimentation platform (pooled-variance Student's t is
    wrong whenever arms differ in spread — Welch is uniformly safe).
    Per order status, compares mean order value between even- and
    odd-custkey populations (the same hash split wh_mann_whitney ranks,
    so the two entries give the parametric and nonparametric view of one
    experiment). Shape: ONE hash aggregate computing count / Σx / Σx²
    per (status, arm) with DECIMAL(38,0) sums — exact and order-free at
    any scale, no second pass for the variance — then O(groups)
    arithmetic for mean, variance, t, and the Welch-Satterthwaite
    degrees of freedom (q1+q2)²/(q1²/(n1−1)+q2²/(n2−1))."""
    o = _t(spark, sf_dir, "orders")
    dec0 = F.lit(0).cast("decimal(38,0)")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = o.select(
        F.col("o_orderstatus").alias("status"),
        (F.col("o_custkey") % 2).cast("long").alias("grp"),
        cents.alias("cents"),
    )
    sums = base.groupBy("status").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(
            F.when(F.col("grp") == 0, F.col("cents").cast("decimal(38,0)")).otherwise(
                dec0
            )
        )
        .cast("double")
        .alias("s1"),
        F.sum(
            F.when(F.col("grp") == 1, F.col("cents").cast("decimal(38,0)")).otherwise(
                dec0
            )
        )
        .cast("double")
        .alias("s2"),
        F.sum(
            F.when(
                F.col("grp") == 0,
                (F.col("cents") * F.col("cents")).cast("decimal(38,0)"),
            ).otherwise(dec0)
        )
        .cast("double")
        .alias("ss1"),
        F.sum(
            F.when(
                F.col("grp") == 1,
                (F.col("cents") * F.col("cents")).cast("decimal(38,0)"),
            ).otherwise(dec0)
        )
        .cast("double")
        .alias("ss2"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    stats = sums.select(
        "status",
        "n1",
        "n2",
        (F.col("s1") / n1d).alias("m1"),
        (F.col("s2") / n2d).alias("m2"),
        ((F.col("ss1") - F.col("s1") * F.col("s1") / n1d) / (F.col("n1") - 1).cast("double")).alias("v1"),
        ((F.col("ss2") - F.col("s2") * F.col("s2") / n2d) / (F.col("n2") - 1).cast("double")).alias("v2"),
    )
    welch = stats.select(
        "status",
        "n1",
        "n2",
        "m1",
        "m2",
        (F.col("v1") / F.col("n1").cast("double")).alias("q1"),
        (F.col("v2") / F.col("n2").cast("double")).alias("q2"),
    )
    q12 = F.col("q1") + F.col("q2")
    return welch.select(
        "status",
        F.col("n1").alias("n_even"),
        F.col("n2").alias("n_odd"),
        stable_round(F.col("m1") - F.col("m2"), 4).alias("mean_diff_cents"),
        stable_round((F.col("m1") - F.col("m2")) / F.sqrt(q12), 6).alias("t_stat"),
        stable_round(
            q12
            * q12
            / (
                F.col("q1") * F.col("q1") / (F.col("n1") - 1).cast("double")
                + F.col("q2") * F.col("q2") / (F.col("n2") - 1).cast("double")
            ),
            4,
        ).alias("df_welch"),
    ).orderBy("status")


@q(
    "wh_bh_fdr",
    oracle="""
        WITH joined AS (
            SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
                   CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS hit
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        ), obs AS (
            SELECT seg, pri, CAST(COUNT(*) AS BIGINT) AS n1,
                   CAST(SUM(hit) AS BIGINT) AS k1
            FROM joined GROUP BY seg, pri
        ), tot AS (
            SELECT CAST(SUM(n1) AS BIGINT) AS n, CAST(SUM(k1) AS BIGINT) AS k,
                   CAST(COUNT(*) AS BIGINT) AS m
            FROM obs
        ), zs AS (
            SELECT seg, pri, n1, k1, m,
                   ABS((CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                        - CAST(k - k1 AS DOUBLE) / CAST(n - n1 AS DOUBLE))
                       / SQRT((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                              * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                              * (1.0 / CAST(n1 AS DOUBLE)
                                 + 1.0 / CAST(n - n1 AS DOUBLE)))) AS az
            FROM obs, tot
        ), erfx AS (
            SELECT seg, pri, n1, k1, m, az,
                   az / SQRT(2.0) AS x,
                   1.0 / (1.0 + 0.3275911 * (az / SQRT(2.0))) AS t
            FROM zs
        ), pv AS (
            SELECT seg, pri, n1, k1, m, az,
                   FLOOR(((((((1.061405429 * t - 1.453152027) * t
                              + 1.421413741) * t - 0.284496736) * t
                            + 0.254829592) * t) * EXP(-(x * x)))
                         * 100000000.0 + 0.5) / 100000000.0 AS p_q
            FROM erfx
        ), ranked AS (
            SELECT seg, pri, n1, k1, m, az, p_q,
                   CAST(ROW_NUMBER() OVER (ORDER BY p_q, seg, pri) AS BIGINT) AS i
            FROM pv
        ), flagged AS (
            SELECT *,
                   MAX(CASE WHEN p_q <= 0.05 * CAST(i AS DOUBLE) / CAST(m AS DOUBLE)
                            THEN i ELSE 0 END) OVER () AS i_star,
                   MIN(CAST(m AS DOUBLE) * p_q / CAST(i AS DOUBLE))
                       OVER (ORDER BY i DESC ROWS UNBOUNDED PRECEDING) AS tail_min
            FROM ranked
        )
        SELECT seg, pri, n1 AS n_orders, k1 AS n_final,
               FLOOR(az * 1000000.0 + 0.5) / 1000000.0 AS abs_z,
               p_q AS p_value,
               FLOOR(LEAST(1.0, tail_min) * 100000000.0 + 0.5) / 100000000.0
                   AS p_adj,
               CASE WHEN i <= i_star THEN 1 ELSE 0 END AS rejected
        FROM flagged ORDER BY p_value, seg, pri
    """,
)
def wh_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg false-discovery-rate control (step-up at
    q=0.05) over a 25-hypothesis family: per (segment x priority) cell,
    a two-proportion z-test of the cell's fulfilled-order share against
    the rest of the population. This is THE guardrail for metric
    dashboards — screening 25 cells at alpha=0.05 uncorrected expects a
    false positive per refresh; BH bounds the expected false-discovery
    fraction instead. p-values come from the Abramowitz-Stegun 7.1.26
    erf polynomial (max abs error 1.5e-7), written as the IDENTICAL
    arithmetic chain in both engines and micro-quantized (1e-8) before
    ranking so order and tie-breaks are engine-independent. Shape: one
    broadcast join + one hash aggregate to the 25-cell family; the BH
    step-up (rank, i*, reversed cumulative-min adjusted p) runs in
    partition-less windows over the PROVABLY BOUNDED family — 25 rows
    regardless of fact size, the one place a global window is free."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    joined = o.join(
        F.broadcast(c), c.c_custkey == o.o_custkey
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("o_orderpriority").alias("pri"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("hit"),
    )
    obs = joined.groupBy("seg", "pri").agg(
        F.count(F.lit(1)).cast("long").alias("n1"),
        F.sum("hit").cast("long").alias("k1"),
    )
    tot = obs.agg(
        F.sum("n1").cast("long").alias("n"),
        F.sum("k1").cast("long").alias("k"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )
    z = obs.crossJoin(F.broadcast(tot))
    n1d = F.col("n1").cast("double")
    n2d = (F.col("n") - F.col("n1")).cast("double")
    pp = F.col("k").cast("double") / F.col("n").cast("double")
    az = F.abs(
        (
            F.col("k1").cast("double") / n1d
            - (F.col("k") - F.col("k1")).cast("double") / n2d
        )
        / F.sqrt(pp * (F.lit(1.0) - pp) * (F.lit(1.0) / n1d + F.lit(1.0) / n2d))
    )
    zs = z.select("seg", "pri", "n1", "k1", "m", az.alias("az"))
    x = F.col("az") / F.sqrt(F.lit(2.0))
    erfx = zs.select(
        "seg", "pri", "n1", "k1", "m", "az",
        x.alias("x"),
        (F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * x)).alias("t"),
    )
    t = F.col("t")
    poly = (
        (
            (
                ((F.lit(1.061405429) * t - F.lit(1.453152027)) * t + F.lit(1.421413741))
                * t
                - F.lit(0.284496736)
            )
            * t
            + F.lit(0.254829592)
        )
        * t
    ) * F.exp(-(F.col("x") * F.col("x")))
    pv = erfx.select(
        "seg", "pri", "n1", "k1", "m", "az",
        (F.floor(poly * F.lit(100000000.0) + F.lit(0.5)) / F.lit(100000000.0)).alias(
            "p_q"
        ),
    )
    ranked = pv.withColumn(
        "i", F.row_number().over(Window.orderBy("p_q", "seg", "pri")).cast("long")
    )
    w_all = Window.orderBy("i").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_tail = Window.orderBy(F.col("i").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    flagged = ranked.select(
        "*",
        F.max(
            F.when(
                F.col("p_q")
                <= F.lit(0.05) * F.col("i").cast("double") / F.col("m").cast("double"),
                F.col("i"),
            ).otherwise(0)
        )
        .over(w_all)
        .alias("i_star"),
        F.min(F.col("m").cast("double") * F.col("p_q") / F.col("i").cast("double"))
        .over(w_tail)
        .alias("tail_min"),
    )
    return flagged.select(
        "seg",
        "pri",
        F.col("n1").alias("n_orders"),
        F.col("k1").alias("n_final"),
        stable_round(F.col("az"), 6).alias("abs_z"),
        F.col("p_q").alias("p_value"),
        stable_round(F.least(F.lit(1.0), F.col("tail_min")), 8).alias("p_adj"),
        F.when(F.col("i") <= F.col("i_star"), 1).otherwise(0).alias("rejected"),
    ).orderBy("p_value", "seg", "pri")


@q(
    "wh_power_mde",
    oracle="""
        WITH joined AS (
            SELECT c.c_mktsegment AS seg,
                   CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS hit
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        ), obs AS (
            SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(hit) AS BIGINT) AS k
            FROM joined GROUP BY seg
        ), rates AS (
            SELECT seg, n, k,
                   CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p1,
                   LEAST(CAST(k AS DOUBLE) / CAST(n AS DOUBLE) * 1.05, 0.999) AS p2
            FROM obs
        ), parts AS (
            SELECT seg, n, k, p1, p2,
                   (p1 + p2) / 2.0 AS pbar,
                   p2 - p1 AS delta
            FROM rates
        )
        SELECT seg,
               n AS n_current,
               FLOOR(p1 * 1000000.0 + 0.5) / 1000000.0 AS baseline_rate,
               FLOOR(p2 * 1000000.0 + 0.5) / 1000000.0 AS target_rate,
               CAST(CEIL((1.959963984540054 * SQRT(2.0 * pbar * (1.0 - pbar))
                          + 0.8416212335729143
                            * SQRT(p1 * (1.0 - p1) + p2 * (1.0 - p2)))
                         * (1.959963984540054 * SQRT(2.0 * pbar * (1.0 - pbar))
                            + 0.8416212335729143
                              * SQRT(p1 * (1.0 - p1) + p2 * (1.0 - p2)))
                         / (delta * delta)) AS BIGINT) AS n_per_arm,
               FLOOR((1.959963984540054 + 0.8416212335729143)
                     * SQRT(2.0 * p1 * (1.0 - p1) / (CAST(n AS DOUBLE) / 2.0))
                     * 1000000.0 + 0.5) / 1000000.0 AS mde_at_current_n
        FROM parts ORDER BY seg
    """,
)
def wh_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power planning: per market segment, the sample size a
    two-proportion z-test needs to detect a 5% relative lift in the
    fulfilled-order rate at alpha=0.05 (two-sided) / power=0.80, plus
    the minimum detectable effect if the segment's CURRENT traffic were
    split 50/50 today. The standard pre-registration arithmetic
    (Fleiss): n/arm = (z_a*sqrt(2*pbar*qbar) + z_b*sqrt(p1*q1+p2*q2))^2
    / (p2-p1)^2, with the z quantiles as literals so no inverse-normal
    is needed at runtime. This is the planning half of the inference
    stack — SPRT (wh_sprt_sequential) monitors the experiment BH
    (wh_bh_fdr) later screens. Shape: one broadcast join + one hash
    aggregate to 5 segment rows, then pure closed-form arithmetic;
    nothing after the aggregate scales with the fact table."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    joined = o.join(F.broadcast(c), c.c_custkey == o.o_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("hit"),
    )
    obs = joined.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("hit").cast("long").alias("k"),
    )
    p1 = F.col("k").cast("double") / F.col("n").cast("double")
    rates = obs.select(
        "seg", "n", "k",
        p1.alias("p1"),
        F.least(p1 * F.lit(1.05), F.lit(0.999)).alias("p2"),
    )
    parts = rates.select(
        "seg", "n", "k", "p1", "p2",
        ((F.col("p1") + F.col("p2")) / F.lit(2.0)).alias("pbar"),
        (F.col("p2") - F.col("p1")).alias("delta"),
    )
    za = F.lit(1.959963984540054)
    zb = F.lit(0.8416212335729143)
    numer = za * F.sqrt(
        F.lit(2.0) * F.col("pbar") * (F.lit(1.0) - F.col("pbar"))
    ) + zb * F.sqrt(
        F.col("p1") * (F.lit(1.0) - F.col("p1"))
        + F.col("p2") * (F.lit(1.0) - F.col("p2"))
    )
    return parts.select(
        "seg",
        F.col("n").alias("n_current"),
        stable_round(F.col("p1"), 6).alias("baseline_rate"),
        stable_round(F.col("p2"), 6).alias("target_rate"),
        F.ceil(numer * numer / (F.col("delta") * F.col("delta")))
        .cast("long")
        .alias("n_per_arm"),
        stable_round(
            (za + zb)
            * F.sqrt(
                F.lit(2.0)
                * F.col("p1")
                * (F.lit(1.0) - F.col("p1"))
                / (F.col("n").cast("double") / F.lit(2.0))
            ),
            6,
        ).alias("mde_at_current_n"),
    ).orderBy("seg")


@q(
    "wh_psm_att",
    oracle="""
        WITH cust AS (
            SELECT c_custkey AS k, c_nationkey AS nation,
                   CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c,
                   CASE WHEN c_custkey % 2 = 0 THEN 1 ELSE 0 END AS t
            FROM customer
        ), outcome AS (
            SELECT c.k, c.nation, c.bal_c, c.t,
                   COALESCE(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)), 0)
                       AS y
            FROM cust c LEFT JOIN orders o ON o.o_custkey = c.k
            GROUP BY c.k, c.nation, c.bal_c, c.t
        ), cells AS (
            SELECT nation, bal_c,
                   CAST(COUNT(*) AS BIGINT) AS ccnt,
                   CAST(SUM(y) AS BIGINT) AS csum
            FROM outcome WHERE t = 0 GROUP BY nation, bal_c
        ), uni AS (
            SELECT nation, bal_c, 1 AS tag, k AS k_sort, y,
                   CAST(NULL AS BIGINT) AS csum, CAST(NULL AS BIGINT) AS ccnt
            FROM outcome WHERE t = 1
            UNION ALL
            SELECT nation, bal_c, 0 AS tag, -1 AS k_sort,
                   CAST(NULL AS BIGINT) AS y, csum, ccnt
            FROM cells
        ), scanned AS (
            SELECT *,
                   LAST_VALUE(CASE WHEN tag = 0 THEN bal_c END IGNORE NULLS)
                       OVER (PARTITION BY nation ORDER BY bal_c, tag, k_sort
                             ROWS UNBOUNDED PRECEDING) AS pred_bal,
                   LAST_VALUE(CASE WHEN tag = 0 THEN csum END IGNORE NULLS)
                       OVER (PARTITION BY nation ORDER BY bal_c, tag, k_sort
                             ROWS UNBOUNDED PRECEDING) AS pred_sum,
                   LAST_VALUE(CASE WHEN tag = 0 THEN ccnt END IGNORE NULLS)
                       OVER (PARTITION BY nation ORDER BY bal_c, tag, k_sort
                             ROWS UNBOUNDED PRECEDING) AS pred_cnt,
                   LAST_VALUE(CASE WHEN tag = 0 THEN bal_c END IGNORE NULLS)
                       OVER (PARTITION BY nation
                             ORDER BY bal_c DESC, tag DESC, k_sort DESC
                             ROWS UNBOUNDED PRECEDING) AS succ_bal,
                   LAST_VALUE(CASE WHEN tag = 0 THEN csum END IGNORE NULLS)
                       OVER (PARTITION BY nation
                             ORDER BY bal_c DESC, tag DESC, k_sort DESC
                             ROWS UNBOUNDED PRECEDING) AS succ_sum,
                   LAST_VALUE(CASE WHEN tag = 0 THEN ccnt END IGNORE NULLS)
                       OVER (PARTITION BY nation
                             ORDER BY bal_c DESC, tag DESC, k_sort DESC
                             ROWS UNBOUNDED PRECEDING) AS succ_cnt
            FROM uni
        ), chosen AS (
            SELECT bal_c, y,
                   CASE WHEN pred_bal IS NOT NULL
                             AND bal_c - pred_bal <= 10000
                             AND (succ_bal IS NULL OR succ_bal - bal_c > 10000
                                  OR bal_c - pred_bal <= succ_bal - bal_c)
                        THEN 1
                        WHEN succ_bal IS NOT NULL AND succ_bal - bal_c <= 10000
                        THEN 2 ELSE 0 END AS side,
                   pred_bal, pred_sum, pred_cnt, succ_bal, succ_sum, succ_cnt
            FROM scanned WHERE tag = 1
        ), matched AS (
            SELECT y,
                   CASE WHEN side = 1
                        THEN CAST(pred_sum AS DOUBLE) / CAST(pred_cnt AS DOUBLE)
                        WHEN side = 2
                        THEN CAST(succ_sum AS DOUBLE) / CAST(succ_cnt AS DOUBLE)
                        END AS mmean,
                   CASE WHEN side = 1 THEN bal_c - pred_bal
                        WHEN side = 2 THEN succ_bal - bal_c END AS dist_c
            FROM chosen
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_treat,
               CAST(COUNT(mmean) AS BIGINT) AS n_matched,
               CAST(COUNT(*) - COUNT(mmean) AS BIGINT) AS n_unmatched,
               FLOOR(CAST(SUM(CASE WHEN mmean IS NOT NULL
                                   THEN CAST(FLOOR((CAST(y AS DOUBLE) - mmean)
                                                   * 100.0 + 0.5) AS BIGINT)
                                   ELSE 0 END) AS DOUBLE)
                     / 100.0 / CAST(COUNT(mmean) AS DOUBLE) / 100.0
                     * 10000.0 + 0.5) / 10000.0 AS att_dollars,
               FLOOR(CAST(SUM(CASE WHEN mmean IS NOT NULL THEN dist_c
                                   ELSE 0 END) AS DOUBLE)
                     / CAST(COUNT(mmean) AS DOUBLE) / 100.0
                     * 10000.0 + 0.5) / 10000.0 AS avg_match_dist
        FROM matched
    """,
)
def wh_psm_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor caliper matching (the propensity-score-matching
    estimator of the average treatment effect on the treated): every
    even-custkey customer is matched, WITH replacement, to the control
    customer(s) whose account balance is nearest within the same nation
    and a $100 caliper; ties at equal distance prefer the predecessor,
    and equal-balance controls are pre-aggregated to one value cell so
    the match is deterministic without any per-unit tie-break. ATT =
    mean over matched treated of (own spend − matched-cell mean spend).
    Complements wh_ipw_ate: matching keeps only comparable units
    (positivity enforced by the caliper, violations COUNTED in
    n_unmatched) where IPW reweights everyone. Shape: the sorted-merge
    asof pattern — union treated units with control value cells, ONE
    ascending and ONE descending cumulative last_value window per
    nation (no cross join, no per-pair blowup), then an O(1)-row
    rollup. Sort keys are null-free (control cells carry k_sort=-1)
    because Spark defaults to NULLS FIRST and DuckDB to NULLS LAST —
    the cross-engine ordering trap. Scales as sort-within-nation;
    at 100 TB the nation partition bounds the window input."""
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    cust = c.select(
        F.col("c_custkey").alias("k"),
        F.col("c_nationkey").alias("nation"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
        F.when(F.col("c_custkey") % 2 == 0, 1).otherwise(0).alias("t"),
    )
    outcome = (
        cust.join(o, cust.k == o.o_custkey, "left")
        .groupBy("k", "nation", "bal_c", "t")
        .agg(
            F.coalesce(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")), F.lit(0)
            ).alias("y")
        )
    )
    cells = (
        outcome.where(F.col("t") == 0)
        .groupBy("nation", "bal_c")
        .agg(
            F.count(F.lit(1)).cast("long").alias("ccnt"),
            F.sum("y").cast("long").alias("csum"),
        )
    )
    nulll = F.lit(None).cast("long")
    uni = outcome.where(F.col("t") == 1).select(
        "nation", "bal_c",
        F.lit(1).alias("tag"),
        F.col("k").alias("k_sort"),
        "y",
        nulll.alias("csum"),
        nulll.alias("ccnt"),
    ).unionByName(
        cells.select(
            "nation", "bal_c",
            F.lit(0).alias("tag"),
            F.lit(-1).cast("long").alias("k_sort"),
            nulll.alias("y"),
            "csum",
            "ccnt",
        )
    )
    w_asc = (
        Window.partitionBy("nation")
        .orderBy("bal_c", "tag", "k_sort")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_desc = (
        Window.partitionBy("nation")
        .orderBy(F.col("bal_c").desc(), F.col("tag").desc(), F.col("k_sort").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ctrl = lambda col: F.when(F.col("tag") == 0, F.col(col))  # noqa: E731
    scanned = uni.select(
        "*",
        F.last(ctrl("bal_c"), ignorenulls=True).over(w_asc).alias("pred_bal"),
        F.last(ctrl("csum"), ignorenulls=True).over(w_asc).alias("pred_sum"),
        F.last(ctrl("ccnt"), ignorenulls=True).over(w_asc).alias("pred_cnt"),
        F.last(ctrl("bal_c"), ignorenulls=True).over(w_desc).alias("succ_bal"),
        F.last(ctrl("csum"), ignorenulls=True).over(w_desc).alias("succ_sum"),
        F.last(ctrl("ccnt"), ignorenulls=True).over(w_desc).alias("succ_cnt"),
    )
    cal = F.lit(10000)
    side = (
        F.when(
            F.col("pred_bal").isNotNull()
            & (F.col("bal_c") - F.col("pred_bal") <= cal)
            & (
                F.col("succ_bal").isNull()
                | (F.col("succ_bal") - F.col("bal_c") > cal)
                | (
                    F.col("bal_c") - F.col("pred_bal")
                    <= F.col("succ_bal") - F.col("bal_c")
                )
            ),
            1,
        )
        .when(
            F.col("succ_bal").isNotNull()
            & (F.col("succ_bal") - F.col("bal_c") <= cal),
            2,
        )
        .otherwise(0)
    )
    chosen = scanned.where(F.col("tag") == 1).select(
        "bal_c", "y", side.alias("side"),
        "pred_bal", "pred_sum", "pred_cnt", "succ_bal", "succ_sum", "succ_cnt",
    )
    matched = chosen.select(
        "y",
        F.when(
            F.col("side") == 1,
            F.col("pred_sum").cast("double") / F.col("pred_cnt").cast("double"),
        )
        .when(
            F.col("side") == 2,
            F.col("succ_sum").cast("double") / F.col("succ_cnt").cast("double"),
        )
        .alias("mmean"),
        F.when(F.col("side") == 1, F.col("bal_c") - F.col("pred_bal"))
        .when(F.col("side") == 2, F.col("succ_bal") - F.col("bal_c"))
        .alias("dist_c"),
    )
    diff_centi = F.floor(
        (F.col("y").cast("double") - F.col("mmean")) * F.lit(100.0) + F.lit(0.5)
    ).cast("long")
    agg = matched.agg(
        F.count(F.lit(1)).cast("long").alias("n_treat"),
        F.count("mmean").cast("long").alias("n_matched"),
        F.sum(F.when(F.col("mmean").isNotNull(), diff_centi).otherwise(0))
        .cast("long")
        .alias("sum_diff_centi"),
        F.sum(F.when(F.col("mmean").isNotNull(), F.col("dist_c")).otherwise(0))
        .cast("long")
        .alias("sum_dist_c"),
    )
    nm = F.col("n_matched").cast("double")
    return agg.select(
        "n_treat",
        "n_matched",
        (F.col("n_treat") - F.col("n_matched")).cast("long").alias("n_unmatched"),
        stable_round(
            F.col("sum_diff_centi").cast("double") / F.lit(100.0) / nm / F.lit(100.0),
            4,
        ).alias("att_dollars"),
        stable_round(
            F.col("sum_dist_c").cast("double") / nm / F.lit(100.0), 4
        ).alias("avg_match_dist"),
    )


@q(
    "wh_simpsons_check",
    oracle="""
        WITH joined AS (
            SELECT c.c_mktsegment AS seg,
                   CASE WHEN o.o_custkey % 2 = 0 THEN 1 ELSE 0 END AS arm,
                   CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS hit
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        ), per_seg AS (
            SELECT seg,
                   CAST(SUM(arm) AS BIGINT) AS n_e,
                   CAST(SUM(arm * hit) AS BIGINT) AS k_e,
                   CAST(SUM(1 - arm) AS BIGINT) AS n_o,
                   CAST(SUM((1 - arm) * hit) AS BIGINT) AS k_o
            FROM joined GROUP BY seg
        ), with_all AS (
            SELECT seg, n_e, k_e, n_o, k_o FROM per_seg
            UNION ALL
            SELECT 'ALL' AS seg, SUM(n_e), SUM(k_e), SUM(n_o), SUM(k_o)
            FROM per_seg
        ), signed AS (
            SELECT seg, n_e, k_e, n_o, k_o,
                   CASE WHEN k_e * n_o > k_o * n_e THEN 1
                        WHEN k_e * n_o < k_o * n_e THEN -1 ELSE 0 END AS sign
            FROM with_all
        ), overall AS (
            SELECT sign AS all_sign FROM signed WHERE seg = 'ALL'
        )
        SELECT s.seg AS scope,
               CAST(s.n_e + s.n_o AS BIGINT) AS n_orders,
               FLOOR(CAST(s.k_e AS DOUBLE) / CAST(s.n_e AS DOUBLE)
                     * 1000000.0 + 0.5) / 1000000.0 AS rate_even,
               FLOOR(CAST(s.k_o AS DOUBLE) / CAST(s.n_o AS DOUBLE)
                     * 1000000.0 + 0.5) / 1000000.0 AS rate_odd,
               s.sign AS diff_sign,
               CASE WHEN s.seg <> 'ALL' AND s.sign <> 0 AND o.all_sign <> 0
                         AND s.sign <> o.all_sign
                    THEN 1 ELSE 0 END AS reversed
        FROM signed s, overall o
        ORDER BY scope
    """,
)
def wh_simpsons_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox audit — the canonical aggregation trap: a
    treatment/control rate difference (even- vs odd-custkey fulfilled-
    order rate) is computed overall AND within every market segment,
    and each segment is flagged when its effect direction CONTRADICTS
    the pooled direction. A dashboard that reports only the pooled rate
    silently ships the wrong conclusion whenever arm mix differs across
    segments (Bickel's Berkeley admissions case); this entry is the
    nightly guard that says 'stratify before you conclude'. Effect
    signs are decided by INTEGER cross-multiplication (k_e·n_o vs
    k_o·n_e) — never by comparing float rates, so the flag can't flip
    on a rounding boundary. Shape: one broadcast join + one hash
    aggregate to segment cells; the ALL row is a second rollup of those
    cells and joins back broadcast-sized."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    joined = o.join(F.broadcast(c), c.c_custkey == o.o_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.when(F.col("o_custkey") % 2 == 0, 1).otherwise(0).alias("arm"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("hit"),
    )
    per_seg = joined.groupBy("seg").agg(
        F.sum("arm").cast("long").alias("n_e"),
        F.sum(F.col("arm") * F.col("hit")).cast("long").alias("k_e"),
        F.sum(F.lit(1) - F.col("arm")).cast("long").alias("n_o"),
        F.sum((F.lit(1) - F.col("arm")) * F.col("hit")).cast("long").alias("k_o"),
    )
    all_row = per_seg.agg(
        F.lit("ALL").alias("seg"),
        F.sum("n_e").cast("long").alias("n_e"),
        F.sum("k_e").cast("long").alias("k_e"),
        F.sum("n_o").cast("long").alias("n_o"),
        F.sum("k_o").cast("long").alias("k_o"),
    )
    with_all = per_seg.unionByName(all_row)
    sign = (
        F.when(F.col("k_e") * F.col("n_o") > F.col("k_o") * F.col("n_e"), 1)
        .when(F.col("k_e") * F.col("n_o") < F.col("k_o") * F.col("n_e"), -1)
        .otherwise(0)
    )
    signed = with_all.select("seg", "n_e", "k_e", "n_o", "k_o", sign.alias("sign"))
    overall = signed.where(F.col("seg") == "ALL").select(
        F.col("sign").alias("all_sign")
    )
    return (
        signed.crossJoin(F.broadcast(overall))
        .select(
            F.col("seg").alias("scope"),
            (F.col("n_e") + F.col("n_o")).cast("long").alias("n_orders"),
            stable_round(
                F.col("k_e").cast("double") / F.col("n_e").cast("double"), 6
            ).alias("rate_even"),
            stable_round(
                F.col("k_o").cast("double") / F.col("n_o").cast("double"), 6
            ).alias("rate_odd"),
            F.col("sign").alias("diff_sign"),
            F.when(
                (F.col("seg") != "ALL")
                & (F.col("sign") != 0)
                & (F.col("all_sign") != 0)
                & (F.col("sign") != F.col("all_sign")),
                1,
            )
            .otherwise(0)
            .alias("reversed"),
        )
        .orderBy("scope")
    )


@q(
    "wh_anova_oneway",
    oracle="""
        WITH base AS (
            SELECT o_orderpriority AS pri,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ), per_grp AS (
            SELECT pri,
                   CAST(COUNT(*) AS BIGINT) AS n_g,
                   CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s_g,
                   CAST(SUM(CAST(cents * cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS ss_g
            FROM base GROUP BY pri
        ), quant AS (
            SELECT pri, n_g, s_g, ss_g,
                   CAST(FLOOR(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
                              / CAST(n_g AS DOUBLE) + 0.5) AS DECIMAL(38,0)) AS q_g
            FROM per_grp
        ), tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(SUM(n_g) AS BIGINT) AS n,
                   CAST(SUM(s_g) AS DECIMAL(38,0)) AS s,
                   CAST(SUM(ss_g) AS DECIMAL(38,0)) AS ssq,
                   CAST(SUM(q_g) AS DECIMAL(38,0)) AS a
            FROM quant
        ), parts AS (
            SELECT k, n,
                   CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS grand_mean,
                   CAST(a AS DOUBLE)
                     - FLOOR(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                             / CAST(n AS DOUBLE) + 0.5) AS ssb,
                   CAST(ssq AS DOUBLE) - CAST(a AS DOUBLE) AS ssw
            FROM tot
        )
        SELECT CAST(k AS INT) AS n_groups, n,
               FLOOR(grand_mean * 10000.0 + 0.5) / 10000.0 AS grand_mean_cents,
               FLOOR((ssb / CAST(k - 1 AS DOUBLE))
                     / (ssw / CAST(n - k AS DOUBLE)) * 1000000.0 + 0.5)
                   / 1000000.0 AS f_stat,
               FLOOR(ssb / (ssb + ssw) * 100000000.0 + 0.5) / 100000000.0 AS eta_sq
        FROM parts
    """,
)
def wh_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of order value across the five order priorities —
    the k-group generalization of wh_welch_ttest (F = between-group /
    within-group mean square) plus eta-squared effect size. Shape: ONE
    hash aggregate to per-group exact integer moments (n, Σx, Σx² in
    DECIMAL(38,0) — order-free at any scale), then each group's
    s_g²/n_g is floor-quantized to an integer via quantize_big (Spark's
    floor() would overflow LONG at 100 TB magnitudes, so the floor stays
    in double arithmetic) so the CROSS-GROUP sum Σ s_g²/n_g is again an
    exact decimal sum — the chi2_micro discipline applied to ANOVA's
    between-group sum of squares. The final five-row→one-row reduction
    is O(k); no second pass over the fact."""
    from bigdatacw1_spark.operators.relational import quantize_big

    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = o.select(F.col("o_orderpriority").alias("pri"), cents.alias("cents"))
    per_grp = base.groupBy("pri").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum(F.col("cents").cast("decimal(38,0)")).cast("decimal(38,0)").alias("s_g"),
        F.sum((F.col("cents") * F.col("cents")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("ss_g"),
    )
    quant = per_grp.withColumn(
        "q_g",
        quantize_big(
            F.col("s_g").cast("double")
            * F.col("s_g").cast("double")
            / F.col("n_g").cast("double")
        ),
    )
    glob = quant.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s_g").cast("decimal(38,0)").alias("s"),
        F.sum("ss_g").cast("decimal(38,0)").alias("ssq"),
        F.sum("q_g").cast("decimal(38,0)").alias("a"),
    )
    sd = F.col("s").cast("double")
    nd = F.col("n").cast("double")
    gsq = F.col("t_gsq")
    parts = glob.withColumn(
        "t_gsq",
        # floor(S²/N + 0.5) without LONG overflow: same double-floor trick
        (sd * sd / nd + F.lit(0.5)) - (sd * sd / nd + F.lit(0.5)) % F.lit(1.0),
    ).select(
        "k",
        "n",
        (sd / nd).alias("grand_mean"),
        (F.col("a").cast("double") - gsq).alias("ssb"),
        (F.col("ssq").cast("double") - F.col("a").cast("double")).alias("ssw"),
    )
    ssb, ssw = F.col("ssb"), F.col("ssw")
    return parts.select(
        F.col("k").cast("int").alias("n_groups"),
        F.col("n").alias("n"),
        stable_round(F.col("grand_mean"), 4).alias("grand_mean_cents"),
        stable_round(
            (ssb / (F.col("k") - 1).cast("double"))
            / (ssw / (F.col("n") - F.col("k")).cast("double")),
            6,
        ).alias("f_stat"),
        stable_round(ssb / (ssb + ssw), 8).alias("eta_sq"),
    )


@q(
    "wh_effect_sizes",
    oracle="""
        WITH base AS (
            SELECT o_orderstatus AS status,
                   CAST(o_custkey % 2 AS BIGINT) AS grp,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ), sums AS (
            SELECT status,
                   CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                   CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
                   CAST(SUM(CASE WHEN grp = 0 THEN CAST(cents AS DECIMAL(38,0))
                                 ELSE CAST(0 AS DECIMAL(38,0)) END) AS DOUBLE) AS s1,
                   CAST(SUM(CASE WHEN grp = 1 THEN CAST(cents AS DECIMAL(38,0))
                                 ELSE CAST(0 AS DECIMAL(38,0)) END) AS DOUBLE) AS s2,
                   CAST(SUM(CASE WHEN grp = 0 THEN CAST(cents * cents AS DECIMAL(38,0))
                                 ELSE CAST(0 AS DECIMAL(38,0)) END) AS DOUBLE) AS ss1,
                   CAST(SUM(CASE WHEN grp = 1 THEN CAST(cents * cents AS DECIMAL(38,0))
                                 ELSE CAST(0 AS DECIMAL(38,0)) END) AS DOUBLE) AS ss2
            FROM base GROUP BY status
        ), stats AS (
            SELECT status, n1, n2,
                   s1 / CAST(n1 AS DOUBLE) - s2 / CAST(n2 AS DOUBLE) AS diff,
                   (ss1 - s1 * s1 / CAST(n1 AS DOUBLE)) / CAST(n1 - 1 AS DOUBLE) AS v1,
                   (ss2 - s2 * s2 / CAST(n2 AS DOUBLE)) / CAST(n2 - 1 AS DOUBLE) AS v2
            FROM sums
        ), eff AS (
            SELECT status, n1, n2, diff, v2,
                   diff / SQRT((CAST(n1 - 1 AS DOUBLE) * v1
                                + CAST(n2 - 1 AS DOUBLE) * v2)
                               / CAST(n1 + n2 - 2 AS DOUBLE)) AS d
            FROM stats
        )
        SELECT status, n1 AS n_even, n2 AS n_odd,
               FLOOR(d * 1000000.0 + 0.5) / 1000000.0 AS cohens_d,
               FLOOR(d * (1.0 - 3.0 / (4.0 * CAST(n1 + n2 AS DOUBLE) - 9.0))
                     * 1000000.0 + 0.5) / 1000000.0 AS hedges_g,
               FLOOR(diff / SQRT(v2) * 1000000.0 + 0.5) / 1000000.0 AS glass_delta
        FROM eff ORDER BY status
    """,
)
def wh_effect_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized effect sizes for the two-arm experiment wh_welch_ttest
    tests: Cohen's d (mean difference over pooled SD), Hedges' g (the
    small-sample bias correction 1 − 3/(4N−9) every meta-analysis
    applies), and Glass's Δ (control-arm SD only — the right choice when
    treatment changes the variance). Statistical significance without
    magnitude is how dashboards mislead; these are the magnitude. Same
    single-aggregate exact-moment shape as wh_welch_ttest: one hash
    aggregate of count/Σx/Σx² per (status, arm) in DECIMAL(38,0), then
    O(groups) closed-form arithmetic — identical expression trees in
    both engines."""
    o = _t(spark, sf_dir, "orders")
    dec0 = F.lit(0).cast("decimal(38,0)")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = o.select(
        F.col("o_orderstatus").alias("status"),
        (F.col("o_custkey") % 2).cast("long").alias("grp"),
        cents.alias("cents"),
    )
    c = F.col("cents")
    sums = base.groupBy("status").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(F.col("grp") == 0, c.cast("decimal(38,0)")).otherwise(dec0))
        .cast("double")
        .alias("s1"),
        F.sum(F.when(F.col("grp") == 1, c.cast("decimal(38,0)")).otherwise(dec0))
        .cast("double")
        .alias("s2"),
        F.sum(F.when(F.col("grp") == 0, (c * c).cast("decimal(38,0)")).otherwise(dec0))
        .cast("double")
        .alias("ss1"),
        F.sum(F.when(F.col("grp") == 1, (c * c).cast("decimal(38,0)")).otherwise(dec0))
        .cast("double")
        .alias("ss2"),
    )
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    stats = sums.select(
        "status",
        "n1",
        "n2",
        (F.col("s1") / n1d - F.col("s2") / n2d).alias("diff"),
        (
            (F.col("ss1") - F.col("s1") * F.col("s1") / n1d)
            / (F.col("n1") - 1).cast("double")
        ).alias("v1"),
        (
            (F.col("ss2") - F.col("s2") * F.col("s2") / n2d)
            / (F.col("n2") - 1).cast("double")
        ).alias("v2"),
    )
    eff = stats.select(
        "status",
        "n1",
        "n2",
        "diff",
        "v2",
        (
            F.col("diff")
            / F.sqrt(
                (
                    (F.col("n1") - 1).cast("double") * F.col("v1")
                    + (F.col("n2") - 1).cast("double") * F.col("v2")
                )
                / (F.col("n1") + F.col("n2") - 2).cast("double")
            )
        ).alias("d"),
    )
    return eff.select(
        "status",
        F.col("n1").alias("n_even"),
        F.col("n2").alias("n_odd"),
        stable_round(F.col("d"), 6).alias("cohens_d"),
        stable_round(
            F.col("d")
            * (
                F.lit(1.0)
                - F.lit(3.0) / (F.lit(4.0) * (F.col("n1") + F.col("n2")).cast("double") - F.lit(9.0))
            ),
            6,
        ).alias("hedges_g"),
        stable_round(F.col("diff") / F.sqrt(F.col("v2")), 6).alias("glass_delta"),
    ).orderBy("status")


@q(
    "wh_g_test",
    oracle="""
        WITH obs AS (
            SELECT o_orderpriority AS pri, o_orderstatus AS st,
                   CAST(COUNT(*) AS BIGINT) AS o
            FROM orders GROUP BY pri, st
        ), rowt AS (SELECT pri, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY pri),
        colt AS (SELECT st, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY st),
        grand AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
        cells AS (
            SELECT obs.o, grand.n,
                   CAST(rowt.r AS DOUBLE) * CAST(colt.c AS DOUBLE)
                       / CAST(grand.n AS DOUBLE) AS e
            FROM obs JOIN rowt USING (pri) JOIN colt USING (st), grand
        ), agg AS (
            SELECT CAST(SUM(CAST(FLOOR(CAST(o AS DOUBLE)
                                       * LN(CAST(o AS DOUBLE) / e)
                                       * 100000000.0 + 0.5) AS BIGINT))
                        AS BIGINT) AS g_half_nano,
                   MAX(n) AS n,
                   CAST(COUNT(*) AS BIGINT) AS n_cells
            FROM cells
        ), dims AS (
            SELECT (SELECT COUNT(*) FROM rowt) AS nr,
                   (SELECT COUNT(*) FROM colt) AS nc
        )
        SELECT agg.n, agg.n_cells,
               CAST((dims.nr - 1) * (dims.nc - 1) AS BIGINT) AS dof,
               FLOOR(2.0 * CAST(agg.g_half_nano AS DOUBLE) / 100000000.0
                     * 1000000.0 + 0.5) / 1000000.0 AS g_stat,
               FLOOR(CAST(agg.g_half_nano AS DOUBLE) / 100000000.0
                     / CAST(agg.n AS DOUBLE) * 100000000.0 + 0.5)
                   / 100000000.0 AS mi_nats
        FROM agg, dims
    """,
)
def wh_g_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-test (likelihood-ratio) of independence for the order
    priority × status contingency table — the information-theoretic
    sibling of wh_chi_square (G = 2·Σ O·ln(O/E) is additive across
    table partitions, which Pearson's χ² is not), plus the empirical
    mutual information in nats (MI = G/2N — the feature-relevance
    number a selection pipeline actually wants; zero cells contribute
    zero by the O·ln(O) → 0 limit and only observed cells are summed).
    Shape: one count aggregate over k×m cells, broadcast-joined
    marginals, and each cell's O·ln(O/E) floor-quantized to an exact
    integer before the order-free cross-cell SUM — the chi2_micro
    discipline, so both engines hash identically despite the
    transcendental."""
    o = _t(spark, sf_dir, "orders")
    obs = o.groupBy(
        F.col("o_orderpriority").alias("pri"), F.col("o_orderstatus").alias("st")
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    rowt = obs.groupBy("pri").agg(F.sum("o").cast("long").alias("r"))
    colt = obs.groupBy("st").agg(F.sum("o").cast("long").alias("c"))
    grand = obs.agg(F.sum("o").cast("long").alias("n"))
    cells = (
        obs.join(F.broadcast(rowt), "pri")
        .join(F.broadcast(colt), "st")
        .crossJoin(F.broadcast(grand))
        .select(
            "o",
            "n",
            (
                F.col("r").cast("double")
                * F.col("c").cast("double")
                / F.col("n").cast("double")
            ).alias("e"),
        )
    )
    od = F.col("o").cast("double")
    agg = cells.agg(
        F.sum(
            F.floor(od * F.log(od / F.col("e")) * F.lit(100000000.0) + F.lit(0.5))
        )
        .cast("long")
        .alias("g_half_nano"),
        F.max("n").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    dims = rowt.agg(F.count(F.lit(1)).alias("nr")).crossJoin(
        colt.agg(F.count(F.lit(1)).alias("nc"))
    )
    half = F.col("g_half_nano").cast("double") / F.lit(100000000.0)
    return agg.crossJoin(F.broadcast(dims)).select(
        "n",
        "n_cells",
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof"),
        stable_round(F.lit(2.0) * half, 6).alias("g_stat"),
        stable_round(half / F.col("n").cast("double"), 8).alias("mi_nats"),
    )


@q(
    "wh_spearman_corr",
    oracle="""
        WITH base AS (
            SELECT l_returnflag AS flag,
                   CAST(ROUND(l_quantity) AS BIGINT) AS x,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
            FROM lineitem
        ), ranked AS (
            SELECT flag,
                   2 * RANK() OVER (PARTITION BY flag ORDER BY x)
                     + COUNT(*) OVER (PARTITION BY flag, x) - 1 AS rx,
                   2 * RANK() OVER (PARTITION BY flag ORDER BY y)
                     + COUNT(*) OVER (PARTITION BY flag, y) - 1 AS ry
            FROM base
        ), moments AS (
            SELECT flag,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(rx AS DECIMAL(38,0))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(ry AS DECIMAL(38,0))) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(rx * rx AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
                   CAST(SUM(CAST(ry * ry AS DECIMAL(38,0))) AS DOUBLE) AS syy,
                   CAST(SUM(CAST(rx * ry AS DECIMAL(38,0))) AS DOUBLE) AS sxy
            FROM ranked GROUP BY flag
        )
        SELECT flag, n,
               FLOOR((CAST(n AS DOUBLE) * sxy - sx * sy)
                     / SQRT((CAST(n AS DOUBLE) * sxx - sx * sx)
                            * (CAST(n AS DOUBLE) * syy - sy * sy))
                     * 1000000.0 + 0.5) / 1000000.0 AS spearman_rho
        FROM moments ORDER BY flag
    """,
)
def wh_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Spearman rank correlation between quantity and
    extended price per return flag — the monotone-association measure
    that survives outliers and nonlinearity where Pearson (a17) does
    not. Average ranks for ties come scaled by 2 so they stay INTEGERS
    (2·avg_rank = 2·RANK + tie_count − 1 — the wh_mann_whitney trick),
    making every rank moment an exact DECIMAL(38,0) sum; rho is then
    Pearson on the integer ranks with a single closed-form expression —
    the scaling cancels. Windows are PARTITIONED by flag (never
    partition-less), two window passes + one hash aggregate."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_quantity")).cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    wx = Window.partitionBy("flag").orderBy("x")
    wxc = Window.partitionBy("flag", "x")
    wy = Window.partitionBy("flag").orderBy("y")
    wyc = Window.partitionBy("flag", "y")
    ranked = base.select(
        "flag",
        (2 * F.rank().over(wx) + F.count(F.lit(1)).over(wxc) - 1).alias("rx"),
        (2 * F.rank().over(wy) + F.count(F.lit(1)).over(wyc) - 1).alias("ry"),
    )
    rx, ry = F.col("rx"), F.col("ry")
    m = ranked.groupBy("flag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(rx.cast("decimal(38,0)")).cast("double").alias("sx"),
        F.sum(ry.cast("decimal(38,0)")).cast("double").alias("sy"),
        F.sum((rx * rx).cast("decimal(38,0)")).cast("double").alias("sxx"),
        F.sum((ry * ry).cast("decimal(38,0)")).cast("double").alias("syy"),
        F.sum((rx * ry).cast("decimal(38,0)")).cast("double").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    return m.select(
        "flag",
        "n",
        stable_round(
            (nd * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                (nd * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (nd * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("spearman_rho"),
    ).orderBy("flag")


@q(
    "wh_kruskal_wallis",
    oracle="""
        WITH base AS (
            SELECT l_returnflag AS flag,
                   CAST(l_suppkey % 3 AS BIGINT) AS grp,
                   CAST(ROUND(l_quantity) AS BIGINT) AS x
            FROM lineitem
        ), ranked AS (
            SELECT flag, grp,
                   2 * RANK() OVER (PARTITION BY flag ORDER BY x)
                     + COUNT(*) OVER (PARTITION BY flag, x) - 1 AS r2
            FROM base
        ), per_grp AS (
            SELECT flag, grp,
                   CAST(COUNT(*) AS BIGINT) AS n_g,
                   CAST(SUM(CAST(r2 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2_g
            FROM ranked GROUP BY flag, grp
        ), quant AS (
            SELECT flag, n_g,
                   CAST(FLOOR(CAST(s2_g AS DOUBLE) * CAST(s2_g AS DOUBLE)
                              / (4.0 * CAST(n_g AS DOUBLE)) + 0.5)
                        AS DECIMAL(38,0)) AS q_g
            FROM per_grp
        ), per_flag AS (
            SELECT flag,
                   CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(SUM(n_g) AS BIGINT) AS n,
                   CAST(SUM(q_g) AS DECIMAL(38,0)) AS a
            FROM quant GROUP BY flag
        ), ties AS (
            SELECT flag,
                   CAST(SUM(CAST(t * t * t - t AS DECIMAL(38,0)))
                        AS DECIMAL(38,0)) AS tsum
            FROM (SELECT flag, x, CAST(COUNT(*) AS BIGINT) AS t
                  FROM base GROUP BY flag, x)
            GROUP BY flag
        ), stats AS (
            SELECT f.flag, f.k, f.n,
                   12.0 / (CAST(f.n AS DOUBLE) * CAST(f.n + 1 AS DOUBLE))
                     * CAST(f.a AS DOUBLE)
                     - 3.0 * CAST(f.n + 1 AS DOUBLE) AS h,
                   1.0 - CAST(t.tsum AS DOUBLE)
                     / (CAST(f.n AS DOUBLE) * CAST(f.n AS DOUBLE)
                        * CAST(f.n AS DOUBLE) - CAST(f.n AS DOUBLE)) AS c
            FROM per_flag f JOIN ties t ON f.flag = t.flag
        )
        SELECT flag, n, CAST(k - 1 AS BIGINT) AS dof,
               FLOOR(h * 1000000.0 + 0.5) / 1000000.0 AS h_stat,
               FLOOR(c * 100000000.0 + 0.5) / 100000000.0 AS tie_correction,
               FLOOR(h / c * 1000000.0 + 0.5) / 1000000.0 AS h_corrected
        FROM stats ORDER BY flag
    """,
)
def wh_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test — the k-group rank ANOVA (the nonparametric
    counterpart of wh_anova_oneway, extending wh_mann_whitney past two
    groups), with the tie correction C = 1 − Σ(t³−t)/(N³−N) that the
    heavily-tied integer quantities make material. Per return flag,
    tests whether quantity distributions differ across three
    supplier-hash groups. Doubled average ranks stay integers
    (2·RANK + ties − 1), per-group rank sums are exact decimals, each
    S_g²/n_g is floor-quantized via the double-floor (no LONG overflow
    at scale) before the exact cross-group sum, and N³−N is computed in
    double identically on both sides. Windows partition by flag; one
    extra tiny aggregate for tie counts."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_returnflag").alias("flag"),
        (F.col("l_suppkey") % 3).cast("long").alias("grp"),
        F.round(F.col("l_quantity")).cast("long").alias("x"),
    )
    wr = Window.partitionBy("flag").orderBy("x")
    wc = Window.partitionBy("flag", "x")
    ranked = base.select(
        "flag",
        "grp",
        (2 * F.rank().over(wr) + F.count(F.lit(1)).over(wc) - 1).alias("r2"),
    )
    per_grp = ranked.groupBy("flag", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum(F.col("r2").cast("decimal(38,0)")).cast("decimal(38,0)").alias("s2_g"),
    )
    s2d = F.col("s2_g").cast("double")
    quant_expr = s2d * s2d / (F.lit(4.0) * F.col("n_g").cast("double")) + F.lit(0.5)
    quant = per_grp.select(
        "flag",
        "n_g",
        (quant_expr - quant_expr % F.lit(1.0)).cast("decimal(38,0)").alias("q_g"),
    )
    per_flag = quant.groupBy("flag").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum("q_g").cast("decimal(38,0)").alias("a"),
    )
    t = F.col("t")
    ties = (
        base.groupBy("flag", "x")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .groupBy("flag")
        .agg(F.sum((t * t * t - t).cast("decimal(38,0)")).cast("decimal(38,0)").alias("tsum"))
    )
    nd = F.col("n").cast("double")
    n1d = (F.col("n") + 1).cast("double")
    stats = per_flag.join(ties, "flag").select(
        "flag",
        "k",
        "n",
        (F.lit(12.0) / (nd * n1d) * F.col("a").cast("double") - F.lit(3.0) * n1d).alias("h"),
        (F.lit(1.0) - F.col("tsum").cast("double") / (nd * nd * nd - nd)).alias("c"),
    )
    return stats.select(
        "flag",
        "n",
        (F.col("k") - 1).cast("long").alias("dof"),
        stable_round(F.col("h"), 6).alias("h_stat"),
        stable_round(F.col("c"), 8).alias("tie_correction"),
        stable_round(F.col("h") / F.col("c"), 6).alias("h_corrected"),
    ).orderBy("flag")


@q(
    "wh_levene_test",
    oracle="""
        WITH base AS (
            SELECT o_orderstatus AS status, o_orderpriority AS pri,
                   o_orderkey AS okey,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ), pos AS (
            SELECT status, pri, cents,
                   ROW_NUMBER() OVER (PARTITION BY status, pri
                                      ORDER BY cents, okey) AS rn,
                   COUNT(*) OVER (PARTITION BY status, pri) AS n_g
            FROM base
        ), med AS (
            SELECT status, pri,
                   CAST(SUM(CASE WHEN rn = (n_g + 1) // 2 THEN cents ELSE 0 END)
                        + SUM(CASE WHEN rn = (n_g + 2) // 2 THEN cents ELSE 0 END)
                        AS BIGINT) AS m2
            FROM pos GROUP BY status, pri
        ), z AS (
            SELECT b.status, b.pri, ABS(2 * b.cents - m.m2) AS z
            FROM base b JOIN med m ON b.status = m.status AND b.pri = m.pri
        ), per_grp AS (
            SELECT status, pri,
                   CAST(COUNT(*) AS BIGINT) AS n_g,
                   CAST(SUM(CAST(z AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s_g,
                   CAST(SUM(CAST(z * z AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS ss_g
            FROM z GROUP BY status, pri
        ), quant AS (
            SELECT status, n_g, s_g, ss_g,
                   CAST(FLOOR(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
                              / CAST(n_g AS DOUBLE) + 0.5) AS DECIMAL(38,0)) AS q_g
            FROM per_grp
        ), per_status AS (
            SELECT status,
                   CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(SUM(n_g) AS BIGINT) AS n,
                   CAST(SUM(s_g) AS DECIMAL(38,0)) AS s,
                   CAST(SUM(ss_g) AS DECIMAL(38,0)) AS ssq,
                   CAST(SUM(q_g) AS DECIMAL(38,0)) AS a
            FROM quant GROUP BY status
        ), parts AS (
            SELECT status, k, n,
                   CAST(a AS DOUBLE)
                     - FLOOR(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                             / CAST(n AS DOUBLE) + 0.5) AS ssb,
                   CAST(ssq AS DOUBLE) - CAST(a AS DOUBLE) AS ssw
            FROM per_status
        )
        SELECT status, n,
               CAST(k - 1 AS BIGINT) AS df1, CAST(n - k AS BIGINT) AS df2,
               FLOOR((ssb / CAST(k - 1 AS DOUBLE))
                     / (ssw / CAST(n - k AS DOUBLE)) * 1000000.0 + 0.5)
                   / 1000000.0 AS w_stat
        FROM parts ORDER BY status
    """,
)
def wh_levene_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levene's test in the Brown-Forsythe form (deviations from the
    group MEDIAN — the robust variant recommended for skewed data):
    within each order status, tests whether order-value spread is
    homogeneous across the five priorities — the assumption check for
    wh_anova_oneway, and a detector of variance-changing treatments
    that mean tests miss entirely. The group median of integer cents is
    kept EXACT by doubling (m2 = lower + upper middle order statistic,
    so z = |2x − m2| stays an integer and every moment is an exact
    decimal sum); the W statistic is then the one-way ANOVA F on z via
    the same quantize_big cross-group discipline. One partitioned
    ROW_NUMBER window, a tiny median table broadcast back, one hash
    aggregate — no partition-less windows."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderkey").alias("okey"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    wp = Window.partitionBy("status", "pri")
    pos = base.select(
        "status",
        "pri",
        "cents",
        F.row_number().over(wp.orderBy("cents", "okey")).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n_g"),
    )
    lo = F.floor((F.col("n_g") + 1) / 2)
    hi = F.floor((F.col("n_g") + 2) / 2)
    med = pos.groupBy("status", "pri").agg(
        (
            F.sum(F.when(F.col("rn") == lo, F.col("cents")).otherwise(0))
            + F.sum(F.when(F.col("rn") == hi, F.col("cents")).otherwise(0))
        )
        .cast("long")
        .alias("m2")
    )
    z = base.join(F.broadcast(med), ["status", "pri"]).select(
        "status", "pri", F.abs(2 * F.col("cents") - F.col("m2")).alias("z")
    )
    zc = F.col("z")
    per_grp = z.groupBy("status", "pri").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum(zc.cast("decimal(38,0)")).cast("decimal(38,0)").alias("s_g"),
        F.sum((zc * zc).cast("decimal(38,0)")).cast("decimal(38,0)").alias("ss_g"),
    )
    from bigdatacw1_spark.operators.relational import quantize_big

    quant = per_grp.select(
        "status",
        "n_g",
        "s_g",
        "ss_g",
        quantize_big(
            F.col("s_g").cast("double")
            * F.col("s_g").cast("double")
            / F.col("n_g").cast("double")
        ).alias("q_g"),
    )
    per_status = quant.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s_g").cast("decimal(38,0)").alias("s"),
        F.sum("ss_g").cast("decimal(38,0)").alias("ssq"),
        F.sum("q_g").cast("decimal(38,0)").alias("a"),
    )
    sd = F.col("s").cast("double")
    nd = F.col("n").cast("double")
    gsq_expr = sd * sd / nd + F.lit(0.5)
    parts = per_status.select(
        "status",
        "k",
        "n",
        (F.col("a").cast("double") - (gsq_expr - gsq_expr % F.lit(1.0))).alias("ssb"),
        (F.col("ssq").cast("double") - F.col("a").cast("double")).alias("ssw"),
    )
    return parts.select(
        "status",
        "n",
        (F.col("k") - 1).cast("long").alias("df1"),
        (F.col("n") - F.col("k")).cast("long").alias("df2"),
        stable_round(
            (F.col("ssb") / (F.col("k") - 1).cast("double"))
            / (F.col("ssw") / (F.col("n") - F.col("k")).cast("double")),
            6,
        ).alias("w_stat"),
    ).orderBy("status")


@q(
    "wh_nelson_aalen",
    oracle="""
        WITH life AS (
            SELECT user_id, event_type,
                   DATE_DIFF('day', MIN(DATE_TRUNC('day', ts)),
                             MAX(DATE_TRUNC('day', ts))) AS dur,
                   (MAX(DATE_TRUNC('day', ts)) <
                    (SELECT MAX(DATE_TRUNC('day', ts)) FROM events)
                      - INTERVAL 2 DAY) AS churned
            FROM events GROUP BY user_id, event_type
        ), by_t AS (
            SELECT dur AS t,
                   COUNT(*) AS ending,
                   COUNT(*) FILTER (churned) AS d
            FROM life GROUP BY dur
        ), risk AS (
            SELECT t, d,
                   SUM(ending) OVER (ORDER BY t DESC
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS n
            FROM by_t
        ), na AS (
            SELECT t, CAST(d AS BIGINT) AS d, CAST(n AS BIGINT) AS n,
                   SUM(CAST(d AS DOUBLE) / n)
                       OVER (ORDER BY t
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS h,
                   SUM(CAST(d AS DOUBLE) / (CAST(n AS DOUBLE) * n))
                       OVER (ORDER BY t
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS v
            FROM risk
        )
        SELECT CAST(t AS INT) AS t, d, n,
               FLOOR(h * 1000000.0 + 0.5) / 1000000.0 AS cum_hazard,
               FLOOR(EXP(-h) * 10000.0 + 0.5) / 10000.0 AS survival_fleming,
               FLOOR(SQRT(v) * 1000000.0 + 0.5) / 1000000.0 AS se_hazard
        FROM na ORDER BY t
    """,
)
def wh_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator over the same censored
    (user, activity-type) lifetimes as wh_survival_km: H(t) = Σ d_i/n_i
    with variance Σ d_i/n_i² (Aalen), plus the Fleming-Harrington
    survival exp(−H) — the estimator of choice when risk sets are small
    (KM's product collapses to 0 at any d=n step; exp(−H) never does)
    and the natural input to proportional-hazards modelling. Same
    shape as KM: duration-bounded aggregation, reverse running sum for
    risk sets, and FORWARD running sums over the ordered duration axis
    as the sequential deterministic fold (the KM ln-sum discipline —
    here the hazard sum needs no log transform at all). Reference
    lifetimes construction: wh_survival_km (warehouse.py)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    life = ev.groupBy("user_id", "event_type").agg(
        F.datediff(F.max(day), F.min(day)).alias("dur"),
        F.max(day).alias("last_day"),
    )
    edge = ev.agg(F.max(day).alias("corpus_max"))
    life = life.crossJoin(F.broadcast(edge)).select(
        "dur",
        (F.col("last_day") < F.col("corpus_max") - F.expr("INTERVAL 2 DAY")).alias(
            "churned"
        ),
    )
    by_t = life.groupBy(F.col("dur").alias("t")).agg(
        F.count(F.lit(1)).alias("ending"),
        F.sum(F.when(F.col("churned"), 1).otherwise(0)).alias("d"),
    )
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = by_t.select("t", "d", F.sum("ending").over(w_desc).alias("n"))
    w_asc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dd = F.col("d").cast("double")
    nd = F.col("n").cast("double")
    na = risk.select(
        "t",
        F.col("d").cast("long").alias("d"),
        F.col("n").cast("long").alias("n"),
        F.sum(dd / nd).over(w_asc).alias("h"),
        F.sum(dd / (nd * nd)).over(w_asc).alias("v"),
    )
    return na.select(
        F.col("t").cast("int").alias("t"),
        "d",
        "n",
        stable_round(F.col("h"), 6).alias("cum_hazard"),
        stable_round(F.exp(-F.col("h")), 4).alias("survival_fleming"),
        stable_round(F.sqrt(F.col("v")), 6).alias("se_hazard"),
    ).orderBy("t")


@q(
    "wh_deletion_vector_scan",
    oracle="""
        WITH base AS (
            SELECT l_orderkey % 64 AS file_id,
                   (l_suppkey % 7 = 3) AS deleted,
                   CAST(ROUND(l_quantity) AS BIGINT) AS qty,
                   ROW_NUMBER() OVER (PARTITION BY l_orderkey % 64
                                      ORDER BY l_orderkey, l_linenumber,
                                               l_suppkey, l_partkey,
                                               l_quantity, l_extendedprice) - 1
                       AS pos
            FROM lineitem
        )
        SELECT CAST(file_id AS BIGINT) AS file_id,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) FILTER (deleted) AS BIGINT) AS n_deleted,
               CAST(COUNT(*) FILTER (NOT deleted) AS BIGINT) AS n_live,
               CAST(SUM(CASE WHEN NOT deleted THEN qty ELSE 0 END) AS BIGINT)
                   AS live_qty_sum,
               CAST(COUNT(DISTINCT CASE WHEN deleted THEN pos // 32 END)
                    AS BIGINT) AS dv_words
        FROM base GROUP BY file_id ORDER BY file_id
    """,
)
def wh_deletion_vector_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-vector merge-on-read — the lakehouse pattern (Delta DVs /
    Iceberg positional deletes) where row-level deletes are PACKED
    BITMAPS keyed by (file, position), applied at scan time without
    rewriting data files. The engine side actually builds the bitmap:
    row positions within each file (deterministic (orderkey, linenumber)
    order), the delete predicate materializes positions, positions pack
    into 32-bit words (SUM of 1<<bit equals bitwise OR because each
    position sets a distinct bit), and the scan LEFT-joins base rows to
    DV words on (file, word) and keeps rows whose bit is unset — an
    equi join bounded per file, never a broadcast of the full DV. The
    ORACLE is independent: it recomputes the per-file live stats from
    the raw predicate, so a wrong shift, sign bit, or word split fails
    the hash. At 100 TB the DV table is ~rows/32 words in the worst
    case and the join co-partitions on file_id."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic table, so
    # the sort key extends until remaining ties are rows identical in every
    # column the scan reads -- then pos assignment within a tie group is a
    # permutation of interchangeable rows and the deleted-position SET is
    # deterministic (and engine-independent).
    w = Window.partitionBy("file_id").orderBy(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_partkey",
        "l_quantity", "l_extendedprice",
    )
    base = li.select(
        (F.col("l_orderkey") % 64).alias("file_id"),
        (F.col("l_suppkey") % 7 == 3).alias("deleted"),
        F.round(F.col("l_quantity")).cast("long").alias("qty"),
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        F.col("l_suppkey"),
        F.col("l_partkey"),
        F.col("l_quantity"),
        F.col("l_extendedprice"),
    ).withColumn("pos", F.row_number().over(w) - 1)
    dv = (
        base.where("deleted")
        .select(
            "file_id",
            F.floor(F.col("pos") / 32).alias("word"),
            # 1 << (pos % 32) with a COLUMN shift amount (F.shiftleft only
            # takes a literal): 2^b is exact in double for b <= 31
            F.pow(F.lit(2.0), (F.col("pos") % 32).cast("double"))
            .cast("long")
            .alias("bit"),
        )
        .groupBy("file_id", "word")
        .agg(F.sum("bit").cast("long").alias("mask"))
    )
    scan = base.withColumn("word", F.floor(F.col("pos") / 32)).join(
        dv, ["file_id", "word"], "left"
    )
    live = F.col("mask").isNull() | (
        F.floor(
            F.col("mask").cast("double")
            / F.pow(F.lit(2.0), (F.col("pos") % 32).cast("double"))
        )
        .cast("long")
        .bitwiseAND(1)
        == 0
    )
    return (
        scan.groupBy("file_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.when(~live, 1).otherwise(0)).cast("long").alias("n_deleted"),
            F.sum(F.when(live, 1).otherwise(0)).cast("long").alias("n_live"),
            F.sum(F.when(live, F.col("qty")).otherwise(0))
            .cast("long")
            .alias("live_qty_sum"),
            F.count_distinct(F.when(F.col("deleted"), F.col("word"))).cast("long").alias(
                "dv_words"
            ),
        )
        .select(
            F.col("file_id").cast("long").alias("file_id"),
            "n_rows",
            "n_deleted",
            "n_live",
            "live_qty_sum",
            "dv_words",
        )
        .orderBy("file_id")
    )


@q(
    "wh_holm_bonferroni",
    oracle="""
        WITH joined AS (
            SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
                   CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS hit
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        ), obs AS (
            SELECT seg, pri, CAST(COUNT(*) AS BIGINT) AS n1,
                   CAST(SUM(hit) AS BIGINT) AS k1
            FROM joined GROUP BY seg, pri
        ), tot AS (
            SELECT CAST(SUM(n1) AS BIGINT) AS n, CAST(SUM(k1) AS BIGINT) AS k,
                   CAST(COUNT(*) AS BIGINT) AS m
            FROM obs
        ), zs AS (
            SELECT seg, pri, n1, k1, m,
                   ABS((CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                        - CAST(k - k1 AS DOUBLE) / CAST(n - n1 AS DOUBLE))
                       / SQRT((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                              * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                              * (1.0 / CAST(n1 AS DOUBLE)
                                 + 1.0 / CAST(n - n1 AS DOUBLE)))) AS az
            FROM obs, tot
        ), erfx AS (
            SELECT seg, pri, n1, k1, m, az,
                   az / SQRT(2.0) AS x,
                   1.0 / (1.0 + 0.3275911 * (az / SQRT(2.0))) AS t
            FROM zs
        ), pv AS (
            SELECT seg, pri, n1, k1, m, az,
                   FLOOR(((((((1.061405429 * t - 1.453152027) * t
                              + 1.421413741) * t - 0.284496736) * t
                            + 0.254829592) * t) * EXP(-(x * x)))
                         * 100000000.0 + 0.5) / 100000000.0 AS p_q
            FROM erfx
        ), ranked AS (
            SELECT seg, pri, m, az, p_q,
                   CAST(ROW_NUMBER() OVER (ORDER BY p_q, seg, pri) AS BIGINT) AS i
            FROM pv
        ), stepped AS (
            SELECT *,
                   MAX(CAST(m - i + 1 AS DOUBLE) * p_q)
                       OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS adj_raw,
                   MIN(CASE WHEN p_q <= 0.05 / CAST(m - i + 1 AS DOUBLE)
                            THEN 1 ELSE 0 END)
                       OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS ok_so_far
            FROM ranked
        )
        SELECT seg, pri, CAST(i AS BIGINT) AS i,
               FLOOR(az * 1000000.0 + 0.5) / 1000000.0 AS abs_z,
               p_q AS p_value,
               FLOOR(LEAST(1.0, adj_raw) * 100000000.0 + 0.5) / 100000000.0
                   AS p_holm,
               FLOOR(LEAST(1.0, CAST(m AS DOUBLE) * p_q) * 100000000.0 + 0.5)
                   / 100000000.0 AS p_bonferroni,
               CAST(ok_so_far AS INT) AS rejected
        FROM stepped ORDER BY i
    """,
)
def wh_holm_bonferroni(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holm step-down multiple-testing control over the SAME 25-cell
    two-proportion family as wh_bh_fdr — the family-wise-error
    counterpart (BH controls FDR, the share of false discoveries; Holm
    controls ANY false discovery, uniformly dominating plain
    Bonferroni, whose adjusted p is also emitted for reference).
    Step-down: compare p_(i) to α/(m−i+1) in ascending order and stop
    at the first failure — the running MIN of the pass indicator; the
    adjusted p is the running MAX of (m−i+1)p_(i) clipped at 1. Same
    erf-polynomial p-values as BH (identical IEEE sequence, quantized
    before ranking); the global windows run over the 25-row hypothesis
    FAMILY, never the fact (see the test_plans allowlist)."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    joined = o.join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey")).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("o_orderpriority").alias("pri"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("hit"),
    )
    obs = joined.groupBy("seg", "pri").agg(
        F.count(F.lit(1)).cast("long").alias("n1"),
        F.sum("hit").cast("long").alias("k1"),
    )
    tot = obs.agg(
        F.sum("n1").cast("long").alias("n"),
        F.sum("k1").cast("long").alias("k"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )
    d = lambda c_: F.col(c_).cast("double")  # noqa: E731
    zs = obs.crossJoin(F.broadcast(tot)).select(
        "seg",
        "pri",
        "m",
        F.abs(
            (d("k1") / d("n1") - (F.col("k") - F.col("k1")).cast("double") / (F.col("n") - F.col("n1")).cast("double"))
            / F.sqrt(
                (d("k") / d("n"))
                * (F.lit(1.0) - d("k") / d("n"))
                * (F.lit(1.0) / d("n1") + F.lit(1.0) / (F.col("n") - F.col("n1")).cast("double"))
            )
        ).alias("az"),
    )
    x = F.col("az") / F.sqrt(F.lit(2.0))
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * x)
    poly = (
        (
            (
                ((F.lit(1.061405429) * t - F.lit(1.453152027)) * t + F.lit(1.421413741))
                * t
                - F.lit(0.284496736)
            )
            * t
            + F.lit(0.254829592)
        )
        * t
    ) * F.exp(-(x * x))
    pv = zs.select(
        "seg",
        "pri",
        "m",
        "az",
        (F.floor(poly * F.lit(100000000.0) + F.lit(0.5)) / F.lit(100000000.0)).alias(
            "p_q"
        ),
    )
    wr = Window.orderBy("p_q", "seg", "pri")
    ranked = pv.withColumn("i", F.row_number().over(wr).cast("long"))
    wc = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    stepped = ranked.select(
        "seg",
        "pri",
        "m",
        "az",
        "p_q",
        "i",
        F.max((F.col("m") - F.col("i") + 1).cast("double") * F.col("p_q"))
        .over(wc)
        .alias("adj_raw"),
        F.min(
            F.when(
                F.col("p_q") <= F.lit(0.05) / (F.col("m") - F.col("i") + 1).cast("double"),
                1,
            ).otherwise(0)
        )
        .over(wc)
        .alias("ok_so_far"),
    )
    return stepped.select(
        "seg",
        "pri",
        "i",
        stable_round(F.col("az"), 6).alias("abs_z"),
        F.col("p_q").alias("p_value"),
        (
            F.floor(F.least(F.lit(1.0), F.col("adj_raw")) * F.lit(100000000.0) + F.lit(0.5))
            / F.lit(100000000.0)
        ).alias("p_holm"),
        (
            F.floor(
                F.least(F.lit(1.0), F.col("m").cast("double") * F.col("p_q"))
                * F.lit(100000000.0)
                + F.lit(0.5)
            )
            / F.lit(100000000.0)
        ).alias("p_bonferroni"),
        F.col("ok_so_far").cast("int").alias("rejected"),
    ).orderBy("i")


@q(
    "wh_two_way_anova",
    oracle="""
        WITH base AS (
            SELECT o_orderpriority AS a, o_orderstatus AS b,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ), cells AS (
            SELECT a, b,
                   CAST(COUNT(*) AS BIGINT) AS n_ab,
                   CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s_ab,
                   CAST(SUM(CAST(cents * cents AS DECIMAL(38,0)))
                        AS DECIMAL(38,0)) AS ss_ab
            FROM base GROUP BY a, b
        ), qc AS (
            SELECT CAST(SUM(CAST(FLOOR(CAST(s_ab AS DOUBLE) * CAST(s_ab AS DOUBLE)
                                       / CAST(n_ab AS DOUBLE) + 0.5)
                                 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS c,
                   CAST(COUNT(*) AS BIGINT) AS n_cells,
                   CAST(COUNT(DISTINCT a) AS BIGINT) AS ka,
                   CAST(COUNT(DISTINCT b) AS BIGINT) AS kb,
                   CAST(SUM(n_ab) AS BIGINT) AS n,
                   CAST(SUM(s_ab) AS DECIMAL(38,0)) AS s,
                   CAST(SUM(ss_ab) AS DECIMAL(38,0)) AS ssq
            FROM cells
        ), qa AS (
            SELECT CAST(SUM(CAST(FLOOR(CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
                                       / CAST(na AS DOUBLE) + 0.5)
                                 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS ta
            FROM (SELECT a, CAST(SUM(n_ab) AS BIGINT) AS na,
                         CAST(SUM(s_ab) AS DECIMAL(38,0)) AS sa
                  FROM cells GROUP BY a)
        ), qb AS (
            SELECT CAST(SUM(CAST(FLOOR(CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
                                       / CAST(nb AS DOUBLE) + 0.5)
                                 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS tb
            FROM (SELECT b, CAST(SUM(n_ab) AS BIGINT) AS nb,
                         CAST(SUM(s_ab) AS DECIMAL(38,0)) AS sb
                  FROM cells GROUP BY b)
        ), parts AS (
            SELECT qc.ka, qc.kb, qc.n, qc.n_cells,
                   CAST(qa.ta AS DOUBLE)
                     - FLOOR(CAST(qc.s AS DOUBLE) * CAST(qc.s AS DOUBLE)
                             / CAST(qc.n AS DOUBLE) + 0.5) AS ss_a,
                   CAST(qb.tb AS DOUBLE)
                     - FLOOR(CAST(qc.s AS DOUBLE) * CAST(qc.s AS DOUBLE)
                             / CAST(qc.n AS DOUBLE) + 0.5) AS ss_b,
                   CAST(qc.c AS DOUBLE)
                     - FLOOR(CAST(qc.s AS DOUBLE) * CAST(qc.s AS DOUBLE)
                             / CAST(qc.n AS DOUBLE) + 0.5) AS ss_cells,
                   CAST(qc.ssq AS DOUBLE) - CAST(qc.c AS DOUBLE) AS ss_w
            FROM qc, qa, qb
        ), tidy AS (
            SELECT 'priority' AS effect,
                   CAST(ka - 1 AS BIGINT) AS df, ss_a AS ss,
                   (ss_a / CAST(ka - 1 AS DOUBLE))
                     / (ss_w / CAST(n - n_cells AS DOUBLE)) AS f
            FROM parts
            UNION ALL
            SELECT 'status', CAST(kb - 1 AS BIGINT), ss_b,
                   (ss_b / CAST(kb - 1 AS DOUBLE))
                     / (ss_w / CAST(n - n_cells AS DOUBLE))
            FROM parts
            UNION ALL
            SELECT 'interaction', CAST((ka - 1) * (kb - 1) AS BIGINT),
                   ss_cells - ss_a - ss_b,
                   ((ss_cells - ss_a - ss_b)
                    / CAST((ka - 1) * (kb - 1) AS DOUBLE))
                     / (ss_w / CAST(n - n_cells AS DOUBLE))
            FROM parts
        )
        SELECT effect, df,
               FLOOR(ss / 1000000.0 * 10000.0 + 0.5) / 10000.0 AS ss_mcents2,
               FLOOR(f * 1000000.0 + 0.5) / 1000000.0 AS f_stat
        FROM tidy ORDER BY effect
    """,
)
def wh_two_way_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way factorial ANOVA of order value over priority × status —
    main effects AND the interaction (the question one-way ANOVA
    cannot ask: does priority's effect on value DIFFER by status?),
    via the classical weighted cell-means decomposition ss_A = Σs_a²/n_a
    − S²/N, ss_AB = Σs_ab²/n_ab − S²/N − ss_A − ss_B (exact for
    balanced/proportional designs; the synthetic cells are
    near-proportional, and the statistic is well-defined either way).
    Same exactness machinery as wh_anova_oneway: ONE hash aggregate to
    per-cell integer moments, every marginal s²/n floor-quantized via
    the double-floor before exact decimal cross-group sums, then an
    O(cells) tidy 3-row (effect, df, ss, F) table."""
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = o.select(
        F.col("o_orderpriority").alias("a"),
        F.col("o_orderstatus").alias("b"),
        cents.alias("cents"),
    )
    cells = base.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("n_ab"),
        F.sum(F.col("cents").cast("decimal(38,0)")).cast("decimal(38,0)").alias("s_ab"),
        F.sum((F.col("cents") * F.col("cents")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("ss_ab"),
    )

    def qsum(df, scol, ncol):
        t = F.col(scol).cast("double") * F.col(scol).cast("double") / F.col(
            ncol
        ).cast("double") + F.lit(0.5)
        return F.sum((t - t % F.lit(1.0)).cast("decimal(38,0)")).cast("decimal(38,0)")

    qc = cells.agg(
        qsum(cells, "s_ab", "n_ab").alias("c"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.count_distinct("a").cast("long").alias("ka"),
        F.count_distinct("b").cast("long").alias("kb"),
        F.sum("n_ab").cast("long").alias("n"),
        F.sum("s_ab").cast("decimal(38,0)").alias("s"),
        F.sum("ss_ab").cast("decimal(38,0)").alias("ssq"),
    )
    qa = (
        cells.groupBy("a")
        .agg(
            F.sum("n_ab").cast("long").alias("na"),
            F.sum("s_ab").cast("decimal(38,0)").alias("sa"),
        )
        .agg(qsum(None, "sa", "na").alias("ta"))
    )
    qb = (
        cells.groupBy("b")
        .agg(
            F.sum("n_ab").cast("long").alias("nb"),
            F.sum("s_ab").cast("decimal(38,0)").alias("sb"),
        )
        .agg(qsum(None, "sb", "nb").alias("tb"))
    )
    sd = F.col("s").cast("double")
    nd = F.col("n").cast("double")
    g_expr = sd * sd / nd + F.lit(0.5)
    g = g_expr - g_expr % F.lit(1.0)
    parts = (
        qc.crossJoin(F.broadcast(qa))
        .crossJoin(F.broadcast(qb))
        .select(
            "ka",
            "kb",
            "n",
            "n_cells",
            (F.col("ta").cast("double") - g).alias("ss_a"),
            (F.col("tb").cast("double") - g).alias("ss_b"),
            (F.col("c").cast("double") - g).alias("ss_cells"),
            (F.col("ssq").cast("double") - F.col("c").cast("double")).alias("ss_w"),
        )
    )
    msw = F.col("ss_w") / (F.col("n") - F.col("n_cells")).cast("double")

    def row(effect, df_expr, ss_expr):
        return parts.select(
            F.lit(effect).alias("effect"),
            df_expr.cast("long").alias("df"),
            ss_expr.alias("ss"),
            (ss_expr / df_expr.cast("double") / msw).alias("f"),
        )

    ss_int = F.col("ss_cells") - F.col("ss_a") - F.col("ss_b")
    tidy = (
        row("priority", F.col("ka") - 1, F.col("ss_a"))
        .unionByName(row("status", F.col("kb") - 1, F.col("ss_b")))
        .unionByName(
            row("interaction", (F.col("ka") - 1) * (F.col("kb") - 1), ss_int)
        )
    )
    return tidy.select(
        "effect",
        "df",
        stable_round(F.col("ss") / F.lit(1000000.0), 4).alias("ss_mcents2"),
        stable_round(F.col("f"), 6).alias("f_stat"),
    ).orderBy("effect")


@q(
    "wh_cmh_test",
    oracle="""
        WITH base AS (
            SELECT CAST(DAYOFWEEK(ts) + 1 AS INT) AS dow,
                   user_id % 2 = 1 AS treated,
                   event_type = 'purchase' AS hit
            FROM events
        ), per AS (
            SELECT dow,
                   CAST(SUM(CASE WHEN treated AND hit THEN 1 ELSE 0 END)
                        AS BIGINT) AS a,
                   CAST(SUM(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT) AS r1,
                   CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM base GROUP BY dow
        ), terms AS (
            SELECT dow, a, n,
                   CAST(a AS DOUBLE)
                     - CAST(r1 AS DOUBLE) * CAST(c1 AS DOUBLE)
                       / CAST(n AS DOUBLE) AS dev,
                   CAST(r1 AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(r1 AS DOUBLE))
                     * CAST(c1 AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(c1 AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                        * (CAST(n AS DOUBLE) - 1.0)) AS v,
                   CAST(a AS DOUBLE) * CAST(n - r1 - c1 + a AS DOUBLE)
                     / CAST(n AS DOUBLE) AS adn,
                   CAST(r1 - a AS DOUBLE) * CAST(c1 - a AS DOUBLE)
                     / CAST(n AS DOUBLE) AS bcn
            FROM per
        ), folded AS (
            SELECT CAST(COUNT(*) AS INT) AS n_strata,
                   CAST(SUM(n) AS BIGINT) AS n_total,
                   CAST(SUM(a) AS BIGINT) AS sum_a,
                   LIST_REDUCE(LIST_PREPEND(0.0, LIST(dev ORDER BY dow)),
                               (acc, x) -> acc + x) AS sdev,
                   LIST_REDUCE(LIST_PREPEND(0.0, LIST(v ORDER BY dow)),
                               (acc, x) -> acc + x) AS sv,
                   LIST_REDUCE(LIST_PREPEND(0.0, LIST(adn ORDER BY dow)),
                               (acc, x) -> acc + x) AS sadn,
                   LIST_REDUCE(LIST_PREPEND(0.0, LIST(bcn ORDER BY dow)),
                               (acc, x) -> acc + x) AS sbcn
            FROM terms
        ), stat AS (
            SELECT n_strata, n_total, sum_a,
                   GREATEST(ABS(sdev) - 0.5, 0.0) * GREATEST(ABS(sdev) - 0.5, 0.0)
                     / sv AS cmh,
                   CASE WHEN sbcn > 0.0 THEN sadn / sbcn END AS ormh
            FROM folded
        )
        SELECT n_strata, n_total, sum_a,
               FLOOR(cmh * 1000000.0 + 0.5) / 1000000.0 AS cmh_stat,
               FLOOR(ormh * 1000000.0 + 0.5) / 1000000.0 AS or_mh,
               cmh > 3.841459 AS reject_05
        FROM stat
    """,
)
def wh_cmh_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Mantel-Haenszel test + Mantel-Haenszel common odds ratio
    over day-of-week strata — the STRATIFIED 2x2 association test that
    completes the experimentation suite: wh_chi_square pools everything
    (and wh_simpsons_check shows why pooling lies); CMH tests the
    treated-vs-purchase association WITHIN each stratum and combines
    the evidence, immune to the confounding a dow-correlated exposure
    would inject. Per stratum the expected count E=r1*c1/n, variance
    V=r1*(n-r1)*c1*(n-c1)/(n^2*(n-1)), and the two MH odds-ratio terms
    a*d/n, b*c/n are closed forms of exact BIGINT counts; the
    cross-stratum sums of these DOUBLES are the one order-sensitive
    step, so both engines fold them in STRATUM ORDER with a 0.0 seed
    (F.aggregate over the dow-sorted collected list == LIST_REDUCE over
    the 0.0-prepended LIST(x ORDER BY dow)) — identical left-to-right
    IEEE additions, so the rounded statistic hash-compares. The 0.5
    continuity correction clamps at zero; the 5% verdict compares the
    UNROUNDED statistic to the chi-square(1) bound. One hash aggregate
    to 7 stratum rows, one 7-element fold: trivially 100 TB-safe."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        F.dayofweek("ts").cast("int").alias("dow"),
        (F.col("user_id") % 2 == 1).alias("treated"),
        (F.col("event_type") == "purchase").alias("hit"),
    )
    per = base.groupBy("dow").agg(
        F.sum(F.when(F.col("treated") & F.col("hit"), 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when(F.col("treated"), 1).otherwise(0)).cast("long").alias("r1"),
        F.sum(F.when(F.col("hit"), 1).otherwise(0)).cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    ad, r1d = F.col("a").cast("double"), F.col("r1").cast("double")
    c1d, nd = F.col("c1").cast("double"), F.col("n").cast("double")
    terms = per.select(
        "dow",
        "a",
        "n",
        (ad - r1d * c1d / nd).alias("dev"),
        (r1d * (nd - r1d) * c1d * (nd - c1d) / (nd * nd * (nd - 1.0))).alias("v"),
        (
            ad
            * (F.col("n") - F.col("r1") - F.col("c1") + F.col("a")).cast("double")
            / nd
        ).alias("adn"),
        (
            (F.col("r1") - F.col("a")).cast("double")
            * (F.col("c1") - F.col("a")).cast("double")
            / nd
        ).alias("bcn"),
    )
    arr = F.sort_array(
        F.collect_list(F.struct("dow", "dev", "v", "adn", "bcn"))
    )

    def ordered_sum(field: str):
        return F.aggregate(
            F.transform(F.col("arr"), lambda s: s[field]),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    folded = terms.agg(
        F.count(F.lit(1)).cast("int").alias("n_strata"),
        F.sum("n").cast("long").alias("n_total"),
        F.sum("a").cast("long").alias("sum_a"),
        arr.alias("arr"),
    ).select(
        "n_strata",
        "n_total",
        "sum_a",
        ordered_sum("dev").alias("sdev"),
        ordered_sum("v").alias("sv"),
        ordered_sum("adn").alias("sadn"),
        ordered_sum("bcn").alias("sbcn"),
    )
    corr = F.greatest(F.abs(F.col("sdev")) - F.lit(0.5), F.lit(0.0))
    cmh = corr * corr / F.col("sv")
    ormh = F.when(F.col("sbcn") > 0.0, F.col("sadn") / F.col("sbcn"))
    return folded.select(
        "n_strata",
        "n_total",
        "sum_a",
        stable_round(cmh, 6).alias("cmh_stat"),
        stable_round(ormh, 6).alias("or_mh"),
        (cmh > F.lit(3.841459)).alias("reject_05"),
    )


@q(
    "wh_ks_test",
    oracle="""
        WITH c AS (
            SELECT event_type, value, CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY event_type, value
        ), types AS (
            SELECT DISTINCT event_type FROM c
        ), merged AS (
            SELECT type_a, type_b, value,
                   CAST(SUM(c1) AS BIGINT) AS c1, CAST(SUM(c2) AS BIGINT) AS c2
            FROM (
                SELECT a.event_type AS type_a, t.event_type AS type_b,
                       a.value, a.c AS c1, 0 AS c2
                FROM c a JOIN types t ON a.event_type < t.event_type
                UNION ALL
                SELECT t.event_type, b.event_type, b.value, 0, b.c
                FROM c b JOIN types t ON t.event_type < b.event_type
            ) x GROUP BY type_a, type_b, value
        ), cum AS (
            SELECT type_a, type_b,
                   CAST(SUM(c1) OVER w AS BIGINT) AS cum1,
                   CAST(SUM(c2) OVER w AS BIGINT) AS cum2
            FROM merged
            WINDOW w AS (PARTITION BY type_a, type_b ORDER BY value
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ), n AS (
            SELECT event_type, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY event_type
        ), d AS (
            SELECT type_a, type_b,
                   MAX(ABS(CAST(cum1 AS DOUBLE) / na.n - CAST(cum2 AS DOUBLE) / nb.n)) AS d_raw,
                   na.n AS n1, nb.n AS n2
            FROM cum
            JOIN n na ON na.event_type = cum.type_a
            JOIN n nb ON nb.event_type = cum.type_b
            GROUP BY type_a, type_b, na.n, nb.n
        )
        SELECT type_a, type_b, n1, n2,
               FLOOR(d_raw * 1000000.0 + 0.5) / 1000000.0 AS d_stat,
               FLOOR(1.358 * SQRT(CAST(n1 + n2 AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2)) * 1000000.0 + 0.5) / 1000000.0 AS d_crit_05,
               d_raw > 1.358 * SQRT(CAST(n1 + n2 AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2)) AS reject_05
        FROM d ORDER BY type_a, type_b
    """,
)
def wh_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test for every pair of event types
    over the ``value`` distribution — the distribution-equality
    companion of wh_mann_whitney (location) and wh_kruskal_wallis
    (k-sample ranks): D = sup_v |ECDF_a(v) - ECDF_b(v)|, computed
    EXACTLY by merging per-(type, value) counts and taking the max
    ECDF gap over the cumulative counts, evaluated at every distinct
    value (ties handled by grouping BEFORE the cumulative, so both
    ECDFs jump together at shared values — the classic naive-KS bug).
    ``reject_05`` compares D against the large-sample alpha=0.05
    critical value c(alpha)*sqrt((n1+n2)/(n1*n2)), c(0.05)=1.358
    (Smirnov's asymptotic).

    Cross-engine exactness: cumulative counts are integers; each ECDF
    gap is two IEEE divisions and a subtract (identical trees both
    engines); max over doubles is exact; sqrt is IEEE
    correctly-rounded, so even the critical value hashes bit-for-bit
    after stable_round(6).

    Scale shape: counts collapse events to distinct (type, value) rows
    first (one shuffle), the pairwise explode multiplies by
    (n_types - 1) <= 4, and the cumulative window partitions by PAIR —
    the same per-group frame every ev_* series operator uses, spilling
    sort, no single global partition."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy("event_type", "value").agg(F.count(F.lit(1)).alias("c"))
    types = c.select("event_type").distinct()
    side_a = (
        c.alias("a")
        .join(F.broadcast(types.alias("t")), F.col("a.event_type") < F.col("t.event_type"))
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("t.event_type").alias("type_b"),
            "value",
            F.col("c").alias("c1"),
            F.lit(0).cast("long").alias("c2"),
        )
    )
    side_b = (
        c.alias("b")
        .join(F.broadcast(types.alias("t")), F.col("t.event_type") < F.col("b.event_type"))
        .select(
            F.col("t.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            "value",
            F.lit(0).cast("long").alias("c1"),
            F.col("c").alias("c2"),
        )
    )
    merged = (
        side_a.unionByName(side_b)
        .groupBy("type_a", "type_b", "value")
        .agg(F.sum("c1").alias("c1"), F.sum("c2").alias("c2"))
    )
    w = (
        Window.partitionBy("type_a", "type_b")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = merged.select(
        "type_a",
        "type_b",
        F.sum("c1").over(w).alias("cum1"),
        F.sum("c2").over(w).alias("cum2"),
    )
    n = c.groupBy("event_type").agg(F.sum("c").alias("n"))
    d = (
        cum.join(
            F.broadcast(n.select(F.col("event_type").alias("type_a"), F.col("n").alias("n1"))),
            "type_a",
        )
        .join(
            F.broadcast(n.select(F.col("event_type").alias("type_b"), F.col("n").alias("n2"))),
            "type_b",
        )
        .groupBy("type_a", "type_b", "n1", "n2")
        .agg(
            F.max(
                F.abs(
                    F.col("cum1").cast("double") / F.col("n1")
                    - F.col("cum2").cast("double") / F.col("n2")
                )
            ).alias("d_raw")
        )
    )
    crit = F.lit(1.358) * F.sqrt(
        (F.col("n1") + F.col("n2")).cast("double")
        / (F.col("n1").cast("double") * F.col("n2"))
    )
    return d.select(
        "type_a",
        "type_b",
        "n1",
        "n2",
        stable_round(F.col("d_raw"), 6).alias("d_stat"),
        stable_round(crit, 6).alias("d_crit_05"),
        (F.col("d_raw") > crit).alias("reject_05"),
    ).orderBy("type_a", "type_b")


@q(
    "wh_jackknife_ratio",
    oracle="""
        WITH base AS (
            SELECT l_returnflag AS flag,
                   FLOOR(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) AS yq,
                   CAST(l_quantity AS DOUBLE) AS x
            FROM lineitem
        ), tot AS (
            SELECT flag, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(yq AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 AS sy,
                   CAST(SUM(CAST(x AS DECIMAL(30,2))) AS DOUBLE) AS sx
            FROM base GROUP BY flag
        ), loo AS (
            SELECT b.flag,
                   FLOOR(((t.sy - b.yq / 10000.0) / (t.sx - b.x)) * 1000000.0 + 0.5) AS qr
            FROM base b JOIN tot t ON t.flag = b.flag
        ), mom AS (
            SELECT flag,
                   CAST(SUM(CAST(qr AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS sr,
                   CAST(SUM(CAST(qr AS DECIMAL(19,0)) * CAST(qr AS DECIMAL(19,0))) AS DOUBLE) / 1000000000000.0 AS srr
            FROM loo GROUP BY flag
        )
        SELECT t.flag, t.n,
               FLOOR((t.sy / t.sx) * 1000000.0 + 0.5) / 1000000.0 AS ratio,
               FLOOR(SQRT((CAST(t.n AS DOUBLE) - 1.0) / t.n
                          * (m.srr - m.sr * m.sr / t.n)) * 1000000.0 + 0.5) / 1000000.0 AS se_jack
        FROM tot t JOIN mom m ON m.flag = t.flag
        ORDER BY t.flag
    """,
)
def wh_jackknife_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one jackknife standard error of a RATIO-OF-SUMS estimator
    (Quenouille/Tukey; Efron & Stein 1981) — the closed-form resampling
    companion of wh_poisson_bootstrap: per returnflag, R = sum(revenue)
    / sum(quantity) (revenue per unit shipped), and the jackknife SE
    from the n delete-one ratios R_(i) = (Sy - y_i)/(Sx - x_i), which
    for a ratio-of-sums need NO resampled passes: every pseudo-value is
    per-row arithmetic against the broadcast group totals, and
    sum((R_(i) - Rbar)^2) collapses to the (sum qr, sum qr^2) moment
    identity — two aggregates total, zero resamples, the exact shape a
    6-quintillion-row lineitem needs.

    Cross-engine exactness (the chi2_micro discipline): revenue is
    integer-quantized at 1e-4 BEFORE the order-free group sum
    (DECIMAL(38,0) exact); each delete-one ratio is quantized at 1e-6
    before ITS sums; the square matrix sum uses DECIMAL(19,0) factors
    multiplied into DECIMAL(38,0) (exact); the final variance identity
    and sqrt are identical IEEE trees both engines, so stable_round(6)
    hashes bit-for-bit."""
    li = _t(spark, sf_dir, "lineitem")
    y = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * F.lit(10000.0)
    yq = (y + F.lit(0.5) - (y + F.lit(0.5)) % F.lit(1.0))  # floor(y*1e4+0.5), exact IEEE
    base = li.select(
        F.col("l_returnflag").alias("flag"),
        yq.alias("yq"),
        F.col("l_quantity").cast("double").alias("x"),
    )
    tot = base.groupBy("flag").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.col("yq").cast("decimal(38,0)")).cast("double") / F.lit(10000.0)).alias("sy"),
        F.sum(F.col("x").cast("decimal(30,2)")).cast("double").alias("sx"),
    )
    r = (F.col("sy") - F.col("yq") / F.lit(10000.0)) / (F.col("sx") - F.col("x"))
    rq = r * F.lit(1000000.0) + F.lit(0.5)
    qr = (rq - rq % F.lit(1.0)).alias("qr")  # floor, exact IEEE, any magnitude
    loo = base.join(F.broadcast(tot), "flag").select("flag", qr)
    mom = loo.groupBy("flag").agg(
        (F.sum(F.col("qr").cast("decimal(38,0)")).cast("double") / F.lit(1000000.0)).alias("sr"),
        (
            F.sum(F.col("qr").cast("decimal(19,0)") * F.col("qr").cast("decimal(19,0)")).cast("double")
            / F.lit(1000000000000.0)
        ).alias("srr"),
    )
    nn = F.col("n").cast("double")
    var = (nn - F.lit(1.0)) / nn * (F.col("srr") - F.col("sr") * F.col("sr") / nn)
    return (
        tot.join(mom, "flag")
        .select(
            "flag",
            "n",
            stable_round(F.col("sy") / F.col("sx"), 6).alias("ratio"),
            stable_round(F.sqrt(var), 6).alias("se_jack"),
        )
        .orderBy("flag")
    )


@q(
    "wh_cooks_distance",
    oracle="""
        WITH base AS (
            SELECT o_orderkey,
                   CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
                   FLOOR(o_totalprice * 100.0 + 0.5) AS yc
            FROM orders
        ), mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(x AS DECIMAL(19,0))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(yc AS DECIMAL(38,0))) AS DOUBLE) / 100.0 AS sy,
                   CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS DOUBLE) AS sxx,
                   CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(yc AS DECIMAL(19,0))) AS DOUBLE) / 100.0 AS sxy
            FROM base
        ), fit AS (
            SELECT n, sx, sy, sxx, sxy,
                   (CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx) AS b1,
                   sx / n AS xbar,
                   (CAST(n AS DOUBLE) * sxx - sx * sx) / n AS sxx_c
            FROM mom
        ), resid AS (
            SELECT b.o_orderkey, b.x, b.yc / 100.0 AS y,
                   b.yc / 100.0 - ((f.sy / f.n - f.b1 * f.xbar) + f.b1 * b.x) AS e,
                   1.0 / f.n + (b.x - f.xbar) * (b.x - f.xbar) / f.sxx_c AS h,
                   f.n AS n
            FROM base b CROSS JOIN fit f
        ), sse AS (
            SELECT CAST(SUM(CAST(FLOOR(e * e * 100.0 + 0.5) AS DECIMAL(38,0))) AS DOUBLE) / 100.0 AS sse,
                   CAST(MAX(n) AS BIGINT) AS n
            FROM resid
        ), cooks AS (
            SELECT r.o_orderkey, r.x, r.y,
                   r.e * r.e * r.h
                   / (2.0 * (s.sse / (s.n - 2.0)) * (1.0 - r.h) * (1.0 - r.h)) AS d
            FROM resid r CROSS JOIN sse s
        )
        SELECT o_orderkey, x AS days, y AS totalprice,
               FLOOR(d * 100000000.0 + 0.5) / 100000000.0 AS cooks_d
        FROM cooks
        ORDER BY d DESC, o_orderkey
        LIMIT 15
    """,
)
def wh_cooks_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS influence diagnostics: Cook's distance for every order under
    the simple regression totalprice ~ days-since-1995, surfacing the
    top-15 most influential rows — the regression-health companion of
    wh_two_way_anova (which partitions variance) and ev_theil_sen
    (which survives what these rows do to OLS). D_i =
    e_i^2 h_i / (p s^2 (1 - h_i)^2) with p = 2, hat leverage h_i = 1/n
    + (x_i - xbar)^2 / Sxx — all CLOSED FORM from five moment sums, so
    the whole diagnostic is one moments aggregate (exact DECIMAL sums),
    one broadcast of the 1-row fit, one quantized SSE aggregate, and a
    TakeOrderedAndProject top-k: three passes, no window, no resample,
    at any scale.

    Cross-engine exactness: x (day offsets) and y (cents) are integers;
    all five moments are exact DECIMAL(38,0) sums with DECIMAL(19,0)
    factor casts before the products (the chi2_micro discipline); slope,
    intercept, leverage, residuals and D are identical IEEE +-*/ trees
    both engines; SSE quantizes e^2 at 1e-2 before its order-free sum.
    The D ordering is therefore bit-identical too; o_orderkey breaks
    exact ties."""
    o = _t(spark, sf_dir, "orders")
    yc_raw = F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)
    base = o.select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).cast("long").alias("x"),
        (yc_raw - yc_raw % F.lit(1.0)).alias("yc"),
    )
    xd = F.col("x").cast("decimal(19,0)")
    mom = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        (F.sum(F.col("yc").cast("decimal(38,0)")).cast("double") / F.lit(100.0)).alias("sy"),
        F.sum(xd * xd).cast("double").alias("sxx"),
        (F.sum(xd * F.col("yc").cast("decimal(19,0)")).cast("double") / F.lit(100.0)).alias("sxy"),
    )
    nn = F.col("n").cast("double")
    fit = mom.select(
        "n",
        "sx",
        "sy",
        ((nn * F.col("sxy") - F.col("sx") * F.col("sy"))
         / (nn * F.col("sxx") - F.col("sx") * F.col("sx"))).alias("b1"),
        (F.col("sx") / F.col("n")).alias("xbar"),
        ((nn * F.col("sxx") - F.col("sx") * F.col("sx")) / F.col("n")).alias("sxx_c"),
    )
    e = (
        F.col("yc") / F.lit(100.0)
        - ((F.col("sy") / F.col("n") - F.col("b1") * F.col("xbar")) + F.col("b1") * F.col("x"))
    )
    h = (
        F.lit(1.0) / F.col("n")
        + (F.col("x") - F.col("xbar")) * (F.col("x") - F.col("xbar")) / F.col("sxx_c")
    )
    resid = base.crossJoin(F.broadcast(fit)).select(
        "o_orderkey",
        "x",
        (F.col("yc") / F.lit(100.0)).alias("y"),
        e.alias("e"),
        h.alias("h"),
        "n",
    )
    e2q_raw = F.col("e") * F.col("e") * F.lit(100.0) + F.lit(0.5)
    sse = resid.agg(
        (F.sum((e2q_raw - e2q_raw % F.lit(1.0)).cast("decimal(38,0)")).cast("double") / F.lit(100.0)).alias("sse"),
        F.max("n").alias("n2"),
    )
    d = (
        F.col("e") * F.col("e") * F.col("h")
        / (
            F.lit(2.0)
            * (F.col("sse") / (F.col("n2") - F.lit(2.0)))
            * (F.lit(1.0) - F.col("h"))
            * (F.lit(1.0) - F.col("h"))
        )
    )
    return (
        resid.crossJoin(F.broadcast(sse))
        .select(
            "o_orderkey",
            F.col("x").alias("days"),
            F.col("y").alias("totalprice"),
            d.alias("d_raw"),
        )
        .orderBy(F.desc("d_raw"), "o_orderkey")
        .limit(15)
        .select(
            "o_orderkey",
            "days",
            "totalprice",
            stable_round(F.col("d_raw"), 8).alias("cooks_d"),
        )
    )
