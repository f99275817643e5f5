"""Pipeline-front-end dialect entries: the Mongo stages BEYOND what the
reference's own pipelines exercise ($setWindowFields, $unionWith, $facet,
$sortByCount), each run through compile_pipeline against the driver tables
with a DuckDB oracle — so the driver verdict covers the dialect surface,
not just the two reference pipelines.

Everything compiles to Catalyst (the front end emits ordinary DataFrame
ops): $setWindowFields is one exchange + in-partition sort, $unionWith is
a plan-level union, $facet's collect_list single rows cross-join for free,
$sortByCount is a hash aggregate + TakeOrdered-able sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatacw1_spark.pipeline import compile_pipeline
from bigdatacw1_spark.queries.registry import q
from bigdatacw1_spark.queries.registry import t as _t


@q(
    "pl_setwindowfields",
    oracle="""
        WITH base AS (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rnk,
                   FLOOR(SUM(o_totalprice) OVER (
                       PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100.0 + 0.5) / 100.0 AS cum_spend,
                   FLOOR(SUM(o_totalprice) OVER (PARTITION BY o_custkey) * 100.0 + 0.5) / 100.0 AS total_spend
            FROM orders
        )
        SELECT o_custkey, o_orderkey, rnk, cum_spend, total_spend
        FROM base WHERE rnk <= 3
        ORDER BY o_custkey, o_orderkey
    """,
)
def pl_setwindowfields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$setWindowFields through the pipeline front end: per-customer order
    rank, running spend (documents ["unbounded","current"]) and whole-
    partition total — Mongo's window stage compiled onto Spark's Window
    API (ONE exchange on o_custkey serves all three outputs)."""
    orders = _t(spark, sf_dir, "orders")
    out = compile_pipeline(
        orders,
        [
            {"$setWindowFields": {
                "partitionBy": "$o_custkey",
                "sortBy": {"o_orderdate": 1, "o_orderkey": 1},
                "output": {
                    "rnk": {"$rank": {}},
                    "cum_spend": {"$sum": "$o_totalprice",
                                  "window": {"documents": ["unbounded", "current"]}},
                    "total_spend": {"$sum": "$o_totalprice"},
                },
            }},
            {"$match": {"rnk": {"$lte": 3}}},
            {"$sort": {"o_custkey": 1, "o_orderkey": 1}},
        ],
    )
    return out.select(
        "o_custkey",
        "o_orderkey",
        "rnk",
        F.round("cum_spend", 2).alias("cum_spend"),
        F.round("total_spend", 2).alias("total_spend"),
    )


@q(
    "pl_unionwith",
    oracle="""
        WITH unioned AS (
            SELECT o_orderpriority AS bucket, o_totalprice AS amount FROM orders
            UNION ALL
            SELECT event_type AS bucket, value AS amount FROM events WHERE value > 50
        )
        SELECT bucket, COUNT(*) AS n,
               FLOOR(SUM(amount) * 100.0 + 0.5) / 100.0 AS total
        FROM unioned GROUP BY bucket ORDER BY bucket
    """,
)
def pl_unionwith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$unionWith with an inner pipeline: orders unioned with filtered
    events (schema aligned by a $project on each side), then $group —
    a plan-level UNION ALL feeding one hash aggregate; the $match on the
    foreign collection is pushed into its scan by Catalyst."""
    orders = _t(spark, sf_dir, "orders")
    events = _t(spark, sf_dir, "events")
    odocs = orders.select(
        F.col("o_orderpriority").alias("bucket"), F.col("o_totalprice").alias("amount")
    )
    out = compile_pipeline(
        odocs,
        [
            {"$unionWith": {"coll": "ev", "pipeline": [
                {"$match": {"value": {"$gt": 50}}},
                {"$project": {"bucket": "$event_type", "amount": "$value"}},
            ]}},
            {"$group": {"_id": "$bucket", "n": {"$sum": 1}, "total": {"$sum": "$amount"}}},
            {"$sort": {"_id": 1}},
        ],
        collections={"ev": events},
    )
    return out.select(
        F.col("_id").alias("bucket"), "n", F.round("total", 2).alias("total")
    )


@q(
    "pl_facet",
    oracle="""
        SELECT
            (SELECT COUNT(*) FROM orders WHERE o_totalprice > 150000) AS n_big,
            (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS n_cust,
            (SELECT o_orderpriority FROM orders
             GROUP BY o_orderpriority ORDER BY COUNT(*) DESC, o_orderpriority LIMIT 1) AS top_priority
    """,
)
def pl_facet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$facet: three summary sub-pipelines over the same scan, collapsed
    to one document. The entry surfaces each facet as a scalar so the
    oracle is plain SQL; the facet arrays themselves are Mongo's shape."""
    orders = _t(spark, sf_dir, "orders")
    out = compile_pipeline(
        orders,
        [{"$facet": {
            "big": [{"$match": {"o_totalprice": {"$gt": 150000}}}, {"$count": "n"}],
            "cust": [{"$group": {"_id": "$o_custkey"}}, {"$count": "n"}],
            "prio": [{"$sortByCount": "$o_orderpriority"}, {"$limit": 1}],
        }}],
    )
    return out.select(
        F.coalesce(F.element_at("big", 1)["n"], F.lit(0)).alias("n_big"),
        F.coalesce(F.element_at("cust", 1)["n"], F.lit(0)).alias("n_cust"),
        F.element_at("prio", 1)["_id"].alias("top_priority"),
    )


@q(
    "pl_sortbycount",
    oracle="""
        SELECT lang AS _id, COUNT(*) AS count
        FROM documents
        GROUP BY lang
        ORDER BY count DESC, _id
    """,
)
def pl_sortbycount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$sortByCount — Mongo's group-count-sort idiom in one stage: a hash
    aggregate on the expression plus an ordered output (count desc with an
    _id tie-break pinned in the compiler for determinism)."""
    docs = _t(spark, sf_dir, "documents")
    return compile_pipeline(docs, [{"$sortByCount": "$lang"}])


@q(
    "pl_graphlookup",
    oracle="""
        WITH RECURSIVE raw AS (
            SELECT DISTINCT CAST(o_custkey AS BIGINT) AS c,
                            CAST(l_suppkey + 1000000 AS BIGINT) AS s
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        ), bi AS (
            SELECT c AS u, s AS v FROM raw UNION SELECT s AS u, c AS v FROM raw
        ), roots AS (SELECT UNNEST([1, 2, 3]) AS root),
        walk(root, u, v, d) AS (
            SELECT r.root, e.u, e.v, 0 FROM roots r JOIN bi e ON e.u = r.root
            UNION
            SELECT w.root, e.u, e.v, w.d + 1
            FROM walk w JOIN bi e ON e.u = w.v
            WHERE w.d < 1
        )
        SELECT CAST(root AS BIGINT) AS root, u, v, CAST(MIN(d) AS BIGINT) AS d
        FROM walk GROUP BY 1, 2, 3
        ORDER BY root, u, v
    """,
)
def pl_graphlookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$graphLookup through the pipeline front end: 2-level traversal of
    the undirected customer↔supplier trade graph from three seed
    customers (depth 0 = the seed's own trade edges, depth 1 = edges of
    the counterparties), flattened by $unwind for the row-level oracle —
    a depth-bounded recursive CTE with a MIN-depth collapse. The
    compiled plan is the bfs_levels shape: one keyed shuffle per round,
    closure computed once per DISTINCT start value."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("o_custkey").cast("long").alias("u"),
            (F.col("l_suppkey").cast("long") + F.lit(1_000_000)).alias("v"),
        )
        .distinct()
    )
    bi = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    roots = spark.range(1, 4).select(F.col("id").alias("root"))
    out = compile_pipeline(
        roots,
        [
            {"$graphLookup": {
                "from": "trades", "startWith": "$root",
                "connectFromField": "v", "connectToField": "u",
                "as": "reach", "depthField": "d", "maxDepth": 1,
            }},
            {"$unwind": "$reach"},
            {"$project": {"root": 1, "u": "$reach.u", "v": "$reach.v", "d": "$reach.d"}},
            {"$sort": {"root": 1, "u": 1, "v": 1}},
        ],
        collections={"trades": bi},
    )
    return out.select("root", "u", "v", "d")


@q(
    "pl_expr_suite",
    oracle="""
        WITH base AS (
            SELECT CAST(MONTH(o_orderdate) AS INT) AS month,
                   CAST(STR_SPLIT(o_orderpriority, '-')[1] AS INT) AS prio_num,
                   LOWER(STR_SPLIT(o_orderpriority, '-')[2]) AS prio_word,
                   CASE WHEN o_totalprice >= 200000 THEN 'high'
                        WHEN o_totalprice >= 50000 THEN 'mid'
                        ELSE 'low' END AS tier,
                   TRUNC(o_totalprice / 1000) AS ktr
            FROM orders
        )
        SELECT tier, month, COUNT(*) AS n,
               MAX(ktr) AS max_k, MIN(prio_num) AS min_prio,
               MAX(prio_word) AS max_word
        FROM base WHERE month IN (1, 2, 3)
        GROUP BY tier, month
        ORDER BY tier, month
    """,
)
def pl_expr_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 expression-dialect sweep through the pipeline front end:
    $month, $split + $arrayElemAt + $toInt (string parsing to int),
    $toLower, $switch (tiering), $trunc (toward-zero at a scale),
    $divide, $in (match-stage membership via $group key filter), compiled
    to pure Catalyst expressions — the whole pipeline is one scan + one
    hash aggregate, no Python. The DuckDB oracle mirrors each function
    (TRUNC/STR_SPLIT/LOWER/CASE), so the dialect's semantics are
    hash-checked end to end, not just unit-tested."""
    orders = _t(spark, sf_dir, "orders")
    out = compile_pipeline(
        orders,
        [
            {"$addFields": {
                "month": {"$month": "$o_orderdate"},
                "prio_num": {"$toInt": {"$arrayElemAt": [{"$split": ["$o_orderpriority", "-"]}, 0]}},
                "prio_word": {"$toLower": {"$arrayElemAt": [{"$split": ["$o_orderpriority", "-"]}, 1]}},
                "tier": {"$switch": {
                    "branches": [
                        {"case": {"$gte": ["$o_totalprice", 200000]}, "then": "high"},
                        {"case": {"$gte": ["$o_totalprice", 50000]}, "then": "mid"},
                    ],
                    "default": "low",
                }},
                "ktr": {"$trunc": [{"$divide": ["$o_totalprice", 1000]}, 0]},
            }},
            {"$match": {"month": {"$in": [1, 2, 3]}}},
            {"$group": {
                "_id": {"tier": "$tier", "month": "$month"},
                "n": {"$sum": 1},
                "max_k": {"$max": "$ktr"},
                "min_prio": {"$min": "$prio_num"},
                "max_word": {"$max": "$prio_word"},
            }},
            {"$project": {"_id": 0, "tier": "$_id.tier", "month": "$_id.month",
                          "n": 1, "max_k": 1, "min_prio": 1, "max_word": 1}},
            {"$sort": {"tier": 1, "month": 1}},
        ],
    )
    return out


@q(
    "pl_densify_fill",
    oracle="""
        WITH daily AS (
            SELECT event_type, DATE_TRUNC('day', ts) AS day, COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ), span AS (
            SELECT event_type, MIN(day) AS lo, MAX(day) AS hi FROM daily GROUP BY 1
        ), grid AS (
            SELECT event_type, UNNEST(GENERATE_SERIES(lo, hi, INTERVAL 1 DAY)) AS day
            FROM span
        )
        SELECT g.event_type, g.day, CAST(COALESCE(d.n, 0) AS BIGINT) AS n
        FROM grid g LEFT JOIN daily d USING (event_type, day)
        ORDER BY g.event_type, g.day
    """,
)
def pl_densify_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$densify + $fill through the pipeline front end: per-event-type
    daily counts densified onto each type's full day grid (partition
    bounds, 1-day time step) with missing days filled as zero — Mongo's
    gap-filling stages compiled to sequence-explode + anti-join + union
    and a coalesce; the day grid is bounded by span/step, the joins are
    keyed by (type, day). Oracle: DuckDB GENERATE_SERIES left join."""
    ev = _t(spark, sf_dir, "events")
    out = compile_pipeline(
        ev,
        [
            {"$group": {"_id": {"event_type": "$event_type",
                                 "day": {"$dateTrunc": {"date": "$ts", "unit": "day"}}},
                        "n": {"$sum": 1}}},
            {"$project": {"_id": 0, "event_type": "$_id.event_type",
                          "day": "$_id.day", "n": 1}},
            {"$densify": {"field": "day", "partitionByFields": ["event_type"],
                           "range": {"step": 1, "unit": "day", "bounds": "partition"}}},
            {"$fill": {"output": {"n": {"value": 0}}}},
            {"$sort": {"event_type": 1, "day": 1}},
        ],
    )
    return out.select("event_type", "day", F.col("n").cast("long").alias("n"))
