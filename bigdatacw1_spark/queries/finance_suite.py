"""FX conversion + trader-limit entries over the reference's described-
but-unqueried data-model elements, mapped onto the driver tables.

Reference cites (/root/reference/Student_23098644/1.CourseworkOne/README.md):
  - line 32: daily ``exchange_rates`` normalizing the multi-currency
    ``price`` column (SQLQueries.sql:37 carries ``currency`` but the four
    reference queries never convert it) → ``f21_fx_convert``;
  - line 34: per-trader ``trader_limits`` → ``f22_trader_limit_breach``.

Neither table exists in the driver's testdata, so both entries DERIVE
them deterministically from lineitem/supplier with engine-identical
integer arithmetic (suppkey%3 currency tag, dayofyear-seeded rate in
thousandths, cents-quantized notionals) — the same derivation runs in
the DuckDB oracle, so values hash-compare bitwise.

Cross-engine notes:
  - All money flows through BIGINT (cents x rate-in-thousandths =
    "e5" units): integer sums are associative, so partition order can't
    flip a low digit the way double sums can.
  - The as-of semantics are oracle-checked with DuckDB's native
    ASOF LEFT JOIN; the Spark side runs the broadcast daily-calendar
    plan (operators/finance.convert_currency_daily) — same result, no
    shuffle of the fact side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatacw1_spark.operators.finance import convert_currency_daily, limit_breaches
from bigdatacw1_spark.queries.registry import q
from bigdatacw1_spark.queries.registry import t as _t

# currency tag + per-currency rate multiplier, shared by Spark and oracle
_CURRENCIES = [("USD", 11), ("EUR", 7), ("GBP", 9)]


def _fx_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem as a multi-currency price feed: currency from suppkey%3,
    amount quantized to integer cents."""
    li = _t(spark, sf_dir, "lineitem")
    m3 = F.col("l_suppkey") % 3
    cur = (
        F.when(m3 == 0, F.lit("USD")).when(m3 == 1, F.lit("EUR")).otherwise(F.lit("GBP"))
    )
    return li.select(
        cur.alias("currency"),
        F.to_date("l_shipdate").alias("price_day"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )


def _fx_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A sparse daily rates table: one rate per currency on every 5th
    day-of-year present in the data, value seeded from the date itself
    (1000 + dayofyear*m % 300, in thousandths) so both engines derive
    identical integers."""
    li = _t(spark, sf_dir, "lineitem")
    days = (
        li.select(F.to_date("l_shipdate").alias("rate_day"))
        .distinct()
        .where(F.dayofyear("rate_day") % 5 == 0)
    )
    curs = spark.createDataFrame(_CURRENCIES, "currency string, m int")
    # 3-row broadcast fan-out (bounded literal dim, not a data cross join)
    return days.crossJoin(F.broadcast(curs)).select(
        "currency",
        "rate_day",
        (F.lit(1000) + (F.dayofyear("rate_day") * F.col("m")) % 300).alias("rate_k"),
    )


@q(
    "f21_fx_convert",
    oracle="""
        WITH pr AS (
            SELECT CASE CAST(l_suppkey % 3 AS INT)
                        WHEN 0 THEN 'USD' WHEN 1 THEN 'EUR' ELSE 'GBP' END AS currency,
                   CAST(l_shipdate AS DATE) AS pday,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
            FROM lineitem
        ), d AS (
            SELECT DISTINCT CAST(l_shipdate AS DATE) AS rate_day FROM lineitem
        ), rd AS (
            SELECT c.currency, d.rate_day,
                   1000 + (dayofyear(d.rate_day) * c.m) % 300 AS rate_k
            FROM d, (VALUES ('USD', 11), ('EUR', 7), ('GBP', 9)) AS c(currency, m)
            WHERE dayofyear(d.rate_day) % 5 = 0
        )
        SELECT pr.currency,
               CAST(EXTRACT(year FROM pr.pday) AS INT) AS yr,
               COUNT(*) AS n_prices,
               COUNT(rd.rate_k) AS n_converted,
               CAST(SUM(pr.cents * rd.rate_k) AS BIGINT) AS converted_e5
        FROM pr ASOF LEFT JOIN rd
          ON pr.currency = rd.currency AND pr.pday >= rd.rate_day
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
)
def f21_fx_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FX-normalize a multi-currency price feed with the rate in effect
    on each price's day (reference README.md:32's exchange_rates model).

    Spark plan: densify the small rates side into a per-currency daily
    calendar and BROADCAST-join the fact side on (currency, day)
    (operators/finance.convert_currency_daily) — the 100 TB shape, since
    an as-of window keyed by ~10² currencies would serialize each
    currency into one task. Oracle: DuckDB's native ASOF LEFT JOIN —
    independent formulation, same semantics. Prices before their
    currency's first published rate stay NULL (left-outer) and are
    reported via n_prices vs n_converted."""
    conv = convert_currency_daily(
        _fx_prices(spark, sf_dir),
        _fx_rates(spark, sf_dir),
        currency_col="currency",
        amount_col="cents",
        price_day="price_day",
        rate_day="rate_day",
        rate_col="rate_k",
        horizon_days=30,
    )
    return (
        conv.groupBy("currency", F.year("price_day").cast("int").alias("yr"))
        .agg(
            F.count(F.lit(1)).alias("n_prices"),
            F.count("rate_k").alias("n_converted"),
            F.sum("converted").alias("converted_e5"),
        )
        .orderBy("currency", "yr")
    )


@q(
    "f22_trader_limit_breach",
    oracle="""
        WITH pos AS (
            SELECT l_suppkey AS trader_id,
                   date_trunc('month', l_shipdate) AS period,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                       AS notional_e2
            FROM lineitem
            GROUP BY 1, 2
        ), lim AS (
            SELECT s_suppkey AS trader_id, s_name,
                   5000000 + GREATEST(CAST(ROUND(s_acctbal * 100) AS BIGINT), 0) * 3000
                       AS limit_cents
            FROM supplier
        )
        SELECT p.trader_id, l.s_name, p.period, p.notional_e2, l.limit_cents,
               CAST(p.notional_e2 > l.limit_cents AS INT) AS is_breach,
               MAX(p.notional_e2) OVER
                   (PARTITION BY p.trader_id ORDER BY p.period) AS peak_notional,
               CASE WHEN p.notional_e2 > l.limit_cents THEN
                   COUNT(CASE WHEN p.notional_e2 > l.limit_cents THEN 1 END) OVER
                       (PARTITION BY p.trader_id ORDER BY p.period)
               END AS breach_seq
        FROM pos p JOIN lim l USING (trader_id)
        ORDER BY trader_id, period
    """,
)
def f22_trader_limit_breach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Limit-breach screen over the reference's trader_limits model
    (README.md:34): per-(trader, month) position notional vs a per-trader
    limit, with running peak exposure and a 1-based breach sequence per
    trader (operators/finance.limit_breaches). Trader = supplier, limit
    derived from s_acctbal in integer cents so both engines agree
    bitwise. Broadcast dim join + two windows sharing one (trader)
    sort — a single extra exchange beyond the positions aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    pos = (
        li.select(
            F.col("l_suppkey").alias("trader_id"),
            F.date_trunc("month", F.col("l_shipdate")).alias("period"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("trader_id", "period")
        .agg(F.sum("cents").alias("notional_e2"))
    )
    lim = sup.select(
        F.col("s_suppkey").alias("trader_id"),
        "s_name",
        (
            F.lit(5000000)
            + F.greatest(F.round(F.col("s_acctbal") * 100).cast("long"), F.lit(0)) * 3000
        ).alias("limit_cents"),
    )
    out = limit_breaches(
        pos,
        lim,
        trader_col="trader_id",
        period_col="period",
        notional_col="notional_e2",
        limit_col="limit_cents",
    )
    return out.select(
        "trader_id",
        "s_name",
        "period",
        "notional_e2",
        "limit_cents",
        F.col("is_breach").cast("int").alias("is_breach"),
        "peak_notional",
        "breach_seq",
    ).orderBy("trader_id", "period")


@q(
    "f25_historical_var",
    oracle="""
        WITH daily AS (
            SELECT user_id AS trader_id, DATE_TRUNC('day', ts) AS day,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS pnl_cents
            FROM events GROUP BY 1, 2
        ), wq AS (
            SELECT *, QUANTILE_CONT(pnl_cents, 0.05)
                          OVER (PARTITION BY trader_id) AS q05
            FROM daily
        )
        SELECT trader_id,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               FLOOR((MAX(q05) / 100.0) * 10000.0 + 0.5) / 10000.0 AS var95,
               FLOOR(((SUM(pnl_cents) FILTER (pnl_cents <= q05)
                       / CAST(COUNT(*) FILTER (pnl_cents <= q05) AS DOUBLE))
                      / 100.0) * 10000.0 + 0.5) / 10000.0 AS expected_shortfall
        FROM wq
        GROUP BY trader_id
        ORDER BY trader_id
    """,
)
def f25_historical_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical-simulation Value-at-Risk per trader — the classic
    risk analytic the reference's cash-equity domain stops short of:
    daily P&L in exact integer cents, VaR95 = the exact interpolated 5th
    percentile of the daily distribution (a15 percentile discipline:
    identical index = p*(n-1) interpolation in both engines over the
    same values), and expected shortfall = the exact-integer mean of the
    tail at-or-below VaR. The tail membership test compares integer
    cents to the shared percentile double, so the tail SET is identical
    cross-engine before any float math. Two grouped aggregates; the
    percentile's full per-group sort is day-bounded, not event-bounded."""
    from bigdatacw1_spark.operators.relational import stable_round

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("user_id").alias("trader_id"), F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("pnl_cents"))
    q05 = F.percentile("pnl_cents", F.lit(0.05))
    tail = F.col("pnl_cents") <= q05
    # Spark aggregates can't nest; compute the percentile once per group
    # via a window, then aggregate the tail in a second pass.
    from pyspark.sql import Window

    w = Window.partitionBy("trader_id")
    d = daily.withColumn("q05", q05.over(w))
    return (
        d.groupBy("trader_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.max("q05").alias("__q05"),
            F.sum(F.when(F.col("pnl_cents") <= F.col("q05"), F.col("pnl_cents"))).alias("__tail_sum"),
            F.count_if(F.col("pnl_cents") <= F.col("q05")).alias("__tail_n"),
        )
        .select(
            "trader_id",
            "n_days",
            stable_round(F.col("__q05") / 100.0, 4).alias("var95"),
            stable_round(
                (F.col("__tail_sum") / F.col("__tail_n").cast("double")) / 100.0, 4
            ).alias("expected_shortfall"),
        )
        .orderBy("trader_id")
    )


@q(
    "f26_max_drawdown",
    oracle="""
        WITH daily AS (
            SELECT user_id AS trader_id, DATE_TRUNC('day', ts) AS day,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS pnl_cents
            FROM events GROUP BY 1, 2
        ), path AS (
            SELECT trader_id, day,
                   SUM(pnl_cents) OVER (PARTITION BY trader_id ORDER BY day
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS cum
            FROM daily
        ), dd AS (
            SELECT trader_id, day,
                   MAX(cum) OVER (PARTITION BY trader_id ORDER BY day
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) - cum AS drawdown_cents
            FROM path
        )
        SELECT trader_id,
               CAST(MAX(drawdown_cents) AS BIGINT) AS max_drawdown_cents,
               ARG_MIN(day, -drawdown_cents * 10000000000
                            + CAST(FLOOR(EPOCH(day)) AS BIGINT)) AS trough_day
        FROM dd
        GROUP BY trader_id
        ORDER BY trader_id
    """,
)
def f26_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per trader — peak-to-trough loss along the
    cumulative P&L path, the risk statistic VaR misses (sequencing
    matters: the same daily distribution in a different order draws down
    differently). Running sum and running peak share one window sort;
    drawdown stays in exact integer cents end to end, and the trough day
    reports the EARLIEST day attaining the maximum (min_by with an
    integer key), so the answer is engine-exact with no float anywhere."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("user_id").alias("trader_id"), F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("pnl_cents"))
    w = (
        Window.partitionBy("trader_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    path = daily.withColumn("cum", F.sum("pnl_cents").over(w))
    dd = path.select(
        "trader_id",
        "day",
        (F.max("cum").over(w) - F.col("cum")).alias("drawdown_cents"),
    )
    return (
        dd.groupBy("trader_id")
        .agg(
            F.max("drawdown_cents").cast("long").alias("max_drawdown_cents"),
            F.min_by(
                "day",
                -F.col("drawdown_cents") * F.lit(10000000000)
                + F.unix_timestamp("day"),
            ).alias("trough_day"),
        )
        .orderBy("trader_id")
    )


@q(
    "f27_beta_covariance",
    oracle="""
        WITH daily AS (
            SELECT user_id AS trader_id, DATE_TRUNC('day', ts) AS day,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS x
            FROM events GROUP BY 1, 2
        ), market AS (
            SELECT day, SUM(x) AS y FROM daily GROUP BY day
        ), j AS (
            SELECT d.trader_id, d.x, m.y FROM daily d JOIN market m USING (day)
        ), moms AS (
            SELECT trader_id,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(x) AS sx, SUM(y) AS sy,
                   SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
            FROM j GROUP BY trader_id
        )
        SELECT trader_id, n AS n_days,
               FLOOR(((n * sxy - sx * sy) / CAST(n * syy - sy * sy AS DOUBLE))
                     * 10000.0 + 0.5) / 10000.0 AS beta,
               FLOOR(((n * sxy - sx * sy)
                      / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                             * CAST(n * syy - sy * sy AS DOUBLE)))
                     * 10000.0 + 0.5) / 10000.0 AS corr
        FROM moms
        WHERE n >= 2 AND n * sxx > sx * sx AND n * syy > sy * sy
        ORDER BY trader_id
    """,
)
def f27_beta_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-trader market beta and correlation — cov(trader P&L, market
    P&L)/var(market) over daily observations, the CAPM-style exposure
    number the reference's portfolio query is one step away from. ALL
    moments (n, Σx, Σy, Σxy, Σx², Σy²) are exact BIGINT cents
    cross-products, so summation order is irrelevant and the only
    floats are the final two divisions (+ one sqrt) — bit-identical
    cross-engine, then stable-rounded. The market series is a per-day
    aggregate (tiny, broadcast back onto trader-days); two keyed hash
    aggregates total. Degenerate traders (one active day or zero
    variance) are excluded by exact integer predicates, never by float
    comparison."""
    from bigdatacw1_spark.operators.relational import stable_round

    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    daily = (
        ev.groupBy(
            F.col("user_id").alias("trader_id"),
            F.date_trunc("day", "ts").alias("day"),
        )
        .agg(F.sum(cents).alias("x"))
    )
    market = daily.groupBy("day").agg(F.sum("x").alias("y"))
    j = daily.join(F.broadcast(market), "day")
    n = F.count(F.lit(1)).cast("long")
    moms = j.groupBy("trader_id").agg(
        n.alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    cov_n = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return (
        moms.where((F.col("n") >= 2) & (var_x > 0) & (var_y > 0))
        .select(
            "trader_id",
            F.col("n").alias("n_days"),
            stable_round(cov_n / var_y.cast("double"), 4).alias("beta"),
            stable_round(
                cov_n / F.sqrt(var_x.cast("double") * var_y.cast("double")), 4
            ).alias("corr"),
        )
        .orderBy("trader_id")
    )
