"""Finance operator tests: FX conversion (both physical plans agree) and
trader-limit breach screening."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from bigdatacw1_spark.operators.finance import (
    convert_currency,
    convert_currency_daily,
    densify_daily_rates,
    limit_breaches,
)


def _d(y, m, d):
    return datetime.date(y, m, d)


def _rates(spark):
    # sparse publications: EUR on the 1st and 10th, GBP only on the 5th
    return spark.createDataFrame(
        [
            ("EUR", _d(2024, 1, 1), 1.10),
            ("EUR", _d(2024, 1, 10), 1.20),
            ("GBP", _d(2024, 1, 5), 1.30),
        ],
        "currency string, rate_day date, rate double",
    )


def _prices(spark):
    return spark.createDataFrame(
        [
            (1, "EUR", _d(2024, 1, 1), 100.0),   # on a publication day
            (2, "EUR", _d(2024, 1, 9), 100.0),   # gap: forward-fills 1.10
            (3, "EUR", _d(2024, 1, 10), 100.0),  # new rate that day: 1.20
            (4, "EUR", _d(2024, 1, 31), 100.0),  # trailing fill: 1.20
            (5, "GBP", _d(2024, 1, 2), 100.0),   # before first GBP rate: NULL
            (6, "GBP", _d(2024, 1, 7), 100.0),   # 1.30
            (7, "CHF", _d(2024, 1, 7), 100.0),   # currency with no rates: NULL
        ],
        "pid int, currency string, price_day date, amount double",
    )


def test_densify_forward_fills_and_bounds_horizon(spark):
    dense = densify_daily_rates(_rates(spark), horizon_days=3).collect()
    by = {(r.currency, r.rate_day): (r.rate, r.rate_src_day) for r in dense}
    assert by[("EUR", _d(2024, 1, 4))] == (1.10, _d(2024, 1, 1))
    assert by[("EUR", _d(2024, 1, 10))] == (1.20, _d(2024, 1, 10))
    assert by[("EUR", _d(2024, 1, 13))] == (1.20, _d(2024, 1, 10))
    assert ("EUR", _d(2024, 1, 14)) not in by  # horizon ends the calendar
    assert ("GBP", _d(2024, 1, 4)) not in by  # before first publication
    assert by[("GBP", _d(2024, 1, 8))] == (1.30, _d(2024, 1, 5))


def test_convert_currency_daily_rates_and_nulls(spark):
    out = convert_currency_daily(_prices(spark), _rates(spark), horizon_days=31)
    rnd = lambda v: None if v is None else round(v, 6)
    got = {r.pid: (r.rate, rnd(r.converted)) for r in out.collect()}
    assert got[1] == (1.10, 110.0)
    assert got[2] == (1.10, 110.0)
    assert got[3] == (1.20, 120.0)
    assert got[4] == (1.20, 120.0)
    assert got[5] == (None, None)  # price precedes first GBP rate
    assert got[6] == (1.30, 130.0)
    assert got[7] == (None, None)  # no rates for CHF at all
    assert out.count() == 7  # left-outer: every price row survives


def test_daily_plan_matches_generic_asof_plan(spark):
    """The broadcast daily-calendar plan and the generic as-of join are
    two physical strategies for the same semantics — results must agree
    row for row (given day-granularity timestamps on both sides)."""
    daily = convert_currency_daily(_prices(spark), _rates(spark), horizon_days=31)
    generic = convert_currency(
        _prices(spark).withColumn("ts", F.col("price_day").cast("timestamp")),
        _rates(spark).withColumn("rate_ts", F.col("rate_day").cast("timestamp")),
    )
    a = {r.pid: (r.rate, r.converted) for r in daily.collect()}
    b = {r.pid: (r.rate, r.converted) for r in generic.collect()}
    assert a == b


def test_daily_plan_broadcasts_and_never_shuffles_prices(spark):
    """The 100 TB contract: the fact side flows through a broadcast hash
    join with no Exchange between scan and join."""
    out = convert_currency_daily(_prices(spark), _rates(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_limit_breaches_windows_and_sequence(spark):
    pos = spark.createDataFrame(
        [
            (1, "2024-01", 50), (1, "2024-02", 150), (1, "2024-03", 120),
            (1, "2024-04", 200), (2, "2024-01", 10),
        ],
        "trader_id int, period string, notional long",
    )
    lim = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100)], "trader_id int, limit_n long"
    )
    out = limit_breaches(
        pos, lim, trader_col="trader_id", period_col="period",
        notional_col="notional", limit_col="limit_n",
    )
    rows = {(r.trader_id, r.period): r for r in out.collect()}
    assert len(rows) == 5  # inner join keeps screened traders only
    assert rows[(1, "2024-01")].is_breach is False
    assert rows[(1, "2024-01")].breach_seq is None
    assert rows[(1, "2024-02")].breach_seq == 1
    assert rows[(1, "2024-03")].breach_seq == 2
    assert rows[(1, "2024-04")].breach_seq == 3
    assert rows[(1, "2024-03")].peak_notional == 150  # running max, not global
    assert rows[(1, "2024-04")].peak_notional == 200
    assert rows[(2, "2024-01")].is_breach is False


def test_limit_breaches_single_exchange_for_both_windows(spark):
    """Both windows partition on the same trader key: the plan must
    contain exactly one Window-feeding Exchange beyond the inputs."""
    pos = spark.createDataFrame([(1, "a", 5)], "trader_id int, period string, notional long")
    lim = spark.createDataFrame([(1, 10)], "trader_id int, limit_n long")
    out = limit_breaches(
        pos, lim, trader_col="trader_id", period_col="period",
        notional_col="notional", limit_col="limit_n",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") <= 2  # may fuse; never two sort+shuffle pairs
    assert "BroadcastHashJoin" in plan
