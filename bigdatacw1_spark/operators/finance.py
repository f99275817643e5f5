"""Financial operators over the reference's described-but-unqueried data
model: FX conversion against a daily rates table, and trader-limit breach
screening.

Reference cites (/root/reference/Student_23098644/1.CourseworkOne/README.md):
  - line 32: ``exchange_rates`` — daily FX rates used to normalize the
    multi-currency ``price`` column (SQLQueries.sql:37 selects
    ``currency`` alongside price but never converts it);
  - line 34: ``trader_limits`` — per-trader notional limits, never queried
    by the reference's four queries.

Both operators are pure DataFrame compositions (no Python UDFs):
``convert_currency`` is the as-of join from operators/relational (one
shuffle on currency+time, O(1) window state per row — scale notes there),
and ``limit_breaches`` is a broadcast dim join plus per-trader windows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigdatacw1_spark.operators.relational import as_of_join


def convert_currency(
    prices: DataFrame,
    rates: DataFrame,
    *,
    currency_col: str = "currency",
    amount_col: str = "amount",
    price_ts: str = "ts",
    rate_ts: str = "rate_ts",
    rate_col: str = "rate",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Normalize multi-currency amounts with the rate in effect at each
    price's timestamp: as-of join (greatest ``rate_ts <= price_ts`` per
    currency), then ``converted = amount * rate``.

    Left-outer semantics: a price before the first published rate for its
    currency keeps NULL ``rate``/``converted`` — surfacing the gap beats
    silently dropping the row. ``tolerance_seconds`` bounds staleness
    ("never use a rate older than N days"), per as_of_join.

    Scale: rates tables are small-but-not-tiny (currencies × days can
    reach millions of rows over decades) — the union+window as-of shape
    shuffles ONCE on currency regardless of either side's size, so it
    survives both a broadcastable rates table and a giant one.
    """
    out = as_of_join(
        prices,
        rates,
        on=[currency_col],
        left_ts=price_ts,
        right_ts=rate_ts,
        right_cols=[rate_col],
        tolerance_seconds=tolerance_seconds,
    )
    return out.withColumn("converted", F.col(amount_col) * F.col(rate_col))


def densify_daily_rates(
    rates: DataFrame,
    *,
    currency_col: str = "currency",
    day_col: str = "rate_day",
    rate_col: str = "rate",
    horizon_days: int = 366,
) -> DataFrame:
    """Expand a sparse daily rates table (one row per currency per
    PUBLISHED day) into a dense per-currency calendar with the rate
    forward-filled, from each currency's first published day through its
    last published day + ``horizon_days``.

    Input must be unique on (currency, day) — pre-aggregate multiple
    intraday publications upstream. Everything here runs on the SMALL
    side (currencies x days), so the per-currency window is cheap no
    matter how big the prices side is. ``horizon_days`` bounds trailing
    staleness: a price dated past the fill horizon finds no calendar row
    and surfaces as unconverted (NULL), the same failure mode a
    tolerance bound gives the generic as-of path.
    """
    bounds = rates.groupBy(currency_col).agg(
        F.min(day_col).alias("__d0"), F.max(day_col).alias("__d1")
    )
    cal = bounds.select(
        currency_col,
        F.explode(
            F.sequence(F.col("__d0"), F.date_add(F.col("__d1"), horizon_days))
        ).alias(day_col),
    )
    # Fill rate and its source day as ONE struct so both always come from
    # the same published row (they are null on exactly the same rows, but
    # a struct makes that invariant structural, not coincidental).
    pub = rates.withColumn("__pub", F.struct(F.col(rate_col), F.col(day_col).alias("src_day")))
    w = Window.partitionBy(currency_col).orderBy(day_col)
    return (
        cal.join(pub.select(currency_col, day_col, "__pub"), [currency_col, day_col], "left")
        .withColumn("__pub", F.last("__pub", ignorenulls=True).over(w))
        .select(
            currency_col,
            day_col,
            F.col(f"__pub.{rate_col}").alias(rate_col),
            F.col("__pub.src_day").alias("rate_src_day"),
        )
    )


def convert_currency_daily(
    prices: DataFrame,
    rates: DataFrame,
    *,
    currency_col: str = "currency",
    amount_col: str = "amount",
    price_day: str = "price_day",
    rate_day: str = "rate_day",
    rate_col: str = "rate",
    horizon_days: int = 366,
) -> DataFrame:
    """FX conversion against DAILY rates, planned for 100 TB prices.

    The generic ``convert_currency`` (as-of join) shuffles prices on the
    currency key — and currency cardinality is TINY (~10²), so at scale
    every partition's window runs as one long sequential task: a
    built-in skew bottleneck. When rates are daily (the reference's
    model — README.md:32), the same semantics decompose into:

      1. densify the SMALL rates side into a per-currency daily calendar
         with the rate forward-filled (``densify_daily_rates``);
      2. BROADCAST equi-join prices on (currency, day).

    No shuffle of the prices side at all — the 100 TB scan flows map-side
    through a broadcast hash join. Equivalent to as-of on day-truncated
    timestamps; `tests` pin equality against ``convert_currency``.

    Prices dated before their currency's first published rate (or past
    the fill horizon) keep NULL rate/converted — left-outer, surfacing
    gaps rather than dropping rows.
    """
    dense = densify_daily_rates(
        rates,
        currency_col=currency_col,
        day_col=rate_day,
        rate_col=rate_col,
        horizon_days=horizon_days,
    )
    dense = dense.withColumnRenamed(rate_day, price_day)
    out = prices.join(F.broadcast(dense), [currency_col, price_day], "left")
    return out.withColumn("converted", F.col(amount_col) * F.col(rate_col))


def limit_breaches(
    positions: DataFrame,
    limits: DataFrame,
    *,
    trader_col: str = "trader_id",
    period_col: str = "period",
    notional_col: str = "notional",
    limit_col: str = "limit_notional",
) -> DataFrame:
    """Screen per-(trader, period) position notionals against per-trader
    limits: attach the limit (broadcast dim join — limits is one row per
    trader), flag ``is_breach = notional > limit``, and add two windows
    per trader ordered by period:

      - ``peak_notional``: running max of notional (growing exposure);
      - ``breach_seq``: 1-based index of this breach among the trader's
        breaches in period order (NULL on non-breach rows) — "third
        month over the limit" screens directly on it.

    Inner join: a position row with no limit row is unscreenable and a
    data-quality question for the orphan audit (j10), not this screen.

    Scale: the join broadcasts the limits dim; both windows partition on
    the SAME trader key, so Catalyst plans one sort+shuffle reused by
    both — one exchange total beyond the aggregate that built positions.
    """
    joined = positions.join(F.broadcast(limits), trader_col, "inner")
    w = Window.partitionBy(trader_col).orderBy(period_col)
    is_breach = F.col(notional_col) > F.col(limit_col)
    return (
        joined.withColumn("is_breach", is_breach)
        .withColumn("peak_notional", F.max(notional_col).over(w))
        .withColumn(
            "breach_seq",
            F.when(
                F.col("is_breach"),
                F.count(F.when(F.col("is_breach"), F.lit(1))).over(w),
            ),
        )
    )
