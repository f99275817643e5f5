"""Spark-first ports of the four reference queries.

Reference: /root/reference/Student_23098644/1.CourseworkOne/
  - SQLQueries.sql   (2 PostgreSQL queries over schema cash_equity)
  - NoSQLQueries.js  (2 MongoDB aggregation pipelines over CourseworkOne)

Each function takes the input DataFrames as parameters (cash_equity /
securities shape, FIXTURES.md §A) so the same implementation runs against
test fixtures and any production-sized parquet of that shape. These are
NOT translations of the engines' execution plans — they re-express the
declared semantics in DataFrame operators and let Catalyst plan them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigdatacw1_spark.operators.relational import (
    argmin_per_group,
    comparison_case,
    group_dedup,
    having,
)


def sql1_sector_return_comparison(
    equity_static: DataFrame,
    equity_prices: DataFrame,
    countries: tuple[str, str] = ("US", "FR"),
) -> DataFrame:
    """SQL Query 1 (SQLQueries.sql:10-31): compare equity performance of two
    countries per GICS sector.

    Semantics: per (sector, country) average daily pct return, then pivot
    the two countries into columns, keep only sectors present in BOTH
    countries (HAVING count(distinct country) > 1 — SQLQueries.sql:30),
    and label which country won ('N/A' on NULL — null-rejecting CASE).

    Plan shape at scale: prices is the big fact; the static dim is small →
    Catalyst broadcasts it (no shuffle of prices for the join); the two
    groupBys shuffle on low-cardinality keys with map-side partial avg.
    """
    a, b = countries
    sector_return = (
        equity_static.join(
            equity_prices,
            equity_static["symbol"] == equity_prices["symbol_id"],
            "left",
        )
        .where(F.col("country").isin(a, b))
        .groupBy("gics_sector", "country")
        .agg(
            F.round(
                F.avg(((F.col("close_price") - F.col("open_price")) / F.col("open_price")) * 100),
                4,
            ).alias("daily_return")
        )
    )
    us_avg = F.avg(F.when(F.col("country") == a, F.col("daily_return")))
    fr_avg = F.avg(F.when(F.col("country") == b, F.col("daily_return")))
    agged = sector_return.groupBy("gics_sector").agg(
        F.round(us_avg, 4).alias("us_return"),
        F.round(fr_avg, 4).alias("fr_return"),
        comparison_case(us_avg, fr_avg, a, b, alias="comparison"),
        F.countDistinct("country").alias("__n_countries"),
    )
    return (
        having(agged, F.col("__n_countries") > 1)
        .drop("__n_countries")
        .orderBy("gics_sector")
    )


def sql2_fund_performance(
    equity_prices: DataFrame,
    portfolio_positions: DataFrame,
    trader_static: DataFrame,
    date_from: str = "2023-10-28",
    date_to: str = "2023-11-24",
) -> DataFrame:
    """SQL Query 2 (SQLQueries.sql:35-57): fund performance over a window,
    assuming positions are static.

    Mechanics preserved from the reference:
      - CTE portfolio_equity: date-bounded prices LEFT JOIN positions,
        group-deduplicated on all selected columns (SQLQueries.sql:37-43).
      - RIGHT JOIN back to prices on the compound key (cob_date, symbol)
        (SQLQueries.sql:48), LEFT JOIN trader dim (SQLQueries.sql:49).
      - trader <> 'null' — the literal string sentinel; SQL ``<>`` is also
        null-rejecting, so genuine NULL traders drop too (SURVEY.md §7.4.1):
        replicated as isNotNull() & != 'null'.
      - mark-to-market: close_price * net_quantity, pct change vs
        net_amount rounded to 4 (SQLQueries.sql:45-46).
      - final per-fund avg of amount_change, sorted desc (SQLQueries.sql:54-57).

    Scale: positions and trader_static are small dims → broadcast; the only
    shuffles are the dedup aggregate and the final groupBy. The right join
    key (cob_date, symbol) is the fact's natural key so AQE handles skew.
    """
    # positions carry their own cob_date (the 2023-10-27 change date,
    # README.md:33) — project it away so "cob_date" resolves to the price
    # date, as the reference's column references do (SQLQueries.sql:37).
    positions = portfolio_positions.select("trader", "symbol", "net_quantity", "net_amount")
    pe = (
        equity_prices.join(
            F.broadcast(positions),
            equity_prices["symbol_id"] == positions["symbol"],
            "left",
        )
        .where(F.col("cob_date").between(F.lit(date_from), F.lit(date_to)))
        .select("cob_date", "currency", "trader", "symbol", "net_amount", "net_quantity")
    )
    pe = group_dedup(pe, ["cob_date", "currency", "trader", "symbol", "net_amount", "net_quantity"])

    prices = equity_prices.select(
        F.col("cob_date").alias("ep_cob_date"),
        F.col("symbol_id").alias("ep_symbol"),
        "close_price",
    )
    tp = (
        pe.join(
            prices,
            (pe["cob_date"] == prices["ep_cob_date"]) & (pe["symbol"] == prices["ep_symbol"]),
            "right",
        )
        .join(
            F.broadcast(trader_static),
            pe["trader"] == trader_static["trader_id"],
            "left",
        )
        .where(F.col("trader").isNotNull() & (F.col("trader") != "null"))
        .select(
            "cob_date",
            "currency",
            "trader",
            "fund_name",
            "fund_focus",
            "trader_name",
            "symbol",
            "net_amount",
            "net_quantity",
            "close_price",
            (F.col("close_price") * F.col("net_quantity")).alias("new_net_amount"),
            F.round(
                ((F.col("close_price") * F.col("net_quantity")) - F.col("net_amount"))
                / F.col("net_amount")
                * 100,
                4,
            ).alias("amount_change"),
        )
    )
    tp = tp.dropDuplicates(
        ["cob_date", "currency", "trader", "fund_name", "fund_focus", "trader_name",
         "symbol", "net_amount", "net_quantity", "close_price"]
    )
    return (
        tp.groupBy("trader_name", "fund_name", "fund_focus")
        .agg(F.avg("amount_change").alias("average_change"))
        .orderBy(F.desc("average_change"))
    )


def nosql1_best_sector(securities: DataFrame, min_market_cap: float = 100000) -> DataFrame:
    """NoSQL Query 1 (NoSQLQueries.js:8-12): average price per GICS sector
    for securities with market cap above a threshold; return the best
    sector.

    Pipeline $match → $group $avg → $sort desc → $limit 1 maps 1:1 onto
    filter → groupBy.avg → orderBy.limit; Catalyst fuses the sort+limit
    into TakeOrderedAndProject (no global sort). Tie-break on sector name
    for determinism (Mongo's result under ties is insertion-order-defined).

    MarketCap is a mixed-type field (number | "NA" | null,
    NoSQLQueries.js:30-33): Mongo's ``$gt`` type-brackets non-numbers out
    of the comparison, replicated here with try_cast (NULL > x is never
    true) — a plain cast would throw under ANSI mode.
    """
    return (
        securities.where(_clean_numeric("MarketData.MarketCap") > min_market_cap)
        .groupBy(F.col("StaticData.GICSSector").alias("_id"))
        .agg(F.avg("MarketData.Price").alias("average"))
        .orderBy(F.desc("average"), F.asc("_id"))
        .limit(1)
    )


def _clean_numeric(col: str) -> F.Column:
    """Mixed-type sentinel ingest (SURVEY.md §7.4.1): the Mongo fields hold
    number | "NA" | null (NoSQLQueries.js:30-33). Fixtures carry them as
    strings; try_cast maps both "NA" and null to NULL — exactly the rows
    ``$nin: ["NA", null]`` excludes."""
    return F.col(col).try_cast("double")


def nosql2_security_screening(securities: DataFrame) -> DataFrame:
    """NoSQL Query 2 (NoSQLQueries.js:28-51): per-sector security screening.

    Declared semantics (README.md:188-237): drop NA/null metrics; compute
    sector averages of MarketCap, PERatio, DividendYield; keep securities
    above ALL three averages; pick the lowest-Beta survivor per sector.

    Spark-first: instead of Mongo's $group+$push (materialize the whole
    sector as an array) + $filter + $arrayElemAt, we use average-over-
    partition windows and a row_number argmin — one shuffle on sector, no
    per-group array, which is what survives a sector with 10^8 members at
    100 TB. Ties on Beta break on Symbol (SURVEY.md §7.4.2).

    Output: one row per sector that has a qualifying security:
    (_id, symbol, beta).
    """
    cleaned = securities.select(
        F.col("Symbol").alias("symbol"),
        F.col("StaticData.GICSSector").alias("_id"),
        _clean_numeric("MarketData.MarketCap").alias("market_cap"),
        _clean_numeric("MarketData.Beta").alias("beta"),
        _clean_numeric("FinancialRatios.DividendYield").alias("dividend_yield"),
        _clean_numeric("FinancialRatios.PERatio").alias("pe_ratio"),
    ).where(
        F.col("market_cap").isNotNull()
        & F.col("beta").isNotNull()
        & F.col("dividend_yield").isNotNull()
        & F.col("pe_ratio").isNotNull()
    )
    w = Window.partitionBy("_id")
    screened = (
        cleaned.withColumn("avg_mcap", F.avg("market_cap").over(w))
        .withColumn("avg_pe", F.avg("pe_ratio").over(w))
        .withColumn("avg_dy", F.avg("dividend_yield").over(w))
        .where(
            (F.col("market_cap") > F.col("avg_mcap"))
            & (F.col("pe_ratio") > F.col("avg_pe"))
            & (F.col("dividend_yield") > F.col("avg_dy"))
        )
    )
    return (
        argmin_per_group(screened, ["_id"], [F.asc("beta"), F.asc("symbol")])
        .select("_id", "symbol", "beta")
        .orderBy("_id")
    )


def nosql2_security_screening_hof(securities: DataFrame) -> DataFrame:
    """Literal translation of the NoSQL2 pipeline shape, kept as coverage
    for the array operators the reference uses: $push ⇒
    collect_list(struct) (A8), $filter with lambda ⇒ F.filter higher-order
    function (F5), $arrayElemAt ⇒ element_at (F6) — NoSQLQueries.js:40-47.

    collect_list order is nondeterministic in Spark, so we sort_array the
    collected structs with beta as the leading field before element_at —
    this reproduces Mongo's $sort-then-$first with a defined total order.
    Same output as nosql2_security_screening.

    NOTE: this materializes each sector as an in-memory array — correct,
    but the window variant above is the one to run at scale.
    """
    cleaned = securities.select(
        F.col("Symbol").alias("symbol"),
        F.col("StaticData.GICSSector").alias("_id"),
        _clean_numeric("MarketData.MarketCap").alias("market_cap"),
        _clean_numeric("MarketData.Beta").alias("beta"),
        _clean_numeric("FinancialRatios.DividendYield").alias("dividend_yield"),
        _clean_numeric("FinancialRatios.PERatio").alias("pe_ratio"),
    ).where(
        F.col("market_cap").isNotNull()
        & F.col("beta").isNotNull()
        & F.col("dividend_yield").isNotNull()
        & F.col("pe_ratio").isNotNull()
    )
    grouped = cleaned.groupBy("_id").agg(
        F.avg("pe_ratio").alias("avg_pe"),
        F.avg("dividend_yield").alias("avg_dy"),
        F.avg("market_cap").alias("avg_mcap"),
        F.collect_list(
            F.struct(
                F.col("beta").alias("beta"),
                F.col("symbol").alias("symbol"),
                F.col("market_cap").alias("market_cap"),
                F.col("pe_ratio").alias("pe_ratio"),
                F.col("dividend_yield").alias("dividend_yield"),
            )
        ).alias("securities"),
    )
    chosen = grouped.select(
        "_id",
        F.try_element_at(
            F.filter(
                F.sort_array(F.col("securities")),
                lambda s: (s["market_cap"] > F.col("avg_mcap"))
                & (s["pe_ratio"] > F.col("avg_pe"))
                & (s["dividend_yield"] > F.col("avg_dy")),
            ),
            F.lit(1),
        ).alias("chosen"),
    )
    return (
        chosen.where(F.col("chosen").isNotNull())
        .select("_id", F.col("chosen.symbol").alias("symbol"), F.col("chosen.beta").alias("beta"))
        .orderBy("_id")
    )
