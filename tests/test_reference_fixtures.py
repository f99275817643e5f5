"""End-to-end tests of the four reference-query ports on cash_equity-shaped
fixtures (FIXTURES.md §A), asserting the invariants the reference README
documents as golden outputs (SURVEY.md §5):

  SQL1   — sectors present in only one country are excluded by the HAVING
           (README.md:92); comparison labels match a Python oracle.
  SQL2   — 'null'-string and NULL traders are dropped (SQLQueries.sql:50);
           one row per fund, sorted by average change desc.
  NoSQL1 — single best sector by avg price over the MarketCap threshold
           (README.md:181-182).
  NoSQL2 — 'NA'/null metrics excluded (README.md:196); sectors where no
           security passes all screens yield no row (README.md:239);
           lowest-Beta tie breaks deterministically on Symbol; the
           window variant and the literal HOF variant agree.
"""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import Row

from bigdatacw1_spark.queries.reference import (
    nosql1_best_sector,
    nosql2_security_screening,
    nosql2_security_screening_hof,
    sql1_sector_return_comparison,
    sql2_fund_performance,
)


@pytest.fixture(scope="module")
def equity_static(spark):
    rows = [
        # sector Tech present in US only → must be excluded by HAVING
        ("AAA", "Alpha", "Tech", "Software", "US", "NA"),
        ("BBB", "Beta", "Tech", "Software", "US", "NA"),
        ("CCC", "Gamma", "Energy", "Oil", "US", "NA"),
        ("DDD", "Delta", "Energy", "Oil", "FR", "EU"),
        ("EEE", "Eps", "Financials", "Banks", "US", "NA"),
        ("FFF", "Zeta", "Financials", "Banks", "FR", "EU"),
        ("GGG", "Eta", "Financials", "Banks", "DE", "EU"),  # non-US/FR noise
    ]
    return spark.createDataFrame(
        rows, "symbol string, security_name string, gics_sector string, gics_industry string, country string, region string"
    )


@pytest.fixture(scope="module")
def equity_prices(spark):
    d0 = datetime.date(2023, 10, 27)
    rows = []
    # symbol -> (open, close) pairs per day; deterministic drift
    series = {
        "AAA": (100.0, 101.0),  # +1%
        "BBB": (100.0, 103.0),  # +3%
        "CCC": (100.0, 102.0),  # US Energy +2%
        "DDD": (100.0, 101.0),  # FR Energy +1%  → US wins Energy
        "EEE": (100.0, 100.5),  # US Fin +0.5%
        "FFF": (100.0, 102.0),  # FR Fin +2%     → FR wins Financials
        "GGG": (100.0, 110.0),  # DE noise
    }
    for day in range(30):
        d = d0 + datetime.timedelta(days=day)
        for sym, (o, c) in series.items():
            rows.append((sym, d, o, c, 1000, "USD"))
    return spark.createDataFrame(
        rows, "symbol_id string, cob_date date, open_price double, close_price double, volume long, currency string"
    )


@pytest.fixture(scope="module")
def portfolio_positions(spark):
    d = datetime.date(2023, 10, 27)
    rows = [
        (1, d, "T1", "AAA", 10.0, 1000.0),
        (2, d, "T1", "CCC", 5.0, 450.0),
        (3, d, "T2", "DDD", -4.0, -380.0),
        (4, d, "null", "EEE", 7.0, 700.0),  # literal sentinel → dropped
        (5, d, None, "FFF", 3.0, 290.0),    # real NULL → dropped
    ]
    return spark.createDataFrame(
        rows, "pos_id long, cob_date date, trader string, symbol string, net_quantity double, net_amount double"
    )


@pytest.fixture(scope="module")
def trader_static(spark):
    rows = [
        ("T1", "Dan Green", "Global Tech", "HF", "Tech"),
        ("T2", "Matt Red", "Euro Momentum", "HF", "Momentum"),
    ]
    return spark.createDataFrame(
        rows, "trader_id string, trader_name string, fund_name string, fund_type string, fund_focus string"
    )


def _sec(symbol, sector, price, mcap, beta, dy, pe):
    return Row(
        Symbol=symbol,
        StaticData=Row(SecurityName=symbol, SECFilings="10-K", GICSSector=sector, GICSSubIndustry="x"),
        MarketData=Row(Price=price, MarketCap=mcap, Beta=beta),
        FinancialRatios=Row(DividendYield=dy, PERatio=pe, PayoutRatio=0.5),
    )


@pytest.fixture(scope="module")
def securities(spark):
    # NA-able numerics carried as strings (FIXTURES.md: 'NA-able double')
    rows = [
        # Tech: S1 above all averages (vs S2/S3), lowest beta among (only) qualifier
        _sec("S1", "Tech", 50.0, "200000", "1.1", "3.0", "30.0"),
        _sec("S2", "Tech", 30.0, "100000", "1.5", "1.0", "10.0"),
        _sec("S3", "Tech", 10.0, "50000", "0.9", "1.5", "12.0"),
        # Energy: E1/E2 tie on beta → symbol breaks the tie; E1 qualifies
        _sec("E1", "Energy", 80.0, "300000", "1.2", "4.0", "20.0"),
        _sec("E2", "Energy", 70.0, "250000", "1.2", "3.5", "18.0"),
        _sec("E3", "Energy", 20.0, "100000", "0.8", "1.0", "5.0"),
        # Util: nobody beats every average → no output row
        _sec("U1", "Util", 40.0, "100000", "1.0", "2.0", "10.0"),
        _sec("U2", "Util", 40.0, "100000", "1.0", "2.0", "10.0"),
        # NA/null rows must be excluded everywhere
        _sec("N1", "Tech", 99.0, "NA", "1.0", "2.0", "10.0"),
        _sec("N2", "Energy", 99.0, None, "1.0", "2.0", "10.0"),
    ]
    return spark.createDataFrame(rows)


def test_sql1_sql_text_front_end_matches_dataframe_port(spark, equity_static, equity_prices):
    """SURVEY.md §3.3: the same analysis through the SQL front end (the
    reference's original dialect, SQLQueries.sql:10-31) and through the
    DataFrame port must produce identical rows — one Catalyst plan, two
    dialects."""
    equity_static.createOrReplaceTempView("equity_static_v")
    equity_prices.createOrReplaceTempView("equity_prices_v")
    sql_res = spark.sql(
        """
        WITH sector_return AS (
            SELECT gics_sector, country,
                   ROUND(AVG(((close_price - open_price) / open_price) * 100), 4) AS daily_return
            FROM equity_static_v
            LEFT JOIN equity_prices_v ON symbol = symbol_id
            WHERE country IN ('US', 'FR')
            GROUP BY gics_sector, country
        )
        SELECT gics_sector,
               ROUND(AVG(CASE WHEN country = 'US' THEN daily_return END), 4) AS us_return,
               ROUND(AVG(CASE WHEN country = 'FR' THEN daily_return END), 4) AS fr_return,
               CASE WHEN AVG(CASE WHEN country = 'US' THEN daily_return END)
                         > AVG(CASE WHEN country = 'FR' THEN daily_return END) THEN 'US'
                    WHEN AVG(CASE WHEN country = 'US' THEN daily_return END)
                         < AVG(CASE WHEN country = 'FR' THEN daily_return END) THEN 'FR'
                    ELSE 'N/A' END AS comparison
        FROM sector_return
        GROUP BY gics_sector
        HAVING COUNT(DISTINCT country) > 1
        ORDER BY gics_sector
        """
    )
    df_res = sql1_sector_return_comparison(equity_static, equity_prices)
    assert [tuple(r) for r in sql_res.collect()] == [tuple(r) for r in df_res.collect()]


def test_sql1_having_excludes_single_country_sectors(spark, equity_static, equity_prices):
    out = sql1_sector_return_comparison(equity_static, equity_prices).collect()
    sectors = [r["gics_sector"] for r in out]
    assert "Tech" not in sectors  # US-only sector (README.md:92 invariant)
    assert sectors == ["Energy", "Financials"]
    by = {r["gics_sector"]: r for r in out}
    assert by["Energy"]["comparison"] == "US"       # +2% vs +1%
    assert by["Financials"]["comparison"] == "FR"   # +0.5% vs +2%
    assert by["Energy"]["us_return"] == pytest.approx(2.0, abs=1e-4)
    assert by["Energy"]["fr_return"] == pytest.approx(1.0, abs=1e-4)


def test_sql2_sentinel_traders_dropped_and_sorted(spark, equity_prices, portfolio_positions, trader_static):
    out = sql2_fund_performance(equity_prices, portfolio_positions, trader_static).collect()
    names = [r["trader_name"] for r in out]
    assert set(names) == {"Dan Green", "Matt Red"}  # 'null' + NULL traders gone
    changes = [r["average_change"] for r in out]
    assert changes == sorted(changes, reverse=True)
    # mark-to-market check for T1/AAA: close 101 * qty 10 vs amount 1000 → +1%
    # T1 holds AAA (+1%) and CCC (close 102*5=510 vs 450 → +13.3333%)
    dan = next(r for r in out if r["trader_name"] == "Dan Green")
    assert dan["average_change"] == pytest.approx((1.0 + 13.3333) / 2, abs=1e-3)


def test_nosql1_top_sector(spark, securities):
    out = nosql1_best_sector(securities, min_market_cap=100000).collect()
    assert len(out) == 1
    # above threshold (>100000): S1 (Tech, 50), E1 (80), E2 (70) → Energy avg 75 > Tech 50
    assert out[0]["_id"] == "Energy"
    assert out[0]["average"] == pytest.approx(75.0)


def test_nosql2_screening_golden_shape(spark, securities):
    out = nosql2_security_screening(securities).collect()
    by = {r["_id"]: r for r in out}
    assert set(by) == {"Tech", "Energy"}      # Util yields no qualifier
    assert by["Tech"]["symbol"] == "S1"
    assert by["Energy"]["symbol"] == "E1"     # beta tie 1.2/1.2 → symbol asc
    assert by["Energy"]["beta"] == pytest.approx(1.2)


def test_nosql2_hof_variant_agrees(spark, securities):
    a = sorted(map(tuple, nosql2_security_screening(securities).collect()))
    b = sorted(map(tuple, nosql2_security_screening_hof(securities).collect()))
    assert a == b


def test_sql2_sql_text_front_end_matches_dataframe_port(
    spark, equity_prices, portfolio_positions, trader_static
):
    """SURVEY.md §3.3 for the HARDEST reference query (SQLQueries.sql:35-57):
    nested CTEs, RIGHT JOIN on the compound (cob_date, symbol) key,
    group-by-as-dedup, string-sentinel trader filter, two-stage
    aggregation — the verbatim SQL dialect and the DataFrame port must
    produce the same rows from one Catalyst planner."""
    equity_prices.createOrReplaceTempView("ep_v")
    portfolio_positions.createOrReplaceTempView("pp_v")
    trader_static.createOrReplaceTempView("ts_v")
    sql_res = spark.sql(
        """
        WITH portfolio_equity AS (
            SELECT ep.cob_date, ep.currency, pp.trader, pp.symbol,
                   pp.net_amount, pp.net_quantity
            FROM ep_v ep
            LEFT JOIN pp_v pp ON ep.symbol_id = pp.symbol
            WHERE ep.cob_date BETWEEN '2023-10-28' AND '2023-11-24'
            GROUP BY ep.cob_date, ep.currency, pp.trader, pp.symbol,
                     pp.net_amount, pp.net_quantity
        ), trader_performance AS (
            SELECT pe.cob_date, pe.currency, pe.trader, ts.fund_name,
                   ts.fund_focus, ts.trader_name, pe.symbol, pe.net_amount,
                   pe.net_quantity, ep.close_price,
                   ep.close_price * pe.net_quantity AS new_net_amount,
                   ROUND(((ep.close_price * pe.net_quantity) - pe.net_amount)
                         / pe.net_amount * 100, 4) AS amount_change
            FROM portfolio_equity pe
            RIGHT JOIN ep_v ep
              ON pe.cob_date = ep.cob_date AND pe.symbol = ep.symbol_id
            LEFT JOIN ts_v ts ON pe.trader = ts.trader_id
            WHERE pe.trader IS NOT NULL AND pe.trader <> 'null'
            GROUP BY pe.cob_date, pe.currency, pe.trader, ts.fund_name,
                     ts.fund_focus, ts.trader_name, pe.symbol, pe.net_amount,
                     pe.net_quantity, ep.close_price
        )
        SELECT trader_name, fund_name, fund_focus,
               AVG(amount_change) AS average_change
        FROM trader_performance
        GROUP BY trader_name, fund_name, fund_focus
        ORDER BY average_change DESC
        """
    )
    df_res = sql2_fund_performance(equity_prices, portfolio_positions, trader_static)
    assert sorted(tuple(r) for r in sql_res.collect()) == sorted(
        tuple(r) for r in df_res.collect()
    )
