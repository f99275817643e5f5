"""Verbatim psql-script front end (bigdatacw1_spark/sqlfile.py): the
reference's ACTUAL SQLQueries.sql — read from the read-only reference
checkout at test time, never copied into this repo — must run UNCHANGED
through run_sql_script and reproduce the hand ports' results on the same
cash_equity-shaped fixtures. The relational analogue of
tests/test_pipeline.py's verbatim Mongo-pipeline runs."""

from __future__ import annotations

import datetime
import os

import pytest

from bigdatacw1_spark.queries.reference import (
    sql1_sector_return_comparison,
    sql2_fund_performance,
)
from bigdatacw1_spark.sqlfile import run_sql_script, split_statements

REFERENCE_SQL = "/root/reference/Student_23098644/1.CourseworkOne/SQLQueries.sql"


def test_split_statements_honors_quotes_and_comments():
    script = """
-- a comment; with a semicolon
set search_path = cash_equity, "$user", public;
select 'a;b' as s /* block; comment */ from t;
select 1
"""
    stmts = split_statements(script)
    assert len(stmts) == 3
    assert "search_path" in stmts[0]
    assert "'a;b'" in stmts[1]
    assert stmts[2].strip() == "select 1"


@pytest.fixture(scope="module")
def cash_equity(spark):
    d0 = datetime.date(2023, 10, 27)
    static_rows = [
        ("AAA", "Alpha", "Tech", "Software", "US", "NA"),
        ("BBB", "Beta", "Tech", "Software", "FR", "EU"),
        ("CCC", "Gamma", "Energy", "Oil", "US", "NA"),
        ("DDD", "Delta", "Energy", "Oil", "FR", "EU"),
        ("EEE", "Eps", "Util", "Power", "US", "NA"),  # US-only → HAVING drops
        ("GGG", "Eta", "Financials", "Banks", "DE", "EU"),  # non-US/FR noise
    ]
    equity_static = spark.createDataFrame(
        static_rows,
        "symbol string, security_name string, gics_sector string, gics_industry string, country string, region string",
    )
    series = {
        "AAA": (100.0, 103.0),
        "BBB": (100.0, 101.0),
        "CCC": (100.0, 101.0),
        "DDD": (100.0, 102.0),
        "EEE": (100.0, 100.5),
        "GGG": (100.0, 110.0),
    }
    price_rows = []
    for day in range(35):
        d = d0 + datetime.timedelta(days=day)
        for sym, (o, c) in series.items():
            price_rows.append((sym, d, o, c, 1000, "USD"))
    equity_prices = spark.createDataFrame(
        price_rows,
        "symbol_id string, cob_date date, open_price double, close_price double, volume long, currency string",
    )
    pos_rows = [
        (1, d0, "T1", "AAA", 10.0, 1000.0),
        (2, d0, "T1", "CCC", 5.0, 450.0),
        (3, d0, "T2", "DDD", -4.0, -380.0),
        (4, d0, "null", "EEE", 7.0, 700.0),  # sentinel → dropped
        (5, d0, None, "GGG", 3.0, 290.0),  # real NULL → dropped
    ]
    portfolio_positions = spark.createDataFrame(
        pos_rows,
        "pos_id long, cob_date date, trader string, symbol string, net_quantity double, net_amount double",
    )
    trader_static = spark.createDataFrame(
        [
            ("T1", "Dan Green", "Global Tech", "HF", "Tech"),
            ("T2", "Matt Red", "Euro Momentum", "HF", "Momentum"),
        ],
        "trader_id string, trader_name string, fund_name string, fund_type string, fund_focus string",
    )
    return {
        "equity_static": equity_static,
        "equity_prices": equity_prices,
        "portfolio_positions": portfolio_positions,
        "trader_static": trader_static,
    }


def _rows_ci(df):
    """Rows keyed by lowercase column name, order-insensitive. Floats
    round to 9 digits: the scripts' own outputs are rounded to 4, but
    SQL2's final avg(amount_change) is UN-rounded in the reference SQL,
    and the verbatim plan's partial-agg merge order differs from the
    port's — a last-ulp difference that is plan-order noise, not
    semantics."""
    cols = [c.lower() for c in df.columns]
    return sorted(
        tuple(
            (c, round(v, 9) if isinstance(v, float) else v)
            for c, v in zip(cols, r)
        )
        for r in df.collect()
    )


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_SQL), reason="reference checkout not present"
)
def test_reference_sql_script_runs_verbatim(spark, cash_equity):
    """The reference's SQLQueries.sql, read VERBATIM from the read-only
    checkout at test time (never copied into this repo), must produce the
    same results as the native ports.

    Environmental skip rationale: the reference checkout lives at
    /root/reference outside this repo; on a machine without that checkout
    (e.g. a bare CI clone) there is nothing to read, so the skip is the
    only correct behavior — the same queries are still pinned by the
    native ports and the golden fixtures, which always run."""
    script = open(REFERENCE_SQL).read()
    results = run_sql_script(spark, script, tables=cash_equity)
    assert len(results) == 2  # search_path consumed, two queries executed
    got1, got2 = results
    want1 = sql1_sector_return_comparison(
        cash_equity["equity_static"], cash_equity["equity_prices"]
    )
    want2 = sql2_fund_performance(
        cash_equity["equity_prices"],
        cash_equity["portfolio_positions"],
        cash_equity["trader_static"],
    )
    assert _rows_ci(got1) == _rows_ci(want1)
    assert len(got1.take(1)) == 1  # non-degenerate: HAVING kept something
    assert _rows_ci(got2) == _rows_ci(want2)
    assert len(got2.take(1)) == 1
