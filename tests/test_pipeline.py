"""Pipeline front-end tests: the reference's ACTUAL NoSQL aggregation
pipelines (NoSQLQueries.js, transcribed stage-for-stage to Python dicts)
must run through compile_pipeline and reproduce the hand-ported queries'
results — the strongest possible parity statement for the document-side
user: their pipeline text executes on this engine unchanged."""

from __future__ import annotations

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from bigdatacw1_spark.pipeline import compile_pipeline
from bigdatacw1_spark.queries.reference import (
    nosql1_best_sector,
    nosql2_security_screening,
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
    rows = [
        _sec("S1", "Tech", 50.0, "200000", "1.1", "3.0", "30.0"),
        _sec("S2", "Tech", 30.0, "100000", "1.5", "1.0", "10.0"),
        _sec("S3", "Tech", 10.0, "50000", "0.9", "1.5", "12.0"),
        _sec("E1", "Energy", 80.0, "300000", "1.2", "4.0", "20.0"),
        _sec("E2", "Energy", 70.0, "250000", "1.2", "3.5", "18.0"),
        _sec("E3", "Energy", 20.0, "100000", "0.8", "1.0", "5.0"),
        _sec("U1", "Util", 40.0, "100000", "1.0", "2.0", "10.0"),
        _sec("U2", "Util", 40.0, "100000", "1.0", "2.0", "10.0"),
        _sec("N1", "Tech", 99.0, "NA", "1.0", "2.0", "10.0"),
        _sec("N2", "Energy", 99.0, None, "1.0", "2.0", "10.0"),
    ]
    return spark.createDataFrame(rows)


# NoSQLQueries.js:8-12, stage for stage
NOSQL1_PIPELINE = [
    {"$match": {"MarketData.MarketCap": {"$gt": 100000}}},
    {"$group": {"_id": "$StaticData.GICSSector", "average": {"$avg": "$MarketData.Price"}}},
    {"$sort": {"average": -1}},
    {"$limit": 1},
]

# NoSQLQueries.js:28-51, stage for stage
NOSQL2_PIPELINE = [
    {"$match": {
        "MarketData.MarketCap": {"$nin": ["NA", None]},
        "MarketData.Beta": {"$nin": ["NA", None]},
        "FinancialRatios.DividendYield": {"$nin": ["NA", None]},
        "FinancialRatios.PERatio": {"$nin": ["NA", None]},
    }},
    {"$group": {
        "_id": "$StaticData.GICSSector",
        "avgPE": {"$avg": "$FinancialRatios.PERatio"},
        "avgDY": {"$avg": "$FinancialRatios.DividendYield"},
        "avgMCap": {"$avg": "$MarketData.MarketCap"},
        "securities": {"$push": {
            "symbol": "$Symbol",
            "MarketCap": "$MarketData.MarketCap",
            "PE": "$FinancialRatios.PERatio",
            "DividendYield": "$FinancialRatios.DividendYield",
            "Beta": "$MarketData.Beta",
        }},
    }},
    {"$project": {
        "_id": 1,
        "chosensecurity": {"$arrayElemAt": [
            {"$filter": {
                "input": "$securities",
                "as": "security",
                "cond": {"$and": [
                    {"$gt": ["$$security.MarketCap", "$avgMCap"]},
                    {"$gt": ["$$security.PE", "$avgPE"]},
                    {"$gt": ["$$security.DividendYield", "$avgDY"]},
                ]},
            }},
            0,
        ]},
    }},
    {"$sort": {"_id": 1, "chosensecurity.Beta": 1}},
    {"$group": {"_id": "$_id", "chosensecurity": {"$first": "$chosensecurity"}}},
    {"$project": {
        "_id": 1,
        "chosensecurity.symbol": 1,
        "chosensecurity.Beta": {"$min": "$chosensecurity.Beta"},
    }},
]


def test_nosql1_pipeline_verbatim_matches_port(spark, securities):
    got = compile_pipeline(securities, NOSQL1_PIPELINE).collect()
    want = nosql1_best_sector(securities).collect()
    assert len(got) == 1
    assert got[0]["_id"] == want[0]["_id"]
    assert abs(got[0]["average"] - want[0]["average"]) < 1e-9


def test_nosql2_pipeline_verbatim_matches_port(spark, securities):
    out = compile_pipeline(securities, NOSQL2_PIPELINE)
    got = {
        r["_id"]: (r["chosensecurity"]["symbol"], float(r["chosensecurity"]["Beta"]))
        for r in out.collect()
        if r["chosensecurity"] is not None and r["chosensecurity"]["symbol"] is not None
    }
    want = {
        r["_id"]: (r["symbol"], r["beta"]) for r in nosql2_security_screening(securities).collect()
    }
    # Mongo emits empty-screen groups with a missing chosensecurity; the
    # hand port drops them — compare the non-empty screens.
    assert got == want
    assert got == {"Tech": ("S1", 1.1), "Energy": ("E1", 1.2)}


def test_pipeline_match_nin_excludes_na_and_null(spark, securities):
    out = compile_pipeline(
        securities, [{"$match": {"MarketData.MarketCap": {"$nin": ["NA", None]}}}]
    )
    syms = {r["Symbol"] for r in out.collect()}
    assert "N1" not in syms and "N2" not in syms
    assert len(syms) == 8


def test_pipeline_unwind_sort_skip_limit_count(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["c"])], "k long, tags array<string>"
    )
    out = compile_pipeline(
        df,
        [
            {"$unwind": "$tags"},
            {"$sort": {"tags": -1}},
            {"$skip": 1},
            {"$limit": 2},
        ],
    ).collect()
    assert [r["tags"] for r in out] == ["b", "a"]
    n = compile_pipeline(df, [{"$unwind": "$tags"}, {"$count": "n"}]).collect()
    assert n[0]["n"] == 3


def test_pipeline_first_without_sort_raises(spark):
    df = spark.createDataFrame([(1, 2)], "k long, v long")
    with pytest.raises(NotImplementedError, match="requires a preceding"):
        compile_pipeline(df, [{"$group": {"_id": "$k", "f": {"$first": "$v"}}}]).collect()


def test_pipeline_unknown_stage_raises(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(NotImplementedError, match="facet"):
        compile_pipeline(df, [{"$facet": {}}])
    with pytest.raises(NotImplementedError, match="unknown collection"):
        compile_pipeline(
            df,
            [{"$lookup": {"from": "x", "localField": "k", "foreignField": "k", "as": "xs"}}],
        )


def test_pipeline_lookup_unwind_join_idiom(spark):
    """$lookup + $unwind — Mongo's join idiom — must behave as a left
    join: matches fan out, non-matches get [] (and drop on unwind)."""
    orders = spark.createDataFrame(
        [(1, "c1"), (2, "c2"), (3, "nobody")], "order_id long, cust string"
    )
    customers = spark.createDataFrame(
        [("c1", "Ada"), ("c1", "Ada2"), ("c2", "Bob")], "cust_id string, name string"
    )
    staged = compile_pipeline(
        orders,
        [{"$lookup": {
            "from": "customers", "localField": "cust",
            "foreignField": "cust_id", "as": "cust_docs",
        }}],
        collections={"customers": customers},
    )
    by_id = {r["order_id"]: r["cust_docs"] for r in staged.collect()}
    assert sorted(d["name"] for d in by_id[1]) == ["Ada", "Ada2"]
    assert [d["name"] for d in by_id[2]] == ["Bob"]
    assert by_id[3] == []  # left-outer: unmatched keeps an empty array

    unwound = compile_pipeline(
        orders,
        [
            {"$lookup": {
                "from": "customers", "localField": "cust",
                "foreignField": "cust_id", "as": "cust_docs",
            }},
            {"$unwind": "$cust_docs"},
            {"$replaceRoot": {"newRoot": {
                "order_id": "$order_id", "name": "$cust_docs.name",
            }}},
            {"$sort": {"order_id": 1, "name": 1}},
        ],
        collections={"customers": customers},
    ).collect()
    assert [(r["order_id"], r["name"]) for r in unwound] == [
        (1, "Ada"), (1, "Ada2"), (2, "Bob")
    ]


def test_pipeline_set_unset(spark):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    out = compile_pipeline(
        df, [{"$set": {"c": {"$add": ["$a", "$b"]}}}, {"$unset": "b"}]
    ).collect()
    assert out[0].asDict() == {"a": 1, "c": 3}


def test_pipeline_bucket_histogram(spark):
    df = spark.createDataFrame([(v,) for v in [1, 5, 12, 25, 60, 99, 150]], "v long")
    out = compile_pipeline(
        df,
        [{"$bucket": {
            "groupBy": "$v",
            "boundaries": [0, 10, 50, 100],
            "default": "other",
            "output": {"n": {"$sum": 1}, "total": {"$sum": "$v"}},
        }}, {"$sort": {"_id": 1}}],
    ).collect()
    got = {str(r["_id"]): (r["n"], r["total"]) for r in out}
    assert got == {"0": (2, 6), "10": (2, 37), "50": (2, 159), "other": (1, 150)}


def test_pipeline_bucket_without_default_errors_on_outlier(spark):
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = spark.createDataFrame([(5,), (500,)], "v long")
    with pytest.raises(SparkRuntimeException, match="outside boundaries"):
        compile_pipeline(
            df, [{"$bucket": {"groupBy": "$v", "boundaries": [0, 10]}}]
        ).collect()


def test_pipeline_map_reduce_size_exprs(spark):
    df = spark.createDataFrame([(1, [1, 2, 3])], "k long, xs array<long>")
    out = compile_pipeline(
        df,
        [{"$project": {
            "k": 1,
            "n": {"$size": "$xs"},
            "doubled": {"$map": {"input": "$xs", "as": "x", "in": {"$multiply": ["$$x", 2]}}},
            "total": {"$reduce": {"input": "$xs", "initialValue": 0,
                                   "in": {"$add": ["$$value", "$$this"]}}},
        }}],
    ).collect()[0]
    assert out["n"] == 3
    assert out["doubled"] == [2, 4, 6]
    assert out["total"] == 6
