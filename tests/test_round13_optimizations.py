"""Pins for the round-13 optimization invariants.

Each test pins an optimization-critical behavior so a later refactor
cannot silently undo it: the one-leaf literal-array builder must remain
bit-identical to the CreateArray form it replaced, and the element
widths must match what ``F.lit`` would have picked (output schemas are
driver-hashed)."""

from __future__ import annotations

import math
import struct

import pytest
from pyspark.sql import functions as F

from bigdatacw1_spark.operators.relational import int_lit_array, lit_array


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


def test_lit_array_double_bit_identical_to_create_array(spark):
    # shortest-repr round-trip must survive Spark's string->double cast:
    # values chosen to stress the parser (subnormal-ish, repeating
    # binary fractions, negative, large magnitude, many digits).
    vals = [
        0.1, -2.5, 1e-17, 5.551115123125783e-17, 123456.789012345,
        2.2250738585072014e-308, 1.7976931348623157e308, -0.0,
        0.30000000000000004, 1.0 / 3.0,
    ]
    df = spark.range(1)
    old = df.select(F.array(*[F.lit(float(v)) for v in vals]).alias("a")).head()["a"]
    new = df.select(lit_array(vals, "double").alias("a")).head()["a"]
    assert [_bits(x) for x in old] == [_bits(y) for y in new]


def test_lit_array_folds_to_single_literal(spark):
    # Catalyst must constant-fold split+cast before execution: the
    # optimized plan carries a literal, not a split() call per row.
    df = spark.range(3).select(
        F.element_at(lit_array(list(range(100)), "bigint"), 5).alias("v")
    )
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "split(" not in optimized.lower()  # ("splits=" is Range's own field)
    assert df.collect() == [(4,)] * 3  # values unchanged by the folding


def test_int_lit_array_width_matches_f_lit(spark):
    df = spark.range(1)
    narrow = df.select(int_lit_array([1, 2, 3]).alias("a"))
    wide = df.select(int_lit_array([1, 1 << 40]).alias("a"))
    assert narrow.schema["a"].dataType.elementType.typeName() == "integer"
    assert wide.schema["a"].dataType.elementType.typeName() == "long"
    assert wide.head()["a"] == [1, 1 << 40]


def test_lit_array_empty_and_nonfinite():
    assert lit_array([], "double") is not None  # empty list is representable
    with pytest.raises(ValueError):
        lit_array([float("nan")], "double")
    with pytest.raises(ValueError):
        lit_array([math.inf], "double")
    with pytest.raises(ValueError):
        lit_array([1], "string")


def test_cm_estimate_unchanged_by_literal_form(spark):
    # end-to-end: the Count-Min probe over the one-leaf literal table
    # returns the same estimates the 16k-child CreateArray form did.
    from bigdatacw1_spark.operators.dedup import build_count_min, cm_estimate

    df = spark.createDataFrame([(i % 7,) for i in range(100)], "k long")
    table = build_count_min(df, "k", width=64, depth=4)
    est = df.select(F.col("k"), cm_estimate("k", table).alias("e")).distinct()
    got = {r["k"]: r["e"] for r in est.collect()}
    # every estimate >= exact count (CMS never underestimates), and with
    # only 7 keys in 64 counters there are no collisions: estimates exact.
    expect = {k: (100 // 7 + (1 if k < 100 % 7 else 0)) for k in range(7)}
    assert got == expect
