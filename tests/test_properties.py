"""Property tests for the two sharp semantic edges (SURVEY.md §5.3, §7.4).

(a) argmin_per_group determinism under ties: Mongo's $sort + $group
    $first relies on stage ordering; our rank-window form must pick the
    same winner as a brute-force Python oracle, on every partitioning.
(b) "NA"/null sentinel filtering: try_cast ingest must keep exactly the
    parseable numerics — the $nin: ["NA", null] semantics.

Hypothesis drives the inputs; each example round-trips through a real
DataFrame. Examples are capped low because every example is a Spark job.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from bigdatacw1_spark.operators.relational import argmin_per_group

GROUPS = ["alpha", "beta", "gamma"]

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(GROUPS),  # group
        st.integers(min_value=0, max_value=3),  # beta value — few distinct → ties
        st.integers(min_value=0, max_value=99),  # symbol id (unique-ified below)
    ),
    min_size=1,
    max_size=25,
)

sentinel_strategy = st.lists(
    st.one_of(
        st.none(),
        st.just("NA"),
        st.just("null"),
        st.from_regex(r"-?[0-9]{1,6}(\.[0-9]{1,4})?", fullmatch=True),
        st.text(alphabet="abcXYZ.-", min_size=1, max_size=6),
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows_strategy, st.integers(min_value=1, max_value=7))
def test_argmin_deterministic_matches_oracle(spark, rows, n_parts):
    # unique symbol per row: (group, beta, sym) with sym disambiguated
    data = [(g, float(b), f"s{i:03d}_{s}") for i, (g, b, s) in enumerate(rows)]
    df = spark.createDataFrame(data, "grp string, beta double, symbol string").repartition(
        n_parts
    )
    got = {
        (r["grp"]): (r["beta"], r["symbol"])
        for r in argmin_per_group(df, ["grp"], [F.asc("beta"), F.asc("symbol")]).collect()
    }
    # brute-force oracle: min by (beta, symbol) per group
    oracle: dict[str, tuple[float, str]] = {}
    for g, b, s in data:
        if g not in oracle or (b, s) < oracle[g]:
            oracle[g] = (b, s)
    assert got == oracle


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(sentinel_strategy)
def test_sentinel_trycast_keeps_exactly_parseable_numerics(spark, values):
    data = [(i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(data, "id long, raw string")
    cleaned = df.select("id", F.col("raw").try_cast("double").alias("x"))
    got = {r["id"]: r["x"] for r in cleaned.collect() if r["x"] is not None}
    oracle = {}
    for i, v in data:
        if v is None or v in ("NA", "null"):
            continue
        try:
            oracle[i] = float(v)
        except ValueError:
            continue
    assert got == oracle
