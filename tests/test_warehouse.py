"""Unit tests for the warehouse-lifecycle / behavioral operators
(operators/warehouse.py): SCD2 build, MERGE upsert, calendar gaps,
rolling distinct reach, funnel, cohort retention."""

from __future__ import annotations

import datetime as dt

from bigdatacw1_spark.operators.warehouse import (
    cohort_retention,
    funnel_steps,
    merge_upsert,
    missing_buckets,
    rolling_distinct_per_day,
    scd2_from_log,
)


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=minute)


def _day(d: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=d)


# ---------------------------------------------------------------------------
# scd2_from_log
# ---------------------------------------------------------------------------

def test_scd2_compresses_runs_and_closes_intervals(spark):
    rows = [
        (1, "a", _ts(0), 1),
        (1, "a", _ts(5), 2),    # same value -> folded into the first run
        (1, "b", _ts(10), 3),   # change -> closes [0,10), opens [10,·)
        (1, "a", _ts(20), 4),   # back to 'a': a NEW interval, not a merge
        (2, "x", _ts(0), 5),
    ]
    df = spark.createDataFrame(rows, "k int, attr string, ts timestamp, eid int")
    out = scd2_from_log(df, ["k"], "attr", "ts", "eid").collect()
    by_from = {(r.k, r.valid_from): r for r in out}
    assert len(out) == 4
    r0 = by_from[(1, _ts(0))]
    assert (r0.attr, r0.valid_to, r0.is_current) == ("a", _ts(10), 0)
    r1 = by_from[(1, _ts(10))]
    assert (r1.attr, r1.valid_to, r1.is_current) == ("b", _ts(20), 0)
    r2 = by_from[(1, _ts(20))]
    assert (r2.attr, r2.valid_to, r2.is_current) == ("a", None, 1)
    r3 = by_from[(2, _ts(0))]
    assert (r3.attr, r3.valid_to, r3.is_current) == ("x", None, 1)


def test_scd2_intervals_partition_time_per_key(spark):
    # Non-current intervals must tile [first_ts, last_change) with no gaps:
    # each valid_to equals the next valid_from.
    rows = [(1, v, _ts(m), m) for m, v in enumerate("aabbaacc")]
    df = spark.createDataFrame(rows, "k int, attr string, ts timestamp, eid int")
    out = sorted(scd2_from_log(df, ["k"], "attr", "ts", "eid").collect(),
                 key=lambda r: r.valid_from)
    for prev, nxt in zip(out, out[1:]):
        assert prev.valid_to == nxt.valid_from
    assert out[-1].valid_to is None and out[-1].is_current == 1


# ---------------------------------------------------------------------------
# merge_upsert
# ---------------------------------------------------------------------------

def test_merge_upsert_update_insert_keep(spark):
    target = spark.createDataFrame(
        [(1, "one", 10.0), (2, "two", 20.0)], "k int, name string, bal double"
    )
    source = spark.createDataFrame([(2, 99.0), (3, 30.0)], "k int, bal double")
    out = {r.k: r for r in merge_upsert(
        target, source, "k", ["bal"], insert_defaults={"name": "new"}
    ).collect()}
    assert out[1].merge_action == "keep" and out[1].bal == 10.0 and out[1].name == "one"
    assert out[2].merge_action == "update" and out[2].bal == 99.0 and out[2].name == "two"
    assert out[3].merge_action == "insert" and out[3].bal == 30.0 and out[3].name == "new"


def test_merge_upsert_preserves_target_schema_plus_action(spark):
    target = spark.createDataFrame([(1, "x", 1.0)], "k int, name string, bal double")
    source = spark.createDataFrame([(1, 2.0)], "k int, bal double")
    out = merge_upsert(target, source, "k", ["bal"])
    assert out.columns == ["k", "name", "bal", "merge_action"]


# ---------------------------------------------------------------------------
# missing_buckets
# ---------------------------------------------------------------------------

def test_missing_buckets_finds_exact_gaps(spark):
    # Events in minutes 0,1,4 -> minutes 2 and 3 are the gaps.
    df = spark.createDataFrame(
        [(_ts(0),), (_ts(1),), (_ts(1) + dt.timedelta(seconds=30),), (_ts(4),)],
        "ts timestamp",
    )
    got = {r.bucket for r in missing_buckets(df, "ts", unit="minute").collect()}
    assert got == {_ts(2), _ts(3)}


def test_missing_buckets_dense_stream_has_none(spark):
    df = spark.createDataFrame([(_ts(m),) for m in range(5)], "ts timestamp")
    assert missing_buckets(df, "ts", unit="minute").count() == 0


# ---------------------------------------------------------------------------
# rolling_distinct_per_day
# ---------------------------------------------------------------------------

def test_rolling_distinct_trailing_window(spark):
    # user 1 active day0; user 2 active day0+day2; user 3 active day8.
    rows = [(1, _day(0)), (2, _day(0)), (2, _day(2)), (3, _day(8))]
    df = spark.createDataFrame(rows, "uid int, ts timestamp")
    got = {r.day: r.ids_7d for r in rolling_distinct_per_day(df, "ts", "uid", 7).collect()}
    # day0: users {1,2}; day2: {1,2} (both day0 actives still in window);
    # day8: day2 activity still within [day2..day8] -> {2,3}.
    assert got == {_day(0): 2, _day(2): 2, _day(8): 2}


def test_rolling_distinct_dedups_multiday_user(spark):
    # One user active every day must count once per day, not N times.
    rows = [(1, _day(d)) for d in range(3)]
    df = spark.createDataFrame(rows, "uid int, ts timestamp")
    got = {r.day: r.ids_7d for r in rolling_distinct_per_day(df, "ts", "uid", 7).collect()}
    assert got == {_day(0): 1, _day(1): 1, _day(2): 1}


# ---------------------------------------------------------------------------
# funnel_steps
# ---------------------------------------------------------------------------

def test_funnel_requires_order_within_deadline(spark):
    rows = [
        # user 1: full ordered funnel.
        (1, "view", _ts(0)), (1, "click", _ts(10)), (1, "purchase", _ts(20)),
        # user 2: click BEFORE first view -> does not count; no later click.
        (2, "view", _ts(10)), (2, "click", _ts(5)), (2, "purchase", _ts(20)),
        # user 3: purchase outside the 24h deadline.
        (3, "view", _ts(0)), (3, "click", _ts(10)), (3, "purchase", _ts(60 * 25)),
        # user 4: never viewed -> excluded entirely.
        (4, "click", _ts(0)),
    ]
    df = spark.createDataFrame(rows, "uid int, etype string, ts timestamp")
    out = {r.uid: r for r in funnel_steps(
        df, "uid", "ts", "etype", ("view", "click", "purchase"), within_hours=24
    ).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].converted == 1 and out[1].purchase_ts == _ts(20)
    assert out[2].click_ts is None and out[2].purchase_ts is None and out[2].converted == 0
    assert out[3].click_ts == _ts(10) and out[3].purchase_ts is None and out[3].converted == 0


def test_funnel_picks_earliest_qualifying_step(spark):
    rows = [(1, "view", _ts(0)), (1, "click", _ts(30)), (1, "click", _ts(15))]
    df = spark.createDataFrame(rows, "uid int, etype string, ts timestamp")
    out = funnel_steps(df, "uid", "ts", "etype", ("view", "click")).collect()[0]
    assert out.click_ts == _ts(15) and out.converted == 1


# ---------------------------------------------------------------------------
# cohort_retention
# ---------------------------------------------------------------------------

def test_cohort_retention_counts_and_ratio(spark):
    rows = [
        (1, _day(0)), (2, _day(0)),          # cohort day0: 2 users
        (1, _day(1)),                        # day0 cohort, offset 1: 1 user
        (3, _day(1)), (3, _day(3)),          # cohort day1: 1 user, back at k=2
    ]
    df = spark.createDataFrame(rows, "uid int, ts timestamp")
    got = {(r.cohort_day, r.k): (r.n_active, r.retention)
           for r in cohort_retention(df, "uid", "ts").collect()}
    assert got == {
        (_day(0), 0): (2, 1.0),
        (_day(0), 1): (1, 0.5),
        (_day(1), 0): (1, 1.0),
        (_day(1), 2): (1, 1.0),
    }


def test_snapshot_diff_classifies_all_change_types(spark):
    from bigdatacw1_spark.operators.warehouse import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c"), (4, None, "d")],
        ["k", "bal", "seg"],
    )
    new = spark.createDataFrame(
        [(2, 20.0, "b"), (3, 31.0, "c"), (4, 40.0, "d"), (5, 50.0, "e")],
        ["k", "bal", "seg"],
    )
    out = {r["k"]: r for r in snapshot_diff(old, new, "k", ["bal", "seg"]).collect()}
    assert out[1]["change_type"] == "delete"
    assert 2 not in out  # unchanged rows are not emitted
    assert out[3]["change_type"] == "update" and out[3]["new_bal"] == 31.0
    assert out[4]["change_type"] == "update"  # NULL -> value counts as change
    assert out[5]["change_type"] == "insert" and out[5]["old_bal"] is None


def test_incremental_agg_refresh_matches_recompute_and_rejects_holistic(spark):
    import pytest

    from pyspark.sql import functions as F

    from bigdatacw1_spark.operators.warehouse import incremental_agg_refresh

    base_facts = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 5)], "k string, v long"
    )
    delta = spark.createDataFrame(
        [("a", 1), ("c", 7), ("c", 3)], "k string, v long"  # c: new group
    )
    measures = {
        "n": ("count", "v"), "s": ("sum", "v"), "lo": ("min", "v"), "hi": ("max", "v"),
    }
    base = base_facts.groupBy("k").agg(
        F.count("v").alias("n"), F.sum("v").alias("s"),
        F.min("v").alias("lo"), F.max("v").alias("hi"),
    )
    got = {
        r.k: (r.n, r.s, r.lo, r.hi)
        for r in incremental_agg_refresh(base, delta, ["k"], measures).collect()
    }
    full = base_facts.unionByName(delta).groupBy("k").agg(
        F.count("v").alias("n"), F.sum("v").alias("s"),
        F.min("v").alias("lo"), F.max("v").alias("hi"),
    )
    want = {r.k: (r.n, r.s, r.lo, r.hi) for r in full.collect()}
    assert got == want  # covers updated (a), untouched (b), inserted (c)

    with pytest.raises(ValueError, match="non-distributive"):
        incremental_agg_refresh(base, delta, ["k"], {"p50": ("percentile", "v")})


def test_dq_checks_counts_each_violation_type(spark):
    """Every rule type must count its violations on deliberately dirty
    data: nulls, out-of-set values, out-of-range, regex misses,
    duplicated keys, and orphaned foreign keys (NULL FK ignored)."""
    from bigdatacw1_spark.operators.warehouse import dq_checks

    rows = [
        (1, 10, "O", 100.0, "1-URGENT"),
        (1, 20, "X", -5.0, "bad"),       # dup key, bad status, bad range, bad regex
        (2, None, "F", 50.0, "2-HIGH"),  # null custkey (FK ignores null)
        (3, 99, "P", 75.0, "3-MEDIUM"),  # custkey 99 not in ref
        (1, 10, "O", 100.0, "1-URGENT"), # key 1 now appears 3 times
    ]
    df = spark.createDataFrame(
        rows, "k long, fk long, status string, price double, prio string"
    )
    ref = spark.createDataFrame([(10,), (20,)], "ck long")
    rules = [
        {"name": "fk_not_null", "type": "not_null", "column": "fk"},
        {"name": "status_ok", "type": "accepted_values", "column": "status",
         "values": ["O", "F", "P"]},
        {"name": "price_pos", "type": "range", "column": "price", "min": 0.0},
        {"name": "prio_fmt", "type": "regex", "column": "prio",
         "pattern": r"^[1-5]-[A-Z]+$"},
        {"name": "k_unique", "type": "unique", "columns": ["k"]},
        {"name": "fk_refs", "type": "references", "column": "fk",
         "ref": "dim", "ref_column": "ck"},
    ]
    got = {r["rule"]: (r["n_violations"], r["passed"])
           for r in dq_checks(df, rules, references={"dim": ref}).collect()}
    assert got == {
        "fk_not_null": (1, False),
        "status_ok": (1, False),
        "price_pos": (1, False),
        "prio_fmt": (1, False),
        "k_unique": (2, False),   # key 1 ×3 → 2 extra rows
        "fk_refs": (1, False),    # fk=99; the NULL fk is not an orphan
    }


def test_dq_checks_clean_table_all_pass_and_unknown_rule_raises(spark):
    import pytest

    from bigdatacw1_spark.operators.warehouse import dq_checks

    df = spark.createDataFrame([(1, "a")], "k long, s string")
    out = dq_checks(df, [
        {"name": "k_not_null", "type": "not_null", "column": "k"},
        {"name": "k_unique", "type": "unique", "columns": ["k"]},
    ]).collect()
    assert all(r["passed"] and r["n_violations"] == 0 for r in out)
    with pytest.raises(NotImplementedError, match="freshness"):
        dq_checks(df, [{"name": "x", "type": "freshness", "column": "k"}])


def test_ks_drift_detects_planted_shift_and_zero_for_identical(spark):
    """KS ≈ 0 when both samples draw the same values; a planted +10 shift
    pushes KS to 1.0 (disjoint supports); ties across samples must not
    break the ECDF (RANGE frame semantics)."""
    from pyspark.sql import functions as F

    from bigdatacw1_spark.operators.warehouse import ks_drift

    rows = []
    for i in range(200):
        # value from i//2 so both parities (= both samples) see the same
        # value multiset — a naive i%10 would correlate value with flag
        v = float((i // 2) % 10)
        rows.append(("same", v, i % 2 == 0))
        rows.append(("shift", v + (10.0 if i % 2 == 0 else 0.0), i % 2 == 0))
    df = spark.createDataFrame(rows, "grp string, value double, is_a boolean")
    got = {r["grp"]: r for r in ks_drift(df, "value", F.col("is_a"), ["grp"]).collect()}
    assert got["same"]["ks_stat"] == 0.0
    assert got["shift"]["ks_stat"] == 1.0
    assert got["same"]["n_a"] == got["same"]["n_b"] == 100


def test_psi_drift_zero_for_identical_and_positive_for_shift(spark):
    from pyspark.sql import functions as F

    from bigdatacw1_spark.operators.warehouse import psi_drift

    rows = []
    for i in range(400):
        v = float((i // 2) % 8) * 50.0 + 1.0  # spread across buckets 0..7
        rows.append(("same", v, i % 2 == 0))
        rows.append(("shift", v + (100.0 if i % 2 == 0 else 0.0), i % 2 == 0))
    df = spark.createDataFrame(rows, "grp string, value double, is_a boolean")
    got = {r["grp"]: r for r in psi_drift(df, "value", F.col("is_a"), ["grp"]).collect()}
    assert got["same"]["psi"] == 0.0
    assert got["shift"]["psi"] > 0.5
    assert got["same"]["n_a"] == got["same"]["n_b"] == 200


def test_ivm_join_delta_broadcasts_both_deltas_and_matches_recompute(spark):
    """The two delta legs must plan as broadcast joins (neither full-size
    side shuffles), and the incremental delta must equal the brute-force
    new-view-minus-old-view recompute."""
    from bigdatacw1_spark.operators.warehouse import ivm_join_delta

    a = spark.createDataFrame(
        [(i, i % 5, float(i)) for i in range(1, 101)], "ok long, ck long, amt double"
    )
    b = spark.createDataFrame(
        [(i, f"c{i}") for i in range(5)], "bk long, name string"
    )
    a_base, a_delta = a.where("ok % 10 != 0"), a.where("ok % 10 = 0")
    b_base, b_delta = b.where("bk % 2 != 0"), b.where("bk % 2 = 0")

    dv = ivm_join_delta(a_base, a_delta, b_base, b_delta, on=[("ck", "bk")])
    plan = dv._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan

    new_v = a.join(b, a.ck == b.bk).select("ok", "ck", "name", "amt")
    old_v = a_base.join(b_base, a_base.ck == b_base.bk).select("ok", "ck", "name", "amt")
    expect = {tuple(r) for r in new_v.exceptAll(old_v).collect()}
    got = {tuple(r) for r in dv.select("ok", "ck", "name", "amt").collect()}
    assert got == expect and len(got) > 0


def test_cdc_materialize_tombstone_and_sparse_merge_semantics(spark):
    """Crafted logs: tombstone clears, orphan updates don't resurrect,
    sparse updates merge column-wise, re-insert after delete restarts."""
    from bigdatacw1_spark.operators.warehouse import cdc_materialize

    rows = [
        # k1: I(a=1,b=1) U(a=2) U(b=3) -> a=2 b=3, 3 ops applied
        (1, 1, "I", 1, 1), (1, 2, "U", 2, None), (1, 3, "U", None, 3),
        # k2: I then D -> gone
        (2, 1, "I", 9, 9), (2, 2, "D", None, None),
        # k3: D then U (orphan) -> gone (no live insert)
        (3, 1, "D", None, None), (3, 2, "U", 5, None),
        # k4: I(1,1) D I(7,None) U(b=8) -> restart: a=7 b=8
        (4, 1, "I", 1, 1), (4, 2, "D", None, None),
        (4, 3, "I", 7, None), (4, 4, "U", None, 8),
        # k5: U only (orphan from before log horizon) -> gone
        (5, 1, "U", 4, 4),
    ]
    log = spark.createDataFrame(
        rows, "k long, seq long, op string, a long, b long"
    )
    got = {
        r["k"]: (r["a"], r["b"], r["applied_ops"])
        for r in cdc_materialize(
            log, ["k"], ["seq"], "op", ["a", "b"]
        ).collect()
    }
    assert got == {1: (2, 3, 3), 4: (7, 8, 2)}


def test_zorder_layout_prunes_both_dimensions_vs_date_sort(spark):
    """The point of z-order: per-file custkey spans must be far narrower
    than under a date-sorted layout (where each file covers nearly the
    whole custkey range), while date spans stay bounded."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bigdatacw1_spark.queries.registry import REGISTRY

    zl = REGISTRY["wh_zorder_layout"].fn(spark, "/root/testdata/sf0.001").collect()
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    date_sorted = (
        o.withColumn(
            "file_id",
            F.ntile(16).over(Window.orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))),
        )
        .groupBy("file_id")
        .agg((F.max("o_custkey") - F.min("o_custkey")).alias("ck_span"))
        .collect()
    )
    ck_extent = o.agg(F.max("o_custkey") - F.min("o_custkey")).first()[0]
    z_mean_span = sum(r["ck_max"] - r["ck_min"] for r in zl) / len(zl)
    d_mean_span = sum(r["ck_span"] for r in date_sorted) / len(date_sorted)
    # date-sorted files each cover ~the full custkey range; z-order files
    # must do meaningfully better (narrower min/max stats => pruning works)
    assert d_mean_span > 0.8 * ck_extent
    assert z_mean_span < 0.6 * d_mean_span


def test_hilbert_key_matches_textbook_reference(spark):
    """The chained-Project expression tree must agree with the classic
    xy→d loop on random grid points (and the 4 corners)."""
    import random

    from bigdatacw1_spark.operators.warehouse import with_hilbert_key

    def ref_xy2d(n, x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    random.seed(7)
    pts = [(0, 0), (1023, 0), (0, 1023), (1023, 1023)] + [
        (random.randrange(1024), random.randrange(1024)) for _ in range(200)
    ]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {(r["x"], r["y"]): r["d"] for r in with_hilbert_key(df, "x", "y").collect()}
    for x, y in pts:
        assert got[(x, y)] == ref_xy2d(1024, x, y), (x, y)


def test_hilbert_locality_no_worse_than_morton(spark):
    """Files cut along the Hilbert curve must keep per-file 2-D extents
    at least as tight overall as Morton's (the no-jump property)."""
    from bigdatacw1_spark.queries.registry import REGISTRY

    def spans(name):
        rows = REGISTRY[name].fn(spark, "/root/testdata/sf0.001").collect()
        return sum(
            (r["ck_max"] - r["ck_min"]) + (r["dt_max"] - r["dt_min"]) for r in rows
        )

    assert spans("wh_hilbert_layout") <= 1.1 * spans("wh_zorder_layout")


def test_fifo_interval_identity_matches_sequential_reference(spark):
    """The interval-overlap formulation must equal a literal sequential
    FIFO simulation on a crafted multi-lot, partial-consumption case."""
    from pyspark.sql import functions as F

    from bigdatacw1_spark.queries.registry import REGISTRY

    # deposits (view): 100, 50, 200; withdrawals (purchase): 120, 180
    rows = []
    seq = [
        ("view", 1.00), ("view", 0.50), ("purchase", 1.20),
        ("view", 2.00), ("purchase", 1.80),
    ]
    from datetime import datetime

    for i, (t, v) in enumerate(seq):
        rows.append((1, i + 1, datetime(2024, 1, 1, 0, 0, i), t, v, None))
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp_ntz, event_type string, value double, props string"
    )
    import tempfile

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = REGISTRY["wh_fifo_allocation"].fn(spark, d).collect()
    # sequential FIFO: w1=120 takes lot1 100 + lot2 20; w2=180 takes lot2 30
    # + lot3 150 -> matches: (d1,w1,100),(d2,w1,20),(d2,w2,30),(d3,w2,150)
    assert len(got) == 1
    r = got[0]
    assert (r["n_lots"], r["n_withdrawals_touched"], r["matched_cents"], r["largest_lot"]) == (4, 2, 300, 150)


def test_bradley_terry_recovers_dominance_order():
    """On a crafted win matrix with clear dominance a≻b≻c, the fitted
    strengths must reproduce that order, normalize to 1, and match the
    analytic two-item solution on a balanced duel."""
    from bigdatacw1_spark.operators.warehouse import bradley_terry_strengths

    wins = [("a", "b", 8), ("b", "a", 2), ("b", "c", 7), ("c", "b", 3),
            ("a", "c", 9), ("c", "a", 1)]
    s = bradley_terry_strengths(wins)
    assert s["a"] > s["b"] > s["c"] > 0
    assert abs(sum(s.values()) - 1.0) < 1e-9
    # two items, 3:1 wins -> p_a/(p_a+p_b) = 0.75 exactly
    s2 = bradley_terry_strengths([("x", "y", 3), ("y", "x", 1)])
    assert abs(s2["x"] / (s2["x"] + s2["y"]) - 0.75) < 1e-6


def test_skipping_effectiveness_shape(spark):
    """The claim the layout operators exist for: z-order yields file
    stats that prune BOTH dimensions; a single-dim sort prunes only its
    own dimension; insertion order prunes ~nothing."""
    from bigdatacw1_spark.queries.warehouse import wh_skipping_effectiveness

    rows = {
        r["layout"]: r
        for r in wh_skipping_effectiveness(spark, "/root/testdata/sf0.01").collect()
    }
    nat, dts, zo = rows["a_natural"], rows["b_datesort"], rows["c_zorder"]
    assert all(r["files_total"] == 16 for r in rows.values())
    assert dts["skip_dt"] > zo["skip_dt"] >= 1  # own-dim sort prunes its dim best
    assert dts["skip_ck"] == 0  # ...and nothing on the other dim
    assert zo["skip_ck"] >= 4 and zo["skip_dt"] >= 4  # z-order prunes both
    assert zo["skip_ck"] > nat["skip_ck"]


def test_gini_and_hhi_match_python_reference(spark):
    """The two concentration metrics must equal plain Python computed
    from the same per-entity integer totals."""
    import math
    from collections import defaultdict

    from bigdatacw1_spark.queries.warehouse import (
        wh_gini_concentration,
        wh_hhi_concentration,
    )

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet").collect()
    per = defaultdict(lambda: defaultdict(int))
    for r in ev:
        per[r["event_type"]][r["user_id"]] += int(round(r["value"] * 100))
    got = {r["event_type"]: r for r in wh_gini_concentration(spark, sf).collect()}
    for et, users in per.items():
        s = sorted(users.values())
        n, ts = len(s), sum(s)
        tis = sum((i + 1) * x for i, x in enumerate(s))
        want = 2.0 * tis / (n * ts) - (n + 1.0) / n
        assert abs(got[et]["gini"] - want) < 2e-6, et
        assert got[et]["n_users"] == n

    li = spark.read.parquet(f"{sf}/lineitem.parquet").collect()
    sup = {r["s_suppkey"]: r["s_nationkey"] for r in
           spark.read.parquet(f"{sf}/supplier.parquet").collect()}
    nat = {r["n_nationkey"]: r["n_name"] for r in
           spark.read.parquet(f"{sf}/nation.parquet").collect()}
    rev = defaultdict(lambda: defaultdict(int))
    for r in li:
        nname = nat[sup[r["l_suppkey"]]]
        rev[nname][r["l_suppkey"]] += int(round(
            float(r["l_extendedprice"]) * (1 - float(r["l_discount"])) * 100))
    goth = {r["nation"]: r for r in wh_hhi_concentration(spark, sf).collect()}
    for nname, d in rev.items():
        s = sum(d.values())
        if s <= 0:
            continue
        want = 1e8 * sum(v * v for v in d.values()) / (s * s)
        assert abs(goth[nname]["hhi"] - want) < 1e-3, nname


def test_benford_contributions_are_consistent(spark):
    from bigdatacw1_spark.queries.warehouse import wh_benford_check

    rows = wh_benford_check(spark, "/root/testdata/sf0.001").collect()
    assert [r["digit"] for r in rows] == list(range(1, 10))
    n = sum(r["observed"] for r in rows)
    assert abs(sum(r["expected"] for r in rows) - n) < 0.01 * n + 1
    assert all(r["chi2_contrib"] >= 0 for r in rows)


def test_markov_attribution_invariants(spark):
    """Removal can only lose conversion paths, and shares are a proper
    normalization of the removal effects."""
    from bigdatacw1_spark.queries.warehouse import wh_attribution_markov

    rows = wh_attribution_markov(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 4
    full = rows[0]["conv_full"]
    assert all(abs(r["conv_full"] - full) < 1e-9 for r in rows)
    assert all(0.0 <= r["conv_removed"] <= r["conv_full"] + 1e-9 for r in rows)
    total_share = sum(r["attribution_share"] for r in rows)
    if any(r["removal_effect"] > 0 for r in rows):
        assert abs(total_share - 1.0) < 1e-3
