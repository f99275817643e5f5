"""Behavioral invariants of the round-12 operators — properties the
oracle hash cannot express (brute-force replay agreement, statistical
reference values, inclusion-probability behavior), per the SURVEY §5
test strategy."""

from __future__ import annotations

import hashlib
import math

from bigdatacw1_spark.queries import REGISTRY
from tests.conftest import SF_SMALL


def _run(spark, name):
    return REGISTRY[name].fn(spark, SF_SMALL).toPandas()


def test_weighted_reservoir_replays_bruteforce_ares(spark):
    """The reservoir must equal a brute-force Python A-Res pass: same
    md5 uniforms, same log-domain priorities, same top-20 in the same
    order — and the log-domain ordering must agree with the textbook
    u^(1/w) ordering it stands in for (the POWER-free equivalence the
    docstring claims)."""
    from bigdatacw1_spark.sources.catalog import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    rows = docs.select("doc_id", "n_chars").where("n_chars > 0").collect()
    keyed = []
    for r in rows:
        h = int(hashlib.md5(f"{r['doc_id']}:res".encode()).hexdigest()[:15], 16)
        u = (h + 1.0) / 1152921504606846976.0
        keyed.append((math.log(u) / r["n_chars"], r["doc_id"], r["n_chars"], u))
    keyed.sort(key=lambda t: (-t[0], t[1]))
    got = _run(spark, "ext_weighted_reservoir")
    assert len(got) == 20
    for i, (_, row) in enumerate(got.iterrows()):
        k, doc_id, w, u = keyed[i]
        assert row["rnk"] == i + 1
        assert row["doc_id"] == doc_id and row["w"] == w
        assert abs(row["priority"] - math.floor(k * 1e8 + 0.5) / 1e8) < 1e-12
        # log-domain priority orders exactly like u^(1/w)
        if i > 0:
            kp, _, wp, up = keyed[i - 1]
            assert up ** (1.0 / wp) >= u ** (1.0 / w) - 1e-15


def test_weighted_reservoir_prefers_heavy_docs(spark):
    """Length-weighting must actually bias the sample: the mean weight
    of the selected docs exceeds the corpus mean weight (the property
    that distinguishes A-Res from uniform sampling)."""
    from bigdatacw1_spark.sources.catalog import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    corpus_mean = docs.where("n_chars > 0").agg({"n_chars": "avg"}).collect()[0][0]
    got = _run(spark, "ext_weighted_reservoir")
    assert got["w"].mean() > corpus_mean


def test_kmv_set_algebra_replays_bruteforce_and_brackets_truth(spark):
    """Pairwise sketch algebra must replay from brute-force Python
    bottom-64 sets (union_k, theta, common_k all exact), the exact
    columns must equal the true set sizes, and the Jaccard estimate
    must land inside its 0.25 envelope on every pair."""
    from bigdatacw1_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_SMALL, "events")
    rows = ev.select(
        "event_type", "user_id", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("d")
    ).distinct().collect()
    sets: dict[str, set[int]] = {}
    for r in rows:
        h = int(hashlib.md5(f"{r['user_id']}|{r['d']}:kmv".encode()).hexdigest()[:13], 16)
        sets.setdefault(r["event_type"], set()).add(h)
    got = _run(spark, "ext_kmv_set_algebra")
    types = sorted(sets)
    assert len(got) == len(types) * (len(types) - 1) // 2
    for _, row in got.iterrows():
        sa, sb = sets[row["type_a"]], sets[row["type_b"]]
        ka, kb = set(sorted(sa)[:64]), set(sorted(sb)[:64])
        merged = sorted(ka | kb)
        bottom = merged[:64]
        assert row["union_k"] == len(bottom)
        assert row["theta"] == bottom[-1]
        assert row["common_k"] == sum(1 for h in bottom if h in ka and h in kb)
        assert row["exact_both"] == len(sa & sb)
        assert row["exact_union"] == len(sa | sb)
        true_j = len(sa & sb) / len(sa | sb)
        assert abs(row["jaccard_est"] - true_j) <= 0.25
        assert bool(row["est_ok"])


def test_ks_test_matches_scipy_formula_on_known_samples(spark):
    """The KS machinery must reproduce the textbook D on a hand-checked
    case: two small samples with ties across samples, where the naive
    per-point ECDF (ignoring shared jumps) gets a different answer."""
    import pandas as pd
    from pyspark.sql import functions as F
    from bigdatacw1_spark.queries.warehouse import wh_ks_test  # noqa: F401 (registry import path)

    # samples: a = [1,2,2,3], b = [2,3,3,4]; distinct values 1,2,3,4
    # F_a = .25,.75,1,1 ; F_b = 0,.25,.75,1 ; D = .5 at v=2
    a, b = [1.0, 2.0, 2.0, 3.0], [2.0, 3.0, 3.0, 4.0]
    ca = pd.Series(a).value_counts().sort_index().cumsum() / len(a)
    cb = pd.Series(b).value_counts().sort_index().cumsum() / len(b)
    vals = sorted(set(a) | set(b))
    fa = [float(ca[ca.index <= v].iloc[-1]) if (ca.index <= v).any() else 0.0 for v in vals]
    fb = [float(cb[cb.index <= v].iloc[-1]) if (cb.index <= v).any() else 0.0 for v in vals]
    d = max(abs(x - y) for x, y in zip(fa, fb))
    assert abs(d - 0.5) < 1e-12  # the hand-checked value

    # and the registry entry's D must satisfy the same definition on
    # real data: recompute one pair's D straight from events
    got = _run(spark, "wh_ks_test")
    row = got.iloc[0]
    from bigdatacw1_spark.sources.catalog import load_table

    ev = load_table(spark, SF_SMALL, "events")
    pa = [r["value"] for r in ev.where(F.col("event_type") == row["type_a"]).select("value").collect()]
    pb = [r["value"] for r in ev.where(F.col("event_type") == row["type_b"]).select("value").collect()]
    assert row["n1"] == len(pa) and row["n2"] == len(pb)
    vals = sorted(set(pa) | set(pb))
    sa, sb = sorted(pa), sorted(pb)
    import bisect

    d_true = max(
        abs(bisect.bisect_right(sa, v) / len(sa) - bisect.bisect_right(sb, v) / len(sb))
        for v in vals
    )
    assert abs(row["d_stat"] - math.floor(d_true * 1e6 + 0.5) / 1e6) < 1e-12
    # critical value formula
    crit = 1.358 * math.sqrt((len(pa) + len(pb)) / (len(pa) * len(pb)))
    assert abs(row["d_crit_05"] - math.floor(crit * 1e6 + 0.5) / 1e6) < 2e-6
    assert bool(row["reject_05"]) == (d_true > crit)


def test_jackknife_ratio_matches_bruteforce_delete_one(spark):
    """The closed-form moment identity must equal the literal n-pass
    delete-one jackknife computed in Python (same quantizations), and
    the SE must be positive and small relative to the ratio."""
    from bigdatacw1_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    li = load_table(spark, SF_SMALL, "lineitem")
    rows = li.select(
        F.col("l_returnflag").alias("flag"),
        (F.col("l_extendedprice") * (1.0 - F.col("l_discount"))).alias("y"),
        F.col("l_quantity").cast("double").alias("x"),
    ).collect()
    by_flag: dict[str, list[tuple[float, float]]] = {}
    for r in rows:
        yq = math.floor(r["y"] * 10000.0 + 0.5)
        by_flag.setdefault(r["flag"], []).append((yq, r["x"]))
    got = _run(spark, "wh_jackknife_ratio")
    for _, row in got.iterrows():
        data = by_flag[row["flag"]]
        n = len(data)
        sy = sum(q for q, _ in data) / 10000.0
        sx = sum(x for _, x in data)
        qrs = [
            math.floor((sy - q / 10000.0) / (sx - x) * 1e6 + 0.5) for q, x in data
        ]
        rbar = sum(qrs) / 1e6 / n
        ss = sum((q / 1e6 - rbar) ** 2 for q in qrs)
        se = math.sqrt((n - 1) / n * ss)
        assert row["n"] == n
        assert abs(row["ratio"] - math.floor(sy / sx * 1e6 + 0.5) / 1e6) < 1e-12
        # the engine uses the (sum qr^2, sum qr) identity; the direct
        # two-pass fold here agrees to the cancellation noise floor
        assert abs(row["se_jack"] - se) < 1e-4
        assert 0 < row["se_jack"] < row["ratio"]


def test_cooks_distance_flags_planted_outlier(spark):
    """Influence must respond to influence: doubling the totalprice of
    one extreme-x order must push that order into the top-15 (checked
    by recomputing Cook's D in Python on the modified data), and the
    engine's top-15 on the unmodified data must equal the brute-force
    Python ranking."""
    from bigdatacw1_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    o = load_table(spark, SF_SMALL, "orders")
    rows = o.select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias("x"),
        "o_totalprice",
    ).collect()

    def cooks(data):
        n = len(data)
        xs = [x for _, x, _ in data]
        ys = [math.floor(y * 100.0 + 0.5) / 100.0 for _, _, y in data]
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        b1 = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        xbar = sx / n
        b0 = sy / n - b1 * xbar
        sxx_c = (n * sxx - sx * sx) / n
        es = [y - (b0 + b1 * x) for x, y in zip(xs, ys)]
        sse = sum(e * e for e in es)
        s2 = sse / (n - 2)
        out = []
        for (key, x, _), e in zip(data, es):
            h = 1.0 / n + (x - xbar) ** 2 / sxx_c
            out.append((key, e * e * h / (2 * s2 * (1 - h) ** 2)))
        return sorted(out, key=lambda t: (-t[1], t[0]))

    data = [(r["o_orderkey"], r["x"], r["o_totalprice"]) for r in rows]
    want = cooks(data)[:15]
    got = _run(spark, "wh_cooks_distance")
    assert list(got["o_orderkey"]) == [k for k, _ in want]
    for (_, row), (_, d) in zip(got.iterrows(), want):
        assert abs(row["cooks_d"] - math.floor(d * 1e8 + 0.5) / 1e8) < 1e-6

    # plant an outlier: max-x order, 10x its price -> must enter top-15
    kmax, xmax, ymax = max(data, key=lambda t: t[1])
    planted = [(k, x, y * 10 if k == kmax else y) for k, x, y in data]
    assert kmax in [k for k, _ in cooks(planted)[:15]]
