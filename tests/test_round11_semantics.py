"""Behavioral invariants of the round-11 operators — properties the
oracle hash cannot express (brute-force replay agreement, conservation,
monotonicity, fit quality), per the SURVEY §5 test strategy."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

from bigdatacw1_spark.queries import REGISTRY
from tests.conftest import SF_SMALL


def _run(spark, name):
    return REGISTRY[name].fn(spark, SF_SMALL).toPandas()


def test_kmv_sketch_replays_bruteforce_bottom_k(spark):
    """The KMV state (n_in_sketch, kth_min_hash) must equal a brute-force
    Python bottom-64 over the same md5-derived hashes, the estimate must
    equal the closed-form (k-1)/u_(k), and for these cardinalities the
    estimator must actually land inside its envelope (est_ok all true —
    a vacuously-true guard would be caught by the exactness checks)."""
    from bigdatacw1_spark.sources.catalog import load_table

    ev = load_table(spark, SF_SMALL, "events")
    pairs = {
        (r["event_type"], r["user_id"])
        for r in ev.select("event_type", "user_id").collect()
    }
    hashes: dict[str, set[int]] = {}
    for et, uid in pairs:
        h = int(hashlib.md5(f"{uid}:kmv".encode()).hexdigest()[:13], 16)
        hashes.setdefault(et, set()).add(h)
    got = _run(spark, "ext_kmv_ndv")
    assert len(got) == len(hashes)
    for _, row in got.iterrows():
        bottom = sorted(hashes[row["event_type"]])[:64]
        assert row["n_in_sketch"] == len(bottom)
        assert row["kth_min_hash"] == bottom[-1]
        if len(bottom) == 64:
            est = 283726776524341248.0 / bottom[-1]
            assert abs(row["ndv_est"] - math.floor(est * 1e4 + 0.5) / 1e4) < 1e-12
            # k=64 -> sigma ~ 12.7%; the 50% envelope should comfortably hold
            assert abs(est - row["exact_users"]) <= 0.5 * row["exact_users"]
        else:
            assert row["ndv_est"] == float(row["n_in_sketch"])
        assert bool(row["est_ok"])


def _py_tokens(text: str) -> list[str]:
    return [w for w in re.split(r"\s+", text.lower()) if w]


def test_good_turing_matches_bruteforce_counts_of_counts(spark):
    """Every Good-Turing/Chao1 column must replay from a Python
    counts-of-counts over the same whitespace tokenization, and the
    estimators must satisfy their structural bounds (p0 in [0,1],
    chao1 >= vocab — richness can only exceed what was seen)."""
    from bigdatacw1_spark.sources.catalog import load_table

    docs = load_table(spark, SF_SMALL, "documents").select("source", "text").collect()
    per: dict[str, Counter] = {}
    for r in docs:
        per.setdefault(r["source"], Counter()).update(_py_tokens(r["text"]))
    got = _run(spark, "ext_good_turing")
    assert len(got) == len(per)
    for _, row in got.iterrows():
        tf = per[row["source"]]
        n, v = sum(tf.values()), len(tf)
        n1 = sum(1 for c in tf.values() if c == 1)
        n2 = sum(1 for c in tf.values() if c == 2)
        assert (row["n_tokens"], row["vocab"], row["n1"], row["n2"]) == (n, v, n1, n2)
        p0 = n1 / n
        chao1 = v + (n1 * (n1 - 1)) / (2.0 * (n2 + 1))
        assert abs(row["p0_unseen"] - math.floor(p0 * 1e6 + 0.5) / 1e6) < 1e-12
        assert abs(row["chao1"] - math.floor(chao1 * 1e4 + 0.5) / 1e4) < 1e-12
        assert 0.0 <= row["p0_unseen"] <= 1.0
        assert row["chao1"] >= row["vocab"]


def test_heaps_law_curve_is_monotone_exhaustive_and_sublinear(spark):
    """The trigram-vocabulary growth curve must be nondecreasing, its
    final checkpoint must equal the whole-corpus totals, and the log-log
    OLS slope must sit strictly inside (0,1) — Heaps' law (sublinear
    growth; beta>=1 would mean every new doc is all-new vocabulary,
    beta<=0 that the crawl learns nothing — the unigram degenerate case
    on this closed-vocabulary corpus, which is why the entry shingles)."""
    from bigdatacw1_spark.sources.catalog import load_table

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text").collect()
    grams: list[str] = []
    for r in docs:
        t = _py_tokens(r["text"])
        grams.extend(" ".join(t[i : i + 3]) for i in range(len(t) - 2))
    got = _run(spark, "ext_heaps_law").sort_values("decile").reset_index(drop=True)
    assert list(got["decile"]) == list(range(1, 11))
    for col in ("docs_cum", "ngrams_cum", "vocab_cum"):
        assert (got[col].diff().dropna() >= 0).all(), col
    assert got.loc[9, "docs_cum"] == len(docs)
    assert got.loc[9, "ngrams_cum"] == len(grams)
    assert got.loc[9, "vocab_cum"] == len(set(grams))
    xs = [math.log(x) for x in got["ngrams_cum"]]
    ys = [math.log(y) for y in got["vocab_cum"]]
    mx, my = sum(xs) / 10, sum(ys) / 10
    beta = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    assert 0.0 < beta < 1.0, beta


def test_gorilla_dod_conserves_points_and_compresses(spark):
    """Bucket counts must partition the dod rows exactly (n_points - 2
    per series), total_bits must equal the bucket-weighted sum plus the
    96 header bits, the whole histogram must replay from a Python pass
    over the sorted distinct seconds, and the scheme must actually beat
    raw 64-bit timestamps on this data."""
    from pyspark.sql import functions as F

    from bigdatacw1_spark.sources.catalog import load_table

    ev = load_table(spark, SF_SMALL, "events")
    rows = ev.select(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1000000.0)
        ).cast("long").alias("t"),
    ).collect()
    series: dict[str, set[int]] = {}
    for r in rows:
        series.setdefault(r["event_type"], set()).add(r["t"])

    def bucket(dod: int) -> int:
        if dod == 0:
            return 1
        if -63 <= dod <= 64:
            return 9
        if -255 <= dod <= 256:
            return 12
        if -2047 <= dod <= 2048:
            return 16
        return 36

    got = _run(spark, "ev_gorilla_dod")
    assert len(got) == len(series)
    for _, row in got.iterrows():
        ts = sorted(series[row["event_type"]])
        deltas = [b - a for a, b in zip(ts, ts[1:])]
        dods = [b - a for a, b in zip(deltas, deltas[1:])]
        want = Counter(bucket(d) for d in dods)
        assert row["n_points"] == len(ts)
        assert row["n_b0"] == sum(1 for d in dods if d == 0)
        for bits, col in [(9, "n_b9"), (12, "n_b12"), (16, "n_b16"), (36, "n_b36")]:
            assert row[col] == want.get(bits, 0), (row["event_type"], col)
        n_bucketed = row["n_b0"] + row["n_b9"] + row["n_b12"] + row["n_b16"] + row["n_b36"]
        # n_b0 rows carry 1 bit and are also the bits==1 class, so the
        # partition check is over ALL dod rows
        assert n_bucketed == row["n_points"] - 2
        total = 96 + sum(bucket(d) for d in dods)
        assert row["total_bits"] == total
        assert abs(
            row["bits_per_point"]
            - math.floor(total / row["n_points"] * 1e4 + 0.5) / 1e4
        ) < 1e-12
        assert row["bits_per_point"] < 64.0  # beats raw int64 timestamps


def test_cms_replay_matches_bruteforce_and_never_underestimates(spark):
    """The CMS cell state must replay from a brute-force Python build of
    the same md5-split sketch (all four per-row functionals), each row
    must conserve the total event count, and the point-query estimate
    (min over the 4 cells a key hashes to) must never underestimate any
    user's true count — the defining CMS guarantee."""
    from bigdatacw1_spark.sources.catalog import load_table

    ev = load_table(spark, SF_SMALL, "events")
    uids = [r["user_id"] for r in ev.select("user_id").collect()]
    cells: dict[int, Counter] = {j: Counter() for j in range(1, 5)}
    for uid in uids:
        hx = hashlib.md5(f"{uid}:cms".encode()).hexdigest()
        for j in range(1, 5):
            cells[j][int(hx[8 * (j - 1) : 8 * j], 16) % 256] += 1
    got = _run(spark, "ext_cms_replay").sort_values("j").reset_index(drop=True)
    assert list(got["j"]) == [1, 2, 3, 4]
    for _, row in got.iterrows():
        d = cells[row["j"]]
        assert row["hit_cells"] == len(d)
        assert row["total_count"] == len(uids)  # conservation: sums to N
        assert row["max_cell"] == max(d.values())
        assert row["cells_checksum"] == sum((p + 1) * c for p, c in d.items())
    exact = Counter(uids)
    for uid, n in exact.items():
        hx = hashlib.md5(f"{uid}:cms".encode()).hexdigest()
        est = min(
            cells[j][int(hx[8 * (j - 1) : 8 * j], 16) % 256] for j in range(1, 5)
        )
        assert est >= n, (uid, est, n)
