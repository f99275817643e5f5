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


asof_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),   # key
        st.integers(min_value=0, max_value=50),  # left ts (seconds)
    ),
    min_size=1,
    max_size=15,
)
asof_right_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),   # key
        st.integers(min_value=0, max_value=50),  # right ts
        st.integers(min_value=0, max_value=999), # payload
    ),
    min_size=0,
    max_size=15,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(asof_rows, asof_right_rows, st.one_of(st.none(), st.integers(min_value=0, max_value=20)))
def test_as_of_join_matches_bruteforce_oracle(spark, lrows, rrows, tol):
    """as_of_join (union + ordered window, with and without a staleness
    tolerance) must agree with the quadratic per-row argmax definition,
    including ties (largest tiebreak id wins among equal timestamps)."""
    from bigdatacw1_spark.operators.relational import as_of_join

    lrows = [(k, t, i) for i, (k, t) in enumerate(lrows)]
    rrows = [(k, t, v, 1000 + i) for i, (k, t, v) in enumerate(rrows)]
    left = spark.createDataFrame(lrows, ["k", "lts", "lid"]).select(
        "k", F.timestamp_seconds("lts").alias("lts"), "lid"
    )
    right = spark.createDataFrame(
        rrows, "k int, rts int, v int, rid int"
    ).select("k", F.timestamp_seconds("rts").alias("rts"), "v", "rid")
    got = {
        r["lid"]: (r["v"], r["rid"])
        for r in as_of_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            right_cols=["v", "rid"], tiebreak="rid", tolerance_seconds=tol,
        ).collect()
    }
    for k, t, lid in lrows:
        cands = [
            (rt, rid, v) for (rk, rt, v, rid) in rrows
            if rk == k and rt <= t and (tol is None or t - rt <= tol)
        ]
        expect = (max(cands)[2], max(cands)[1]) if cands else (None, None)
        assert got[lid] == expect, (lid, got[lid], expect)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=2),    # key
            st.integers(min_value=0, max_value=400),  # ts seconds
            st.integers(min_value=0, max_value=9999), # value cents
        ),
        min_size=1,
        max_size=12,
    )
)
def test_twap_matches_python_fold(spark, rows):
    """twap must equal the piecewise-constant integral computed by a
    plain Python loop over the (ts, id)-sorted series."""
    from collections import defaultdict

    from bigdatacw1_spark.operators.timeseries import twap

    rows = [(k, t, c, i) for i, (k, t, c) in enumerate(rows)]
    df = spark.createDataFrame(rows, ["k", "t", "cents", "eid"]).select(
        "k",
        F.timestamp_seconds("t").alias("ts"),
        (F.col("cents") / 100.0).alias("value"),
        "eid",
    )
    got = {r["k"]: r for r in twap(df, ["k"], "ts", "value", "eid").collect()}
    series = defaultdict(list)
    for k, t, c, i in rows:
        series[k].append((t, i, c))
    for k, obs in series.items():
        obs.sort()
        num = sum(c * (obs[j + 1][0] - t) for j, (t, _, c) in enumerate(obs[:-1]))
        den = sum(obs[j + 1][0] - t for j, (t, _, c) in enumerate(obs[:-1]))
        if den == 0:
            # zero-length span (all simultaneous) or single obs: drops out
            assert k not in got or got[k]["span_seconds"] == 0
            continue
        import math
        expect = math.floor((num / (100.0 * den)) * 10000 + 0.5) / 10000
        assert got[k]["twap"] == expect, (k, got[k]["twap"], expect)
        assert got[k]["span_seconds"] == den


fx_prices_strategy = st.lists(
    st.tuples(
        st.sampled_from(["AAA", "BBB", "CCC"]),   # currency
        st.integers(min_value=0, max_value=120),  # day offset from epoch base
        st.integers(min_value=1, max_value=9999), # amount in cents
    ),
    min_size=1,
    max_size=25,
)

fx_rates_strategy = st.lists(
    st.tuples(
        st.sampled_from(["AAA", "BBB"]),          # CCC never gets a rate
        st.integers(min_value=0, max_value=120),  # publication day offset
        st.integers(min_value=900, max_value=1100),  # rate in thousandths
    ),
    min_size=1,
    max_size=15,
    unique_by=lambda r: (r[0], r[1]),  # one publication per (currency, day)
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(fx_prices_strategy, fx_rates_strategy)
def test_fx_daily_broadcast_plan_equals_generic_asof(spark, prices, rates):
    """The FX conversion's two physical strategies — the broadcast
    densified-calendar equi-join (convert_currency_daily) and the
    union+window as-of join (convert_currency) — must return identical
    (rate, converted) for ANY sparse rates table and any price set, as
    long as the daily plan's fill horizon covers the data span.
    Semantics divergence between a scale optimization and its reference
    formulation is exactly the bug class property testing catches."""
    import datetime

    from bigdatacw1_spark.operators.finance import convert_currency, convert_currency_daily

    base = datetime.date(2024, 1, 1)
    prows = [
        (i, c, base + datetime.timedelta(days=d), float(cents))
        for i, (c, d, cents) in enumerate(prices)
    ]
    rrows = [
        (c, base + datetime.timedelta(days=d), k / 1000.0) for (c, d, k) in rates
    ]
    pdf = spark.createDataFrame(prows, "pid int, currency string, price_day date, amount double")
    rdf = spark.createDataFrame(rrows, "currency string, rate_day date, rate double")

    daily = convert_currency_daily(pdf, rdf, horizon_days=121)
    generic = convert_currency(
        pdf.withColumn("ts", F.col("price_day").cast("timestamp")),
        rdf.withColumn("rate_ts", F.col("rate_day").cast("timestamp")),
    )
    a = {r.pid: (r.rate, r.converted) for r in daily.collect()}
    b = {r.pid: (r.rate, r.converted) for r in generic.collect()}
    assert a == b


# ---------------------------------------------------------------------------
# (f) $match predicate compiler vs a Python Mongo-semantics evaluator:
#     random documents (numbers, numeric strings, "NA", null) × random
#     predicates must agree with Mongo's rules — type-bracketed numeric
#     comparisons, null-keeping $ne, null-aware $in/$nin.
# ---------------------------------------------------------------------------

_doc_value = st.one_of(
    st.none(),
    st.just("NA"),
    st.integers(min_value=-5, max_value=10).map(float),
    st.sampled_from(["3", "7.5", "-2"]),  # numeric STRINGS: castable
    st.sampled_from(["abc", "xyz"]),
)

_pred = st.one_of(
    st.sampled_from(["$gt", "$gte", "$lt", "$lte", "$ne", "$eq"]).flatmap(
        lambda op: st.integers(min_value=-3, max_value=8).map(lambda v: {op: float(v)})
    ),
    st.just({"$in": ["NA", None]}),
    st.just({"$nin": ["NA", None]}),
    st.just({"$in": ["abc", "3"]}),
)


def _mongo_eval(val, spec) -> bool:
    """Reference evaluator for one field predicate, Mongo rules as the
    compiler documents them: numeric comparisons type-bracket (a doc
    whose value isn't numeric — including numeric STRINGS failing only
    by type in Mongo, but our dialect ingests mixed columns as strings
    and try_casts, so castable strings compare numerically); $ne keeps
    nulls; $in/$nin treat null in the list as is-null/is-not-null."""
    import math

    def as_num(x):
        if isinstance(x, float):
            return x
        if isinstance(x, str):
            try:
                return float(x)
            except ValueError:
                return None
        return None

    for op, rhs in spec.items():
        if op in ("$gt", "$gte", "$lt", "$lte"):
            n = as_num(val)
            if n is None:
                return False
            ok = {"$gt": n > rhs, "$gte": n >= rhs, "$lt": n < rhs, "$lte": n <= rhs}[op]
            if not ok:
                return False
        elif op == "$eq":
            n = as_num(val)
            if not (n is not None and n == rhs):
                return False
        elif op == "$ne":
            n = as_num(val)
            if n is not None and n == rhs:
                return False
        elif op == "$in":
            vals = [v for v in rhs if v is not None]
            hit = val in vals or (val is None and None in rhs)
            if not hit:
                return False
        elif op == "$nin":
            vals = [v for v in rhs if v is not None]
            if val in vals:
                return False
            if None in rhs and val is None:
                return False
    return True


@given(vals=st.lists(_doc_value, min_size=1, max_size=15), pred=_pred)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_match_predicate_compiler_matches_mongo_eval(spark, vals, pred):
    from bigdatacw1_spark.pipeline import _match_predicate

    rows = [(i, ("%g" % v) if isinstance(v, float) else v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "i long, f string")
    got = {r["i"] for r in df.where(_match_predicate({"f": pred})).collect()}
    want = {
        i for i, v in enumerate(vals)
        if _mongo_eval(("%g" % v) if isinstance(v, float) else v, pred)
    }
    assert got == want, (vals, pred)


luhn_strategy = st.lists(
    st.one_of(
        st.from_regex(r"[0-9]{1,20}", fullmatch=True),
        st.text(alphabet="0123456789-x ", min_size=0, max_size=12),
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(luhn_strategy)
def test_luhn_valid_matches_python_reference(spark, strings):
    """luhn_valid (array-builtin fold) ≡ the textbook Python Luhn over
    arbitrary digit-ish strings, including non-digit and empty input
    (both reject, never raise)."""
    from bigdatacw1_spark.functions.text import luhn_valid

    def ref(s: str) -> bool:
        if not s or not s.isdigit():
            return False
        total = 0
        for i, ch in enumerate(reversed(s)):
            d = int(ch)
            if i % 2 == 1:
                d = d * 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10 == 0

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strings)], "i long, s string"
    )
    got = {r["i"]: r["ok"] for r in df.select("i", luhn_valid("s").alias("ok")).collect()}
    for i, s in enumerate(strings):
        assert got[i] is ref(s), (s, got[i])


lines_strategy = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=12),
    min_size=1,
    max_size=15,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(lines_strategy)
def test_dedup_lines_matches_python_reference(spark, docs):
    """dedup_lines ≡ Python dict.fromkeys first-occurrence dedup for any
    line multiset/order."""
    from bigdatacw1_spark.functions.text import dedup_lines

    df = spark.createDataFrame(
        [(i, "\n".join(ls)) for i, ls in enumerate(docs)], "i long, text string"
    )
    d = dedup_lines("text")
    got = {
        r["i"]: (r["c"], r["n"], r["k"])
        for r in df.select(
            "i", d["clean_text"].alias("c"), d["n_lines"].alias("n"),
            d["n_dup_lines"].alias("k"),
        ).collect()
    }
    for i, ls in enumerate(docs):
        kept = list(dict.fromkeys(ls))
        assert got[i] == ("\n".join(kept), len(ls), len(ls) - len(kept)), (ls, got[i])


gopher_strategy = st.lists(
    st.one_of(
        st.sampled_from(["the", "a", "and", "of", "to"]),  # stopwords
        st.sampled_from(["cat", "dog", "table", "window"]),
        st.just("w" * 15),  # long word pushes mean word length
        st.just("x"),
    ),
    min_size=0,
    max_size=60,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(gopher_strategy, min_size=1, max_size=12))
def test_gopher_rules_match_python_reference(spark, docs):
    from collections import Counter

    from bigdatacw1_spark.functions.text import STOPWORDS, gopher_rules

    stops = set(STOPWORDS["en"])

    def ref(words):
        n = len(words)
        sumlen = sum(map(len, words))
        n_stop = sum(1 for t in words if t in stops)
        dist = len(set(words))
        top = max(Counter(words).values()) if words else 0
        return (
            10 <= n <= 100000,
            3 * n <= sumlen <= 10 * n and n > 0,
            n_stop >= 2,
            10 * top <= 3 * n and n > 0,
            10 * dist >= 3 * n and n > 0,
        )

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], "i long, text string"
    )
    g = gopher_rules("text")
    got = {
        r["i"]: (r["wc"], r["mwl"], r["sw"], r["tw"], r["dw"], r["keep"])
        for r in df.select(
            "i", g["r_word_count"].alias("wc"), g["r_mean_word_len"].alias("mwl"),
            g["r_stopwords"].alias("sw"), g["r_top_word"].alias("tw"),
            g["r_distinct"].alias("dw"), g["keep"].alias("keep"),
        ).collect()
    }
    for i, ws in enumerate(docs):
        want = ref(ws)
        assert got[i][:5] == want, (ws, got[i], want)
        assert got[i][5] == all(want)


url_strategy = st.builds(
    lambda scheme, host, path, params, frag: (
        f"{scheme}://{host}{path}"
        + ("?" + "&".join(params) if params else "")
        + (f"#{frag}" if frag else "")
    ),
    st.sampled_from(["http", "HTTP", "https", "HtTpS"]),
    st.sampled_from(["Example.COM", "www.site.org", "A.B.c"]),
    st.sampled_from(["", "/", "/Path/To", "/x"]),
    st.lists(
        st.sampled_from(["a=1", "b=2", "z=9", "utm_source=x", "gclid=42", "ref=feed"]),
        max_size=4,
        unique=True,
    ),
    st.sampled_from(["", "frag", "sec2"]),
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(url_strategy, min_size=1, max_size=20))
def test_canonicalize_url_matches_python_reference(spark, urls):
    import re

    from bigdatacw1_spark.functions.text import canonicalize_url

    def ref(u):
        m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)", u)
        if not m:
            return u.strip().lower()
        scheme, host, path = m.groups()
        qm = re.search(r"\?([^#]*)", u)
        params = [
            p for p in (qm.group(1).split("&") if qm else [])
            if p and not re.match(r"^(utm_[a-z]+|fbclid|gclid|ref)=", p)
        ]
        base = scheme.lower() + "://" + host.lower() + path
        return base + ("?" + "&".join(sorted(params)) if params else "")

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i long, u string"
    )
    got = {r["i"]: r["c"] for r in df.select("i", canonicalize_url("u").alias("c")).collect()}
    for i, u in enumerate(urls):
        assert got[i] == ref(u), (u, got[i], ref(u))


# --- BPE segmentation vs a pure-Python greedy-merge reference -------------

_bpe_words = st.lists(
    st.text(alphabet="abc01", min_size=1, max_size=6), min_size=0, max_size=8
)
_bpe_merge_tables = st.just(None)  # default table; merges chain (s,c),(sc,a)...


def _py_bpe_counts(words: list[str], merges) -> tuple[int, int, int]:
    from bigdatacw1_spark.functions.text import BPE_MERGES_DEFAULT

    merges = merges or BPE_MERGES_DEFAULT
    n_chars = sum(len(w) for w in words)
    n_tokens = 0
    for w in words:
        syms = list(w)
        for a, b in merges:
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        n_tokens += len(syms)
    return len(words), n_chars, n_tokens


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(_bpe_words, _bpe_merge_tables)
def test_bpe_segment_matches_python_reference(spark, words, merges):
    """The string-replacement implementation must equal an independent
    list-walking greedy merger on arbitrary word sequences (including
    the 'a a a' overlap case the left-to-right rule defines)."""
    from bigdatacw1_spark.functions.text import bpe_segment

    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    r = bpe_segment(df, merges).collect()[0]
    want = _py_bpe_counts(words, merges)
    assert (r.n_words, r.n_chars, r.n_tokens) == want


# --- robots.txt decision vs a pure-Python reference -----------------------

_robots_prefixes = st.lists(
    st.tuples(st.booleans(), st.text(alphabet="/abp", min_size=1, max_size=5)),
    min_size=0,
    max_size=6,
)
_robots_paths = st.text(alphabet="/abp", min_size=1, max_size=8)


def _py_robots(rules: list[tuple[bool, str]], path: str) -> tuple[bool, int]:
    best_key = -1
    for allow, prefix in rules:
        if path.startswith(prefix):
            key = len(prefix) * 2 + int(allow)
            best_key = max(best_key, key)
    if best_key < 0:
        return True, -1
    return best_key % 2 == 1, best_key // 2


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(_robots_prefixes, _robots_paths)
def test_robots_decision_matches_python_reference(spark, rules, path):
    from bigdatacw1_spark.functions.text import robots_allowed, robots_star_rules

    body = "User-agent: *\n" + "\n".join(
        ("Allow: " if a else "Disallow: ") + p for a, p in rules
    )
    df = spark.createDataFrame([(body, path)], "robots string, path string")
    v = robots_allowed(robots_star_rules("robots"), F.col("path"))
    r = df.select(v["allowed"].alias("a"), v["match_len"].alias("m")).collect()[0]
    assert (r.a, r.m) == _py_robots(rules, path)


# --- JPEG exact round-trip on random even constant-block images -----------

@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=1, max_value=3),
    st.lists(st.integers(min_value=0, max_value=127), min_size=12, max_size=12),
)
def test_jpeg_even_constant_blocks_roundtrip_exactly(bw, bh, block_vals):
    """ANY even-valued constant-block image must survive the lossy codec
    bit-for-bit (the analytic exactness claim behind ext_mm_jpeg, tested
    beyond the fixture family's specific value formula)."""
    from bigdatacw1_spark.operators.multimodal import decode_jpeg, encode_jpeg_gray

    w, h = bw * 8, bh * 8
    px = bytes(
        2 * block_vals[(y // 8) * bw + (x // 8)]
        for y in range(h)
        for x in range(w)
    )
    assert decode_jpeg(encode_jpeg_gray(w, h, px))[3] == px


gorder_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),   # key — narrow → heavy ties
        st.integers(min_value=0, max_value=1000),   # value for the running sum
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(gorder_strategy, st.integers(min_value=1, max_value=9), st.integers(min_value=1, max_value=8))
def test_global_order_columns_matches_python_fold(spark, rows, shards, k):
    """global_order_columns rank/runsum and ntile_from_rank must equal a
    sequential Python fold over ORDER BY (key, id) for ANY data, shard
    count, and NTILE width — including all-equal keys (every row in one
    shard), negative keys, and n < k. The sharded-offset decomposition
    is exact, not approximate; only load balance depends on the
    percentile boundaries."""
    from bigdatacw1_spark.operators.warehouse import (
        global_order_columns,
        ntile_from_rank,
    )

    data = [(i, key, val) for i, (key, val) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, key long, val long").repartition(3)
    out, total = global_order_columns(
        df, F.col("key"), [F.col("id")], value=F.col("val"), shards=shards
    )
    got = {
        r["id"]: (r["__rank"], r["__runsum"], r["nt"])
        for r in out.withColumn(
            "nt", ntile_from_rank(F.col("__rank"), total, k)
        ).collect()
    }

    assert total == len(data)
    ordered = sorted(data, key=lambda t: (t[1], t[0]))
    run = 0
    n = len(ordered)
    q, rem = divmod(n, k)
    for rank0, (i, _key, val) in enumerate(ordered):
        run += val
        rank = rank0 + 1
        if q == 0:
            nt = rank
        elif rank <= rem * (q + 1):
            nt = (rank - 1) // (q + 1) + 1
        else:
            nt = rem + (rank - 1 - rem * (q + 1)) // q + 1
        assert got[i] == (rank, run, nt), (i, got[i], (rank, run, nt))


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=2),     # series key
            st.integers(min_value=0, max_value=99999), # daily cents
        ),
        min_size=4,
        max_size=16,
    )
)
def test_cusum_and_backtest_match_python_folds(spark, rows):
    """The window-collapsed CUSUM and the four-scalar backtest fold must
    equal plain sequential Python over the day-ordered series."""
    from collections import defaultdict

    from bigdatacw1_spark.operators.timeseries import (
        backtest_one_step,
        cusum_changepoint,
    )

    data = [(k, i, c) for i, (k, c) in enumerate(rows)]
    df = spark.createDataFrame(data, ["k", "d", "x"]).select(
        "k", F.timestamp_seconds(F.col("d") * 86400).alias("day"), F.col("x")
    )
    series = defaultdict(list)
    for k, d, c in data:
        series[k].append((d, c))

    got_c = {r["k"]: r for r in cusum_changepoint(df, ["k"], "day", "x").collect()}
    got_b = {r["k"]: r for r in backtest_one_step(df, ["k"], "day", "x").collect()}

    for k, obs in series.items():
        obs.sort()
        xs = [c for _, c in obs]
        n = len(xs)
        if n >= 4:
            n1 = n // 2
            s1 = sum(xs[:n1])
            mu = s1 / n1
            cusum, peak, peak_i = 0.0, -1.0, -1
            for i, x in enumerate(xs):
                cusum = max(0.0, cusum + (x - mu))
                if cusum > peak + 1e-9:
                    peak, peak_i = cusum, i
            r = got_c[k]
            assert r["n_days"] == n
            assert abs(r["mu_ref"] - mu / 100.0) < 1e-3
            assert abs(r["peak_cusum"] - peak / 100.0) < 1e-3
        if n >= 2:
            ewma, sae_e, sae_n, prev = float(xs[0]), 0.0, 0.0, float(xs[0])
            for x in xs[1:]:
                sae_e += abs(x - ewma)
                sae_n += abs(x - prev)
                ewma = 0.5 * x + 0.5 * ewma
                prev = float(x)
            r = got_b[k]
            assert r["n_forecasts"] == n - 1
            assert abs(r["mae_ewma"] - sae_e / (n - 1)) < 1e-3
            assert abs(r["mae_naive"] - sae_n / (n - 1)) < 1e-3


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=15),
    st.lists(st.integers(min_value=51, max_value=99), min_size=0, max_size=15),
    st.lists(st.integers(min_value=100, max_value=140), min_size=6, max_size=10),
)
def test_winnowing_containment_holds_for_random_contexts(spark, pre, post, shared):
    """Schleimer et al.'s guarantee, fuzzed: ANY two documents sharing a
    contiguous window+ngram-1 = 6-token run must share at least one
    selected winnowing fingerprint, whatever surrounds the run."""
    from bigdatacw1_spark.operators.dedup import winnowing_fingerprints

    run = " ".join(f"s{t}" for t in shared[:6])
    d1 = " ".join(f"a{t}" for t in pre) + f" {run} " + " ".join(f"b{t}" for t in post)
    d2 = " ".join(f"c{t}" for t in post) + f" {run} " + " ".join(f"d{t}" for t in pre)
    df = spark.createDataFrame([(1, d1.strip()), (2, d2.strip())], "doc_id long, text string")
    fps = {r["doc_id"]: set(r["fps"]) for r in winnowing_fingerprints(df).collect()}
    assert fps[1] & fps[2]


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=200))
def test_mulaw_codec_matches_itu_reference_properties(samples):
    """G.711 mu-law encode→decode must (a) round-trip every byte value
    that decode can produce, (b) keep quantization error within the
    segment's half-step for arbitrary int16 input, and (c) preserve
    sign. Tested beyond the fixture's value formula."""
    from bigdatacw1_spark.operators.multimodal import (
        mulaw_decode_byte,
        mulaw_encode_sample,
    )

    for x in samples:
        b = mulaw_encode_sample(x)
        assert 0 <= b <= 255
        y = mulaw_decode_byte(b)
        # sign preserved (0 maps to 0 from either side)
        if y != 0:
            assert (y < 0) == (x < 0)
        # max quantization error: half the largest segment step (2^12/2)
        # plus the clip region above 32635
        assert abs(min(max(x, -32635), 32635) - y) <= 2048
        # decode is a fixed point: re-encoding a decoded value returns it
        assert mulaw_decode_byte(mulaw_encode_sample(y)) == y


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**40), max_value=2**40),
            st.integers(min_value=0, max_value=7),
            st.integers(min_value=-100000, max_value=100000),
            st.integers(min_value=-128, max_value=128),
            st.sampled_from(["N", "R", "A", "", "multi byte ✓"]),
        ),
        min_size=0,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=9),
)
def test_avro_container_roundtrip_any_records(records, block_size):
    """encode_avro_container→decode_avro_container is exact for arbitrary
    longs (including negatives, exercising zigzag), arbitrary block
    sizes (including empty files and ragged final blocks), and
    multi-byte UTF-8 strings."""
    from bigdatacw1_spark.sources.formats import (
        decode_avro_container,
        encode_avro_container,
    )

    recs = [tuple(r) for r in records]
    assert decode_avro_container(encode_avro_container(recs, block_size)) == recs


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=14),
    st.integers(min_value=1, max_value=4),
    st.data(),
)
def test_tiff_roundtrip_any_pixels_both_compressions(w, h, rps, data):
    """encode_tiff→decode_tiff is bit-exact for arbitrary pixel bytes in
    both gray/PackBits and RGB/uncompressed modes, across strip heights
    (single-strip inline offsets vs multi-strip external arrays)."""
    from bigdatacw1_spark.operators.multimodal import decode_tiff, encode_tiff

    gray = bytes(
        data.draw(st.integers(min_value=0, max_value=255)) for _ in range(w * h)
    )
    assert decode_tiff(encode_tiff(w, h, 1, 32773, gray, rows_per_strip=rps)) == (
        w, h, 1, 32773, gray,
    )
    rgb = bytes((i * 37 + 11) % 256 for i in range(w * h * 3))
    assert decode_tiff(encode_tiff(w, h, 3, 1, rgb, rows_per_strip=rps)) == (
        w, h, 3, 1, rgb,
    )


def test_tiff_foreign_ifd_type_refuses_loudly():
    """A baseline TIFF whose required tag carries a non-SHORT/LONG IFD
    type (e.g. RATIONAL=5) must refuse with NotImplementedError, not
    silently mis-size the entry and decode garbage (r8 ADVICE item)."""
    import struct

    import pytest

    from bigdatacw1_spark.operators.multimodal import decode_tiff, encode_tiff

    blob = bytearray(encode_tiff(4, 4, 1, 1, bytes(range(16)), rows_per_strip=4))
    magic, ifd_off = struct.unpack("<HI", blob[2:8])
    (n_entries,) = struct.unpack("<H", blob[ifd_off : ifd_off + 2])
    for k in range(n_entries):
        off = ifd_off + 2 + 12 * k
        tag, typ = struct.unpack("<HH", blob[off : off + 4])
        if tag == 256:  # ImageWidth: rewrite its type to RATIONAL (5)
            blob[off + 2 : off + 4] = struct.pack("<H", 5)
            break
    with pytest.raises(NotImplementedError, match="IFD entry type"):
        decode_tiff(bytes(blob))


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=120))
def test_alaw_quantization_idempotent(samples):
    """G.711 A-law: decode(encode(x)) is the segment midpoint, and
    re-encoding a decoded value is a FIXED POINT (the companding law's
    defining property); error is bounded by half the segment width."""
    from bigdatacw1_spark.operators.multimodal import (
        alaw_decode_byte,
        alaw_encode_sample,
    )

    for x in samples:
        y = alaw_decode_byte(alaw_encode_sample(x))
        assert -32768 <= y <= 32767
        assert alaw_decode_byte(alaw_encode_sample(y)) == y
        assert abs(x - y) <= 512  # seg-7 half-step at 16-bit scale (worst at -32768)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=10),
    st.data(),
)
def test_qoi_roundtrip_arbitrary_pixels(w, h, data):
    """encode_qoi→decode_qoi is bit-exact for arbitrary RGB buffers
    (QOI is lossless by spec), including run/index/diff/luma op mixes."""
    from bigdatacw1_spark.operators.multimodal import decode_qoi, encode_qoi

    px = bytes(
        data.draw(st.integers(min_value=0, max_value=255)) for _ in range(w * h * 3)
    )
    assert decode_qoi(encode_qoi(w, h, px)) == (w, h, 3, px)


def test_qoi_run_overrun_by_one_rejected():
    """A malformed stream whose final RUN overruns the pixel count by
    exactly one pixel must raise, not return an oversized buffer (the
    shared post-op append used to land after the overrun check)."""
    import struct

    import pytest

    from bigdatacw1_spark.operators.multimodal import decode_qoi

    # 2x2 image = 4 pixels: RGB(9,9,9) then RUN(4) -> 5 pixels total.
    payload = (
        b"qoif" + struct.pack(">IIBB", 2, 2, 3, 0)
        + bytes((0xFE, 9, 9, 9)) + bytes((0xC0 | 3,))
        + b"\x00" * 7 + b"\x01"
    )
    with pytest.raises(ValueError, match="run overruns"):
        decode_qoi(payload)


def test_qoi_op_choice_matches_qoi_c_signed_char_semantics():
    """qoi.c computes vr/vg/vb AND vg_r = vr−vg / vg_b = vb−vg as
    signed chars (each difference wraps to [-128,127] before its range
    test). Model that directly and assert the encoder picks the same
    op class for a grid of wrap-boundary transitions — including the
    dr−dg wrap extremes — and stays lossless."""
    from bigdatacw1_spark.operators.multimodal import decode_qoi, encode_qoi

    def sc(x):  # signed-char wrap
        return (x + 128) % 256 - 128

    def qoi_c_op(prev, cur):
        vr, vg, vb = (sc(cur[i] - prev[i]) for i in range(3))
        if -2 <= vr <= 1 and -2 <= vg <= 1 and -2 <= vb <= 1:
            return "diff"
        if -32 <= vg <= 31 and -8 <= sc(vr - vg) <= 7 and -8 <= sc(vb - vg) <= 7:
            return "luma"
        return "rgb"

    op_tag = {0xFE: "rgb", 1: "diff", 2: "luma"}
    edge = (0, 1, 7, 8, 31, 32, 96, 127, 128, 129, 224, 248, 254, 255)
    prev = (200, 100, 50)
    for r in edge:
        for g in edge:
            cur = (r, g, (r + g) % 256)
            if cur == prev:
                continue
            px = bytes(prev + cur)
            enc = encode_qoi(2, 1, px)
            body = enc[14:-8]
            # pixel0 op length: RGB=4, else INDEX/DIFF=1 or LUMA=2
            op0 = body[0]
            off = 4 if op0 == 0xFE else (2 if op0 >> 6 == 2 else 1)
            op1 = body[off]
            got = op_tag.get(op1 if op1 == 0xFE else op1 >> 6, "index")
            want = qoi_c_op(prev, cur)
            if got != "index":  # INDEX legitimately preempts all three
                assert got == want, (prev, cur, got, want)
            assert decode_qoi(enc) == (2, 1, 3, px)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=100))
def test_ima_adpcm_container_roundtrip(samples):
    """encode_wav_ima_adpcm→decode_wav (dispatch path) reproduces the
    encoder's internal reconstruction exactly — the wire nibbles, block
    header, and decoder state machine agree sample for sample."""
    from bigdatacw1_spark.operators.multimodal import (
        decode_wav,
        encode_wav_ima_adpcm,
        ima_adpcm_decode,
        ima_adpcm_encode,
    )

    pred0, codes = ima_adpcm_encode(samples)
    expected = ima_adpcm_decode(pred0, 0, codes)
    sr, ch, got = decode_wav(encode_wav_ima_adpcm(8000, samples))
    assert (sr, ch) == (8000, 1)
    assert got == expected
    assert len(got) == len(samples)


def test_ima_adpcm_bad_cbsize_rejected():
    """A fmt chunk with the right layout but cbSize != 2 is not the
    documented samplesPerBlock extension — refuse loudly rather than
    read bytes 18:20 as a sample count."""
    import struct

    import pytest

    from bigdatacw1_spark.operators.multimodal import (
        decode_wav_ima_adpcm,
        encode_wav_ima_adpcm,
    )

    wav = encode_wav_ima_adpcm(8000, [0, 100, -100])
    fmt_off = wav.index(b"fmt ") + 8
    fmt = bytearray(wav[fmt_off : fmt_off + 20])
    data_off = wav.index(b"data") + 8
    data_len = struct.unpack("<I", wav[data_off - 4 : data_off])[0]
    data = wav[data_off : data_off + data_len]
    assert decode_wav_ima_adpcm(bytes(fmt), data)[2]  # sanity: valid fmt ok
    fmt[16:18] = struct.pack("<H", 4)
    with pytest.raises(ValueError, match="cbSize=2"):
        decode_wav_ima_adpcm(bytes(fmt), data)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**62),
            st.integers(min_value=0, max_value=7),
            st.integers(min_value=0, max_value=10**7),
            st.integers(min_value=-(2**40), max_value=2**40),
            st.text(min_size=0, max_size=12),
        ),
        min_size=0,
        max_size=40,
    )
)
def test_protobuf_stream_roundtrip(records):
    """encode_protobuf_stream→decode_protobuf_stream is exact for
    arbitrary records, including negative sint64 zigzag values and
    non-ASCII strings."""
    from bigdatacw1_spark.sources.formats import (
        decode_protobuf_stream,
        encode_protobuf_stream,
    )

    recs = [tuple(r) for r in records]
    assert decode_protobuf_stream(encode_protobuf_stream(recs)) == recs


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.integers(min_value=1, max_value=16), st.data())
def test_rle_bitpack_roundtrip_arbitrary(bit_width, data):
    """encode_rle_bitpack→decode_rle_bitpack is the identity for
    arbitrary run-structured streams at any bit width, including the
    alignment-sensitive literal→RLE transitions (parquet-mr policy:
    an 8+ run becomes RLE only from an 8-aligned literal position)."""
    from bigdatacw1_spark.sources.formats import (
        decode_rle_bitpack,
        encode_rle_bitpack,
    )

    limit = 1 << bit_width
    vals: list[int] = []
    for _ in range(data.draw(st.integers(min_value=0, max_value=12))):
        v = data.draw(st.integers(min_value=0, max_value=limit - 1))
        vals.extend([v] * data.draw(st.integers(min_value=1, max_value=20)))
    dec, _rr, _bp = decode_rle_bitpack(encode_rle_bitpack(vals, bit_width))
    assert dec == vals


def test_rle_bitpack_wire_policy():
    """The encoder's wire choices match parquet-mr's hybrid heuristic,
    and the decoder rejects streams violating the format invariants."""
    import pytest

    from bigdatacw1_spark.sources.formats import (
        _pb_varint,
        decode_rle_bitpack,
        encode_rle_bitpack,
    )

    # 9 identical values from alignment -> one RLE run, zero slots.
    assert decode_rle_bitpack(encode_rle_bitpack([3] * 9, 3))[1:] == (1, 0)
    # 9 distinct values -> no RLE, two bit-packed groups (16 slots).
    assert decode_rle_bitpack(
        encode_rle_bitpack([1, 2, 3, 4, 5, 6, 7, 0, 1], 3)
    )[1:] == (0, 16)
    # 3 literals then a 10-run: run head tops the group up to 8, the
    # 5-value tail stays literal -> still no RLE run on the wire.
    vals = [1, 2, 3] + [5] * 10 + [6]
    dec, rr, bp = decode_rle_bitpack(encode_rle_bitpack(vals, 3))
    assert dec == vals and rr == 0 and bp == 16
    # aligned literals then a 9-run -> RLE fires.
    assert decode_rle_bitpack(
        encode_rle_bitpack([1, 2, 3, 4, 5, 6, 7, 0] + [5] * 9, 3)
    )[1:] == (1, 8)
    with pytest.raises(ValueError, match="does not fit"):
        encode_rle_bitpack([8], 3)
    enc = bytearray(encode_rle_bitpack([1, 2, 3], 3))
    enc[-1] |= 0x80  # nonzero padding in the final group
    with pytest.raises(ValueError, match="padding"):
        decode_rle_bitpack(bytes(enc))
    # well-formed groups but fewer values than the declared count:
    # [bw=3, n=9, RLE header 9<<1, value] with n bumped to 10.
    short = bytearray(encode_rle_bitpack([1] * 9, 3))
    assert short[1] == 9
    short[1] = 10
    with pytest.raises(ValueError, match="declared count"):
        decode_rle_bitpack(bytes(short))
    # adversarial declared count (r10 advice): a ~10-byte stream that
    # declares n=2^40 with one matching RLE run must refuse with the
    # typed error BEFORE allocating — the per-run bound compares against
    # n, so n itself needs the cap.
    n = 1 << 40
    huge = bytes([3]) + _pb_varint(n) + _pb_varint(n << 1) + bytes([1])
    with pytest.raises(ValueError, match="max_values"):
        decode_rle_bitpack(huge)
    # the cap is caller-tunable, and a legal stream under a tight cap
    # still decodes.
    assert decode_rle_bitpack(
        encode_rle_bitpack([1] * 9, 3), max_values=9
    )[0] == [1] * 9
    with pytest.raises(ValueError, match="max_values"):
        decode_rle_bitpack(encode_rle_bitpack([1] * 9, 3), max_values=8)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=2),      # key
            st.integers(min_value=0, max_value=30),     # day index (dups ok)
            st.integers(min_value=-9999, max_value=9999),  # daily cents total
        ),
        min_size=2,
        max_size=15,
        unique_by=lambda r: (r[0], r[1]),
    )
)
def test_garch_matches_python_fold(spark, rows):
    """garch_volatility must equal the plain-Python GARCH(1,1) recursion
    h_t = w + a*e2_{t-1} + b*h_{t-1} seeded with e2_1 over the
    (day-sorted) squared scaled first differences, per key."""
    import math
    from collections import defaultdict

    from bigdatacw1_spark.operators.timeseries import garch_volatility

    df = spark.createDataFrame(rows, ["k", "d", "x"])
    got = {r["k"]: r for r in garch_volatility(df, ["k"], "d", "x").collect()}
    series = defaultdict(list)
    for k, d, x in rows:
        series[k].append((d, x))
    for k, obs in series.items():
        obs.sort()
        if len(obs) < 2:
            assert k not in got
            continue
        e2 = [
            ((b - a) / 100.0) ** 2
            for (_, a), (_, b) in zip(obs[:-1], obs[1:])
        ]
        h = e2[0]
        for x in e2[:-1]:
            h = 0.25 + 0.125 * x + 0.75 * h
        expect = math.floor(h * 1e6 + 0.5) / 1e6
        assert got[k]["h_last"] == expect, (k, got[k]["h_last"], expect)
        assert got[k]["n_returns"] == len(e2)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.integers(min_value=-50, max_value=50),  # daily values, ties likely
        min_size=3,
        max_size=14,
    )
)
def test_mann_kendall_statistics_match_bruteforce(spark, xs):
    """The registered Mann-Kendall pipeline shape (pair join + tie
    aggregate) must reproduce the textbook O(n^2) S and tie-corrected
    Var(S) computed by a plain double loop."""
    import math

    from pyspark.sql import functions as F

    rows = [(1, i, x) for i, x in enumerate(xs)]
    daily = spark.createDataFrame(rows, ["k", "d", "x"])
    a, b = daily.alias("a"), daily.alias("b")
    s_df = (
        a.join(b, "k")
        .where(F.col("a.d") < F.col("b.d"))
        .agg(
            F.sum(
                F.when(F.col("b.x") > F.col("a.x"), 1)
                .when(F.col("b.x") < F.col("a.x"), -1)
                .otherwise(0)
            ).alias("s")
        )
    )
    ties_df = (
        daily.groupBy("x")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)).alias("tt"))
    )
    s = s_df.collect()[0]["s"]
    tt = ties_df.collect()[0]["tt"]
    n = len(xs)
    exp_s = sum(
        (xs[j] > xs[i]) - (xs[j] < xs[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    groups: dict[int, int] = {}
    for x in xs:
        groups[x] = groups.get(x, 0) + 1
    exp_tt = sum(t * (t - 1) * (2 * t + 5) for t in groups.values())
    assert s == exp_s
    assert tt == exp_tt
    var_s = (n * (n - 1) * (2 * n + 5) - exp_tt) / 18.0
    if var_s > 0:
        z = (s - math.copysign(1, s)) / math.sqrt(var_s) if s != 0 else 0.0
        assert abs(z) <= abs(s) / math.sqrt(var_s) + 1e-12


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.data())
def test_rle_bitpack_decoder_total_on_mutated_streams(data):
    """Robustness totality: truncating or bit-flipping a valid stream
    must either decode to SOME values or raise ValueError — never an
    IndexError/KeyError/struct.error escape (the loud-refusal contract
    every codec decoder in the repo follows)."""
    from bigdatacw1_spark.sources.formats import (
        decode_rle_bitpack,
        encode_rle_bitpack,
    )

    vals = []
    for _ in range(data.draw(st.integers(min_value=1, max_value=6))):
        v = data.draw(st.integers(min_value=0, max_value=7))
        vals.extend([v] * data.draw(st.integers(min_value=1, max_value=12)))
    enc = bytearray(encode_rle_bitpack(vals, 3))
    mode = data.draw(st.sampled_from(["truncate", "flip", "extend", "count"]))
    if mode == "truncate":
        enc = enc[: data.draw(st.integers(min_value=0, max_value=len(enc)))]
    elif mode == "flip":
        i = data.draw(st.integers(min_value=0, max_value=len(enc) - 1))
        enc[i] ^= 1 << data.draw(st.integers(min_value=0, max_value=7))
    elif mode == "count":
        # adversarial DECLARED COUNT (r10 advice): splice an arbitrary
        # varint — up to 2^62 — in place of n; the small valid streams
        # the other modes mutate can never reach the max_values cap.
        from bigdatacw1_spark.sources.formats import _pb_varint

        n = data.draw(st.integers(min_value=0, max_value=1 << 62))
        body_start = 1
        while enc[body_start] & 0x80:
            body_start += 1
        body_start += 1
        enc = enc[:1] + bytearray(_pb_varint(n)) + enc[body_start:]
    else:
        enc += bytes(data.draw(st.integers(min_value=0, max_value=255))
                     for _ in range(data.draw(st.integers(min_value=1, max_value=4))))
    try:
        decode_rle_bitpack(bytes(enc))
    except ValueError:
        pass  # loud, typed refusal is the contract


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),  # stratum
            st.booleans(),                          # treated
            st.booleans(),                          # hit
        ),
        min_size=8,
        max_size=40,
    )
)
def test_cmh_statistic_matches_bruteforce(spark, rows):
    """The CMH fold shape (stratum-ordered list fold over dev/v/adn/bcn)
    must reproduce the textbook per-stratum formulas computed by a plain
    Python loop, including the continuity-correction clamp."""
    import math
    from collections import defaultdict

    from pyspark.sql import functions as F

    from bigdatacw1_spark.operators.relational import stable_round  # noqa: F401

    # strata need n >= 2 for the variance denominator; pad if needed
    counts: dict[int, int] = defaultdict(int)
    for s, _, _ in rows:
        counts[s] += 1
    rows = [r for r in rows if counts[r[0]] >= 2]
    if not rows:
        return
    df = spark.createDataFrame(rows, ["dow", "treated", "hit"])
    per = df.groupBy("dow").agg(
        F.sum(F.when(F.col("treated") & F.col("hit"), 1).otherwise(0))
        .cast("long").alias("a"),
        F.sum(F.when(F.col("treated"), 1).otherwise(0)).cast("long").alias("r1"),
        F.sum(F.when(F.col("hit"), 1).otherwise(0)).cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    got = {r["dow"]: r for r in per.collect()}
    # brute-force per-stratum cells
    cells = defaultdict(lambda: [0, 0, 0, 0])  # a, r1, c1, n
    for s, t, h in rows:
        c = cells[s]
        c[0] += int(t and h)
        c[1] += int(t)
        c[2] += int(h)
        c[3] += 1
    sdev = sv = 0.0
    for s in sorted(cells):
        a, r1, c1, n = cells[s]
        assert (got[s]["a"], got[s]["r1"], got[s]["c1"], got[s]["n"]) == (a, r1, c1, n)
        sdev += a - r1 * c1 / n
        sv += r1 * (n - r1) * c1 * (n - c1) / (n * n * (n - 1.0))
    if sv > 0:
        cmh = max(abs(sdev) - 0.5, 0.0) ** 2 / sv
        assert cmh >= 0 and math.isfinite(cmh)


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.data())
def test_image_audio_decoders_total_on_mutated_streams(data):
    """Robustness totality for the container codecs (r10 verdict #5,
    extending the RLE fuzz model to the image/audio/Avro family):
    truncating, bit-flipping, or extending a valid PNG/GIF/TIFF/WAV/Avro
    stream must either decode to SOMETHING or raise
    ValueError/NotImplementedError — never IndexError/KeyError/
    struct.error/zlib.error, and never an unbounded allocation (the
    header-declared geometry is capped before any inflate/expand)."""
    from bigdatacw1_spark.operators.multimodal import (
        decode_bmp,
        decode_flac,
        decode_gif,
        decode_jpeg,
        decode_png,
        decode_qoi,
        decode_tiff,
        decode_wav,
        encode_bmp,
        encode_flac,
        encode_gif,
        encode_jpeg_gray,
        encode_png,
        encode_qoi,
        encode_tiff,
        encode_wav,
    )
    from bigdatacw1_spark.sources.formats import (
        decode_avro_container,
        encode_avro_container,
    )

    from bigdatacw1_spark.operators.multimodal import (
        encode_wav_alaw,
        encode_wav_ima_adpcm,
        encode_wav_mulaw,
        split_mjpeg_frames,
    )

    codec = data.draw(
        st.sampled_from(
            ["png", "gif", "tiff", "wav", "avro", "bmp", "qoi", "flac", "jpeg",
             "wav_mulaw", "wav_alaw", "wav_adpcm", "mjpeg", "protobuf", "warc"]
        )
    )
    w = data.draw(st.integers(min_value=1, max_value=6))
    h = data.draw(st.integers(min_value=1, max_value=6))
    if codec == "png":
        px = bytes((3 * i + 1) % 256 for i in range(w * h * 3))
        enc, dec = bytearray(encode_png(w, h, 3, px)), decode_png
    elif codec == "gif":
        pal = [(i, 255 - i, 7 * i % 256) for i in range(4)]
        idxs = [(x + y) % 4 for y in range(h) for x in range(w)]
        enc, dec = bytearray(encode_gif(w, h, idxs, pal)), decode_gif
    elif codec == "tiff":
        px = bytes((5 * i + 2) % 256 for i in range(w * h))
        enc, dec = bytearray(encode_tiff(w, h, 1, 32773, px)), decode_tiff
    elif codec == "wav":
        samples = [((17 * i) % 65536) - 32768 for i in range(w * h * 4)]
        enc, dec = bytearray(encode_wav(8000, 1, samples)), decode_wav
    elif codec == "bmp":
        px = bytes((7 * i + 3) % 256 for i in range(w * h * 3))
        enc, dec = bytearray(encode_bmp(w, h, px)), decode_bmp
    elif codec == "qoi":
        px = bytes((11 * i + 5) % 256 for i in range(w * h * 3))
        enc, dec = bytearray(encode_qoi(w, h, px)), decode_qoi
    elif codec == "flac":
        samples = [((23 * i) % 65536) - 32768 for i in range(w * h * 4)]
        enc, dec = bytearray(encode_flac(8000, 1, samples)), decode_flac
    elif codec == "jpeg":
        jw, jh = 8 * w, 8 * h  # the encoder requires 8-aligned dims
        px = bytes((13 * i + 9) % 256 for i in range(jw * jh))
        enc, dec = bytearray(encode_jpeg_gray(jw, jh, px)), decode_jpeg
    elif codec == "wav_mulaw":
        pcm = [((31 * i) % 65536) - 32768 for i in range(w * h * 3)]
        enc, dec = bytearray(encode_wav_mulaw(8000, 1, pcm)), decode_wav
    elif codec == "wav_alaw":
        pcm = [((29 * i) % 65536) - 32768 for i in range(w * h * 3)]
        enc, dec = bytearray(encode_wav_alaw(8000, 1, pcm)), decode_wav
    elif codec == "wav_adpcm":
        pcm = [((i * 37 + w) % 4096) - 2048 for i in range(w * h * 3 + 4)]
        enc, dec = bytearray(encode_wav_ima_adpcm(8000, pcm)), decode_wav
    elif codec == "mjpeg":
        frame = encode_jpeg_gray(8, 8, bytes((13 * i + w) % 256 for i in range(64)))

        def dec(payload, _s=split_mjpeg_frames, _d=decode_jpeg):
            for fr in _s(payload):
                _d(fr)

        enc = bytearray(frame * h)
    elif codec == "protobuf":
        from bigdatacw1_spark.sources.formats import (
            decode_protobuf_stream,
            encode_protobuf_stream,
        )

        precs = [(i, i + 1, 10 * i, -3 * i, "NRA"[i % 3]) for i in range(w * h)]
        enc, dec = bytearray(encode_protobuf_stream(precs)), decode_protobuf_stream
    elif codec == "warc":
        from bigdatacw1_spark.sources.formats import build_warc, parse_warc

        wrecs = [
            ("response", f"http://x/{i}", bytes((7 * i + k) % 256 for k in range(w)))
            for i in range(h)
        ]
        enc, dec = bytearray(build_warc(wrecs)), parse_warc
    else:
        recs = [(i, i + 1, 10 * i, -3 * i, "NRA"[i % 3]) for i in range(w * h)]
        enc, dec = bytearray(encode_avro_container(recs, block_size=3)), (
            decode_avro_container
        )

    mode = data.draw(st.sampled_from(["truncate", "flip", "extend"]))
    if mode == "truncate":
        enc = enc[: data.draw(st.integers(min_value=0, max_value=len(enc)))]
    elif mode == "flip":
        i = data.draw(st.integers(min_value=0, max_value=len(enc) - 1))
        enc[i] ^= 1 << data.draw(st.integers(min_value=0, max_value=7))
    else:
        enc += bytes(
            data.draw(st.integers(min_value=0, max_value=255))
            for _ in range(data.draw(st.integers(min_value=1, max_value=4)))
        )
    try:
        dec(bytes(enc))
    except (ValueError, NotImplementedError):
        pass  # loud, typed refusal is the contract


def test_codec_bomb_declarations_refuse_before_allocating():
    """Adversarial header-declared geometry (the decode_rle_bitpack
    max_values class, r10 advice): a tiny payload declaring enormous
    output must refuse with the typed error BEFORE inflating or
    allocating — each case below would otherwise be a multi-GB
    decompression/expansion bomb or an astronomically-sized table."""
    import struct

    import pytest

    from bigdatacw1_spark.operators.multimodal import (
        decode_gif,
        decode_png,
        decode_tiff,
        encode_gif,
        encode_png,
    )
    from bigdatacw1_spark.sources.formats import decode_avro_container

    # PNG: splice 65535x65535 into IHDR (w at byte 16, h at 20) over a
    # tiny valid image -> must refuse at the pixel cap, not inflate.
    png = bytearray(encode_png(4, 4, 3, bytes(48)))
    png[16:24] = struct.pack(">II", 65535, 65535)
    with pytest.raises(ValueError, match="max_pixels"):
        decode_png(bytes(png))
    # PNG: shrink the declared height under the real stream -> the
    # bounded inflate must flag the surplus, not silently truncate.
    png2 = bytearray(encode_png(4, 4, 3, bytes(48)))
    png2[16:24] = struct.pack(">II", 4, 2)
    with pytest.raises(ValueError, match="length mismatch"):
        decode_png(bytes(png2))

    # GIF: the LZW min-code-size byte sizes a 2^mcs root table; a single
    # mutated byte must not request a 2^64-entry allocation.
    pal = [(i, i, i) for i in range(4)]
    gif = bytearray(encode_gif(3, 3, [0] * 9, pal))
    mcs_off = 13 + 3 * 4 + 10
    assert gif[mcs_off] == 2  # the fixture's real min code size
    gif[mcs_off] = 64
    with pytest.raises(ValueError, match="min code size"):
        decode_gif(bytes(gif))
    # GIF: roots beyond the color table would escape as IndexError on
    # the palette lookup.
    gif[mcs_off] = 8
    with pytest.raises(ValueError, match="color table"):
        decode_gif(bytes(gif))
    # GIF: huge declared image dimensions cap before LZW expansion.
    gif2 = bytearray(encode_gif(3, 3, [0] * 9, pal))
    gif2[13 + 12 + 5 : 13 + 12 + 9] = struct.pack("<HH", 65535, 65535)
    with pytest.raises(ValueError, match="max_pixels"):
        decode_gif(bytes(gif2))

    # TIFF: 60000x60000 declared over a 2-byte PackBits run -> pixel cap.
    def tag(t, typ, count, value):
        return struct.pack("<HHII", t, typ, count, value)

    strip = b"\x81\xff"  # PackBits: 128-byte run, would amplify 64x
    ifd_off = 8 + len(strip)
    entries = (
        tag(256, 4, 1, 60000) + tag(257, 4, 1, 60000) + tag(258, 3, 1, 8)
        + tag(259, 3, 1, 32773) + tag(273, 4, 1, 8) + tag(277, 3, 1, 1)
        + tag(278, 4, 1, 60000) + tag(279, 4, 1, len(strip))
    )
    tiff = (
        b"II" + struct.pack("<HI", 42, ifd_off) + strip
        + struct.pack("<H", 8) + entries + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError, match="pixel cap"):
        decode_tiff(tiff)

    # PNG: zero dimensions must refuse BEFORE inflating — h=0 makes the
    # declared size 0 and zlib treats max_length=0 as UNLIMITED, so this
    # header previously re-opened the bomb (review finding): a zlib
    # stream inflating far past the declared size must never
    # materialize.
    import zlib

    bomb = zlib.compress(bytes(1 << 20), 9)  # 1 MB of zeros -> ~1 KB
    png3 = bytearray(encode_png(4, 4, 3, bytes(48)))
    png3[16:24] = struct.pack(">II", 4, 0)
    # splice the bomb in as the IDAT body of a minimal chunk stream
    ihdr = bytes(png3[8 : 8 + 25])  # len+type+13+crc
    idat = struct.pack(">I", len(bomb)) + b"IDAT" + bomb + b"\x00\x00\x00\x00"
    iend = struct.pack(">I", 0) + b"IEND" + b"\x00\x00\x00\x00"
    with pytest.raises(ValueError, match="zero PNG dimension"):
        decode_png(b"\x89PNG\r\n\x1a\n" + ihdr + idat + iend)

    # JPEG: plane allocation is PER COMPONENT, so the pixel cap alone is
    # not enough — a SOF0 declaring 255 components (each 1x1 sampling,
    # passing the 4:4:4 check) at the full capped geometry would request
    # 255 full-geometry float64 planes (~34 GB virtual). The component
    # count must be capped before the planes are allocated (r11 advice).
    from bigdatacw1_spark.operators.multimodal import decode_jpeg

    ncomp = 255
    sof_body = struct.pack(">BHHB", 8, 4096, 4096, ncomp) + b"".join(
        struct.pack(">BBB", cid + 1, 0x11, 0) for cid in range(ncomp)
    )
    sof = b"\xff\xc0" + struct.pack(">H", 2 + len(sof_body)) + sof_body
    with pytest.raises(ValueError, match="components"):
        decode_jpeg(b"\xff\xd8" + sof)

    # QOI: huge declared dimensions cap before the RUN-op amplification
    # loop (each input byte can emit 186 output bytes).
    from bigdatacw1_spark.operators.multimodal import decode_qoi, encode_qoi

    qoi = bytearray(encode_qoi(3, 3, bytes(27)))
    qoi[4:12] = struct.pack(">II", 65535, 65535)
    with pytest.raises(ValueError, match="max_pixels"):
        decode_qoi(bytes(qoi))

    # Avro: a negative string length would rewind the cursor (infinite
    # loop); zigzag 0x01 == -1.
    with pytest.raises(ValueError, match="negative Avro"):
        decode_avro_container(b"Obj\x01" + b"\x01" + b"\x02" + b"\x01")
    # Avro: truncated varint refuses with the typed error.
    with pytest.raises(ValueError, match="truncated Avro varint"):
        decode_avro_container(b"Obj\x01" + b"\x80")

    # WARC: a negative Content-Length would rewind the cursor too.
    from bigdatacw1_spark.sources.formats import (
        build_warc,
        gunzip_bounded,
        parse_warc,
    )

    neg = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: -4\r\n\r\n"
    with pytest.raises(ValueError, match="negative WARC"):
        parse_warc(neg)
    # gunzip_bounded: a ~100 KB gzip bomb inflating to 100 MB refuses at
    # the cap; a legal multi-member stream (the .warc.gz layout) still
    # concatenates; truncation refuses typed.
    import gzip

    bomb_gz = gzip.compress(bytes(100 << 20), 9)
    with pytest.raises(ValueError, match="max_bytes"):
        gunzip_bounded(bomb_gz, max_bytes=1 << 20)
    members = gzip.compress(b"alpha", mtime=0) + gzip.compress(b"beta", mtime=0)
    assert gunzip_bounded(members) == b"alphabeta"
    with pytest.raises(ValueError, match="truncated gzip"):
        gunzip_bounded(members[:-5])
    # trailing NUL padding (block-aligned gzip writers) must decode like
    # gzip.decompress does, not refuse as a corrupt member
    assert gunzip_bounded(members + b"\x00" * 16) == b"alphabeta"
    # and the WARC fixture round-trips through the bounded inflater
    blob = build_warc([("response", "http://x", b"hello"), ("request", None, b"")])
    assert parse_warc(gunzip_bounded(gzip.compress(blob, mtime=0))) == [
        ("response", "http://x", b"hello"),
        ("request", None, b""),
    ]
