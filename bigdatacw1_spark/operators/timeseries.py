"""Time-series operators beyond resample/ffill (SURVEY.md §2 extensions).

The reference's domain is daily equity prices — a time series — but its
queries only ever aggregate snapshots. These are the series-native
operators that domain grows into, shaped for Spark's execution model:
every one is a window or grid-join keyed by the series id, so the data
shuffles once on the key regardless of scale, and all arithmetic stays
in JVM expressions (integer where exactness matters).

See also operators/relational.py: sessionize, resample_ffill,
as_of_join — the same family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigdatacw1_spark.operators.relational import stable_round


def twap(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    tiebreak: str,
    cents_scale: int = 100,
) -> DataFrame:
    """Time-weighted average of a piecewise-constant series per key:
    each observation holds until the next one, so
    TWAP = Σ vᵢ·(tᵢ₊₁−tᵢ) / (t_N − t₁). The plain AVG over-weights
    bursts (ten ticks in a minute count ten times); TWAP weights by
    holding time — the standard fix for irregular financial/telemetry
    series.

    Exactness: values are quantized to integer ``cents_scale``-ths and
    durations to whole epoch seconds, so the weighted sum is a BIGINT —
    order-independent and bit-identical cross-engine; only the final
    division is floating point. One shuffle on the key serves the lead
    window and the aggregation. Keys with a single observation have no
    holding interval and drop out (SQL semantics: zero weight rows); a
    key whose observations are ALL simultaneous keeps a row with
    span_seconds=0 and twap NULL (try_divide — ANSI-safe).

    Output: (*key_cols, twap, span_seconds, n_obs).
    """
    w = Window.partitionBy(*key_cols).orderBy(F.asc(ts_col), F.asc(tiebreak))
    t = F.unix_timestamp(F.col(ts_col))
    nxt = F.lead(t).over(w)
    v_units = F.round(F.col(value_col) * cents_scale).cast("long")
    seg = df.select(
        *key_cols,
        (nxt - t).alias("__dt"),
        v_units.alias("__v"),
    ).where(F.col("__dt").isNotNull())
    return (
        seg.groupBy(*key_cols)
        .agg(
            stable_round(
                F.try_divide(
                    F.sum(F.col("__v") * F.col("__dt")).cast("double"),
                    F.lit(float(cents_scale)) * F.sum("__dt"),
                ),
                4,
            ).alias("twap"),
            F.sum("__dt").alias("span_seconds"),
            (F.count(F.lit(1)) + 1).alias("n_obs"),
        )
    )


def resample_interpolate(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    tiebreak: str,
) -> DataFrame:
    """Hourly resample with LINEAR interpolation: one row per (key, hour)
    over the global span; hours between two observations get the
    straight-line value, hours outside a key's observed range stay NULL.
    The companion of resample_ffill for continuous quantities (a held
    price forward-fills; a temperature interpolates).

    Same scalable shape as resample_ffill — the per-(key,hour) last-
    observation rank, both fill windows, and the grid join all ride ONE
    hash partitioning by key; the dense grid is sequence+explode (never
    driver-side). The interpolation fraction uses whole-hour integer
    offsets, so the only floating-point step is the final
    prev + (next−prev)·frac — identical IEEE ops in any engine.

    Output: (key, hour, value_interp).
    """
    hour = F.date_trunc("hour", F.col(ts_col))
    w_last = Window.partitionBy(key, "hour").orderBy(F.desc(ts_col), F.desc(tiebreak))
    obs = (
        df.select(key, hour.alias("hour"), F.col(ts_col), F.col(value_col), F.col(tiebreak))
        .withColumn("rn", F.row_number().over(w_last))
        .where(F.col("rn") == 1)
        .select(key, "hour", F.col(value_col).alias("__obs"))
    )
    bounds = df.agg(
        F.date_trunc("hour", F.min(ts_col)).alias("h0"),
        F.date_trunc("hour", F.max(ts_col)).alias("h1"),
    )
    grid = (
        df.select(key)
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            key,
            F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hour"),
        )
    )
    g = grid.join(obs, [key, "hour"], "left")
    hnum = (F.unix_timestamp("hour") / F.lit(3600)).cast("long")
    g = g.withColumn("__h", hnum)
    w_back = (
        Window.partitionBy(key)
        .orderBy("__h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(key)
        .orderBy("__h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_h = F.when(F.col("__obs").isNotNull(), F.col("__h"))
    prev_v = F.last("__obs", ignorenulls=True).over(w_back)
    prev_h = F.last(obs_h, ignorenulls=True).over(w_back)
    next_v = F.first("__obs", ignorenulls=True).over(w_fwd)
    next_h = F.first(obs_h, ignorenulls=True).over(w_fwd)
    frac = (F.col("__h") - prev_h).cast("double") / (next_h - prev_h).cast("double")
    interp = (
        F.when(F.col("__obs").isNotNull(), F.col("__obs"))
        .when(
            prev_v.isNotNull() & next_v.isNotNull(),
            stable_round(prev_v + (next_v - prev_v) * frac, 4),
        )
        .otherwise(F.lit(None).cast("double"))
    )
    return g.select(key, "hour", interp.alias("value_interp"))


def rolling_zscore(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    tiebreak: str,
    window_rows: int = 10,
    cents_scale: int = 100,
) -> DataFrame:
    """Rolling z-score anomaly signal: each observation scored against
    the mean/std of the trailing ``window_rows`` observations of the
    same key (itself included) — the unsupervised spike detector every
    telemetry pipeline runs first.

    Exactness discipline: the frame aggregates are Σv and Σv² over
    integer ``cents_scale``-ths — BIGINT, order-independent, identical
    in any engine — and mean/variance/z are derived from them with one
    fixed sequence of IEEE ops, so even this floating-point statistic
    is hash-checkable cross-engine (same trick as the exact-decimal
    moments in a14). Population variance (÷n) over the frame; windows
    shorter than 2 rows or with zero variance yield NULL z. One key
    shuffle serves the single window pass.

    Output: input keys + (ts, value, roll_mean, roll_std, zscore).
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.asc(ts_col), F.asc(tiebreak))
        .rowsBetween(-(window_rows - 1), Window.currentRow)
    )
    v = F.round(F.col(value_col) * cents_scale).cast("long")
    n = F.count(F.lit(1)).over(w)
    s1 = F.sum(v).over(w)
    s2 = F.sum(v * v).over(w)
    mean = s1.cast("double") / n / cents_scale
    var = (
        (s2.cast("double") / n) - (s1.cast("double") / n) * (s1.cast("double") / n)
    ) / F.lit(float(cents_scale * cents_scale))
    std = F.sqrt(var)
    z = F.when((n >= 2) & (std > 0), (F.col(value_col) - mean) / std)
    return df.select(
        *key_cols,
        F.col(ts_col),
        F.col(value_col),
        stable_round(mean, 4).alias("roll_mean"),
        stable_round(std, 4).alias("roll_std"),
        stable_round(z, 4).alias("zscore"),
    )


def ewma_last(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    alpha: float = 0.5,
    lookback: int = 64,
    tiebreak: str | None = None,
    round_digits: int = 4,
) -> DataFrame:
    """Exponentially weighted moving average per key — the smoothed
    "current level" signal (monitoring, anomaly baselines, trading
    marks): s_1 = x_1, s_t = (1-alpha)*s_{t-1} + alpha*x_t over the
    time-ordered observations; returns the final s per key.

    The fold is truncated to the most recent ``lookback`` observations.
    That bounds per-key state (rank window -> filter -> bounded
    collect), and with the default alpha=0.5 / lookback=64 the dropped
    tail's weight is 2^-64 — below double-precision resolution, so the
    truncation is exact in IEEE terms. The kept values fold in ascending
    time order via ``F.aggregate`` seeded with the oldest kept value,
    the same left fold DuckDB's ``LIST_REDUCE`` runs, so the rounded
    result hash-compares across engines.

    Scale shape: one shuffle on the key for the rank window; the groupBy
    that follows reuses the same hash partitioning. State is
    lookback-bounded per key, never history-bounded. The streaming
    companion is transformWithState with the same bounded deque.
    """
    order = [F.col("__ts").desc()] + (
        [F.col("__tb").desc()] if tiebreak else []
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    wall = Window.partitionBy(*keys)
    ranked = df.select(
        *keys,
        F.col(ts_col).alias("__ts"),
        *( [F.col(tiebreak).alias("__tb")] if tiebreak else [] ),
        F.col(value_col).cast("double").alias("__v"),
    ).withColumn("__rn", F.row_number().over(w)).withColumn(
        "n_obs", F.count(F.lit(1)).over(wall)
    ).withColumn("last_ts", F.max("__ts").over(wall))

    obs_struct = F.struct(
        F.col("__ts").alias("ts"),
        *( [F.col("__tb").alias("tb")] if tiebreak else [] ),
        F.col("__v").alias("v"),
    )
    kept = ranked.where(F.col("__rn") <= lookback)
    agg = kept.groupBy(*keys).agg(
        F.sort_array(F.collect_list(obs_struct)).alias("os"),
        F.max("n_obs").alias("n_obs"),
        F.max("last_ts").alias("last_ts"),
    )
    folded = F.aggregate(
        F.slice(F.col("os"), 2, F.size("os") - 1),
        F.element_at(F.col("os"), 1)["v"],
        lambda acc, o: acc * F.lit(1.0 - alpha) + o["v"] * F.lit(alpha),
    )
    return agg.select(
        *keys,
        F.col("n_obs").cast("long").alias("n_obs"),
        F.col("last_ts"),
        stable_round(folded, round_digits).alias("ewma"),
    )


def window_funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    tiebreak_col: str,
    type_col: str,
    steps: list[str],
    window_micros: int,
) -> DataFrame:
    """Ordered-funnel depth per user (ClickHouse ``windowFunnel``
    semantics): the largest k such that the user has events of types
    ``steps[0] < steps[1] < … < steps[k-1]`` in that order under the
    total order (ts, tiebreak), with the whole chain inside
    ``window_micros``: t_k − t_1 ≤ W. Intermediate spacing is
    unconstrained — only the end-to-end span is.

    Instead of the naive k-way self-join (k shuffles, quadratic blowup
    on hot users), this runs k−1 CASCADED RUNNING-MAX WINDOW PASSES
    over one (user, ts, tiebreak) sort:

      c₁(row)  = ts                       if type = steps[0]
      cₖ(row)  = max cₖ₋₁ over EARLIER rows   if type = steps[k−1]

    cₖ at a row of type steps[k−1] is the LATEST possible chain start
    t_1 among all ordered chains steps[0..k−1] ending at this row —
    and maximizing t_1 is exactly optimal because the only window
    constraint is t_1 ≥ t_k − W (a chain exists within W iff the
    max-t_1 chain is within W). Satisfiability is monotone in k (a
    within-window chain's prefix is within window), so
    depth = max{k : some row has cₖ ≠ null ∧ ts − cₖ ≤ W}.

    All k−1 window passes share ONE partitioning and sort (user key) —
    a single shuffle regardless of k, per-user state is O(1) per pass,
    and hot users cost n·k row visits, never n^k. Exact integer
    microsecond arithmetic end to end.

    Output: (user_col, funnel_depth ∈ [0, len(steps)]).
    """
    if len(steps) < 2:
        raise ValueError("window_funnel needs at least 2 steps")
    w_excl = (
        Window.partitionBy(user_col)
        .orderBy(F.asc(ts_col), F.asc(tiebreak_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # ts arrives as TIMESTAMP_NTZ (catalog normalization); the UTC session
    # timezone makes the cast a pure reinterpretation, and only DIFFERENCES
    # of t_us are compared, so the epoch basis cancels either way.
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    out = df.select(user_col, ts_col, tiebreak_col, type_col).withColumn(
        "__c1", F.when(F.col(type_col) == steps[0], t_us)
    )
    for k in range(2, len(steps) + 1):
        out = out.withColumn(
            f"__c{k}",
            F.when(
                F.col(type_col) == steps[k - 1],
                F.max(F.col(f"__c{k-1}")).over(w_excl),
            ),
        )
    oks = [
        F.max(
            (
                F.col(f"__c{k}").isNotNull()
                & ((t_us - F.col(f"__c{k}")) <= F.lit(window_micros))
            ).cast("int")
        ).alias(f"__ok{k}")
        for k in range(1, len(steps) + 1)
    ]
    per_user = out.groupBy(user_col).agg(*oks)
    depth = F.greatest(
        F.lit(0),
        *[F.col(f"__ok{k}") * k for k in range(1, len(steps) + 1)],
    )
    return per_user.select(
        user_col, depth.cast("int").alias("funnel_depth")
    )


def holt_forecast(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    round_digits: int = 4,
) -> DataFrame:
    """Holt's linear-trend double exponential smoothing per key
    (α = β = 0.5): level and trend evolve as

        l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1})
        b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}

    seeded the standard way (l_2 = x_2, b_2 = x_2 − x_1); the one-step
    forecast is l + b. This is the next rung above ewma_last: EWMA
    tracks a LEVEL and lags any trend systematically, Holt tracks the
    slope too — the default short-horizon forecaster for capacity and
    load series.

    Exactness discipline (ewma_last family): the per-key series is a
    SORTED bounded collect folded left-to-right with the exact same
    expression shapes the DuckDB oracle's LIST_REDUCE runs (α/β = 0.5
    are exact binary fractions; l_new is inlined twice identically in
    both engines), so the rounded outputs hash-compare. One shuffle on
    the key; per-key state is the series (day-bounded), fold state is
    two doubles.

    Output: (*keys, n_obs, level, trend, forecast_next).
    """
    obs = F.struct(F.col(ts_col).alias("t"), F.col(value_col).cast("double").alias("v"))
    agg = df.groupBy(*keys).agg(
        F.sort_array(F.collect_list(obs)).alias("os"),
    )
    xs = F.transform(F.col("os"), lambda o: o["v"])
    init = F.struct(
        F.element_at(xs, 1).alias("l"),
        F.lit(None).cast("double").alias("b"),
    )
    a = F.lit(0.5)

    def step(acc, x):
        l_new = a * x + a * (acc["l"] + acc["b"])
        return F.when(
            acc["b"].isNull(),
            F.struct(x.alias("l"), (x - acc["l"]).alias("b")),
        ).otherwise(
            F.struct(
                l_new.alias("l"),
                (a * (l_new - acc["l"]) + a * acc["b"]).alias("b"),
            )
        )

    folded = F.aggregate(F.slice(xs, 2, F.size(xs) - 1), init, step)
    return agg.where(F.size("os") >= 2).select(
        *keys,
        F.size("os").cast("long").alias("n_obs"),
        stable_round(folded["l"], round_digits).alias("level"),
        stable_round(folded["b"], round_digits).alias("trend"),
        stable_round(folded["l"] + folded["b"], round_digits).alias("forecast_next"),
    )


def kalman_filter_1d(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    q_var: float = 0.25,
    r_var: float = 4.0,
    round_digits: int = 4,
) -> DataFrame:
    """Scalar Kalman filter per key (random-walk state model): the
    optimal linear estimator when the series is a noisy observation of
    a drifting level — the principled upgrade of ewma_last, whose gain
    ADAPTS (starts high while the state is uncertain, settles to the
    steady-state Riccati value) instead of staying fixed at α.

        predict:  x⁻ = x,           P⁻ = P + Q
        update:   K  = P⁻/(P⁻+R),   x  = x⁻ + K·(z − x⁻),  P = (1−K)·P⁻

    seeded x₁ = z₁, P₁ = 1. Q/R default to exact binary fractions
    (0.25/4.0) so the gain arithmetic carries no decimal-literal drift.

    Exactness discipline (holt_forecast family): per-key SORTED bounded
    collect folded left-to-right with the exact expression shapes the
    DuckDB oracle's RECURSIVE CTE runs (struct-state folds must not use
    LIST_REDUCE — see ev_holt_forecast's oracle note). One shuffle on
    the key; fold state is two doubles.

    Output: (*keys, n_obs, estimate, variance, gain) — gain is the
    steady value K implied by the FINAL variance, the number you read
    to know how reactive the filter has become.
    """
    obs = F.struct(F.col(ts_col).alias("t"), F.col(value_col).cast("double").alias("v"))
    agg = df.groupBy(*keys).agg(F.sort_array(F.collect_list(obs)).alias("os"))
    xs = F.transform(F.col("os"), lambda o: o["v"])
    init = F.struct(
        F.element_at(xs, 1).alias("x"),
        F.lit(1.0).alias("p"),
    )

    def step(acc, z):
        pp = acc["p"] + F.lit(q_var)
        k = pp / (pp + F.lit(r_var))
        return F.struct(
            (acc["x"] + k * (z - acc["x"])).alias("x"),
            ((F.lit(1.0) - k) * pp).alias("p"),
        )

    folded = F.aggregate(
        F.slice(xs, 2, F.greatest(F.size(xs) - 1, F.lit(0))), init, step
    )
    pp_final = folded["p"] + F.lit(q_var)
    return agg.where(F.size("os") >= 1).select(
        *keys,
        F.size("os").cast("long").alias("n_obs"),
        stable_round(folded["x"], round_digits).alias("estimate"),
        stable_round(folded["p"], round_digits).alias("variance"),
        stable_round(pp_final / (pp_final + F.lit(r_var)), round_digits).alias("gain"),
    )


def backtest_one_step(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    round_digits: int = 4,
) -> DataFrame:
    """Rolling-origin one-step backtest — the evaluation every deployed
    forecaster needs before it gates capacity decisions: walk each key's
    series in time order, at every step i >= 2 score the EWMA forecast
    (state up to i−1, α = 0.5) AND the naive last-value forecast against
    the actual x_i, and report both mean absolute errors. A model that
    cannot beat mae_naive has no business forecasting (the
    Makridakis-competition yardstick).

    Exactness discipline (holt_forecast family): per-key SORTED bounded
    collect, one left fold carrying four scalars (ewma, two error sums,
    prev), the identical expression shapes the oracle's RECURSIVE CTE
    replays (α = 0.5 exact; struct-state folds must avoid DuckDB's
    LIST_REDUCE — see ev_holt_forecast). One shuffle on the key.

    Output: (*keys, n_forecasts, mae_ewma, mae_naive).
    """
    obs = F.struct(F.col(ts_col).alias("t"), F.col(value_col).cast("double").alias("v"))
    agg = df.groupBy(*keys).agg(F.sort_array(F.collect_list(obs)).alias("os"))
    xs = F.transform(F.col("os"), lambda o: o["v"])
    x1 = F.element_at(xs, 1)
    init = F.struct(
        x1.alias("ewma"),
        F.lit(0.0).alias("sae_e"),
        F.lit(0.0).alias("sae_n"),
        x1.alias("prev"),
    )
    a = F.lit(0.5)

    def step(acc, x):
        return F.struct(
            # a*x + (1-a)*ewma — written with the explicit (1-a) so the
            # weights sum to 1 for ANY alpha, not just the default 0.5
            # where a == 1-a happens to hold.
            (a * x + (F.lit(1.0) - a) * acc["ewma"]).alias("ewma"),
            (acc["sae_e"] + F.abs(x - acc["ewma"])).alias("sae_e"),
            (acc["sae_n"] + F.abs(x - acc["prev"])).alias("sae_n"),
            x.alias("prev"),
        )

    folded = F.aggregate(F.slice(xs, 2, F.size(xs) - 1), init, step)
    n_fc = (F.size(xs) - 1).cast("double")
    return agg.where(F.size("os") >= 2).select(
        *keys,
        (F.size(xs) - 1).cast("long").alias("n_forecasts"),
        stable_round(folded["sae_e"] / n_fc, round_digits).alias("mae_ewma"),
        stable_round(folded["sae_n"] / n_fc, round_digits).alias("mae_naive"),
    )


def cusum_changepoint(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    round_digits: int = 4,
    scale: float = 100.0,
) -> DataFrame:
    """CUSUM level-shift change-point detection per key (Page 1954):
    against a reference mean from each series' FIRST HALF, the one-sided
    CUSUM is C_t = max(0, C_{t−1} + (x_t − μ)); its peak marks the most
    sustained upward shift and the peak's position the change point.

    Spark shape — NO sequential fold at all: with S_t = Σ_{i≤t}(x_i − μ),
    the recurrence collapses to C_t = S_t − min(0, min_{j≤t} S_j), so
    the whole detector is two cumulative windows (sum, min) plus a rank,
    all partitioned by the series key — one shuffle, no collect, no
    partition-less window.

    Exactness: x is integer ``value_col`` units and μ = s1/n1 is kept as
    the exact pair, so D_t = n1·x_t − s1 and every cumulation is BIGINT;
    the only floats are the two output divisions. ``scale`` divides the
    two reported floats — the default 100.0 converts the cents callers'
    integer units to currency; pass ``scale=1.0`` for already-scaled
    series (previously this was hardcoded, silently rescaling non-cents
    callers by 100×). Series shorter than 4 observations have no
    meaningful reference half and drop out.

    Output: (*keys, n_days, mu_ref, peak_cusum, peak_day).
    """
    kp = [F.col(k) for k in keys]
    w_ord = (
        Window.partitionBy(*kp)
        .orderBy("__day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*kp)
    base = df.select(
        *kp, F.col(ts_col).alias("__day"), F.col(value_col).cast("long").alias("__x")
    )
    idx = F.row_number().over(Window.partitionBy(*kp).orderBy("__day"))
    n = F.count(F.lit(1)).over(w_all)
    half = F.call_function("div", n, F.lit(2))
    withref = base.select(
        *kp,
        "__day",
        "__x",
        n.alias("__n"),
        F.sum(F.when(idx <= half, F.lit(1)).otherwise(F.lit(0))).over(w_all).alias("__n1"),
        F.sum(F.when(idx <= half, F.col("__x"))).over(w_all).alias("__s1"),
    )
    dd = F.col("__n1") * F.col("__x") - F.col("__s1")
    s = withref.withColumn("__ss", F.sum(dd).over(w_ord))
    c = s.withColumn(
        "__cc", F.col("__ss") - F.least(F.min("__ss").over(w_ord), F.lit(0))
    )
    rk = F.row_number().over(
        Window.partitionBy(*kp).orderBy(F.desc("__cc"), F.asc("__day"))
    )
    mu = F.col("__s1").cast("double") / F.col("__n1") / F.lit(float(scale))
    peak = F.col("__cc").cast("double") / F.col("__n1") / F.lit(float(scale))
    return (
        c.withColumn("__rk", rk)
        .where((F.col("__rk") == 1) & (F.col("__n") >= 4))
        .select(
            *kp,
            F.col("__n").cast("long").alias("n_days"),
            stable_round(mu, round_digits).alias("mu_ref"),
            stable_round(peak, round_digits).alias("peak_cusum"),
            F.col("__day").alias("peak_day"),
        )
    )


def theil_sen_slope(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    round_digits: int = 4,
) -> DataFrame:
    """Theil–Sen robust trend per key: the MEDIAN of all pairwise slopes
    (x_j − x_i)/(t_j − t_i), i < j — the estimator that tolerates up to
    ~29% arbitrary outliers where OLS (a17_regression) is dragged by a
    single whale day. The standard robust companion to the MAD anomaly
    gate: MAD flags the outliers, Theil–Sen reports the trend as if
    they were not there.

    Scale shape: the pair join is quadratic in SERIES LENGTH, which is
    calendar-bounded (≤365 points/key/year — never corpus-sized), and
    equi-keyed on the series key, so it shuffles once and each key's
    pairs stay local. Slopes are exact integer differences divided
    once (both engines produce bit-identical doubles); the median is
    the exact interpolated quantile over that multiset, so the rounded
    output hash-compares (QUANTILE_CONT ≡ F.percentile).

    Output: (*keys, n_points, n_pairs, ts_slope)."""
    a = df.select(
        *keys, F.col(ts_col).alias("__d1"), F.col(value_col).cast("long").alias("__v1")
    )
    b = df.select(
        *keys, F.col(ts_col).alias("__d2"), F.col(value_col).cast("long").alias("__v2")
    )
    pairs = a.join(b, on=keys).where(F.col("__d1") < F.col("__d2"))
    slope = (F.col("__v2") - F.col("__v1")).cast("double") / F.datediff(
        F.col("__d2"), F.col("__d1")
    ).cast("double")
    per_key_points = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_points"))
    slopes = pairs.select(*keys, slope.alias("__slope")).groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.percentile("__slope", F.lit(0.5)).alias("__med"),
    )
    return (
        per_key_points.join(slopes, on=keys)
        .select(
            *keys,
            F.col("n_points").cast("long").alias("n_points"),
            "n_pairs",
            stable_round(F.col("__med"), round_digits).alias("ts_slope"),
        )
    )


def dtw_fold(a: "Column", b: "Column", na: "Column", nb: "Column") -> "Column":
    """Dynamic-time-warping distance between two per-row series arrays
    (|·| local cost, unit steps, full band) as ONE JVM-side fold — the
    classic elastic similarity for time series that plain Euclidean
    comparison gets wrong under phase shift, and an operator Spark has
    no builtin for.

    The O(na·nb) DP runs row-major over cell index t with a SLIDING
    list of only the last nb+1 cell values (the cells any step can
    reach: left = L[len], up = L[len−nb+1], diag = L[len−nb]), so the
    fold state is O(nb), not O(na·nb). Boundary rows/columns fall out
    of the CASE on (i, j); branches guard every element_at, so no
    out-of-range index is ever evaluated under ANSI mode. With
    integer-valued inputs (cents) every cell stays an exact integer in
    double — min/plus arithmetic carries no float-order sensitivity —
    which is what lets a DuckDB recursive CTE replay the identical DP
    (see ev_dtw_distance).

    Intended use: per-key series joined against one broadcast
    reference row; the fold is a scalar expression, so it distributes
    with the rows. Requires na ≥ 2 and nb ≥ 2 (filter first).
    """
    init = F.array(F.abs(F.element_at(a, 1) - F.element_at(b, 1)))
    seq = F.sequence(F.lit(2), (na * nb).cast("int"))

    def step(acc, tn):
        t = tn - 1
        i = (F.floor(t / nb) + 1).cast("int")
        j = (F.pmod(t, nb) + 1).cast("int")
        ln = F.size(acc)
        c = F.abs(F.element_at(a, i) - F.element_at(b, j))
        left = F.element_at(acc, ln)
        up = F.element_at(acc, ln - nb.cast("int") + 1)
        diag = F.element_at(acc, ln - nb.cast("int"))
        d = c + (
            F.when(i == 1, left)
            .when(j == 1, up)
            .otherwise(F.least(left, up, diag))
        )
        newl = F.concat(acc, F.array(d))
        return F.when(
            F.size(newl) > nb.cast("int") + 1, F.slice(newl, 2, nb.cast("int") + 1)
        ).otherwise(newl)

    folded = F.aggregate(seq, init, step)
    return F.element_at(folded, F.size(folded))


def garch_volatility(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    omega: float = 0.25,
    alpha: float = 0.125,
    beta: float = 0.75,
    round_digits: int = 6,
) -> DataFrame:
    """GARCH(1,1) conditional-variance filter per key with fixed exact
    binary-fraction parameters (omega=1/4, alpha=1/8, beta=3/4 by
    default; alpha+beta < 1 so the process is covariance-stationary
    with long-run variance omega/(1-alpha-beta)):

        h_t = omega + alpha*eps2_{t-1} + beta*h_{t-1},  h_1 = eps2_1

    over the squared first differences eps2 of the (time-sorted) value
    series scaled to units (value/100). This is the volatility rung of
    the estimator ladder: ewma_last smooths the LEVEL, holt_forecast
    adds a SLOPE, kalman_filter_1d adapts the gain, and GARCH tracks
    the VARIANCE of the innovations — variance clustering is the
    defining stylized fact of financial and load series, invisible to
    all three level trackers.

    Exactness discipline (ewma_last family): the recursion is a SCALAR
    left fold, so both engines run it as h = fold(step, seed=eps2_1)
    over eps2_1..eps2_{m-1} — Spark as F.aggregate over the sorted
    collected series, DuckDB as LIST_REDUCE over the seed-prepended
    truncated list (LIST_REDUCE seeds with the first element) — with
    the step expression omega + alpha*x + beta*acc ordered identically.
    One shuffle on the key; per-key state is the day-bounded series.

    Output: (*keys, n_obs, n_returns, h_last, sigma_last,
    above_longrun) where above_longrun compares the UNROUNDED h to the
    closed-form long-run variance so both engines branch on identical
    doubles.
    """
    obs = F.struct(F.col(ts_col).alias("t"), F.col(value_col).cast("long").alias("v"))
    agg = df.groupBy(*keys).agg(F.sort_array(F.collect_list(obs)).alias("os"))
    xs = F.transform(F.col("os"), lambda o: o["v"])
    rs = F.zip_with(
        F.slice(xs, 2, F.size(xs) - 1),
        F.slice(xs, 1, F.size(xs) - 1),
        lambda b, a: (b - a).cast("double") / F.lit(100.0),
    )
    e2 = F.transform(rs, lambda r: r * r)
    w, al, be = F.lit(omega), F.lit(alpha), F.lit(beta)
    folded = F.aggregate(
        F.slice(e2, 1, F.size(e2) - 1),
        F.element_at(e2, 1),
        lambda acc, x: w + al * x + be * acc,
    )
    longrun = omega / (1.0 - alpha - beta)
    return (
        agg.where(F.size("os") >= 2)
        .withColumn("h", folded)
        .select(
            *keys,
            F.size("os").cast("long").alias("n_obs"),
            (F.size("os") - 1).cast("long").alias("n_returns"),
            stable_round(F.col("h"), round_digits).alias("h_last"),
            stable_round(F.sqrt(F.col("h")), round_digits).alias("sigma_last"),
            (F.col("h") > F.lit(longrun)).alias("above_longrun"),
        )
    )
