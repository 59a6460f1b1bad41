"""Event-time operators: as-of join and gap-based sessionization.

Beyond-reference operators a large-scale event/training-data pipeline needs
(the reference's only temporal logic is daily batch dating, SURVEY §2.9).
Both are pure window/aggregation compositions — no UDFs, no per-key driver
loops — so they scale with the shuffle, not with the key count.

The as-of join deliberately avoids the pandas ``merge_asof``-per-group
pattern: a union + ordered-window forward-fill computes every match in one
pass, one shuffle on (key, time) — the standard scalable formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_LEFT, _RIGHT = 0, 1


def _epoch_us(df: DataFrame, col: str):
    """Absolute microseconds of a timestamp column for bucketing and
    range frames, NTZ-tolerant (the module contract): `unix_micros`
    rejects TIMESTAMP_NTZ outright, so NTZ diffs against the NTZ epoch
    instead — wall-clock µs, no timezone involved; LTZ keeps the
    native `unix_micros` instant."""
    if dict(df.dtypes).get(col) == "timestamp_ntz":
        return F.timestamp_diff(
            "MICROSECOND",
            F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
            F.col(col))
    return F.unix_micros(F.col(col))


def _diff_us(later, earlier):
    """``later - earlier`` in microseconds, type-preserving.

    These operators only ever need *differences*, so instead of converting
    to an epoch (the old ``unix_micros(cast)`` path interpreted
    TIMESTAMP_NTZ in the session timezone — off by the offset change for a
    gap straddling a DST transition under a non-UTC zone),
    ``timestamp_diff`` subtracts the two columns directly in their own
    type: wall-clock micros for NTZ (no timezone involved), instant micros
    for LTZ.  Null-propagating, like the subtraction it replaces.
    """
    return F.timestamp_diff("MICROSECOND", earlier, later)


def asof_join(left: DataFrame, right: DataFrame, on, left_ts: str = "ts",
              right_ts: str = "ts", right_cols=None, suffix: str = "_right",
              tolerance_seconds: int | None = None) -> DataFrame:
    """Backward (inclusive) as-of join: each left row gets the most recent
    right row with ``right.ts <= left.ts`` for the same key(s); null when
    no prior right row exists (left-outer semantics).

    Implementation: tag and union both inputs, sort each key's timeline once
    (right rows before left rows at equal timestamps → inclusive), and
    forward-fill the right payload with ``last(ignorenulls)`` over the
    ordered window.  Equivalent SQL: DuckDB/ANSI ``ASOF LEFT JOIN``.

    ``tolerance_seconds`` optionally voids matches older than the window
    (pandas merge_asof tolerance semantics).
    """
    keys = [on] if isinstance(on, str) else list(on)
    rcols = list(right_cols) if right_cols is not None \
        else [c for c in right.columns if c not in keys and c != right_ts]

    # one right row per (key, ts): keep the greatest payload tuple so the
    # fill is deterministic under timestamp collisions
    r = (right
         .select(*keys, F.col(right_ts).alias("_ts"),
                 F.struct(*[F.col(c) for c in rcols]).alias("_payload"))
         .groupBy(*keys, "_ts").agg(F.max("_payload").alias("_payload"))
         .withColumn("_side", F.lit(_RIGHT)))

    left_row = F.struct(*[F.col(c) for c in left.columns]).alias("_row")
    l = left.select(*keys, F.col(left_ts).alias("_ts"),
                    F.lit(_LEFT).alias("_side"),
                    F.lit(None).cast(r.schema["_payload"].dataType)
                    .alias("_payload"),
                    left_row)
    row_type = l.schema["_row"].dataType
    timeline = l.unionByName(
        r.select(*keys, "_ts", F.col("_side"), "_payload",
                 F.lit(None).cast(row_type).alias("_row")))

    w = (Window.partitionBy(*keys)
         .orderBy(F.col("_ts").asc(), F.col("_side").desc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = (timeline
              .withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
              .withColumn("_match_ts",
                          F.last(F.when(F.col("_side") == _RIGHT,
                                        F.col("_ts")), ignorenulls=True).over(w))
              .filter(F.col("_side") == _LEFT))

    if tolerance_seconds is not None:
        # µs arithmetic: second-truncated casts would keep matches up to
        # ~1s staler than the tolerance at the boundary
        in_window = (_diff_us(F.col("_ts"), F.col("_match_ts"))
                     <= tolerance_seconds * 1_000_000)
        filled = (filled
                  .withColumn("_match", F.when(in_window, F.col("_match")))
                  .withColumn("_match_ts", F.when(in_window, F.col("_match_ts"))))

    out_cols = [F.col(f"_row.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("_match_ts").alias(right_ts + suffix))
    out_cols += [F.col(f"_match.{c}").alias(c + suffix) for c in rcols]
    return filled.select(*out_cols)


def _with_session_ids(events: DataFrame, key_col: str, ts_col: str,
                      gap_seconds: int,
                      order_tiebreak: str | None):
    """Per-event session-id assignment shared by `sessionize` (aggregated
    form) and `next_event_pairs` (per-event form): the gap flag + running
    sum over one ordered window.  Returns (frame_with_session_id, window).
    """
    order = [F.col(ts_col).asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    # microsecond arithmetic: second-truncated casts would disagree with
    # µs-precision engines exactly at the gap boundary
    gap_us = _diff_us(F.col(ts_col), F.lag(F.col(ts_col)).over(w))
    with_ids = (events
                .withColumn("_new",
                            F.when(gap_us.isNull()
                                   | (gap_us > gap_seconds * 1_000_000), 1)
                            .otherwise(0))
                .withColumn("session_id",
                            F.sum("_new").over(
                                w.rowsBetween(Window.unboundedPreceding,
                                              Window.currentRow))))
    return with_ids, w


def sessionize(events: DataFrame, key_col: str = "user_id",
               ts_col: str = "ts", gap_seconds: int = 1800,
               order_tiebreak: str | None = None) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the key's previous event exceeds ``gap_seconds``.

    Returns one row per session: (key, session_id 1..n per key,
    session_start, session_end, n_events).  Two ordered windows + one
    aggregation — a single shuffle on the key.
    """
    with_ids, _ = _with_session_ids(events, key_col, ts_col, gap_seconds,
                                    order_tiebreak)
    return (with_ids
            .groupBy(key_col, "session_id")
            .agg(F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 F.count("*").alias("n_events")))


def next_event_pairs(events: DataFrame, key_col: str = "user_id",
                     ts_col: str = "ts", label_col: str = "event_type",
                     gap_seconds: int = 1800,
                     order_tiebreak: str | None = None) -> DataFrame:
    """(current event -> next event) training pairs WITHIN sessions — the
    supervised examples a next-action/behavioral model trains on, built
    straight from the event log: sessionize (shared `_with_session_ids`
    assignment, so session boundaries are bit-identical with
    `sessionize`), then lead() inside each (key, session) for the target
    label and the time-to-next-event feature.  A session's last event
    emits no pair (no target exists).

    Returns (key_col, session_id, ts_col, label_col, next_<label_col>,
    next_gap_us).  Plan: the SAME single key-partitioned exchange carries
    the session windows and the lead — Spark plans all three window
    functions over one sort, so pair extraction costs nothing beyond
    sessionization itself.
    """
    with_ids, w = _with_session_ids(events, key_col, ts_col, gap_seconds,
                                    order_tiebreak)
    # lead within the key window, then REQUIRE same session: cheaper than
    # re-partitioning a (key, session_id) window, identical result (the
    # next row in key order is in the same session iff its _new flag is 0)
    nxt_label = F.lead(F.col(label_col)).over(w)
    nxt_ts = F.lead(F.col(ts_col)).over(w)
    nxt_new = F.lead(F.col("_new")).over(w)
    return (with_ids
            .withColumn("_nxt_label", nxt_label)
            .withColumn("_nxt_ts", nxt_ts)
            .withColumn("_nxt_new", nxt_new)
            .filter(F.col("_nxt_new") == 0)
            .select(key_col, "session_id", ts_col, label_col,
                    F.col("_nxt_label").alias(f"next_{label_col}"),
                    _diff_us(F.col("_nxt_ts"), F.col(ts_col))
                    .alias("next_gap_us")))


def pattern_topk(df: DataFrame, pattern, key_col: str = "user_id",
                 order_cols=("ts",), value_col: str = "value",
                 k: int = 10, normalize: bool = True) -> DataFrame:
    """Time-series subsequence similarity search: the k windows (length =
    len(pattern)) across all keys' ordered value series most similar to
    the query pattern, by z-normalized euclidean distance (the standard
    shape-matching metric — normalization makes it amplitude/offset
    invariant; pass normalize=False for raw euclidean).

    Output: (key, pos, dist, window) — pos is the 1-based window start in
    the key's series, ordered by (dist rounded to 6, key, pos) with rank
    <= k.

    Plan shape (distributable, no UDF): each row's window materializes as
    an array of `lead()` values over ONE ordered window per key (explicit
    per-offset leads — deterministic, unlike collect_list over a moving
    frame), the distance is a fold over zip_with against the constant
    normalized pattern, and the global top-k is a TakeOrdered — no global
    sort materializes.  Cost: one shuffle on the key + m doubles per row;
    m (pattern length) is small by construction.
    """
    m = len(pattern)
    if m < 2:
        raise ValueError(f"pattern must have >= 2 points, got {m}")
    p = [float(x) for x in pattern]
    if normalize:
        pm = sum(p) / m
        pv = sum((x - pm) ** 2 for x in p) / m
        ps = max(pv ** 0.5, 1e-12)
        p = [(x - pm) / ps for x in p]
    p_lit = F.expr("array(%s)" % ",".join(repr(x) + "D" for x in p))

    order = [F.col(c).asc() for c in order_cols]
    wo = Window.partitionBy(key_col).orderBy(*order)
    win = F.array(*[F.lead(value_col, i).over(wo) for i in range(m)])
    rows = (df
            .withColumn("pos", F.row_number().over(wo))
            .withColumn("_w", win)
            # drops tail windows that run off the series end AND windows
            # with an interior NULL value — a window with a missing
            # observation has no well-defined shape distance
            .filter(F.size(F.filter("_w", lambda x: x.isNotNull())) == m)
            .select(F.col(key_col), "pos",
                    F.transform("_w", lambda x: x.cast("double"))
                    .alias("_w")))

    wcol = F.col("_w")
    if normalize:
        mean = F.aggregate(wcol, F.lit(0.0), lambda a, x: a + x) / m
        var = F.aggregate(F.transform(wcol, lambda x: (x - mean) * (x - mean)),
                          F.lit(0.0), lambda a, x: a + x) / m
        std = F.greatest(F.sqrt(var), F.lit(1e-12))
        zcol = F.transform(wcol, lambda x: (x - mean) / std)
    else:
        zcol = wcol
    dist2 = F.aggregate(
        F.zip_with(zcol, p_lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda a, x: a + x)
    scored = rows.withColumn("dist", F.round(F.sqrt(dist2), 6))
    # rounded distance in the ranking: sub-ULP fold differences across
    # engines must not reorder the top-k; (key, pos) breaks rounded ties.
    # Global top-k WITHOUT a global sort: per-key prune to k inside the
    # existing key partitioning, then TakeOrdered (orderBy + limit) over
    # the k-per-key survivors; the rank column is a window over only the
    # final k rows.
    order_keys = [F.col("dist").asc(), F.col(key_col).asc(),
                  F.col("pos").asc()]
    wk = Window.partitionBy(key_col).orderBy(*order_keys)
    local = (scored.withColumn("_lr", F.row_number().over(wk))
             .filter(F.col("_lr") <= k).drop("_lr"))
    top = local.orderBy(*order_keys).limit(k)
    wr = Window.orderBy(*order_keys)
    return (top.withColumn("rank", F.row_number().over(wr))
            .select(key_col, "pos", "dist",
                    F.col("_w").alias("window"), "rank"))


def resample_ffill(df: DataFrame, key_cols, step_col: str,
                   value_cols, step: int = 1) -> DataFrame:
    """Regularize a sparse integer-step series: per key, emit the lattice
    anchored at the key's min step (spacing `step`, up to its max) and
    forward-fill the value columns from the most recent observed row at or
    before each lattice point — observations BETWEEN lattice points (any
    misalignment when step > 1) still fill forward; nothing is silently
    dropped.  NULL before the first observation — no value is invented.
    `is_observed` marks lattice points with an observation at exactly that
    step.  Input grain: at most one observation per (key, step).

    Plan shape (the scalable formulation): one groupBy builds each key's
    [min, max] span, `sequence` + `explode` materializes the dense grid
    JVM-side (no driver loop, no per-key Python), a left join attaches the
    observed rows, and one ordered window per key forward-fills — two
    shuffles total (span agg + join/window share the key exchange), row
    count bounded by the grid, not by keys × global span: a key covering
    one week never inflates to another key's year.

    Output: key_cols + step_col + value_cols + `is_observed` (false for
    gap rows).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    vals = [value_cols] if isinstance(value_cols, str) else list(value_cols)

    span = (df.groupBy(*keys)
            .agg(F.min(step_col).alias("_lo"), F.max(step_col).alias("_hi")))
    grid = (span.select(*keys,
                        F.explode(F.sequence(F.col("_lo"), F.col("_hi"),
                                             F.lit(step))).alias(step_col),
                        F.lit(None).cast("boolean").alias("_obs")))
    # union + ordered fill, NOT a join on exact step equality: with
    # step > 1 an observation between grid points (or off the min-anchored
    # lattice entirely) would never match an equi-join and its value
    # would silently vanish — here it rides the same timeline and
    # forward-fills the next grid point, which is what "most recent
    # observed row" means.
    observed = df.select(*keys, step_col,
                         F.lit(True).alias("_obs"),
                         *[F.col(v) for v in vals])
    timeline = observed.unionByName(
        grid, allowMissingColumns=True)
    # at equal step, the observed row must precede its grid twin in the
    # fill order (nulls-last on _obs==True first via desc_nulls_last)
    w = (Window.partitionBy(*keys)
         .orderBy(F.col(step_col).asc(), F.col("_obs").desc_nulls_last())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = [F.last(v, ignorenulls=True).over(w).alias(v) for v in vals]
    is_obs = (F.max(F.when(F.col("_obs"), F.col(step_col))).over(w)
              == F.col(step_col))
    return (timeline
            .select(*keys, step_col, *filled,
                    F.coalesce(is_obs, F.lit(False)).alias("is_observed"),
                    "_obs")
            .filter(F.col("_obs").isNull())
            .drop("_obs"))


def with_ewma(df: DataFrame, key_col: str = "user_id",
              ts_col: str = "ts", value_col: str = "value",
              alpha: float = 0.25, window: int = 8,
              tiebreak_col: str | None = None,
              out_col: str = "ewma") -> DataFrame:
    """Truncated-window exponential moving average per key: the recursive
    y_i = alpha*x_i + (1-alpha)*y_{i-1} seeded with the window's oldest
    value, folded over the trailing `window` observations.

    The recursion is inherently sequential, which a distributed engine
    cannot run over unbounded history without serializing each key —
    so the history is TRUNCATED to the last `window` rows: one ordered
    window collects an O(window) array per row (bounded state — an
    unbounded collect would hold O(n) per row), and a row-LOCAL fold
    runs the recursion.  Truncation error is (1-alpha)^window of the
    older mass — pick window so that's below your tolerance (0.75^8 ~=
    0.1, 0.75^16 ~= 0.01).

    Engine parity note: the fold is sequential in frame order on every
    engine (DuckDB list_reduce seeds with the first element — mirrored
    here via element_at/slice), so with a deterministic (ts, tiebreak)
    ordering the EWMA values are bit-identical across engines, no
    rounding games needed.  `alpha` values that are exact binary
    fractions (0.25, 0.5, 0.125) keep the per-step arithmetic exact.

    NULL contract: `value_col` must be non-null.  Spark's collect_list
    silently DROPS a NULL observation (the row gets the previous fold
    value and later windows shift by one), while a SQL engine keeping
    NULLs folds to NULL — cross-engine parity and the smoothing
    semantics both break.  Filter or impute missing observations
    upstream.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"with_ewma: alpha must be in (0, 1], got {alpha}")
    if window < 1:
        raise ValueError("with_ewma: window must be >= 1")
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = (Window.partitionBy(key_col).orderBy(*order)
         .rowsBetween(-(window - 1), 0))
    arr = F.collect_list(F.col(value_col).cast("double")).over(w)
    a = F.lit(float(alpha))
    fold = F.aggregate(
        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
        F.element_at(arr, 1),
        lambda acc, x: a * x + (F.lit(1.0) - a) * acc)
    return df.withColumn(out_col, fold)


def with_cusum(df: DataFrame, key_col: str = "user_id",
               ts_col: str = "ts", value_col: str = "value",
               target: float = 0.0, slack: float = 0.5,
               threshold: float | None = None, window: int = 16,
               tiebreak_col: str | None = None,
               out_col: str = "cusum") -> DataFrame:
    """One-sided (upper) CUSUM drift statistic per key: the recursive
    S_i = max(0, S_{i-1} + x_i - target - slack) folded over the
    trailing `window` observations — the standard sequential
    change-detection statistic (Page 1954), truncated exactly like
    `with_ewma` and for the same reason (the recursion is sequential;
    bounded history keeps per-row state O(window)).

    The seed is max(0, x_oldest - target - slack) — the same recursion
    applied to the window's first element from S=0, stated identically
    in an engine's first-element-seeded fold by pre-mapping each
    element to its deviation.  With `threshold` set, adds
    `<out_col>_alarm` (S >= threshold) — the drift flag monitoring
    pipelines page on.  Truncation note: a drift older than `window`
    observations ages out; pick window > the expected detection delay.
    NULL contract: as `with_ewma` — non-null values only (collect_list
    drops NULLs, silently misaligning the fold).
    """
    if window < 1:
        raise ValueError("with_cusum: window must be >= 1")
    if slack < 0:
        raise ValueError("with_cusum: slack must be >= 0")
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = (Window.partitionBy(key_col).orderBy(*order)
         .rowsBetween(-(window - 1), 0))
    dev = (F.col(value_col).cast("double")
           - F.lit(float(target)) - F.lit(float(slack)))
    arr = F.collect_list(dev).over(w)
    fold = F.aggregate(
        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
        F.greatest(F.element_at(arr, 1), F.lit(0.0)),
        lambda acc, x: F.greatest(acc + x, F.lit(0.0)))
    out = df.withColumn(out_col, fold)
    if threshold is not None:
        out = out.withColumn(out_col + "_alarm",
                             F.col(out_col) >= F.lit(float(threshold)))
    return out


def ohlc_bars(df: DataFrame, key_col: str = "user_id",
              ts_col: str = "ts", value_col: str = "value",
              bar: str = "hour",
              tiebreak_col: str | None = None) -> DataFrame:
    """Open/high/low/close downsampling: one row per (key, bar) with the
    bar's first value (by (ts, tiebreak)), max, min, last value, and
    observation count — the standard lossy compaction for dashboarding
    and coarse backtesting over event streams.

    ONE groupBy on (key, date_trunc(bar)): open/close are min_by/max_by
    with a struct ordering key, so ties at identical timestamps resolve
    deterministically when `tiebreak_col` is given.  The exchange
    carries (key x bar)-sized partial aggregates — never raw events.
    """
    if bar not in ("minute", "hour", "day", "week", "month"):
        raise ValueError(f"ohlc_bars: unsupported bar {bar!r}")
    ordk = (F.struct(F.col(ts_col), F.col(tiebreak_col)) if tiebreak_col
            else F.struct(F.col(ts_col)))
    return (df.groupBy(F.col(key_col),
                       F.date_trunc(bar, F.col(ts_col)).alias("bar"))
            .agg(F.min_by(F.col(value_col), ordk).alias("open"),
                 F.max(value_col).alias("high"),
                 F.min(value_col).alias("low"),
                 F.max_by(F.col(value_col), ordk).alias("close"),
                 F.count(F.lit(1)).alias("n_obs")))


def time_weighted_avg(df: DataFrame, key_col: str = "user_id",
                      ts_col: str = "ts", value_col: str = "value",
                      tiebreak_col: str | None = None) -> DataFrame:
    """Time-weighted average per key over its observed span: each
    observation holds until the next one, so its weight is the gap to
    the successor in microseconds; the final observation has no
    successor and contributes nothing (documented boundary — append a
    closing marker row upstream to weight it).  Keys with a single
    observation yield NULL twap.

    Plan: one ordered window (lead) + one groupBy — the weighting rides
    the same key exchange as the ordering, and the output is key-sized.
    The plain `avg` over irregular samples over-weights bursts; this is
    the estimator that doesn't.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    gap = _diff_us(F.lead(F.col(ts_col)).over(w), F.col(ts_col))
    weighted = df.withColumn("_w", gap.cast("double"))
    return (weighted.groupBy(key_col)
            .agg(F.round(F.sum(F.col(value_col) * F.col("_w"))
                         / F.sum("_w"), 6).alias("twap"),
                 F.sum("_w").cast("long").alias("span_us"),
                 F.count(F.lit(1)).alias("n_obs")))


def seasonal_decompose(df: DataFrame, key_col: str = "user_id",
                       order_col: str = "step",
                       value_col: str = "value", period: int = 7,
                       round_to: int = 6) -> DataFrame:
    """Classical additive seasonal decomposition per key:
    value = trend + seasonal + residual for an odd period m.

    trend is the centered moving average over m consecutive rows,
    written as an EXPLICIT lag/lead addition chain (not a window avg):
    the chain's left-to-right float order is reproducible in any
    engine, where windowed avg implementations are free to accumulate
    in segment-tree order — the EWMA lesson applied to sliding means.
    trend is NULL within half a period of either series edge (no full
    window).  seasonal is the per-(key, phase) mean of the detrended
    values, centered to sum to ~0 across phases (phase = 0-based row
    number mod m — alignment is relative, so gaps shift phases; run
    `resample_ffill` upstream for calendar-aligned series).  residual
    = value - trend - seasonal, computed from the UNROUNDED parts;
    all three round once at the output.

    Plan: ONE key exchange (the ordered window provides row numbers
    and all 2*half lag/leads in a single pass), one (key x period)-
    bounded groupBy for phase means, one key-bounded groupBy for the
    centering mean, and two small joins back — no corpus-sized
    relation after the window.  Even periods need the half-weighted
    2xm moving average; not implemented (use the odd neighbor).
    """
    if period < 3 or period % 2 == 0:
        raise ValueError(
            f"period must be odd and >= 3, got {period} "
            "(even periods need the half-weighted 2xm average)")
    half = period // 2
    w = Window.partitionBy(key_col).orderBy(order_col)
    v = F.col(value_col).cast("double")
    # explicit chain: ((v[-h] + v[-h+1]) + ...) + v[+h], left to right
    total = F.lag(v, half).over(w)
    for d in range(half - 1, 0, -1):
        total = total + F.lag(v, d).over(w)
    total = total + v
    for d in range(1, half + 1):
        total = total + F.lead(v, d).over(w)
    # localCheckpoint: base (the corpus-sized windowed relation) feeds
    # the phase means AND the final join; phase_means feeds the
    # centering mean AND the seasonal join — without the pins Catalyst
    # re-executes the lag/lead window pass per consumer (the LM-table
    # lesson), and the docstring's one-key-exchange claim would be false
    base = df.select(
        F.col(key_col), F.col(order_col), v.alias("_v"),
        ((F.row_number().over(w) - 1) % period).alias("_phase"),
        (total / period).alias("_trend")).localCheckpoint(eager=False)
    phase_means = (base.filter(F.col("_trend").isNotNull())
                   .groupBy(key_col, "_phase")
                   .agg(F.avg(F.col("_v") - F.col("_trend"))
                        .alias("_pm"))
                   .localCheckpoint(eager=False))
    centers = (phase_means.groupBy(key_col)
               .agg(F.avg("_pm").alias("_cm")))
    seasonal = (phase_means.join(centers, key_col)
                .select(key_col, "_phase",
                        (F.col("_pm") - F.col("_cm")).alias("_seas")))
    return (base.join(seasonal, [key_col, "_phase"], "left")
            .select(
        F.col(key_col), F.col(order_col),
        F.col("_v").alias(value_col),
        F.round("_trend", round_to).alias("trend"),
        F.round("_seas", round_to).alias("seasonal"),
        F.round(F.col("_v") - F.col("_trend") - F.col("_seas"),
                round_to).alias("residual")))


def interval_join(points: DataFrame, intervals: DataFrame,
                  point_ts: str = "ts", start_col: str = "start",
                  end_col: str = "end",
                  bucket_seconds: int = 86400) -> DataFrame:
    """Point-in-interval join (start <= ts < end, half-open) WITHOUT the
    cartesian trap: a naive range-predicate join plans as
    BroadcastNestedLoopJoin — every point against every interval.  Here
    each interval EXPLODES to the coarse time buckets it overlaps
    (sequence over floor-divided epochs), each point maps to exactly ONE
    bucket, and the join is a hash equi-join on the bucket plus the
    exact range filter.  A pair appears at most once by construction
    (the point's single bucket), so no dedup pass.

    Pick `bucket_seconds` near the median interval length: explosion
    factor = interval_len/bucket + 1, while a too-coarse bucket inflates
    the candidate pairs the range filter must discard.  Hot buckets
    (many long intervals over one bucket) are the skew case — salt the
    bucket key like `plans/scale.salted_join` if one bucket dominates.

    Intervals with end <= start are dropped (invalid by the half-open
    contract).  Column names must be disjoint across the two inputs.
    """
    if bucket_seconds < 1:
        raise ValueError("interval_join: bucket_seconds must be >= 1")
    clash = set(points.columns) & set(intervals.columns)
    if clash:
        raise ValueError(f"interval_join: overlapping columns {clash} — "
                         "rename/suffix one side first")
    if "_bk" in points.columns or "_bk" in intervals.columns:
        raise ValueError("interval_join: '_bk' is reserved for the "
                         "bucket key — rename that column first")
    pt_ntz = dict(points.dtypes).get(point_ts) == "timestamp_ntz"
    iv_ntz = dict(intervals.dtypes).get(start_col) == "timestamp_ntz"
    if pt_ntz != iv_ntz:
        raise ValueError(
            "interval_join: points and intervals mix TIMESTAMP and "
            "TIMESTAMP_NTZ — wall-clock and instant epochs don't "
            "compare; cast one side first")
    b_us = int(bucket_seconds) * 1_000_000
    s_us = _epoch_us(intervals, start_col)
    e_us = _epoch_us(intervals, end_col)
    iv = (intervals.filter(F.col(end_col) > F.col(start_col))
          .withColumn("_bk", F.explode(F.sequence(
              F.floor(s_us / b_us), F.floor((e_us - 1) / b_us)))))
    pt = points.withColumn(
        "_bk", F.floor(_epoch_us(points, point_ts) / b_us))
    return (pt.join(iv, "_bk")
            .filter((F.col(point_ts) >= F.col(start_col))
                    & (F.col(point_ts) < F.col(end_col)))
            .drop("_bk"))


def with_holt(df: DataFrame, key_col: str = "user_id",
              ts_col: str = "ts", value_col: str = "value",
              alpha: float = 0.5, beta: float = 0.25, window: int = 8,
              tiebreak_col: str | None = None) -> DataFrame:
    """Truncated-window Holt double-exponential smoothing per key — the
    level+trend forecaster one rung above `with_ewma`:

        l_i = α·x_i + (1-α)·(l_{i-1} + t_{i-1})
        t_i = β·(l_i - l_{i-1}) + (1-β)·t_{i-1}

    seeded with l = x_1, t = x_2 - x_1 over the trailing `window`
    observations; adds (holt_level, holt_trend, holt_forecast) where
    forecast = level + trend is the one-step-ahead prediction.

    Same machinery and contracts as `with_ewma`: one ordered window
    collects a bounded O(window) array per row, a row-LOCAL fold runs
    the 2-state recursion with a struct accumulator; fold order is
    engine-identical, so with binary-fraction α/β the outputs are
    BIT-IDENTICAL raw doubles (no rounding — the q_ewma half-point
    lesson).  Single-observation windows degrade to level = x, trend =
    0.  NULL observations break the fold (the collect_list drop) —
    filter upstream.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"with_holt: alpha must be in (0, 1], got {alpha}")
    if not 0.0 <= beta <= 1.0:
        raise ValueError(f"with_holt: beta must be in [0, 1], got {beta}")
    if window < 2:
        raise ValueError("with_holt: window must be >= 2")
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = (Window.partitionBy(key_col).orderBy(*order)
         .rowsBetween(-(window - 1), 0))
    arr = F.collect_list(F.col(value_col).cast("double")).over(w)
    a, b = F.lit(float(alpha)), F.lit(float(beta))

    def step(acc, x):
        new_l = a * x + (F.lit(1.0) - a) * (acc["l"] + acc["t"])
        new_t = (b * (new_l - acc["l"]) + (F.lit(1.0) - b) * acc["t"])
        return F.struct(new_l.alias("l"), new_t.alias("t"))

    seed = F.struct(
        F.element_at(arr, 1).alias("l"),
        (F.element_at(arr, 2) - F.element_at(arr, 1)).alias("t"))
    folded = F.aggregate(
        F.slice(arr, 3, F.greatest(F.size(arr) - 2, F.lit(0))),
        seed, step)
    level = F.when(F.size(arr) >= 2, folded["l"]) \
        .otherwise(F.element_at(arr, 1))
    trend = F.when(F.size(arr) >= 2, folded["t"]).otherwise(F.lit(0.0))
    return (df.withColumn("holt_level", level)
            .withColumn("holt_trend", trend)
            .withColumn("holt_forecast",
                        F.col("holt_level") + F.col("holt_trend")))


def with_rolling_median(df: DataFrame, key_col: str = "user_id",
                        ts_col: str = "ts", value_col: str = "value",
                        window: int = 5,
                        tiebreak_col: str | None = None,
                        out_col: str = "rolling_median") -> DataFrame:
    """Per-key rolling EXACT median over the trailing `window`
    observations — the robust smoother next to `with_ewma`/`with_holt`:
    a single spike moves a mean by spike/window but a median not at all,
    which is why sensor QA pipelines median-filter before thresholding.

    Same bounded machinery as the folds: one ordered window collects an
    O(window) array per row, then array_sort + explicit middle
    selection — lower + (upper-lower)·0.5 interpolation for even
    counts, written as the SAME expression on both engines (DuckDB's
    median() would interpolate with its own arithmetic; mirroring the
    formula beats trusting two implementations to agree at the last
    ulp).  Warm-up rows (fewer than `window` observations yet) take the
    median of what exists — the standard expanding warm-up.  NULL
    observations break the frame alignment (the collect_list drop
    documented at `with_ewma`) — filter upstream.
    """
    if window < 1:
        raise ValueError("with_rolling_median: window must be >= 1")
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = (Window.partitionBy(key_col).orderBy(*order)
         .rowsBetween(-(window - 1), 0))
    arr = F.array_sort(
        F.collect_list(F.col(value_col).cast("double")).over(w))
    n = F.size(arr)
    # explicit floor(): a bare double→int cast TRUNCATES in Spark but
    # ROUNDS in ANSI engines — the one place the mirrored expression
    # would silently diverge
    lo = F.element_at(arr, F.floor((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (F.floor(n / 2) + 1).cast("int"))
    med = lo + (hi - lo) * F.lit(0.5)
    return df.withColumn(out_col, med)
