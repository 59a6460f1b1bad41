"""Behavioral event analytics: ordered funnels and cohort retention.

Beyond-reference operators (SURVEY §2.11): the two standard questions a
product/event pipeline asks of an event log — "who progressed through
this ordered sequence of actions, and how far?" (funnel) and "of the
users who first appeared in period X, how many were still active k
periods later?" (retention).

100 TB shapes:
- `funnel` without a transition window is k-1 user-keyed min-aggregate
  joins — each stage one groupBy(user) + one equi-join on user, so the
  shuffle count is the (small, constant) funnel depth and every shuffled
  relation is user-sized after stage 1.  WITH a window it becomes a
  join-free re-anchoring DP: k range-frame window passes over ONE key
  exchange of the step-filtered event relation (Spark plans all passes
  over a single sort).  Either way, NO per-user arrays: the
  collect-and-fold alternative holds O(events-per-user) rows in one
  task and dies on power users.
- `cohort_retention` is two aggregations: first-seen per user (one
  user-keyed shuffle) joined back to the activity relation, then a
  (cohort, offset) groupBy with countDistinct — cohort-sized output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(events: DataFrame, steps, key_col: str = "user_id",
           ts_col: str = "ts", type_col: str = "event_type",
           within_seconds: int | None = None) -> DataFrame:
    """Ordered-funnel completion per key: for the step sequence
    ``steps = [A, B, ...]``, each key's EARLIEST time of A, then the
    earliest B strictly after that A, and so on (the standard
    first-touch funnel semantics; greedy-earliest is optimal here — an
    earlier prior stage can only admit more candidates for the next).

    ``within_seconds`` bounds each TRANSITION (ts_i - ts_{i-1}) and
    switches to RE-ANCHORING semantics: stage i can chain off ANY
    stage-(i-1)-reachable event within the window, not just the
    earliest (greedy-earliest undercounts under a window — a user with
    view@0, view@100, click@105 and a 10 s window genuinely converted
    via the second view; step_i_ts is then the earliest time the
    prefix 1..i completes).  Without a window, greedy-earliest IS
    optimal — an earlier prior stage only admits more candidates.

    Returns (key, step_1_ts .. step_k_ts, depth) with NULL timestamps
    past the key's deepest completed stage; keys that never did step 1
    are absent (inner semantics on stage 1 — left-join the result to
    the user dimension for drop-off rates).
    """
    steps = list(steps)
    if not steps:
        raise ValueError("funnel: need at least one step")
    if within_seconds is not None and within_seconds <= 0:
        raise ValueError("funnel: within_seconds must be positive")
    ev = events.select(F.col(key_col).alias("_k"),
                       F.col(ts_col).alias("_ts"),
                       F.col(type_col).alias("_t"))
    if within_seconds is None:
        # greedy-earliest chain as k sibling window passes over ONE
        # key exchange (r16, guide §2.4): the previous k-1 min-join
        # ladder re-instantiated the event scan per stage and
        # duplicated the growing `out` subtree on both sides of each
        # join (7 distinct scans at k = 3).  step_i references
        # step_{i-1}, so each stage is its own select, but every
        # window shares the single hash exchange on the key; the
        # final groupBy collapses the per-key-constant columns.
        from pyspark.sql import Window

        wk = Window.partitionBy("_k")
        cur = (ev.filter(F.col("_t").isin(steps))
               .withColumn("step_1_ts",
                           F.min(F.when(F.col("_t") == steps[0],
                                        F.col("_ts"))).over(wk)))
        for i, step in enumerate(steps[1:], start=2):
            prev = F.col(f"step_{i - 1}_ts")
            cur = cur.withColumn(
                f"step_{i}_ts",
                F.min(F.when((F.col("_t") == step)
                             & (F.col("_ts") > prev),
                             F.col("_ts"))).over(wk))
        out = (cur.groupBy("_k")
               .agg(*[F.min(f"step_{i}_ts").alias(f"step_{i}_ts")
                      for i in range(1, len(steps) + 1)])
               .filter(F.col("step_1_ts").isNotNull()))
    else:
        # re-anchoring DP as k window passes over ONE key exchange:
        # reach_i(e) = e is step i AND some reach_{i-1} event lies in
        # the strict window (e.ts - T, e.ts) — integer-µs frame
        # [-T*1e6, -1] encodes `a.ts < e.ts AND e.ts - a.ts <= T`.
        # No joins; Spark plans all k passes over a single sort.
        from pyspark.sql import Window

        from flood_data_spark.operators.timeseries import _epoch_us

        # prefilter to the funnel's step types: non-step events can
        # never anchor a reach, so only step events need the sort
        ev = ev.filter(F.col("_t").isin(steps))
        # NTZ-tolerant epoch (unix_micros rejects TIMESTAMP_NTZ)
        us = _epoch_us(ev, "_ts")
        frame = (Window.partitionBy("_k").orderBy(us)
                 .rangeBetween(-within_seconds * 1_000_000, -1))
        reach = ev.withColumn("_r1", F.col("_t") == steps[0])
        for i, step in enumerate(steps[1:], start=2):
            prev_in_window = (F.max(
                F.when(F.col(f"_r{i - 1}"), us)).over(frame)
                .isNotNull())
            reach = reach.withColumn(
                f"_r{i}", (F.col("_t") == step) & prev_in_window)
        out = reach.groupBy("_k").agg(*[
            F.min(F.when(F.col(f"_r{i}"), F.col("_ts")))
            .alias(f"step_{i}_ts")
            for i in range(1, len(steps) + 1)])
        out = out.filter(F.col("step_1_ts").isNotNull())
    depth = F.lit(0)
    for i in range(1, len(steps) + 1):
        depth = F.when(F.col(f"step_{i}_ts").isNotNull(), i) \
            .otherwise(depth)
    return (out.withColumn("depth", depth.cast("int"))
            .withColumnRenamed("_k", key_col))


def cohort_retention(events: DataFrame, key_col: str = "user_id",
                     ts_col: str = "ts",
                     period: str = "week") -> DataFrame:
    """Cohorted retention: users grouped by the period of their FIRST
    event; for each (cohort_period, offset) the distinct users active
    offset periods later, plus the retention fraction vs the cohort's
    size at offset 0.

    (cohort, offset) rows: two shuffles (first-seen groupBy, then the
    cohort×offset distinct count) — output is cohort-bounded.  `period`
    is any `date_trunc` unit; offsets count whole periods between the
    truncated cohort date and the truncated activity date.
    """
    if period not in ("day", "week", "month", "quarter", "year"):
        raise ValueError(f"cohort_retention: unsupported period {period!r}")
    ev = events.select(F.col(key_col).alias("_k"),
                       F.date_trunc(period, F.col(ts_col)).alias("_p"))
    first = ev.groupBy("_k").agg(F.min("_p").alias("_cohort"))
    # whole-period offset: date arithmetic on the truncated boundaries
    unit_days = {"day": 1, "week": 7}.get(period)
    joined = ev.join(first, "_k")
    if unit_days is not None:
        off = (F.datediff(F.col("_p"), F.col("_cohort"))
               / F.lit(unit_days)).cast("long")
    else:
        months = {"month": 1, "quarter": 3, "year": 12}[period]
        off = ((F.months_between(F.col("_p"), F.col("_cohort")))
               / F.lit(months)).cast("long")
    # localCheckpoint: `active` feeds both the base (offset-0) filter
    # and the final join — cohort-bounded, so materializing once beats
    # re-running the corpus-sized ev⋈first chain per consumer
    active = (joined.withColumn("_off", off)
              .groupBy(F.col("_cohort").alias("cohort"),
                       F.col("_off").alias("offset"))
              .agg(F.countDistinct("_k").alias("n_active"))
              .localCheckpoint(eager=False))
    base = (active.filter(F.col("offset") == 0)
            .select("cohort", F.col("n_active").alias("_n0")))
    return (active.join(F.broadcast(base), "cohort")
            .select("cohort", "offset", "n_active",
                    F.round(F.col("n_active") / F.col("_n0"), 6)
                    .alias("retention")))


def transition_matrix(events: DataFrame, key_col: str = "user_id",
                      ts_col: str = "ts", type_col: str = "event_type",
                      gap_seconds: int = 1800,
                      order_tiebreak: str | None = None) -> DataFrame:
    """First-order Markov transition estimates over session-bounded
    event sequences: (event_type, next_event_type, n, p) with p the
    row-normalized maximum-likelihood transition probability.

    Rides `timeseries.next_event_pairs` (the SAME session boundaries as
    `sessionize`, bit-identical), so cross-session jumps never count as
    transitions.  The matrix is |event-type|^2-bounded: one pair count
    groupBy + a broadcast row-total join — corpus-sized work only in
    the shared sessionize exchange.
    """
    from flood_data_spark.operators.timeseries import next_event_pairs

    pairs = next_event_pairs(events, key_col=key_col, ts_col=ts_col,
                             label_col=type_col, gap_seconds=gap_seconds,
                             order_tiebreak=order_tiebreak)
    # localCheckpoint: `counts` feeds both the totals aggregate and the
    # final join — |event-type|^2-bounded, vs re-running the corpus-
    # sized sessionize window chain per consumer
    counts = (pairs.groupBy(F.col(type_col),
                            F.col(f"next_{type_col}"))
              .agg(F.count(F.lit(1)).alias("n"))
              .localCheckpoint(eager=False))
    totals = (counts.groupBy(type_col)
              .agg(F.sum("n").alias("_tot")))
    return (counts.join(F.broadcast(totals), type_col)
            .select(type_col, f"next_{type_col}", "n",
                    F.round(F.col("n") / F.col("_tot"), 6).alias("p")))


def attribution_credit(events: DataFrame, key_col: str = "user_id",
                       ts_col: str = "ts",
                       channel_col: str = "event_type",
                       conversion_event: str = "purchase",
                       model: str = "last_touch",
                       id_col: str = "event_id") -> DataFrame:
    """Multi-touch conversion attribution — the marketing-analytics
    companion to `funnel`/`transition_matrix`: each conversion's
    preceding touches (the journey: this user's non-conversion events
    since their previous conversion) share the conversion's credit
    under the chosen model:

        last_touch  — the final touch takes the whole credit,
        first_touch — the opening touch takes it,
        linear      — each of the k touches takes half_up(1e6, k)
                      micro-credits (the per-journey sum differs from
                      exactly 1 by < k/2 micro — documented rounding,
                      no fractional-double drift).

    Journeys are delimited by the running conversion count (one
    user-keyed ordered window, ties broken by `id_col` — fully
    deterministic); touches after a user's last conversion attribute
    nothing, conversions with zero preceding touches credit nothing.
    Shape: ONE (user)-keyed window exchange shared by the running
    count and the per-journey rank (same partition key), then one
    channel-keyed aggregate of exact integer micro-credits.  Returns
    (channel, n_touches, n_credited, credit) sorted by channel, where
    credit = Σ micro-credits / 1e6 and n_credited counts touches with
    nonzero credit."""
    from pyspark.sql import Window

    from flood_data_spark.datapipe.linalg import _idiv_half_up

    if model not in ("last_touch", "first_touch", "linear"):
        raise ValueError(f"attribution_credit: unknown model {model!r}")
    MICRO = 1_000_000
    dec = "decimal(38,0)"
    is_conv = (F.col(channel_col) == conversion_event).cast("int")
    w_user = Window.partitionBy(key_col)
    w_ord = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    base = (events.withColumn("_c", is_conv)
            .withColumn("_j", F.coalesce(
                F.sum("_c").over(w_ord.rowsBetween(
                    Window.unboundedPreceding, -1)), F.lit(0)))
            .withColumn("_nc", F.sum("_c").over(w_user)))
    touches = base.filter((F.col("_c") == 0)
                          & (F.col("_j") < F.col("_nc")))
    wj = Window.partitionBy(key_col, "_j").orderBy(ts_col, id_col)
    wjall = Window.partitionBy(key_col, "_j")
    ranked = (touches.withColumn("_rn", F.row_number().over(wj))
              .withColumn("_k", F.count(F.lit(1)).over(wjall)))
    full = F.lit(MICRO).cast(dec)
    if model == "last_touch":
        credit = F.when(F.col("_rn") == F.col("_k"), full) \
            .otherwise(F.lit(0).cast(dec))
    elif model == "first_touch":
        credit = F.when(F.col("_rn") == 1, full) \
            .otherwise(F.lit(0).cast(dec))
    else:
        credit = _idiv_half_up(full, F.col("_k").cast(dec))
    out = (ranked.withColumn("_cr", credit)
           .groupBy(F.col(channel_col).alias("channel"))
           .agg(F.count(F.lit(1)).alias("n_touches"),
                F.sum((F.col("_cr") > 0).cast("long"))
                .alias("n_credited"),
                F.sum("_cr").alias("_s")))
    return (out.select("channel", "n_touches", "n_credited",
                       (F.col("_s").cast("double")
                        / F.lit(float(MICRO))).alias("credit"))
            .orderBy("channel"))
