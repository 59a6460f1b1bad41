"""as-of join and sessionization golden tests."""

import datetime

from pyspark.sql import functions as F

from flood_data_spark.operators.timeseries import asof_join, sessionize


def _ts(minute, second=0):
    return datetime.datetime(2024, 1, 1, 0, minute, second)


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "p1"), (1, _ts(20), "p2"), (2, _ts(5), "p3")],
        "user_id long, ts timestamp, name string")
    right = spark.createDataFrame(
        [(1, _ts(9), 100.0), (1, _ts(10), 150.0), (1, _ts(15), 200.0),
         (2, _ts(6), 300.0)],
        "user_id long, ts timestamp, quote double")

    out = {r.name: r for r in
           asof_join(left, right, on="user_id").collect()}
    # inclusive: left@10 matches right@10, not right@9
    assert out["p1"].quote_right == 150.0 and out["p1"].ts_right == _ts(10)
    # most recent prior: left@20 → right@15
    assert out["p2"].quote_right == 200.0
    # no prior right row for user 2 at ts 5 → null (left-outer)
    assert out["p3"].quote_right is None and out["p3"].ts_right is None


def test_asof_tolerance(spark):
    left = spark.createDataFrame(
        [(1, _ts(30), "late")], "user_id long, ts timestamp, name string")
    right = spark.createDataFrame(
        [(1, _ts(10), 1.0)], "user_id long, ts timestamp, quote double")
    hit = asof_join(left, right, on="user_id").first()
    assert hit.quote_right == 1.0
    missed = asof_join(left, right, on="user_id",
                       tolerance_seconds=600).first()
    assert missed.quote_right is None


def test_asof_matches_duckdb_asof_join(spark):
    """Differential check against DuckDB's native ASOF LEFT JOIN on a
    seeded random workload."""
    import duckdb
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(17)
    base = pd.Timestamp("2024-01-01")
    lpdf = pd.DataFrame({
        "k": rng.integers(0, 5, 60),
        "ts": base + pd.to_timedelta(rng.integers(0, 10_000, 60), unit="s"),
        "lv": np.arange(60.0)})
    rpdf = pd.DataFrame({
        "k": rng.integers(0, 5, 80),
        "ts": base + pd.to_timedelta(rng.integers(0, 10_000, 80), unit="s"),
        "rv": np.arange(80.0)})
    # unique (k, ts) on the right so match values are well-defined
    rpdf = rpdf.drop_duplicates(subset=["k", "ts"])

    got = (asof_join(spark.createDataFrame(lpdf),
                     spark.createDataFrame(rpdf),
                     on="k", left_ts="ts", right_ts="ts")
           .select("k", "ts", "lv", "rv_right").toPandas()
           .sort_values(["k", "ts", "lv"]).reset_index(drop=True))

    con = duckdb.connect()
    con.register("l", lpdf)
    con.register("r", rpdf)
    want = con.execute("""
        SELECT l.k, l.ts, l.lv, r.rv AS rv_right
        FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.ts
        ORDER BY l.k, l.ts, l.lv
    """).df().reset_index(drop=True)

    assert len(got) == len(want) == 60
    for g, w in zip(got.itertuples(), want.itertuples()):
        assert g.k == w.k and g.lv == w.lv
        if pd.isna(w.rv_right):
            assert pd.isna(g.rv_right)
        else:
            assert g.rv_right == w.rv_right


def test_sessionize_gap_splits(spark):
    ev = spark.createDataFrame(
        [(1, _ts(0), 1), (1, _ts(10), 2), (1, _ts(50), 3), (1, _ts(55), 4),
         (2, _ts(0), 5)],
        "user_id long, ts timestamp, event_id long")
    out = {(r.user_id, r.session_id): r
           for r in sessionize(ev, gap_seconds=1800,
                               order_tiebreak="event_id").collect()}
    # user 1: events at 0,10 then 40-min gap → second session at 50,55
    assert len(out) == 3
    s1 = out[(1, 1)]
    assert s1.n_events == 2 and s1.session_start == _ts(0) \
        and s1.session_end == _ts(10)
    s2 = out[(1, 2)]
    assert s2.n_events == 2 and s2.session_start == _ts(50)
    assert out[(2, 1)].n_events == 1


def test_asof_tolerance_subsecond_boundary(spark):
    import datetime as _dt
    # age = 600.9s with tolerance 600s: truncation to seconds would keep it
    left = spark.createDataFrame(
        [(1, _dt.datetime(2024, 1, 1, 0, 10, 0, 950000), "x")],
        "user_id long, ts timestamp, name string")
    right = spark.createDataFrame(
        [(1, _dt.datetime(2024, 1, 1, 0, 0, 0, 50000), 1.0)],
        "user_id long, ts timestamp, quote double")
    out = asof_join(left, right, on="user_id", tolerance_seconds=600).first()
    assert out.quote_right is None


def test_resample_ffill_fills_gaps_per_key(spark):
    from flood_data_spark.operators.timeseries import resample_ffill

    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 4, 40.0), ("b", 2, 5.0), ("b", 3, None)],
        "k string, step int, v double")
    out = resample_ffill(df, "k", "step", "v").collect()
    rows = {(r.k, r.step): r for r in out}
    # a: dense 1..4, gaps 2,3 carry 10.0
    assert {(s) for (k, s) in rows if k == "a"} == {1, 2, 3, 4}
    assert rows[("a", 2)].v == 10.0 and not rows[("a", 2)].is_observed
    assert rows[("a", 3)].v == 10.0
    assert rows[("a", 4)].v == 40.0 and rows[("a", 4)].is_observed
    # b spans only 2..3 (per-key span, not global), observed NULL stays
    # filled from the prior observation
    assert {(s) for (k, s) in rows if k == "b"} == {2, 3}
    assert rows[("b", 3)].v == 5.0 and rows[("b", 3)].is_observed


def test_resample_ffill_null_before_first_observation(spark):
    from flood_data_spark.operators.timeseries import resample_ffill
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", 1, None), ("a", 3, 7.0)], "k string, step int, v double")
    out = {r.step: r for r in
           resample_ffill(df, "k", "step", "v").collect()}
    assert out[1].v is None          # nothing to carry yet
    assert out[2].v is None
    assert out[3].v == 7.0


def test_ntz_timestamp_parquet(spark, tmp_path):
    """Spark 4 reads timezone-less parquet timestamps as TIMESTAMP_NTZ;
    sessionize/asof_join must tolerate it (regression: CORRECTNESS_r05
    q_rolling/q_sessionize DATATYPE_MISMATCH on unix_micros(ntz))."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "ntz.parquet")
    pdf = pd.DataFrame({
        "user_id": [1, 1, 1, 2],
        "event_id": [1, 2, 3, 4],
        "ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:10:00",
                              "2024-01-01 02:00:00", "2024-01-01 00:00:00"]),
    })
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    assert table.schema.field("ts").type == pa.timestamp("ns") or \
        table.schema.field("ts").type.tz is None
    pq.write_table(table.cast(pa.schema([
        ("user_id", pa.int64()), ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")),  # no tz -> Spark 4 TIMESTAMP_NTZ
    ])), path)

    df = spark.read.parquet(path)
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"

    sessions = sessionize(df, key_col="user_id", ts_col="ts",
                          gap_seconds=3600,
                          order_tiebreak="event_id").collect()
    by_key = {}
    for r in sessions:
        by_key.setdefault(r.user_id, []).append(r)
    # user 1: events at 0:00/0:10 in one session, 2:00 opens a new one
    assert len(by_key[1]) == 2 and len(by_key[2]) == 1
    assert sorted(s.n_events for s in by_key[1]) == [1, 2]

    # asof_join with tolerance exercises the other unix_micros site
    left = df.select("user_id", "ts", "event_id")
    right = df.select("user_id", "ts",
                      F.col("event_id").alias("payload"))
    out = asof_join(left, right, on="user_id",
                    tolerance_seconds=1).collect()
    assert all(r.payload_right is not None for r in out)


def test_pattern_topk_finds_planted_spike(spark):
    """A series with one planted spike shaped like the (scaled+shifted)
    query pattern must rank it #1 under z-normalized distance."""
    from flood_data_spark.operators.timeseries import pattern_topk

    pattern = [1.0, 2.0, 4.0, 8.0, 4.0, 2.0, 1.0, 0.5]
    # key 1: flat noise then the pattern scaled by 10 and shifted by 100
    series = [5.0, 6.0, 5.5, 6.2] + [100 + 10 * x for x in pattern] + [5.8, 6.1]
    rows = [(1, i + 1, float(v)) for i, v in enumerate(series)]
    rows += [(2, i + 1, float(v)) for i, v in
             enumerate([3.0, 3.1, 2.9, 3.0, 3.2, 3.1, 3.0, 2.8, 3.3, 2.9])]
    df = spark.createDataFrame(rows, "user_id long, seq long, value double")

    out = pattern_topk(df, pattern, key_col="user_id", order_cols=("seq",),
                       value_col="value", k=3).collect()
    best = out[0]
    assert best.rank == 1
    # the planted window starts at position 5 of key 1's series
    assert (best.user_id, best.pos) == (1, 5)
    # scale+shift invariance: z-normalized distance of the planted copy ~ 0
    assert best.dist < 1e-6
    assert best.window == [100 + 10 * x for x in pattern]


def test_pattern_topk_no_global_sort(spark):
    """Global top-k must go through TakeOrdered (per-key prune + limit),
    never a full global Sort of all candidate windows."""
    from flood_data_spark.operators.timeseries import pattern_topk

    df = spark.createDataFrame(
        [(u, i, float(u * 10 + i)) for u in range(3) for i in range(20)],
        "user_id long, seq long, value double")
    plan = (pattern_topk(df, [1.0, 2.0, 1.0], key_col="user_id",
                         order_cols=("seq",), value_col="value", k=5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan, plan


def test_pattern_topk_rejects_short_pattern(spark):
    import pytest
    from flood_data_spark.operators.timeseries import pattern_topk

    df = spark.createDataFrame([(1, 1, 1.0)],
                               "user_id long, seq long, value double")
    with pytest.raises(ValueError, match="pattern"):
        pattern_topk(df, [1.0])


def test_resample_ffill_misaligned_observations_not_dropped(spark):
    """step > 1 with observations off the min-anchored lattice: the values
    must forward-fill the next lattice point, never vanish (review
    finding: exact-equality join dropped them)."""
    from flood_data_spark.operators.timeseries import resample_ffill

    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0), (1, 4, 40.0)],
        "k long, step long, v double")
    rows = {r.step: r for r in
            resample_ffill(df, "k", "step", "v", step=2).collect()}
    # lattice anchored at min: steps 1 and 3
    assert sorted(rows) == [1, 3]
    assert rows[1].v == 10.0 and rows[1].is_observed
    # step 3 fills from the MOST RECENT observation (step 2), not step 1
    assert rows[3].v == 20.0 and not rows[3].is_observed


def test_next_event_pairs_within_sessions(spark):
    import datetime as dt

    from flood_data_spark.operators.timeseries import (
        next_event_pairs, sessionize)

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 100, "view"),
        (1, t0 + dt.timedelta(minutes=5), 101, "click"),
        (1, t0 + dt.timedelta(minutes=8), 102, "buy"),
        # > 30 min gap -> new session; its single event emits no pair
        (1, t0 + dt.timedelta(hours=2), 103, "view"),
        (2, t0, 200, "view"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string")
    pairs = next_event_pairs(ev, gap_seconds=1800,
                             order_tiebreak="event_id").collect()
    got = {(r.user_id, r.event_type, r.next_event_type, r.next_gap_us)
           for r in pairs}
    assert got == {(1, "view", "click", 300_000_000),
                   (1, "click", "buy", 180_000_000)}
    # session ids agree with sessionize's boundaries
    sess = sessionize(ev, gap_seconds=1800, order_tiebreak="event_id")
    assert sess.filter("user_id = 1").count() == 2
    assert all(r.session_id == 1 for r in pairs)


def test_next_event_pairs_empty_and_single(spark):
    import datetime as dt

    from flood_data_spark.operators.timeseries import next_event_pairs

    ev = spark.createDataFrame(
        [], "user_id long, ts timestamp, event_id long, event_type string")
    assert next_event_pairs(ev).count() == 0
    # a lone event per key has no target: zero pairs, never a null-target
    # row (the lead at partition end must be filtered, not emitted)
    one = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 100, "view")],
        "user_id long, ts timestamp, event_id long, event_type string")
    assert next_event_pairs(one).count() == 0


def test_ewma_matches_hand_recursion(spark):
    from flood_data_spark.operators.timeseries import with_ewma

    rows = [(1, i, float(v)) for i, v in enumerate([10, 20, 30, 40])]
    df = spark.createDataFrame(rows, "user_id int, ts long, value double")
    got = {r.ts: r.ewma
           for r in with_ewma(df, ts_col="ts", alpha=0.5,
                              window=10).collect()}
    # y0=10; y1=.5*20+.5*10=15; y2=.5*30+.5*15=22.5; y3=.5*40+.5*22.5
    assert got == {0: 10.0, 1: 15.0, 2: 22.5, 3: 31.25}


def test_ewma_window_truncation_reseeds(spark):
    from flood_data_spark.operators.timeseries import with_ewma

    rows = [(1, i, float(v)) for i, v in enumerate([100, 0, 0])]
    df = spark.createDataFrame(rows, "user_id int, ts long, value double")
    got = {r.ts: r.ewma
           for r in with_ewma(df, ts_col="ts", alpha=0.5,
                              window=2).collect()}
    # window 2: row 2 folds over [0, 0] only — the 100 has aged out
    assert got[2] == 0.0
    assert got[1] == 50.0


def test_ewma_per_key_and_guards(spark):
    from flood_data_spark.operators.timeseries import with_ewma

    rows = [(1, 0, 10.0), (2, 0, 99.0), (1, 1, 20.0)]
    df = spark.createDataFrame(rows, "user_id int, ts long, value double")
    got = {(r.user_id, r.ts): r.ewma
           for r in with_ewma(df, ts_col="ts", alpha=0.25).collect()}
    assert got[(2, 0)] == 99.0          # keys never mix
    assert got[(1, 1)] == 0.25 * 20 + 0.75 * 10
    import pytest as _pt
    with _pt.raises(ValueError, match="alpha"):
        with_ewma(df, ts_col="ts", alpha=0.0)
    with _pt.raises(ValueError, match="window"):
        with_ewma(df, ts_col="ts", window=0)


def test_cusum_hand_recursion_and_alarm(spark):
    from flood_data_spark.operators.timeseries import with_cusum

    vals = [0.0, 0.2, 3.0, 3.0, 0.0]
    rows = [(1, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "user_id int, ts long, value double")
    got = {r.ts: (r.cusum, r.cusum_alarm)
           for r in with_cusum(df, ts_col="ts", target=0.0, slack=0.5,
                               threshold=4.0, window=16).collect()}
    # S: max(0,-.5)=0; max(0,0-.3)=0; 0+2.5=2.5; 2.5+2.5=5.0; 5.0-.5=4.5
    assert got[0] == (0.0, False)
    assert got[1] == (0.0, False)
    assert got[2] == (2.5, False)
    assert got[3] == (5.0, True)
    assert got[4] == (4.5, True)


def test_cusum_window_truncation_and_guards(spark):
    from flood_data_spark.operators.timeseries import with_cusum
    import pytest as _pt

    rows = [(1, 0, 10.0), (1, 1, 0.0), (1, 2, 0.0)]
    df = spark.createDataFrame(rows, "user_id int, ts long, value double")
    got = {r.ts: r.cusum
           for r in with_cusum(df, ts_col="ts", slack=0.5,
                               window=2).collect()}
    # ts=2 folds [0,0] only: seed max(0,-0.5)=0, then max(0,0-0.5)=0
    assert got[2] == 0.0
    assert got[1] == 9.0  # 9.5 - 0.5
    with _pt.raises(ValueError, match="window"):
        with_cusum(df, ts_col="ts", window=0)
    with _pt.raises(ValueError, match="slack"):
        with_cusum(df, ts_col="ts", slack=-1)


def test_ewma_null_contract_documented_behavior(spark):
    """Pin the documented NULL behavior: collect_list DROPS the null
    observation, so its row carries the previous fold value — callers
    must filter/impute upstream (docstring contract)."""
    from flood_data_spark.operators.timeseries import with_ewma

    rows = [(1, 0, 10.0), (1, 1, None), (1, 2, 20.0)]
    df = spark.createDataFrame(rows, "user_id int, ts long, value double")
    got = {r.ts: r.ewma
           for r in with_ewma(df, ts_col="ts", alpha=0.5,
                              window=10).collect()}
    assert got[0] == 10.0
    assert got[1] == 10.0            # null row: previous fold, NOT null
    assert got[2] == 15.0            # fold skips the missing observation


def test_ohlc_bars_deterministic(spark):
    from flood_data_spark.operators.timeseries import ohlc_bars
    import datetime as dt

    t = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [(1, 10, t, 5.0), (1, 11, t, 9.0),          # tie on ts: open
            (1, 12, t + dt.timedelta(minutes=30), 1.0),
            (1, 13, t + dt.timedelta(hours=1), 7.0),   # next bar
            (2, 14, t, 2.0)]
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, ts timestamp, value double")
    got = {(r.user_id, r.bar.hour): (r.open, r.high, r.low, r.close,
                                     r.n_obs)
           for r in ohlc_bars(df, bar="hour",
                              tiebreak_col="event_id").collect()}
    assert got[(1, 10)] == (5.0, 9.0, 1.0, 1.0, 3)   # tie -> lower id
    assert got[(1, 11)] == (7.0, 7.0, 7.0, 7.0, 1)
    assert got[(2, 10)] == (2.0, 2.0, 2.0, 2.0, 1)
    import pytest as _pt
    with _pt.raises(ValueError, match="bar"):
        ohlc_bars(df, bar="fortnight")


def test_time_weighted_avg_vs_hand_math(spark):
    from flood_data_spark.operators.timeseries import time_weighted_avg
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    rows = [(1, t, 10.0),
            (1, t + dt.timedelta(seconds=1), 30.0),
            (1, t + dt.timedelta(seconds=4), 99.0),   # terminal: weight 0
            (2, t, 5.0)]                              # single obs: NULL
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
    got = {r.user_id: (r.twap, r.span_us, r.n_obs)
           for r in time_weighted_avg(df).collect()}
    # (10*1s + 30*3s) / 4s = 25; plain avg would say 46.3
    assert got[1] == (25.0, 4_000_000, 3)
    assert got[2][0] is None and got[2][2] == 1


def test_interval_join_matches_naive_truth(spark):
    from flood_data_spark.operators.timeseries import interval_join
    import datetime as dt

    t = dt.datetime(2024, 1, 1)

    def ts(h):
        return t + dt.timedelta(hours=h)

    pts = spark.createDataFrame(
        [(i, ts(i * 7)) for i in range(20)], "pid int, ts timestamp")
    ivs = spark.createDataFrame(
        [(100, ts(0), ts(24)),          # day one
         (101, ts(20), ts(30)),         # crosses a bucket boundary
         (102, ts(50), ts(50)),         # invalid: dropped
         (103, ts(140), ts(141))],      # never matches (7h grid)
        "iv_id int, start timestamp, end timestamp")
    got = {(r.pid, r.iv_id)
           for r in interval_join(pts, ivs,
                                  bucket_seconds=86400).collect()}
    naive = {(p, i) for p in range(20) for (i, s, e) in
             [(100, 0, 24), (101, 20, 30)]
             if s <= p * 7 < e}
    assert got == naive
    assert (3, 101) in got              # 21h inside the crossing interval


def test_interval_join_half_open_and_guards(spark):
    from flood_data_spark.operators.timeseries import interval_join
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    pts = spark.createDataFrame([(1, t), (2, t + dt.timedelta(hours=24))],
                                "pid int, ts timestamp")
    ivs = spark.createDataFrame(
        [(9, t, t + dt.timedelta(hours=24))],
        "iv_id int, start timestamp, end timestamp")
    got = {r.pid for r in interval_join(pts, ivs).collect()}
    assert got == {1}                   # end is EXCLUSIVE
    import pytest as _pt
    with _pt.raises(ValueError, match="bucket_seconds"):
        interval_join(pts, ivs, bucket_seconds=0)
    with _pt.raises(ValueError, match="overlapping"):
        interval_join(pts.withColumnRenamed("pid", "iv_id"), ivs)


def test_interval_join_plan_is_hash_join_not_bnlj(spark):
    from flood_data_spark.operators.timeseries import interval_join
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    pts = spark.createDataFrame([(1, t)], "pid int, ts timestamp")
    ivs = spark.createDataFrame(
        [(9, t, t + dt.timedelta(hours=1))],
        "iv_id int, start timestamp, end timestamp")
    plan = interval_join(pts, ivs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_join_and_funnel_tolerate_ntz(spark):
    """The module contract says TIMESTAMP_NTZ-tolerant — unix_micros
    rejects NTZ, so the bucketing/epoch path must go through the
    NTZ-safe diff (caught by a package-boundary drive on raw parquet
    reads, which surface NTZ under Spark 4)."""
    from flood_data_spark.operators.behavior import funnel
    from flood_data_spark.operators.timeseries import interval_join
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    pts = (spark.createDataFrame([(1, t), (2, t + dt.timedelta(hours=30))],
                                 "pid int, ts timestamp")
           .withColumn("ts", F.col("ts").cast("timestamp_ntz")))
    ivs = (spark.createDataFrame(
        [(9, t, t + dt.timedelta(hours=24))],
        "iv_id int, start timestamp, end timestamp")
        .withColumn("start", F.col("start").cast("timestamp_ntz"))
        .withColumn("end", F.col("end").cast("timestamp_ntz")))
    assert {r.pid for r in interval_join(pts, ivs).collect()} == {1}
    import pytest as _pt
    with _pt.raises(ValueError, match="mix"):
        interval_join(pts.withColumn("ts", F.col("ts").cast("timestamp")),
                      ivs)

    ev = (spark.createDataFrame(
        [(1, t, "view"), (1, t + dt.timedelta(seconds=5), "click")],
        "user_id int, ts timestamp, event_type string")
        .withColumn("ts", F.col("ts").cast("timestamp_ntz")))
    r = funnel(ev, ["view", "click"], within_seconds=10).collect()[0]
    assert r.depth == 2
