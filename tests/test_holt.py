"""Holt double-exponential smoothing (operators/timeseries.with_holt) —
hand-computed fold goldens."""

import pytest

from flood_data_spark.operators.timeseries import with_holt


def _series(spark, vals):
    rows = [(i, 1, i, float(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, value double")


def _run(spark, vals, **kw):
    out = with_holt(_series(spark, vals), key_col="user_id", ts_col="ts",
                    value_col="value", tiebreak_col="event_id", **kw)
    return {r.event_id: (r.holt_level, r.holt_trend, r.holt_forecast)
            for r in out.collect()}


def test_hand_computed_three_rows(spark):
    # seed l=10, t=2; fold x=14: l'=.5*14+.5*12=13, t'=.25*3+.75*2=2.25
    got = _run(spark, [10, 12, 14], alpha=0.5, beta=0.25, window=8)
    assert got[0] == (10.0, 0.0, 10.0)          # singleton: level=x
    assert got[1] == (10.0, 2.0, 12.0)          # seed state
    assert got[2] == (13.0, 2.25, 15.25)


def test_constant_series_is_fixed_point(spark):
    got = _run(spark, [5, 5, 5, 5, 5], alpha=0.5, beta=0.25, window=4)
    for i in range(1, 5):
        assert got[i] == (5.0, 0.0, 5.0)


def test_window_truncates_history(spark):
    # with window=3 the fold at row 3 sees only [x1, x2, x3]
    full = _run(spark, [1, 100, 2, 4], alpha=0.5, beta=0.25, window=3)
    fresh = _run(spark, [100, 2, 4], alpha=0.5, beta=0.25, window=3)
    assert full[3] == fresh[2]


def test_validation(spark):
    df = _series(spark, [1, 2])
    with pytest.raises(ValueError, match="alpha"):
        with_holt(df, alpha=0.0)
    with pytest.raises(ValueError, match="beta"):
        with_holt(df, beta=1.5)
    with pytest.raises(ValueError, match="window"):
        with_holt(df, window=1)


def test_rolling_median_goldens(spark):
    from flood_data_spark.operators.timeseries import with_rolling_median
    out = with_rolling_median(_series(spark, [5, 1, 9, 3, 7]),
                              key_col="user_id", ts_col="ts",
                              value_col="value", window=3,
                              tiebreak_col="event_id")
    got = {r.event_id: r.rolling_median for r in out.collect()}
    assert got[0] == 5.0                    # warm-up: median of [5]
    assert got[1] == 3.0                    # median of [1,5] interpolated
    assert got[2] == 5.0                    # median of [1,5,9]
    assert got[3] == 3.0                    # median of [1,3,9]
    assert got[4] == 7.0                    # median of [3,7,9]


def test_rolling_median_spike_immunity(spark):
    from flood_data_spark.operators.timeseries import with_rolling_median
    vals = [10, 10, 10_000, 10, 10]
    out = with_rolling_median(_series(spark, vals), key_col="user_id",
                              ts_col="ts", value_col="value", window=5,
                              tiebreak_col="event_id")
    final = {r.event_id: r.rolling_median for r in out.collect()}[4]
    assert final == 10.0                    # the spike never surfaces


def test_rolling_median_validation(spark):
    from flood_data_spark.operators.timeseries import with_rolling_median
    with pytest.raises(ValueError, match="window"):
        with_rolling_median(_series(spark, [1]), window=0)


def test_holt_differential_fuzz_vs_python(spark):
    # deterministic pseudo-random series (hash-derived, no RNG state):
    # fold the same recursion in plain python and compare bit-for-bit
    import hashlib

    def u(i):
        return int.from_bytes(hashlib.md5(f"hf{i}".encode()).digest()[:6],
                              "big") / float(1 << 48)

    vals = [round(u(i) * 100, 3) for i in range(40)]
    a, b, w = 0.5, 0.25, 8
    out = with_holt(_series(spark, vals), key_col="user_id", ts_col="ts",
                    value_col="value", alpha=a, beta=b, window=w,
                    tiebreak_col="event_id")
    got = {r.event_id: (r.holt_level, r.holt_trend)
           for r in out.collect()}
    for i in range(len(vals)):
        arr = vals[max(0, i - w + 1): i + 1]
        if len(arr) == 1:
            want = (arr[0], 0.0)
        else:
            l, t = arr[0], arr[1] - arr[0]
            for x in arr[2:]:
                nl = a * x + (1.0 - a) * (l + t)
                t = b * (nl - l) + (1.0 - b) * t
                l = nl
            want = (l, t)
        assert got[i] == want, f"row {i}"


def test_rolling_median_differential_fuzz_vs_python(spark):
    import hashlib

    def u(i):
        return int.from_bytes(hashlib.md5(f"rm{i}".encode()).digest()[:6],
                              "big") / float(1 << 48)

    vals = [round(u(i) * 50, 3) for i in range(60)]
    w = 7
    from flood_data_spark.operators.timeseries import with_rolling_median
    out = with_rolling_median(_series(spark, vals), key_col="user_id",
                              ts_col="ts", value_col="value", window=w,
                              tiebreak_col="event_id")
    got = {r.event_id: r.rolling_median for r in out.collect()}
    for i in range(len(vals)):
        arr = sorted(vals[max(0, i - w + 1): i + 1])
        n = len(arr)
        lo = arr[(n + 1) // 2 - 1]
        hi = arr[n // 2]
        want = lo + (hi - lo) * 0.5
        assert got[i] == want, f"row {i}"
