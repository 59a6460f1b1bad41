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
