"""Muskingum channel routing: coefficient window, recurrence golden,
mass behavior."""

import numpy as np
import pytest

from flood_data_spark.operators.routing import (
    muskingum_coefficients,
    muskingum_route,
)


def test_coefficients_sum_and_stability():
    c0, c1, c2 = muskingum_coefficients(20.0, 0.2, 24.0)
    assert c0 + c1 + c2 == pytest.approx(1.0, abs=1e-12)
    assert min(c0, c1, c2) >= 0
    with pytest.raises(ValueError, match="stability"):
        muskingum_coefficients(40.0, 0.4, 24.0)   # dt < 2Kx
    with pytest.raises(ValueError, match="x must be"):
        muskingum_coefficients(20.0, 0.7, 24.0)


def test_route_matches_python_recursion(spark):
    rng = np.random.default_rng(4)
    inflow = np.concatenate([np.full(3, 10.0),
                             10 + 90 * np.exp(-0.5 * np.arange(8)),
                             np.full(9, 10.0)])
    df = spark.createDataFrame(
        [("r1", t, float(v)) for t, v in enumerate(inflow)]
        + [("r2", t, float(v)) for t, v in
           enumerate(rng.uniform(5, 50, 12))],
        "reach string, day int, q double")
    out = muskingum_route(df, "q", "day", ["reach"],
                          k=20.0, x=0.2, dt=24.0)
    got = {(r.reach, r.t): r.outflow for r in out.collect()}
    c0, c1, c2 = muskingum_coefficients(20.0, 0.2, 24.0)
    for reach, series in (("r1", inflow),
                          ("r2", None)):
        if series is None:
            continue
        o = series[0]
        assert got[(reach, 0)] == o
        for t in range(1, len(series)):
            o = (c0 * series[t] + c1 * series[t - 1]) + c2 * o
            assert got[(reach, t)] == pytest.approx(o, abs=0.0), t


def test_route_attenuates_and_delays_peak(spark):
    """A flood wave routed through storage: peak outflow is lower than
    peak inflow and occurs no earlier; steady state passes through."""
    inflow = [10.0] * 3 + [10 + 90 * 2.718281828 ** (-0.5 * k)
                           for k in range(8)] + [10.0] * 15
    df = spark.createDataFrame(
        [("r", t, float(v)) for t, v in enumerate(inflow)],
        "reach string, day int, q double")
    rows = muskingum_route(df, "q", "day", ["reach"],
                           k=30.0, x=0.1, dt=24.0).collect()
    o = [r.outflow for r in rows]
    assert max(o) < max(inflow)
    assert o.index(max(o)) >= inflow.index(max(inflow))
    assert o[-1] == pytest.approx(10.0, abs=0.5)   # settles back
    with pytest.raises(ValueError, match="group key"):
        muskingum_route(df, "q", "day", [], 30.0, 0.1, 24.0)


def test_baseflow_filter_matches_python_and_bounds(spark):
    from flood_data_spark.operators.routing import baseflow_separate

    rng = np.random.default_rng(8)
    base = 20 + np.cumsum(rng.normal(0, 0.5, 25))
    storm = np.zeros(25)
    storm[8:14] = [30, 80, 60, 35, 15, 5]
    q = np.abs(base) + storm
    df = spark.createDataFrame(
        [("r", t, float(v)) for t, v in enumerate(q)],
        "reach string, day int, q double")
    out = baseflow_separate(df, "q", "day", ["reach"],
                            alpha=0.925).collect()
    got = np.array([r.baseflow for r in out])

    a, b = 0.925, (1 + 0.925) / 2
    f = np.zeros(len(q))
    for j in range(1, len(q)):
        f[j] = a * f[j - 1] + b * (q[j] - q[j - 1])
    want = np.maximum(q - np.maximum(f, 0.0), 0.0)
    assert np.array_equal(got, want)          # bit-exact
    # physical bounds: 0 <= baseflow <= flow
    assert (got >= 0).all() and (got <= q + 1e-12).all()
    # the storm peak is mostly quickflow
    assert got[9] < 0.5 * q[9]
    with pytest.raises(ValueError, match="alpha"):
        baseflow_separate(df, "q", "day", ["reach"], alpha=1.5)


def test_flashiness_hand_and_bounds(spark):
    from flood_data_spark.operators.routing import flashiness_index

    rows = ([("flat", t, 10.0) for t in range(5)]           # RB = 0
            + [("spiky", t, v) for t, v in
               enumerate([0.0, 20.0, 0.0, 20.0, 0.0])]      # RB = 2
            + [("mix", 0, 10.0), ("mix", 1, 14.0),
               ("mix", 2, 6.0)])   # path 12 / vol 30 = 0.4
    df = spark.createDataFrame(rows, "reach string, d long, q double")
    out = {r.reach: r for r in
           flashiness_index(df, "q", "d", ["reach"]).collect()}
    assert out["flat"].rb == 0.0
    assert out["spiky"].rb == pytest.approx(2.0, abs=1e-6)
    assert out["mix"].rb == pytest.approx(0.4, abs=1e-6)
    # all-zero flow -> NULL
    z = spark.createDataFrame([("z", 0, 0.0), ("z", 1, 0.0)],
                              "reach string, d long, q double")
    assert flashiness_index(z, "q", "d", ["reach"]) \
        .collect()[0].rb is None
    with pytest.raises(ValueError, match="group key"):
        flashiness_index(df, "q", "d", [])
