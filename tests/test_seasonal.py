"""Seasonal decomposition (timeseries.seasonal_decompose) against a
direct Python computation of the same definition."""

import pytest

from flood_data_spark.operators.timeseries import seasonal_decompose


def _brute(values, period):
    """Literal re-computation: centered MA trend (left-to-right chain),
    phase means of detrended, centered; returns rounded triples."""
    n, half = len(values), period // 2
    trend = [None] * n
    for i in range(half, n - half):
        tot = values[i - half]
        for d in range(i - half + 1, i + half + 1):
            tot = tot + values[d]
        trend[i] = tot / period
    sums, cnts = {}, {}
    for i, (y, t) in enumerate(zip(values, trend)):
        if t is not None:
            p = i % period
            sums[p] = sums.get(p, 0.0) + (y - t)
            cnts[p] = cnts.get(p, 0) + 1
    pm = {p: sums[p] / cnts[p] for p in sums}
    cm = sum(pm.values()) / len(pm) if pm else None
    out = []
    for i, (y, t) in enumerate(zip(values, trend)):
        s = pm[i % period] - cm if (i % period) in pm else None
        r = (y - t - s) if (t is not None and s is not None) else None
        out.append((round(t, 6) if t is not None else None,
                    round(s, 6) if s is not None else None,
                    round(r, 6) if r is not None else None))
    return out


def _run(spark, values, period=7, key="k"):
    rows = [(key, i, float(v)) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "user_id string, step int, value double")
    got = {r.step: (r.trend, r.seasonal, r.residual)
           for r in seasonal_decompose(df, period=period).collect()}
    return [got[i] for i in range(len(values))]


def test_seasonal_recovers_planted_structure(spark):
    """y = 0.5*i + weekly pattern, no noise: interior trend is exactly
    linear, seasonal is the centered pattern, residual ~ 0."""
    pattern = [3.0, -1.0, 0.5, -2.0, 1.5, -0.5, -1.5]   # sums to 0
    values = [0.5 * i + pattern[i % 7] for i in range(42)]
    out = _run(spark, values, period=7)
    for i in range(3, 39):
        t, s, r = out[i]
        # MA of linear+zero-sum-pattern over one full period = linear part
        assert t == pytest.approx(0.5 * i, abs=1e-6), i
        assert s == pytest.approx(pattern[i % 7], abs=1e-6), i
        assert abs(r) <= 1e-5, i
    assert out[0][0] is None and out[41][0] is None      # edges


def test_seasonal_matches_brute_force(spark):
    import hashlib
    values = [((int(hashlib.md5(f"s:{i}".encode()).hexdigest()[:8], 16)
                % 1000) - 500) / 25.0 for i in range(40)]
    assert _run(spark, values, period=5) == _brute(values, 5)


def test_seasonal_short_series_and_multi_key(spark):
    rows = ([("a", i, float(i)) for i in range(3)]      # shorter than period
            + [("b", i, float(i % 3)) for i in range(15)])
    df = spark.createDataFrame(rows, "user_id string, step int, value double")
    out = seasonal_decompose(df, period=5).collect()
    a = [r for r in out if r.user_id == "a"]
    assert len(a) == 3 and all(r.trend is None and r.residual is None
                               for r in a)
    b = {r.step: r for r in out if r.user_id == "b"}
    assert b[7].trend is not None and b[7].residual is not None


def test_seasonal_validation(spark):
    df = spark.createDataFrame([("a", 0, 1.0)],
                               "user_id string, step int, value double")
    with pytest.raises(ValueError, match="odd"):
        seasonal_decompose(df, period=4)
    with pytest.raises(ValueError, match="odd"):
        seasonal_decompose(df, period=1)
