"""Equi-depth histogram operator (operators/stats.py)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from flood_data_spark.operators.stats import (
    equidepth_bounds, equidepth_histogram, with_equidepth_bucket)


def test_bounds_hand_computed(spark):
    # values 1..10: quartile boundaries at p*(n-1) interpolation
    df = spark.createDataFrame([(float(i),) for i in range(1, 11)], "v double")
    b = equidepth_bounds(df, "v", n_buckets=4)
    assert b == pytest.approx([3.25, 5.5, 7.75])


def test_buckets_roughly_equal_population(spark):
    df = spark.range(1000).select((F.col("id") * 7 % 1000)
                                  .cast("double").alias("v"))
    h = {r.bucket: r.n for r in
         equidepth_histogram(df, "v", n_buckets=10).collect()}
    assert len(h) == 10
    assert all(90 <= n <= 110 for n in h.values())


def test_ties_share_a_bucket(spark):
    # 100 copies of one value + 100 distinct: the tie mass must land in
    # ONE bucket (value-based assignment), not split by row order
    rows = [(5.0,)] * 100 + [(float(i),) for i in range(100, 200)]
    df = spark.createDataFrame(rows, "v double")
    out = with_equidepth_bucket(df, "v", n_buckets=4)
    tie_buckets = (out.filter(F.col("v") == 5.0)
                   .select("bucket").distinct().collect())
    assert len(tie_buckets) == 1


def test_empty_input_no_rows(spark):
    df = spark.createDataFrame([], "v double")
    assert equidepth_histogram(df, "v").count() == 0


def test_rejects_bad_bucket_count(spark):
    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError, match="n_buckets"):
        equidepth_bounds(df, "v", n_buckets=1)


def test_robust_outliers_hand_computed(spark):
    from flood_data_spark.operators.stats import with_robust_outliers

    # group A: values 1..9 + a wild 100; med of 10 values = 5.5
    rows = [(i, "a", float(v)) for i, v in enumerate(
        [1, 2, 3, 4, 5, 6, 7, 8, 9, 100])]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    out = {r.id: r for r in
           with_robust_outliers(df, "v", ("g",)).collect()}
    assert out[0].ro_med == 5.5
    # residuals |v-5.5|: 4.5,3.5,2.5,1.5,.5,.5,1.5,2.5,3.5,94.5 → MAD 2.5
    assert out[0].ro_mad == 2.5
    flagged = {i for i, r in out.items() if r.ro_outlier}
    assert flagged == {9}                     # only the planted 100
    assert out[9].ro_z == pytest.approx(
        round(94.5 / (1.4826 * 2.5), 6))


def test_robust_outliers_constant_group_flags_nothing(spark):
    from flood_data_spark.operators.stats import with_robust_outliers

    df = spark.createDataFrame([(i, "c", 7.0) for i in range(5)],
                               "id long, g string, v double")
    rows = with_robust_outliers(df, "v", ("g",)).collect()
    assert all(not r.ro_outlier and r.ro_z is None for r in rows)
    with pytest.raises(ValueError, match="partition_cols"):
        with_robust_outliers(df, "v", ())


def test_trend_stats_recovers_planted_line(spark):
    from flood_data_spark.operators.stats import trend_stats

    rows = [(0, float(x), 3.0 * x + 2.0) for x in range(10)]
    rows += [(1, float(x), 5.0) for x in range(4)]        # flat group
    rows += [(2, 1.0, 9.9)]                               # single point
    df = spark.createDataFrame(rows, "g long, x double, y double")
    out = {r.g: r for r in trend_stats(df, "y", "x", ("g",)).collect()}
    assert out[0].slope == pytest.approx(3.0)
    assert out[0].intercept == pytest.approx(2.0)
    assert out[0].r2 == pytest.approx(1.0)
    assert out[1].slope == pytest.approx(0.0) and out[1].n_pairs == 4
    assert out[2].slope is None               # undefined on one point


def test_profile_table_hand_computed(spark):
    from flood_data_spark.operators.stats import profile_table

    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None), (3, 20.0)],
        "k long, v double")
    out = {r.column: r for r in profile_table(df).collect()}
    assert set(out) == {"k", "v"}
    assert out["k"].n_rows == 4 and out["k"].n_null == 0
    assert out["k"].n_distinct == 3
    assert out["k"].min_value == 1.0 and out["k"].max_value == 3.0
    assert out["v"].n_null == 1 and out["v"].n_distinct == 2


def test_profile_table_approx_mode_and_guards(spark):
    from flood_data_spark.operators.stats import profile_table

    df = spark.createDataFrame([(i, str(i)) for i in range(100)],
                               "k long, s string")
    row = profile_table(df, ["k"], accuracy_mode="approx").collect()[0]
    # HLL++ at default rsd (5%): within sketch error of the truth
    assert abs(row.n_distinct - 100) <= 10
    # approx mode must not plan the Expand operator (the k-pass exact path)
    plan = profile_table(df, ["k"], accuracy_mode="approx") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    with pytest.raises(ValueError, match="non-numeric"):
        profile_table(df, ["s"])
    with pytest.raises(ValueError, match="accuracy_mode"):
        profile_table(df, ["k"], accuracy_mode="bogus")


def test_jsd_identities(spark):
    """JSD(P,P) = 0; disjoint vocabularies hit the ln 2 ceiling;
    symmetric in its arguments; numpy differential on a mixed case."""
    import math

    import numpy as np

    from flood_data_spark.operators.stats import js_divergence

    p = spark.createDataFrame([(0, "a b c a")], "id long, text string")
    q = spark.createDataFrame([(0, "x y z")], "id long, text string")
    same = js_divergence(p, p).collect()[0]
    assert same.jsd == pytest.approx(0.0, abs=2e-6)
    disj = js_divergence(p, q).collect()[0]
    assert disj.jsd == pytest.approx(math.log(2), abs=2e-6)
    m = spark.createDataFrame([(0, "a a b")], "id long, text string")
    n = spark.createDataFrame([(0, "a b b b")], "id long, text string")
    fwd = js_divergence(m, n).collect()[0]
    rev = js_divergence(n, m).collect()[0]
    assert fwd.jsd == pytest.approx(rev.jsd, abs=2e-6)
    assert fwd.kl_pm == pytest.approx(rev.kl_qm, abs=2e-6)
    # numpy reference
    P = np.array([2 / 3, 1 / 3]); Q = np.array([1 / 4, 3 / 4])
    M = (P + Q) / 2
    ref = 0.5 * (P * np.log(P / M)).sum() + 0.5 * (Q * np.log(Q / M)).sum()
    assert fwd.jsd == pytest.approx(ref, abs=2e-6)
    # empty side -> NULL
    empty = spark.createDataFrame([(0, "  ")], "id long, text string")
    e = js_divergence(p, empty).collect()[0]
    assert e.jsd is None and e.kl_pm is None


# --- Mann-Kendall + Sen's slope ---------------------------------------------


def test_mann_kendall_hand_increasing(spark):
    from flood_data_spark.operators.stats import mann_kendall_sen

    rows = [("g", t, float(t)) for t in range(1, 7)]
    df = spark.createDataFrame(rows, "g string, t long, x double")
    r = mann_kendall_sen(df, "x", "t", ["g"]).collect()[0]
    assert (r.n, r.s) == (6, 15)
    want_z = 14.0 / math.sqrt(6 * 5 * 17 / 18.0)
    assert r.z == pytest.approx(want_z, abs=2e-6)
    assert r.sen_slope == pytest.approx(1.0, abs=1e-6)
    assert r.trend == "increasing"


def test_mann_kendall_matches_numpy(spark):
    """Differential vs a brute-force numpy MK + Sen on a noisy trended
    series with planted ties."""
    from flood_data_spark.operators.stats import mann_kendall_sen

    rng = np.random.default_rng(3)
    n = 40
    x = np.round(0.3 * np.arange(n) + rng.normal(0, 4, n), 1)
    x[5] = x[9] = x[20]          # planted tie group of 3
    df = spark.createDataFrame(
        [("g", int(t), float(v)) for t, v in enumerate(x)],
        "g string, t long, x double")
    got = mann_kendall_sen(df, "x", "t", ["g"]).collect()[0]
    s = sum(np.sign(x[j] - x[i])
            for i in range(n) for j in range(i + 1, n))
    _, counts = np.unique(x, return_counts=True)
    var = (n * (n - 1) * (2 * n + 5)
           - sum(t * (t - 1) * (2 * t + 5) for t in counts)) / 18.0
    want_z = (s - np.sign(s)) / math.sqrt(var)
    slopes = np.array([(x[j] - x[i]) / (j - i)
                       for i in range(n) for j in range(i + 1, n)])
    assert got.s == int(s)
    assert got.z == pytest.approx(want_z, abs=2e-6)
    assert got.sen_slope == pytest.approx(np.median(slopes), abs=2e-6)


def test_mann_kendall_degenerate(spark):
    from flood_data_spark.operators.stats import mann_kendall_sen

    rows = ([("flat", t, 7.0) for t in range(5)]
            + [("down", t, float(-2 * t)) for t in range(8)])
    df = spark.createDataFrame(rows, "g string, t long, x double")
    out = {r.g: r for r in
           mann_kendall_sen(df, "x", "t", ["g"]).collect()}
    assert out["flat"].s == 0 and out["flat"].z is None
    assert out["flat"].trend == "no trend"
    assert out["down"].trend == "decreasing"
    assert out["down"].sen_slope == pytest.approx(-2.0, abs=1e-6)
    with pytest.raises(ValueError, match="group key"):
        mann_kendall_sen(df, "x", "t", [])


# --- Kolmogorov-Smirnov two-sample ------------------------------------------


def test_ks_hand_case_and_scipy_free_golden(spark):
    """a = (1,2,3,4), b = (3,4,5,6): ECDFs diverge most at x in [2,3):
    F_a = 0.5, F_b = 0 -> D = 0.5."""
    from flood_data_spark.operators.stats import ks_two_sample

    rows = ([("g", "a", float(v)) for v in (1, 2, 3, 4)]
            + [("g", "b", float(v)) for v in (3, 4, 5, 6)])
    df = spark.createDataFrame(rows, "g string, lab string, v double")
    r = ks_two_sample(df, "v", "lab", "a", "b", ["g"]).collect()[0]
    assert (r.n_a, r.n_b) == (4, 4)
    assert r.d == pytest.approx(0.5, abs=1e-6)
    want_crit = 1.358 * math.sqrt(8 / 16.0)
    assert r.crit_05 == pytest.approx(want_crit, abs=2e-6)
    assert r.reject_05 == (0.5 > want_crit)


def test_ks_matches_numpy_ecdf(spark):
    """Differential vs a brute-force numpy ECDF sup over a shifted
    pair with heavy ties (integer-valued samples)."""
    from flood_data_spark.operators.stats import ks_two_sample

    rng = np.random.default_rng(17)
    a = rng.integers(0, 30, 200).astype(float)
    b = (rng.integers(0, 30, 150) + 4).astype(float)
    rows = ([("g", "x", float(v)) for v in a]
            + [("g", "y", float(v)) for v in b])
    df = spark.createDataFrame(rows, "g string, lab string, v double")
    r = ks_two_sample(df, "v", "lab", "x", "y", ["g"]).collect()[0]
    grid = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), grid, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), grid, side="right") / len(b)
    want = np.abs(fa - fb).max()
    assert r.d == pytest.approx(want, abs=2e-6)
    assert r.reject_05 == bool(
        want > 1.358 * math.sqrt((200 + 150) / (200 * 150.0)))


def test_ks_identical_and_missing_sample(spark):
    from flood_data_spark.operators.stats import ks_two_sample

    rows = ([("same", lab, float(v)) for lab in ("a", "b")
             for v in (1, 2, 3)]
            + [("only_a", "a", 5.0), ("only_a", "a", 6.0)])
    df = spark.createDataFrame(rows, "g string, lab string, v double")
    out = {r.g: r for r in
           ks_two_sample(df, "v", "lab", "a", "b", ["g"]).collect()}
    assert out["same"].d == 0.0 and out["same"].reject_05 is False
    assert out["only_a"].d is None and out["only_a"].reject_05 is None
    with pytest.raises(ValueError, match="group key"):
        ks_two_sample(df, "v", "lab", "a", "b", [])


# --- Hurst rescaled-range ---------------------------------------------------


def _py_hurst(x, sizes):
    """Reference R/S Hurst replicating the operator's micro-integer
    chain (exact, including the seams)."""
    def idiv(num, den):
        q = (2 * abs(num) + den) // (2 * den)
        return -q if num < 0 else q

    qx = [int(math.copysign(math.floor(abs(v) * 1e6 + 0.5), v))
          for v in x]
    pts = []
    for m in sizes:
        rss = []
        for b in range(len(qx) // m):
            blk = qx[b * m:(b + 1) * m]
            s1, s2 = sum(blk), sum(v * v for v in blk)
            varn = m * s2 - s1 * s1
            qs = int(math.floor(math.sqrt(varn) + 0.5))
            if qs == 0:
                continue
            z, prefix = 0, []
            for v in blk:
                z += m * v - s1
                prefix.append(z)
            rm = max(prefix) - min(prefix)
            rss.append(idiv(rm * 10 ** 6, qs))
        if not rss:
            continue
        rsm = idiv(sum(rss), len(rss))
        if rsm <= 0:
            continue
        v = math.log(rsm / 1e6) * 1e6
        ly = int(math.copysign(math.floor(abs(v) + 0.5), v))
        lx = int(math.floor(math.log(m) * 1e6 + 0.5))
        pts.append((lx, ly))
    k = len(pts)
    sx = sum(p[0] for p in pts); sy = sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    den = k * sxx - sx * sx
    return idiv((k * sxy - sx * sy) * 10 ** 6, den) / 1e6


def test_hurst_matches_python_replica_and_ranges(spark):
    from flood_data_spark.operators.stats import hurst_rs

    rng = np.random.default_rng(12)
    n = 512
    white = rng.normal(50, 5, n)                     # H ~ 0.5
    walk = 50 + np.cumsum(rng.normal(0, 1, n))       # H ~ 1.0
    rows = ([("white", t, float(v)) for t, v in enumerate(white)]
            + [("walk", t, float(v)) for t, v in enumerate(walk)])
    df = spark.createDataFrame(rows, "g string, t long, x double")
    out = {r.g: r for r in
           hurst_rs(df, "x", "t", ["g"], (8, 32, 128)).collect()}
    assert out["white"].k_sizes == 3 and out["walk"].k_sizes == 3
    assert out["white"].hurst == pytest.approx(
        _py_hurst(list(white), [8, 32, 128]), abs=2e-6)
    assert out["walk"].hurst == pytest.approx(
        _py_hurst(list(walk), [8, 32, 128]), abs=2e-6)
    # qualitative: the random walk is far more persistent
    assert out["walk"].hurst > out["white"].hurst + 0.2
    assert 0.2 < out["white"].hurst < 0.8
    with pytest.raises(ValueError, match="window sizes"):
        hurst_rs(df, "x", "t", ["g"], (8,))
