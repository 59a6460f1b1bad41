"""Extreme-value analysis: Gumbel L-moment fits / return levels, POT
runs declustering, GPD method-of-moments tail fit."""

import math

import numpy as np
import pytest

from flood_data_spark.operators.extremes import (
    EULER_GAMMA,
    gpd_moment_fit,
    gumbel_return_levels,
    gumbel_variate,
    pot_decluster,
)


def _lmom_gumbel(x):
    """Reference L-moment Gumbel fit (Hosking's b0/b1 convention)."""
    xs = np.sort(np.asarray(x, dtype=float))
    n = len(xs)
    b0 = xs.mean()
    b1 = (np.arange(n) * xs).sum() / (n * (n - 1))
    lam2 = 2 * b1 - b0
    beta = lam2 / math.log(2.0)
    xi = b0 - EULER_GAMMA * beta
    return xi, beta


def test_gumbel_matches_numpy_lmoments(spark):
    rng = np.random.default_rng(5)
    # a Gumbel(100, 20) annual-max series, 40 'years'
    x = 100 - 20 * np.log(-np.log(rng.uniform(size=40)))
    df = spark.createDataFrame([("c", float(v)) for v in x],
                               "cell string, am double")
    out = gumbel_return_levels(df, "am", ["cell"],
                               periods=(2, 10, 100)).collect()
    xi, beta = _lmom_gumbel(x)
    assert [r.period for r in out] == [2, 10, 100]
    for r in out:
        assert r.n == 40
        assert r.loc == pytest.approx(xi, abs=2e-5)
        assert r.scale == pytest.approx(beta, abs=2e-5)
        want = xi + beta * gumbel_variate(r.period)
        assert r.level == pytest.approx(want, abs=1e-4)
    # return levels increase with period
    assert out[0].level < out[1].level < out[2].level


def test_gumbel_degenerate_groups(spark):
    rows = ([("one", 5.0)]                       # n = 1
            + [("flat", 3.0), ("flat", 3.0), ("flat", 3.0)]  # λ2 = 0
            + [("ok", 1.0), ("ok", 2.0), ("ok", 4.0)])
    df = spark.createDataFrame(rows, "cell string, am double")
    out = {(r.cell, r.period): r for r in
           gumbel_return_levels(df, "am", ["cell"],
                                periods=(2,)).collect()}
    assert out[("one", 2)].level is None
    assert out[("flat", 2)].level is None and out[("flat", 2)].scale is None
    assert out[("ok", 2)].level is not None
    with pytest.raises(ValueError, match="group key"):
        gumbel_return_levels(df, "am", [])


def test_pot_decluster_hand_case(spark):
    """Exceedances of 10 at t = 0,5,8, 100,103, 500 with gap 50 form
    three clusters with peaks 15, 12, 30."""
    rows = [("g", 0, 15.0), ("g", 3, 2.0), ("g", 5, 11.0),
            ("g", 8, 12.5), ("g", 100, 12.0), ("g", 103, 11.5),
            ("g", 400, 9.0), ("g", 500, 30.0)]
    df = spark.createDataFrame(rows, "cell string, t long, v double")
    out = pot_decluster(df, "v", "t", ["cell"], 10.0, 50).collect()
    got = [(r.cluster, r.peak, r.n_exceed, r.start_o, r.end_o)
           for r in out]
    assert got == [(0, 15.0, 3, 0, 8), (1, 12.0, 2, 100, 103),
                   (2, 30.0, 1, 500, 500)]


def test_gpd_mom_matches_numpy(spark):
    rng = np.random.default_rng(9)
    u, xi_true, sig_true = 50.0, 0.2, 10.0
    # inverse-CDF GPD sample above u
    p = rng.uniform(size=300)
    y = sig_true / xi_true * ((1 - p) ** (-xi_true) - 1)
    df = spark.createDataFrame([("c", float(u + v)) for v in y],
                               "cell string, x double")
    got = gpd_moment_fit(df, "x", ["cell"], u).collect()[0]
    ybar = y.mean()
    s2 = y.var()            # population variance — the n-cleared form
    r = ybar * ybar / s2
    assert got.n == 300
    assert got.mean_excess == pytest.approx(ybar, abs=2e-6)
    assert got.xi == pytest.approx((1 - r) / 2, abs=2e-6)
    assert got.sigma == pytest.approx(ybar * (r + 1) / 2, abs=2e-6)


def test_gpd_degenerate(spark):
    rows = ([("flat", 20.0), ("flat", 20.0)]    # zero variance
            + [("one", 25.0)]                    # n = 1
            + [("ok", 12.0), ("ok", 14.0), ("ok", 30.0)])
    df = spark.createDataFrame(rows, "cell string, x double")
    out = {r.cell: r for r in
           gpd_moment_fit(df, "x", ["cell"], 10.0).collect()}
    assert out["flat"].xi is None and out["flat"].sigma is None
    assert out["one"].xi is None
    assert out["ok"].xi is not None
    # below-threshold rows are excluded entirely
    df2 = spark.createDataFrame([("z", 5.0)], "cell string, x double")
    assert gpd_moment_fit(df2, "x", ["cell"], 10.0).count() == 0


def test_doy_climatology_percentiles_and_wrap(spark):
    import datetime

    from flood_data_spark.operators.extremes import doy_climatology

    rows = []
    # Jan 1 (doy 1): values 1..5; Jan 3 (doy 3): values 10, 20
    for v in (1.0, 2.0, 3.0, 4.0, 5.0):
        rows.append(("c", datetime.datetime(2024, 1, 1, 12), v))
    for v in (10.0, 20.0):
        rows.append(("c", datetime.datetime(2024, 1, 3, 6), v))
    df = spark.createDataFrame(rows, "cell string, ts timestamp, v double")

    out = {r.doy: r for r in
           doy_climatology(df, "v", "ts", ["cell"],
                           percentiles=(0.25, 0.5, 0.75),
                           window=0).collect()}
    assert out[1].n == 5
    assert out[1].q50 == pytest.approx(np.percentile(
        [1, 2, 3, 4, 5], 50), abs=1e-12)
    assert out[1].q25 == pytest.approx(np.percentile(
        [1, 2, 3, 4, 5], 25), abs=1e-12)
    assert out[3].q75 == pytest.approx(17.5, abs=1e-12)

    # window=1: doy-1 rows also land on the circular neighbors 366 and 2
    sm = {r.doy: r for r in
          doy_climatology(df, "v", "ts", ["cell"],
                          percentiles=(0.5,), window=1).collect()}
    assert sm[366].n == 5            # wrap: doy 1 - 1 -> 366
    assert sm[2].n == 7              # doy 1 and doy 3 both spill into 2
    assert sm[2].q50 == pytest.approx(np.percentile(
        [1, 2, 3, 4, 5, 10, 20], 50), abs=1e-12)
    with pytest.raises(ValueError, match="window"):
        doy_climatology(df, "v", "ts", ["cell"], window=-1)


def test_drought_runs_hand_case(spark):
    """Below-10 deficits at days 1,2,3 (values 7,9,8), 6 (4), 9,10
    (5,5) with step 1 -> runs (3 days, sev 6), (1 day, sev 6),
    (2 days, sev 10)."""
    from flood_data_spark.operators.extremes import drought_runs

    rows = [("g", 1, 7.0), ("g", 2, 9.0), ("g", 3, 8.0),
            ("g", 4, 15.0), ("g", 6, 4.0), ("g", 9, 5.0),
            ("g", 10, 5.0), ("g", 11, 12.0)]
    df = spark.createDataFrame(rows, "cell string, d long, v double")
    out = drought_runs(df, "v", "d", ["cell"], 10.0, step=1).collect()
    got = [(r.run, r.start_o, r.end_o, r.duration, r.severity,
            r.intensity, r.min_value) for r in out]
    assert got == [(0, 1, 3, 3, 6.0, 2.0, 7.0),
                   (1, 6, 6, 1, 6.0, 6.0, 4.0),
                   (2, 9, 10, 2, 10.0, 5.0, 5.0)]
    # a larger step merges across both holes (gaps 3 and 3)
    merged = drought_runs(df, "v", "d", ["cell"], 10.0,
                          step=3).collect()
    assert [r.duration for r in merged] == [6]
    assert merged[0].severity == pytest.approx(22.0, abs=1e-9)
    with pytest.raises(ValueError, match="group key"):
        drought_runs(df, "v", "d", [], 10.0)


def test_plotting_positions_weibull_and_gringorten(spark):
    from flood_data_spark.operators.extremes import plotting_positions

    vals = [30.0, 10.0, 20.0, 40.0]
    df = spark.createDataFrame([("c", v) for v in vals],
                               "cell string, am double")
    wb = plotting_positions(df, "am", ["cell"], "weibull").collect()
    assert [r.value for r in wb] == sorted(vals)
    assert [r.p for r in wb] == [0.2, 0.4, 0.6, 0.8]
    assert wb[-1].t_years == pytest.approx(5.0, abs=1e-6)
    gg = plotting_positions(df, "am", ["cell"],
                            "gringorten").collect()
    for r in gg:
        want_p = (r.rank - 0.44) / (4 + 0.12)
        assert r.p == pytest.approx(want_p, abs=1e-6)
        assert r.t_years == pytest.approx(1 / (1 - want_p), abs=2e-6)
    with pytest.raises(ValueError, match="unknown method"):
        plotting_positions(df, "am", ["cell"], "hazen")


def test_low_flow_mam_complete_windows_and_gaps(spark):
    from flood_data_spark.operators.extremes import low_flow_mam

    # days 0..9 values 10..1 (strictly falling): MAM3 = mean(3,2,1)=2
    rows = [("c", d, float(10 - d)) for d in range(10)]
    # gapped group: days 0,1,3,4 -> NO complete 3-day range window
    rows += [("gap", d, 5.0) for d in (0, 1, 3, 4)]
    df = spark.createDataFrame(rows, "cell string, d long, v double")
    out = {r.cell: r for r in
           low_flow_mam(df, "v", "d", ["cell"], window=3).collect()}
    assert out["c"].n_windows == 8
    assert out["c"].mam == pytest.approx(2.0, abs=1e-6)
    assert out["gap"].n_windows == 0 and out["gap"].mam is None
    with pytest.raises(ValueError, match="window"):
        low_flow_mam(df, "v", "d", ["cell"], window=0)


def test_standardized_anomaly_matches_numpy(spark):
    import datetime

    from flood_data_spark.operators.extremes import standardized_anomaly

    rng = np.random.default_rng(14)
    rows = []
    vals = {}
    for day in (1, 2, 3):
        vs = rng.uniform(10, 60, 40)
        vals[day] = vs
        for v in vs:
            rows.append(("c", datetime.datetime(2024, 1, day, 9),
                         float(v)))
    df = spark.createDataFrame(rows, "cell string, ts timestamp, v double")
    out = standardized_anomaly(df, "v", "ts", ["cell"],
                               window=0).collect()
    by_day = {}
    for r in out:
        by_day.setdefault(r.doy, []).append(r)
    for day, vs in vals.items():
        mu, sd = vs.mean(), vs.std()       # population std: n-cleared
        got = sorted(r.z for r in by_day[day])
        want = sorted((vs - mu) / sd)
        assert np.allclose(got, want, atol=5e-6), day
    # constant-day group -> NULL z
    flat = spark.createDataFrame(
        [("c", datetime.datetime(2024, 2, 1), 5.0),
         ("c", datetime.datetime(2024, 2, 1), 5.0)],
        "cell string, ts timestamp, v double")
    zf = standardized_anomaly(flat, "v", "ts", ["cell"]).collect()
    assert all(r.z is None for r in zf)


def test_frequency_qq_residuals_small_on_gumbel_sample(spark):
    from flood_data_spark.operators.extremes import frequency_qq

    rng = np.random.default_rng(6)
    x = 100 - 20 * np.log(-np.log(rng.uniform(size=60)))
    df = spark.createDataFrame([("c", float(v)) for v in x],
                               "cell string, am double")
    out = frequency_qq(df, "am", ["cell"]).collect()
    assert len(out) == 60
    assert [r.rank for r in out] == list(range(1, 61))
    # on a true Gumbel sample the QQ relation hugs the diagonal:
    # median |residual| well under one scale unit
    res = np.array([abs(r.residual) for r in out])
    assert np.median(res) < 10.0
    # fitted quantiles are monotone in rank
    fitted = [r.fitted for r in out]
    assert all(a < b for a, b in zip(fitted, fitted[1:]))
    # degenerate group: NULL fit -> NULL fitted/residual, rows kept
    flat = spark.createDataFrame([("f", 3.0), ("f", 3.0)],
                                 "cell string, am double")
    fr = frequency_qq(flat, "am", ["cell"]).collect()
    assert len(fr) == 2 and all(r.fitted is None for r in fr)


def test_gev_matches_python_lmoments(spark):
    """Differential vs a python replica of the full Hosking chain
    (including the shared Γ polynomial and every quantized seam)."""
    import math as pm

    from flood_data_spark.operators.extremes import (
        GAMMA_P, GEV_K1, GEV_K2, LN2_OVER_LN3, gev_return_levels)

    def gamma1p(x):
        def poly(a):
            return sum(c * a ** i for i, c in enumerate(GAMMA_P))
        return poly(x) if x >= 0 else poly(1.0 + x) / (1.0 + x)

    rng = np.random.default_rng(33)
    # Frechet-ish (kappa < 0) and Weibull-type (kappa > 0) samples
    cases = {}
    u = rng.uniform(size=80)
    cases["fr"] = 100 + 20 / 0.2 * (1 - (-np.log(u)) ** 0.2)   # k=0.2
    u2 = rng.uniform(size=80)
    cases["wb"] = 100 + 20 / -0.2 * (1 - (-np.log(u2)) ** -0.2)
    rows = [(g, float(v)) for g, vs in cases.items() for v in vs]
    df = spark.createDataFrame(rows, "cell string, am double")
    out = {(r.cell, r.period): r for r in
           gev_return_levels(df, "am", ["cell"],
                             periods=(10, 100)).collect()}

    def idiv(num, den):
        q = (2 * abs(num) + den) // (2 * den)
        return -q if num < 0 else q

    def seam(v):
        return int(pm.copysign(pm.floor(abs(v) * 1e6 + 0.5), v))

    for g, vs in cases.items():
        qx = sorted(int(pm.floor(abs(v) * 1e6 + 0.5)) for v in vs)
        n = len(qx)
        s0 = sum(qx)
        s1 = sum((i) * x for i, x in enumerate(qx))          # (i-1), 1-based
        s2 = sum(i * (i - 1) * x for i, x in enumerate(qx))
        lam1 = idiv(s0, n)
        lam2n = 2 * s1 - (n - 1) * s0
        lam2 = idiv(lam2n, n * (n - 1))
        t3n = 6 * s2 - 6 * (n - 2) * s1 + (n - 1) * (n - 2) * s0
        t3q = idiv(t3n * 10 ** 6, (n - 2) * lam2n)
        c = 2.0 / (3.0 + t3q / 1e6) - LN2_OVER_LN3
        cq = seam(c)
        k = GEV_K1 * (cq / 1e6) + GEV_K2 * (cq / 1e6) * (cq / 1e6)
        kq = seam(k)
        kd = kq / 1e6
        gq = int(pm.floor(gamma1p(kd) * 1e6 + 0.5))
        gd = gq / 1e6
        sig = (lam2 / 1e6) * kd / (gd * (1.0 - pm.exp(-kd * pm.log(2.0))))
        sq = seam(sig)
        xq = lam1 + seam((sq / 1e6) * (gd - 1.0) / kd)
        for T in (10, 100):
            lyt = pm.log(-pm.log(1.0 - 1.0 / T))
            lq = xq + seam((sq / 1e6) / kd * (1.0 - pm.exp(kd * lyt)))
            r = out[(g, T)]
            assert r.kappa == pytest.approx(kq / 1e6, abs=2e-6), g
            assert r.level == pytest.approx(lq / 1e6, abs=5e-6), (g, T)
    # the Frechet-type sample recovers kappa near its true 0.2
    assert abs(out[("fr", 10)].kappa - 0.2) < 0.1
    # degenerate: n < 3
    tiny = spark.createDataFrame([("t", 1.0), ("t", 2.0)],
                                 "cell string, am double")
    tr = gev_return_levels(tiny, "am", ["cell"], periods=(10,)) \
        .collect()[0]
    assert tr.level is None and tr.kappa is None


def test_lmoment_ratios_match_reference(spark):
    """Differential vs the direct-definition L-moment estimator
    (unbiased PWMs) on a skewed sample; plus the Gumbel theoretical
    point (t3 = 0.1699, t4 = 0.1504) within sampling noise."""
    from flood_data_spark.operators.extremes import lmoment_ratios

    rng = np.random.default_rng(51)
    x = np.sort(100 - 20 * np.log(-np.log(rng.uniform(size=400))))
    df = spark.createDataFrame([("c", float(v)) for v in x],
                               "cell string, am double")
    r = lmoment_ratios(df, "am", ["cell"]).collect()[0]
    n = len(x)
    i = np.arange(1, n + 1)
    b0 = x.mean()
    b1 = ((i - 1) * x).sum() / (n * (n - 1))
    b2 = ((i - 1) * (i - 2) * x).sum() / (n * (n - 1) * (n - 2))
    b3 = ((i - 1) * (i - 2) * (i - 3) * x).sum() \
        / (n * (n - 1) * (n - 2) * (n - 3))
    lam1, lam2 = b0, 2 * b1 - b0
    lam3 = 6 * b2 - 6 * b1 + b0
    lam4 = 20 * b3 - 30 * b2 + 12 * b1 - b0
    assert r.n == 400
    assert r.l1 == pytest.approx(lam1, abs=2e-6)
    assert r.t2 == pytest.approx(lam2 / lam1, abs=2e-6)
    assert r.t3 == pytest.approx(lam3 / lam2, abs=2e-6)
    assert r.t4 == pytest.approx(lam4 / lam2, abs=2e-6)
    # the Gumbel diagram point
    assert r.t3 == pytest.approx(0.1699, abs=0.06)
    assert r.t4 == pytest.approx(0.1504, abs=0.06)
    # degenerate: n < 4
    tiny = spark.createDataFrame([("t", float(v)) for v in (1, 2, 3)],
                                 "cell string, am double")
    tr = lmoment_ratios(tiny, "am", ["cell"]).collect()[0]
    assert tr.t2 is None and tr.t4 is None


def test_gev_near_gumbel_limit_consistency(spark):
    """Cross-family sanity: on a true Gumbel sample the GEV fit's
    kappa is near 0 and its 100-year level lands near the Gumbel
    fit's (within a few percent of the scale parameter)."""
    from flood_data_spark.operators.extremes import (
        gev_return_levels, gumbel_return_levels)

    rng = np.random.default_rng(61)
    x = 100 - 20 * np.log(-np.log(rng.uniform(size=400)))
    df = spark.createDataFrame([("c", float(v)) for v in x],
                               "cell string, am double")
    gum = {r.period: r for r in
           gumbel_return_levels(df, "am", ["cell"],
                                periods=(100,)).collect()}
    gev = {r.period: r for r in
           gev_return_levels(df, "am", ["cell"],
                             periods=(100,)).collect()}
    assert abs(gev[100].kappa) < 0.15
    assert gev[100].level == pytest.approx(gum[100].level,
                                           abs=3 * gum[100].scale)


def test_gev_domain_gate_nulls_extreme_lskew(spark):
    """A sample with L-skewness near 1 drives Hosking's kappa(c)
    approximation far outside its validity range (|kappa| > 0.5,
    near the Gamma reflection's pole at kappa = -1): the fit must
    report NULL loc/scale/level instead of plausible-looking wrong
    numbers, while a well-behaved group in the same frame still
    fits."""
    from flood_data_spark.operators.extremes import gev_return_levels

    rng = np.random.default_rng(77)
    good = 100 - 20 * np.log(-np.log(rng.uniform(size=200)))
    rows = ([("wild", 1.0)] * 30 + [("wild", 1.0001), ("wild", 5e7)]
            + [("tame", float(v)) for v in good])
    df = spark.createDataFrame(rows, "cell string, am double")
    out = {(r.cell, r.period): r for r in
           gev_return_levels(df, "am", ["cell"],
                             periods=(100,)).collect()}
    wild = out[("wild", 100)]
    assert abs(wild.kappa) > 0.5          # outside the domain...
    assert wild.loc is None and wild.scale is None
    assert wild.level is None             # ...so the fit is gated
    tame = out[("tame", 100)]
    assert tame.level is not None and abs(tame.kappa) <= 0.5
