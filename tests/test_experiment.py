"""Kaplan-Meier + two-proportion z-test (operators/experiment.py)."""

import math

import numpy as np
import pytest

from flood_data_spark.operators.experiment import (
    km_survival, two_proportion_ztest)


def _surv(spark, rows):
    return spark.createDataFrame(
        rows, "cohort string, duration long, event int")


def test_km_textbook_curve(spark):
    # classic small example: durations 1,2+,3,4,4,5+ (+ = censored)
    rows = [("a", 1, 1), ("a", 2, 0), ("a", 3, 1),
            ("a", 4, 1), ("a", 4, 1), ("a", 5, 0)]
    got = {r.t: (r.n_risk, r.d_events, r.survival)
           for r in km_survival(_surv(spark, rows)).collect()}
    s1 = round(1.0 * (6 - 1) / 6, 6)
    s3 = round(s1 * (4 - 1) / 4, 6)
    s4 = round(s3 * (3 - 2) / 3, 6)
    assert got == {1: (6, 1, s1), 3: (4, 1, s3), 4: (3, 2, s4)}


def test_km_no_censoring_matches_empirical_survival(spark):
    # without censoring KM = empirical survivor function n_remaining/n
    rows = [("a", d, 1) for d in (1, 2, 2, 3)]
    got = {r.t: r.survival for r in km_survival(_surv(spark, rows)).collect()}
    assert got[1] == 0.75
    assert got[2] == pytest.approx(0.25, abs=2e-6)
    assert got[3] == 0.0


def test_km_censored_at_event_time_still_at_risk(spark):
    # censored subject at t=2 counts in the t=2 risk set
    rows = [("a", 2, 1), ("a", 2, 0), ("a", 5, 0)]
    got = {r.t: (r.n_risk, r.d_events)
           for r in km_survival(_surv(spark, rows)).collect()}
    assert got == {2: (3, 1)}


def test_km_groups_independent_and_guards(spark):
    rows = [("a", 1, 1), ("a", 2, 1), ("b", 7, 1)]
    got = {(r.cohort, r.t): r.survival
           for r in km_survival(_surv(spark, rows)).collect()}
    assert got[("b", 7)] == 0.0 and got[("a", 1)] == 0.5
    with pytest.raises(ValueError, match="NULL"):
        km_survival(spark.createDataFrame(
            [("a", None, 1)], "cohort string, duration long, event int"))


def test_km_deterministic_across_partitionings(spark):
    rows = [("g%d" % (i % 3), (i * 7) % 11 + 1, i % 2) for i in range(90)]
    d = _surv(spark, rows)
    a = {(r.cohort, r.t, r.n_risk, r.d_events, r.survival)
         for r in km_survival(d.coalesce(1)).collect()}
    b = {(r.cohort, r.t, r.n_risk, r.d_events, r.survival)
         for r in km_survival(d.repartition(8)).collect()}
    assert a == b


def _ab(spark, rows):
    return spark.createDataFrame(rows, "variant string, success int")


def test_ztest_closed_form(spark):
    rows = [("A", 1)] * 30 + [("A", 0)] * 70 + \
           [("B", 1)] * 45 + [("B", 0)] * 55
    r = two_proportion_ztest(_ab(spark, rows)).first()
    assert (r.variant_a, r.variant_b) == ("A", "B")
    assert (r.n_a, r.n_b, r.x_a, r.x_b) == (100, 100, 30, 45)
    pooled = 75 / 200
    z = (0.30 - 0.45) / math.sqrt(pooled * (1 - pooled) * (2 / 100))
    assert r.z == round(z, 6)
    assert r.lift == round(-0.15, 6)
    assert r.significant == (abs(z) >= 1.959964)
    assert r.significant  # |z| ~ 2.19


def test_ztest_insignificant_and_guards(spark):
    rows = [("A", 1)] * 10 + [("A", 0)] * 90 + \
           [("B", 1)] * 11 + [("B", 0)] * 89
    r = two_proportion_ztest(_ab(spark, rows)).first()
    assert not r.significant
    with pytest.raises(ValueError, match="2 variants"):
        two_proportion_ztest(_ab(spark, [("A", 1), ("B", 0), ("C", 1)]))
    with pytest.raises(ValueError, match="degenerate"):
        two_proportion_ztest(_ab(spark, [("A", 0), ("B", 0)]))


def test_cuped_matches_numpy_and_contracts(spark):
    """CUPED: theta = cov/var, the mean is preserved, variance shrinks
    by ~rho^2 on a strongly correlated covariate, and a constant
    covariate leaves the metric untouched."""
    import numpy as np

    from flood_data_spark.operators.experiment import cuped_adjust

    rng = np.random.default_rng(5)
    x = rng.normal(10, 3, 500)
    y = 2.0 * x + rng.normal(0, 1, 500)
    df = spark.createDataFrame(
        [(i, float(b), float(a)) for i, (b, a) in enumerate(zip(y, x))],
        "id int, y double, x double")
    out = cuped_adjust(df, "y", "x", keys=["id"]).collect()
    adj = np.array([r.cuped_adjusted for r in out])
    met = np.array([r.metric for r in out])
    t_ref = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    assert out[0].theta == pytest.approx(t_ref, abs=2e-5)
    assert adj.mean() == pytest.approx(met.mean(), abs=1e-4)
    assert adj.var() < 0.3 * met.var()
    ref = y - t_ref * (x - x.mean())
    assert np.allclose(adj, ref, atol=2e-4)
    # constant covariate: no signal, theta 0, metric unchanged
    d2 = spark.createDataFrame([(1, 5.0, 2.0), (2, 7.0, 2.0)],
                               "id int, y double, x double")
    o2 = cuped_adjust(d2, "y", "x", keys=["id"]).collect()
    assert all(r.theta == 0.0 and r.cuped_adjusted == r.metric
               for r in o2)


def test_cuped_partition_invariant(spark):
    import numpy as np

    from flood_data_spark.operators.experiment import cuped_adjust

    rng = np.random.default_rng(9)
    rows = [(i, float(v), float(w))
            for i, (v, w) in enumerate(rng.normal(5, 2, (300, 2)))]
    df = spark.createDataFrame(rows, "id int, y double, x double")
    a = sorted(map(tuple, cuped_adjust(df, "y", "x",
                                       keys=["id"]).collect()))
    b = sorted(map(tuple, cuped_adjust(df.repartition(7), "y", "x",
                                       keys=["id"]).collect()))
    assert a == b


# --- always-valid sequential readout (mSPRT) ------------------------------


def _msprt_numpy(na, xa, nb, xb, tau2=0.01):
    """Reference logLambda for one peek's cumulative counts."""
    pa, pb = xa / na, xb / nb
    pbar = (xa + xb) / (na + nb)
    v = pbar * (1 - pbar) * (1 / na + 1 / nb)
    th = pa - pb
    return 0.5 * math.log(v / (v + tau2)) \
        + th * th * tau2 / (2 * v * (v + tau2))


def test_msprt_matches_numpy_and_contracts(spark):
    """logLambda micro-nats match the closed form per peek; the
    always-valid p is non-increasing; rejection is sticky; degenerate
    peeks (one arm empty / pooled 0%) carry NULL and don't move the
    decision."""
    from flood_data_spark.operators.experiment import msprt_readout

    rows = [
        # peek 1: only arm A has data -> NULL logLam
        (1, "A", 1), (1, "A", 0),
        # peek 2: both arms, strong effect starts
        (2, "A", 1), (2, "A", 1), (2, "B", 0), (2, "B", 0),
        (3, "A", 1), (3, "A", 1), (3, "B", 0), (3, "B", 1),
        (4, "A", 1), (4, "A", 1), (4, "B", 0), (4, "B", 0),
    ]
    df = spark.createDataFrame(rows, "peek int, variant string,"
                                     " success int")
    out = msprt_readout(df, time_col="peek", tau2=0.01,
                        alpha=0.05).collect()
    by_peek = {r.peek: r for r in out}
    assert by_peek[1].log_lambda_micro is None
    assert by_peek[1].always_valid_p == 1.0
    assert not by_peek[1].reject
    # cumulative counts then closed form
    cums = {2: (4, 3, 2, 0), 3: (6, 5, 4, 1), 4: (8, 7, 6, 1)}
    for pk, (na, xa, nb, xb) in cums.items():
        r = by_peek[pk]
        assert (r.n_a, r.x_a, r.n_b, r.x_b) == (na, xa, nb, xb)
        want = round(_msprt_numpy(na, xa, nb, xb) * 1e6)
        assert abs(r.log_lambda_micro - want) <= 1, (pk, r, want)
    ps = [by_peek[k].always_valid_p for k in sorted(by_peek)]
    assert ps == sorted(ps, reverse=True)
    rejects = [by_peek[k].reject for k in sorted(by_peek)]
    assert rejects == sorted(rejects)  # False..True, sticky


def test_msprt_guards(spark):
    from flood_data_spark.operators.experiment import msprt_readout

    df = spark.createDataFrame([(1, "A", 1)], "peek int, variant string,"
                                              " success int")
    with pytest.raises(ValueError, match="tau2"):
        msprt_readout(df, tau2=0.0)
    with pytest.raises(ValueError, match="alpha"):
        msprt_readout(df, alpha=1.5)


def test_msprt_peeking_validity_vs_ztest(spark):
    """THE reason this operator exists: under H0 (both arms
    Bernoulli(0.5)) with 20 peeks, the fixed-n z-test read at every
    peek blows far past its nominal 5% false-positive rate, while the
    mSPRT's ever-reject rate stays within the martingale bound
    alpha=0.05 (Johari et al. 2017).  100 independent null streams,
    deterministic seed; the z ladder is recomputed in numpy from the
    same draws."""
    import random

    import numpy as np

    from flood_data_spark.operators.experiment import msprt_readout

    rng = random.Random(20260815)
    n_streams, n_peeks, per_arm = 100, 20, 25
    rows = []
    draws = {}   # (stream) -> list of per-peek (xa, xb)
    for s in range(n_streams):
        draws[s] = []
        for t in range(n_peeks):
            xa = sum(rng.random() < 0.5 for _ in range(per_arm))
            xb = sum(rng.random() < 0.5 for _ in range(per_arm))
            draws[s].append((xa, xb))
            rows.append((s, t, "A", xa, per_arm))
            rows.append((s, t, "B", xb, per_arm))
    # expand counts to unit rows through explode-free weighting: build
    # per-row successes directly (keeps the input the operator's shape)
    unit = [(s, t, v, 1) for (s, t, v, x, n) in rows for _ in range(x)] \
        + [(s, t, v, 0) for (s, t, v, x, n) in rows for _ in range(n - x)]
    df = spark.createDataFrame(unit, "stream int, peek int,"
                                     " variant string, success int")
    got = msprt_readout(df, time_col="peek", group_cols=("stream",),
                        tau2=0.01, alpha=0.05).collect()
    msprt_fp = len({r.stream for r in got if r.reject})

    # z-test read at every peek, numpy, same draws
    z_fp = 0
    for s in range(n_streams):
        na = nb = xa = xb = 0
        crossed = False
        for (a, b) in draws[s]:
            na += 25; nb += 25; xa += a; xb += b
            pbar = (xa + xb) / (na + nb)
            if pbar in (0.0, 1.0):
                continue
            z = (xa / na - xb / nb) / math.sqrt(
                pbar * (1 - pbar) * (1 / na + 1 / nb))
            if abs(z) >= 1.959964:
                crossed = True
        z_fp += crossed

    # martingale bound: E[msprt_fp] <= 5; allow binomial slack
    assert msprt_fp <= 12, (msprt_fp, z_fp)
    # the z ladder's ever-crossing rate is far above nominal — the
    # documented peeking pathology (typically ~20-30% at 20 peeks)
    assert z_fp > msprt_fp and z_fp >= 12, (msprt_fp, z_fp)


# --- delta-method ratio metric CI -----------------------------------------


def test_ratio_ci_matches_numpy_delta_method(spark):
    import numpy as np

    from flood_data_spark.operators.experiment import ratio_metric_ci

    rng = np.random.default_rng(11)
    x = rng.uniform(1, 100, 200).round(4)
    y = rng.uniform(1, 50, 200).round(4)
    df = spark.createDataFrame(
        [("g", float(a), float(b)) for a, b in zip(x, y)],
        "g string, x double, y double")
    r = ratio_metric_ci(df, "x", "y", ("g",)).collect()[0]
    n = len(x)
    R = x.sum() / y.sum()
    vx, vy = x.var(), y.var()                    # population moments
    cxy = ((x - x.mean()) * (y - y.mean())).mean()
    se = np.sqrt(max(vx - 2 * R * cxy + R * R * vy, 0)
                 / (n * y.mean() ** 2))
    assert r.n == n
    assert r.ratio == pytest.approx(R, abs=2e-6)
    assert r.se == pytest.approx(se, abs=2e-6)
    assert r.lo == pytest.approx(R - 1.959964 * se, abs=5e-6)
    assert r.hi == pytest.approx(R + 1.959964 * se, abs=5e-6)


def test_ratio_ci_guards_and_partition_invariance(spark):
    from flood_data_spark.operators.experiment import ratio_metric_ci

    rows = [("z", 1.0, 1.0), ("z", 2.0, -1.0),    # sy = 0
            ("s", 3.0, 2.0),                      # n = 1
            ("c", 5.0, 2.0), ("c", 5.0, 2.0)]     # zero variance
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r.g: r for r in
           ratio_metric_ci(df, "x", "y", ("g",)).collect()}
    assert out["z"].ratio is None and out["z"].se is None
    assert out["s"].ratio == 1.5 and out["s"].se is None \
        and out["s"].lo is None
    assert out["c"].se == 0.0 and out["c"].lo == out["c"].hi == 2.5
    big = df.union(df.selectExpr("'m' as g", "x * 2", "y"))
    a = sorted(map(tuple, ratio_metric_ci(
        big.coalesce(1), "x", "y", ("g",)).collect()))
    b = sorted(map(tuple, ratio_metric_ci(
        big.repartition(5), "x", "y", ("g",)).collect()))
    assert a == b


# --- Wilson score interval -------------------------------------------------


def test_wilson_matches_closed_form_and_bounds(spark):
    from flood_data_spark.operators.experiment import wilson_interval

    z = 1.959964
    cases = {"a": (40, 100), "b": (0, 20), "c": (20, 20), "d": (1, 3)}
    rows = [(g, 1) for g, (x, n) in cases.items() for _ in range(x)] \
        + [(g, 0) for g, (x, n) in cases.items() for _ in range(n - x)]
    df = spark.createDataFrame(rows, "g string, success int")
    out = {r.g: r for r in
           wilson_interval(df, "success", ("g",)).collect()}
    for g, (x, n) in cases.items():
        r = out[g]
        assert (r.n, r.x) == (n, x)
        center = (x + z * z / 2) / (n + z * z)
        margin = z * math.sqrt(x * (n - x) / n + z * z / 4) / (n + z * z)
        assert r.lo == pytest.approx(center - margin, abs=2e-6), g
        assert r.hi == pytest.approx(center + margin, abs=2e-6), g
        # Wilson never exits [0,1], even at x=0 / x=n
        assert 0.0 <= r.lo <= r.hi <= 1.0
        assert r.p == pytest.approx(x / n, abs=1e-6)
    # extreme cells keep a nonzero-width interval (no collapse)
    assert out["b"].hi > 0.0 and out["c"].lo < 1.0


# --- Neyman allocation -----------------------------------------------------


def test_neyman_allocation_hand_case(spark):
    """Two strata, sd ratio 3:1 and size ratio 1:2 -> weights 3:2;
    a zero-variance stratum draws nothing; caps bind at N_h."""
    from flood_data_spark.datapipe.curation import neyman_allocation

    rows = ([("hi", v) for v in (0.0, 6.0) * 50]        # N=100, sd=3
            + [("lo", v) for v in (0.0, 2.0) * 100]     # N=200, sd=1
            + [("konst", 5.0)] * 40)                    # sd=0
    df = spark.createDataFrame(rows, "s string, v double")
    out = {r.s: r for r in
           neyman_allocation(df, "v", ("s",), total_n=100).collect()}
    assert out["hi"].sd == pytest.approx(3.0, abs=1e-6)
    assert out["lo"].sd == pytest.approx(1.0, abs=1e-6)
    assert out["konst"].sd == 0.0 and out["konst"].alloc == 0
    # weights: 100*3 = 300 vs 200*1 = 200 -> 60 / 40
    assert out["hi"].alloc == 60 and out["lo"].alloc == 40
    # cap binds: budget larger than a stratum's population
    out2 = {r.s: r for r in
            neyman_allocation(df, "v", ("s",), total_n=400).collect()}
    assert out2["hi"].alloc == 100          # capped at N_h
    with pytest.raises(ValueError, match="stratum"):
        neyman_allocation(df, "v", (), 10)
    with pytest.raises(ValueError, match="total_n"):
        neyman_allocation(df, "v", ("s",), -1)


# --- SRM check --------------------------------------------------------------


def test_srm_detects_mismatch_and_passes_balance(spark):
    import math

    from flood_data_spark.operators.experiment import srm_check

    rows = ([("ok", "A")] * 5000 + [("ok", "B")] * 5050
            + [("bad", "A")] * 5000 + [("bad", "B")] * 5800
            + [("bad", "C")] * 7)     # foreign variant ignored
    df = spark.createDataFrame(rows, "exp string, variant string")
    out = {r.exp: r for r in srm_check(df, group_cols=["exp"]).collect()}
    ok, bad = out["ok"], out["bad"]
    assert (ok.n_a, ok.n_b) == (5000, 5050)
    z_ok = (5000 - 10050 * 0.5) / math.sqrt(10050 * 0.25)
    assert ok.z == pytest.approx(z_ok, abs=2e-6)
    assert ok.srm is False
    z_bad = (5000 - 10800 * 0.5) / math.sqrt(10800 * 0.25)
    assert bad.z == pytest.approx(z_bad, abs=2e-6)
    assert bad.srm is True
    with pytest.raises(ValueError, match="expected_a"):
        srm_check(df, group_cols=["exp"], expected_a=1.5)


def test_srm_unbalanced_design(spark):
    """A 90/10 design with counts near 90/10 passes."""
    from flood_data_spark.operators.experiment import srm_check

    rows = [("e", "A")] * 9000 + [("e", "B")] * 1020
    df = spark.createDataFrame(rows, "exp string, variant string")
    r = srm_check(df, group_cols=["exp"], expected_a=0.9).collect()[0]
    assert r.srm is False and abs(r.z) < 3


# --- Winsorized mean --------------------------------------------------------


def test_winsorized_mean_matches_numpy(spark):
    from flood_data_spark.operators.experiment import winsorized_mean

    rng = np.random.default_rng(21)
    vals = np.concatenate([rng.exponential(10, 500), [5000.0, 9000.0]])
    df = spark.createDataFrame([("g", float(v)) for v in vals],
                               "grp string, v double")
    r = winsorized_mean(df, "v", ["grp"], lower=0.01,
                        upper=0.95).collect()[0]
    lo = np.percentile(vals, 1)
    hi = np.percentile(vals, 95)
    want = np.clip(vals, lo, hi).mean()
    assert r.n == 502
    assert r.lo_cap == pytest.approx(lo, abs=1e-9)
    assert r.hi_cap == pytest.approx(hi, abs=1e-9)
    assert r.wmean == pytest.approx(want, abs=2e-6)
    # capping tames the outliers: far below the raw mean's pull
    assert r.wmean < vals.mean()
    with pytest.raises(ValueError, match="lower"):
        winsorized_mean(df, "v", ["grp"], lower=0.9, upper=0.5)


def test_srm_variantless_group_surfaces_with_null_z(spark):
    """An experiment whose rows are ALL outside {A, B} must surface
    with n_a = n_b = 0 and NULL z/srm, not vanish from the report
    (the aggregate runs over the unfiltered frame)."""
    from flood_data_spark.operators.experiment import srm_check

    rows = ([("live", "A")] * 40 + [("live", "B")] * 42
            + [("ghost", "C")] * 25)
    df = spark.createDataFrame(rows, "exp string, variant string")
    out = {r.exp: r for r in srm_check(df, group_cols=["exp"]).collect()}
    assert set(out) == {"live", "ghost"}
    g = out["ghost"]
    assert (g.n_a, g.n_b) == (0, 0)
    assert g.z is None and g.srm is None


def test_winsorized_mean_excludes_null_values(spark):
    """NULL values must not count toward n: n, the caps, and the sum
    all cover the same (non-null) rows, so wmean is not deflated."""
    from flood_data_spark.operators.experiment import winsorized_mean

    rng = np.random.default_rng(33)
    vals = rng.exponential(10, 200)
    rows = ([("g", float(v)) for v in vals]
            + [("g", None)] * 50)
    df = spark.createDataFrame(rows, "grp string, v double")
    r = winsorized_mean(df, "v", ["grp"], lower=0.05,
                        upper=0.95).collect()[0]
    lo, hi = np.percentile(vals, 5), np.percentile(vals, 95)
    want = np.clip(vals, lo, hi).mean()
    assert r.n == 200
    assert r.wmean == pytest.approx(want, abs=2e-6)
