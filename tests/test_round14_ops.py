"""Round-14 operators: empirical SPI, regional growth curve (RFA),
FSS, RPS, quantile-mapping bias correction, unit-hydrograph
convolution — each against an independent numpy/python twin."""

import math

import numpy as np
import pytest

from flood_data_spark.functions.distributions import invnorm


# --- invnorm seam ----------------------------------------------------------


def test_invnorm_matches_tables_and_symmetry():
    # Φ⁻¹ reference values (Abramowitz & Stegun / standard tables)
    cases = {0.5: 0.0, 0.975: 1.959963985, 0.025: -1.959963985,
             0.01: -2.326347874, 0.99: 2.326347874,
             0.001: -3.090232306, 0.999: 3.090232306}
    for p, want in cases.items():
        assert invnorm(p) == pytest.approx(want, abs=2e-8)
    for p in (0.0001, 0.2, 0.4, 0.44, 0.7, 0.9999):
        assert invnorm(p) == pytest.approx(-invnorm(1 - p), abs=1e-12)
    with pytest.raises(ValueError):
        invnorm(0.0)
    with pytest.raises(ValueError):
        invnorm(1.0)


# --- SPI -------------------------------------------------------------------


def test_spi_matches_numpy_twin(spark):
    from flood_data_spark.operators.extremes import spi_empirical

    rng = np.random.default_rng(14)
    vals = rng.gamma(2.0, 30.0, size=40)
    rows = [("c", 7, int(2000 + y), float(v))
            for y, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "cell string, month int, year int, precip double")
    got = spi_empirical(df, "precip", ["cell", "month"], "year") \
        .collect()
    assert len(got) == len(vals)
    # twin: Gringorten positions off the micro-quantized sort order
    qx = np.sign(vals) * np.floor(np.abs(vals) * 1e6 + 0.5)
    order = np.argsort(qx, kind="stable")
    ranks = np.empty(len(vals), dtype=int)
    ranks[order] = np.arange(1, len(vals) + 1)
    n = len(vals)
    by_year = {}
    for y in range(n):
        num = (100 * ranks[y] - 44) * 1_000_000
        den = 100 * n + 12
        by_year[int(2000 + y)] = (2 * num + den) // (2 * den)  # pq
    for r in got:
        pq = by_year[r.year]
        assert r.p == pytest.approx(pq / 1e6, abs=1e-9)
        # the operator evaluates the probit ON the quantized p
        assert r.spi == pytest.approx(invnorm(pq / 1e6), abs=1.1e-6)
        assert r.n == n
    # a standardized index: median-ish value near 0, extremes signed
    spis = sorted(r.spi for r in got)
    assert spis[0] < -1.5 and spis[-1] > 1.5
    assert abs(np.median(spis)) < 0.2
    with pytest.raises(ValueError, match="group key"):
        spi_empirical(df, "precip", [], "year")


# --- regional growth curve -------------------------------------------------


def _ams(rng, loc, scale, n):
    return loc - scale * np.log(-np.log(rng.uniform(size=n)))


def test_regional_single_site_matches_atsite_gev(spark):
    """A one-site region's scaled growth curve reproduces the at-site
    GEV fit (index-flood algebra: x_T = l1 · q(T))."""
    from flood_data_spark.operators.extremes import (
        gev_return_levels, regional_growth_curve)

    rng = np.random.default_rng(41)
    x = _ams(rng, 100.0, 25.0, 60)
    rows = [("r", "s1", float(v)) for v in x]
    df = spark.createDataFrame(rows,
                               "region string, site string, am double")
    at = {r.period: r for r in
          gev_return_levels(df, "am", ["region"],
                            periods=(10, 100)).collect()}
    rg = {r.period: r for r in
          regional_growth_curve(df, "am", ["region"], "site",
                                periods=(10, 100)).collect()}
    for t in (10, 100):
        assert rg[t].level == pytest.approx(at[t].level, rel=2e-3)
        assert rg[t].n == 60


def test_regional_scale_invariance_and_pooling(spark):
    """Two sites with the SAME distribution shape but 3x different
    index floods share one growth curve; levels scale by the index
    flood.  A short noisy site gets the pooled (stable) curve."""
    from flood_data_spark.operators.extremes import (
        regional_growth_curve)

    rng = np.random.default_rng(42)
    base = _ams(rng, 100.0, 20.0, 50)
    rows = ([("r", "a", float(v)) for v in base]
            + [("r", "b", float(3.0 * v)) for v in base])
    df = spark.createDataFrame(rows,
                               "region string, site string, am double")
    out = {(r.site, r.period): r for r in
           regional_growth_curve(df, "am", ["region"], "site",
                                 periods=(100,)).collect()}
    a, b = out[("a", 100)], out[("b", 100)]
    # identical growth (same regional curve), scaled levels
    assert a.growth == b.growth
    assert b.level == pytest.approx(3.0 * a.level, rel=1e-5)


def test_regional_guards(spark):
    from flood_data_spark.operators.extremes import (
        regional_growth_curve)

    # constant series everywhere: lam2 = 0 -> no site qualifies ->
    # regional fit NULL but sites still surface
    rows = [("r", "a", 5.0)] * 4 + [("r", "b", 7.0)] * 4
    df = spark.createDataFrame(rows,
                               "region string, site string, am double")
    out = regional_growth_curve(df, "am", ["region"], "site",
                                periods=(10,)).collect()
    assert len(out) == 2
    assert all(r.growth is None and r.level is None for r in out)
    with pytest.raises(ValueError, match="region key"):
        regional_growth_curve(df, "am", [], "site")


# --- FSS -------------------------------------------------------------------


def _fss_numpy(f, o, r):
    """Edge-aware box-fraction FSS twin (micro-free reference)."""
    ni, nj = f.shape
    pf = np.zeros_like(f, dtype=float)
    po = np.zeros_like(f, dtype=float)
    for i in range(ni):
        for j in range(nj):
            i0, i1 = max(0, i - r), min(ni, i + r + 1)
            j0, j1 = max(0, j - r), min(nj, j + r + 1)
            cnt = (i1 - i0) * (j1 - j0)
            pf[i, j] = f[i0:i1, j0:j1].sum() / cnt
            po[i, j] = o[i0:i1, j0:j1].sum() / cnt
    num = ((pf - po) ** 2).sum()
    den = (pf ** 2).sum() + (po ** 2).sum()
    return 1.0 - num / den if den > 0 else None


def _grid_df(spark, f, o):
    ni, nj = f.shape
    rows = [("g", i, j, int(f[i, j]), int(o[i, j]))
            for i in range(ni) for j in range(nj)]
    return spark.createDataFrame(
        rows, "grp string, i int, j int, fc int, ob int")


def test_fss_matches_numpy_twin(spark):
    from flood_data_spark.operators.verification import fss

    rng = np.random.default_rng(7)
    f = (rng.uniform(size=(12, 15)) < 0.15).astype(int)
    o = np.roll(f, shift=1, axis=1)  # displaced by one column
    df = _grid_df(spark, f, o)
    for r in (1, 2):
        got = fss(df, "i", "j", "fc", "ob", ["grp"],
                  radius=r).collect()[0]
        want = _fss_numpy(f, o, r)
        assert got.n_cells == f.size
        assert got.fss == pytest.approx(want, abs=5e-6)
    # neighborhood tolerance: FSS grows with radius for displaced rain
    f1 = fss(df, "i", "j", "fc", "ob", ["grp"], radius=1) \
        .collect()[0].fss
    f3 = fss(df, "i", "j", "fc", "ob", ["grp"], radius=3) \
        .collect()[0].fss
    assert f3 > f1


def test_fss_perfect_and_undefined(spark):
    from flood_data_spark.operators.verification import fss

    f = np.zeros((6, 6), dtype=int)
    f[2, 3] = f[3, 3] = 1
    got = fss(_grid_df(spark, f, f.copy()), "i", "j", "fc", "ob",
              ["grp"], radius=1).collect()[0]
    assert got.fss == pytest.approx(1.0, abs=1e-9)
    z = np.zeros((4, 4), dtype=int)
    got0 = fss(_grid_df(spark, z, z), "i", "j", "fc", "ob",
               ["grp"], radius=1).collect()[0]
    assert got0.fss is None
    with pytest.raises(ValueError, match="radius"):
        fss(_grid_df(spark, f, f), "i", "j", "fc", "ob", ["grp"],
            radius=0)


# --- RPS -------------------------------------------------------------------


def test_rps_matches_numpy_twin(spark):
    from flood_data_spark.operators.verification import rps_score

    rng = np.random.default_rng(9)
    thr = [10.0, 20.0, 40.0]
    rows, want_inst = [], []
    for t in range(25):
        m = 11
        members = rng.gamma(2.0, 12.0, size=m)
        obs = float(rng.gamma(2.0, 12.0))
        rows += [("c", t, float(v), obs) for v in members]
        cf = np.array([(members <= k).mean() for k in thr])
        co = np.array([1.0 if obs <= k else 0.0 for k in thr])
        want_inst.append(((cf - co) ** 2).sum() / len(thr))
    df = spark.createDataFrame(
        rows, "cell string, t int, member double, obs double")
    got = rps_score(df, "member", "obs", ["cell"], ["t"],
                    thresholds=thr).collect()[0]
    assert got.n_inst == 25
    assert got.rps == pytest.approx(np.mean(want_inst), abs=5e-6)


def test_rps_perfect_and_guards(spark):
    from flood_data_spark.operators.verification import rps_score

    rows = [("c", 0, 5.0, 5.0)] * 7    # all members == obs
    df = spark.createDataFrame(
        rows, "cell string, t int, member double, obs double")
    got = rps_score(df, "member", "obs", ["cell"], ["t"],
                    thresholds=[1.0, 10.0]).collect()[0]
    assert got.rps == 0.0
    with pytest.raises(ValueError, match="ascending"):
        rps_score(df, "member", "obs", ["cell"], ["t"],
                  thresholds=[10.0, 1.0])
    with pytest.raises(ValueError, match="instance key"):
        rps_score(df, "member", "obs", ["cell"], [],
                  thresholds=[1.0])


# --- quantile mapping ------------------------------------------------------


def test_quantile_map_matches_numpy(spark):
    from flood_data_spark.operators.postprocess import quantile_map

    rng = np.random.default_rng(5)
    sim_v = rng.gamma(2.0, 10.0, size=80)     # biased model climate
    obs_v = rng.gamma(2.0, 14.0, size=60) + 5.0
    sim = spark.createDataFrame([("g", float(v)) for v in sim_v],
                                "grp string, flow double")
    obs = spark.createDataFrame([("g", float(v)) for v in obs_v],
                                "grp string, flow double")
    got = quantile_map(sim, obs, "flow", ["grp"]).collect()
    assert len(got) == len(sim_v)
    n = len(sim_v)
    obs_sorted = np.sort(np.sign(obs_v)
                         * np.floor(np.abs(obs_v) * 1e6 + 0.5)) / 1e6
    ranks = {}
    for i, v in enumerate(np.sort(sim_v), start=1):
        ranks.setdefault(round(v, 9), []).append(i)
    for r in got:
        # p = i/(n+1); mapped = linear obs quantile at p (type 7)
        i = ranks[round(r.value, 9)].pop(0)
        p = i / (n + 1)
        want = np.quantile(obs_sorted, p, method="linear")
        assert r.p == pytest.approx(p, abs=2e-6)
        assert r.mapped == pytest.approx(want, abs=5e-6)
    # corrected sample mean moved toward the observed climate
    mm = np.mean([r.mapped for r in got])
    assert abs(mm - obs_v.mean()) < abs(sim_v.mean() - obs_v.mean())


def test_quantile_map_degenerate_obs(spark):
    from flood_data_spark.operators.postprocess import quantile_map

    sim = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0), ("h", 9.0)],
        "grp string, v double")
    obs = spark.createDataFrame([("g", 42.0)], "grp string, v double")
    got = {(r.grp, r.value): r for r in
           quantile_map(sim, obs, "v", ["grp"]).collect()}
    # m = 1: everything maps to the single observed value
    assert got[("g", 1.0)].mapped == 42.0
    assert got[("g", 2.0)].mapped == 42.0
    # group with no observations: NULL mapped
    assert got[("h", 9.0)].mapped is None
    with pytest.raises(ValueError, match="group key"):
        quantile_map(sim, obs, "v", [])


# --- unit hydrograph -------------------------------------------------------


def test_uh_convolve_matches_numpy(spark):
    from flood_data_spark.operators.routing import uh_convolve

    rng = np.random.default_rng(3)
    rain = rng.uniform(0, 30, size=20)
    uh = [0.1, 0.35, 0.3, 0.15, 0.1]
    rows = [("b", t, float(p)) for t, p in enumerate(rain)]
    df = spark.createDataFrame(rows, "basin string, t int, p double")
    got = {r.t: r.runoff for r in
           uh_convolve(df, "p", "t", ["basin"], uh).collect()}
    want = np.convolve(rain, uh)
    assert len(got) == len(rain) + len(uh) - 1   # full tail emitted
    for t, w in enumerate(want):
        assert got[t] == pytest.approx(w, abs=5e-6)
    # mass conservation: sum(UH) = 1 -> total runoff = total rain
    assert sum(got.values()) == pytest.approx(rain.sum(), abs=1e-3)
    with pytest.raises(ValueError, match="ordinate"):
        uh_convolve(df, "p", "t", ["basin"], [])


# --- rating curve ----------------------------------------------------------


def test_rating_curve_recovers_power_law(spark):
    from flood_data_spark.operators.routing import rating_curve

    rng = np.random.default_rng(11)
    h = rng.uniform(0.5, 8.0, size=300)
    a_true, b_true = 12.0, 1.7
    q = a_true * h ** b_true * np.exp(rng.normal(0, 0.05, size=300))
    rows = ([("s", float(x), float(y)) for x, y in zip(h, q)]
            + [("s", -1.0, 5.0), ("s", 2.0, None)])   # excluded rows
    df = spark.createDataFrame(rows,
                               "station string, h double, q double")
    r = rating_curve(df, "h", "q", ["station"]).collect()[0]
    assert r.n == 300
    # numpy twin (raw-double OLS; micro seams agree to ~1e-4)
    x, y = np.log(h), np.log(q)
    bb = np.polyfit(x, y, 1)
    assert r.b == pytest.approx(bb[0], abs=1e-4)
    assert r.ln_a == pytest.approx(bb[1], abs=1e-4)
    assert r.a == pytest.approx(np.exp(bb[1]), rel=1e-3)
    cc = np.corrcoef(x, y)[0, 1] ** 2
    assert r.r2 == pytest.approx(cc, abs=1e-4)
    assert r.r2 > 0.99
    with pytest.raises(ValueError, match="group key"):
        rating_curve(df, "h", "q", [])


def test_rating_curve_degenerate_stage(spark):
    """Constant stage: den_x = 0 -> NULL fit, n still reported."""
    from flood_data_spark.operators.routing import rating_curve

    df = spark.createDataFrame([("s", 2.0, float(v))
                                for v in (1.0, 2.0, 3.0)],
                               "station string, h double, q double")
    r = rating_curve(df, "h", "q", ["station"]).collect()[0]
    assert r.n == 3
    assert r.b is None and r.a is None and r.r2 is None


# --- seasonal Mann-Kendall -------------------------------------------------


def _mk_s_var(x):
    """Plain MK S and tie-corrected variance for one series."""
    n = len(x)
    s = sum(np.sign(x[j] - x[i])
            for i in range(n) for j in range(i + 1, n))
    _, counts = np.unique(x, return_counts=True)
    tsum = sum(t * (t - 1) * (2 * t + 5) for t in counts)
    var = (n * (n - 1) * (2 * n + 5) - tsum) / 18.0
    return s, var


def test_seasonal_mk_matches_numpy_twin(spark):
    from flood_data_spark.operators.stats import seasonal_mann_kendall

    rng = np.random.default_rng(19)
    rows, s_tot, var_tot = [], 0, 0.0
    seasonal = np.array([0.0, 30.0, 60.0, 30.0])  # strong cycle
    for season in range(4):
        # upward trend + seasonal offset + noise
        x = (seasonal[season] + 2.0 * np.arange(12)
             + rng.normal(0, 1.0, 12))
        xq = np.floor(np.abs(x) * 1e6 + 0.5) * np.sign(x) / 1e6
        s, v = _mk_s_var(xq)
        s_tot += s
        var_tot += v
        rows += [("c", season, int(t), float(val))
                 for t, val in enumerate(x)]
    df = spark.createDataFrame(
        rows, "cell string, season int, t int, x double")
    r = seasonal_mann_kendall(df, "x", "t", "season",
                              ["cell"]).collect()[0]
    assert (r.n, r.n_seasons, r.s) == (48, 4, int(s_tot))
    want_z = (s_tot - np.sign(s_tot)) / np.sqrt(var_tot)
    assert r.z == pytest.approx(want_z, abs=2e-5)
    assert r.trend == "increasing"
    # sen slope pools within-season pairs: near the true +2.0/step
    assert r.sen_slope == pytest.approx(2.0, abs=0.3)
    with pytest.raises(ValueError, match="group key"):
        seasonal_mann_kendall(df, "x", "t", "season", [])


def test_seasonal_mk_deseasonalizes(spark):
    """A PURE seasonal cycle with no trend: plain MK on the pooled
    series can see spurious structure; seasonal MK reports no trend
    (all within-season series are constant -> Var = 0, NULL z)."""
    from flood_data_spark.operators.stats import seasonal_mann_kendall

    rows = [("c", season, t, float(10 * season))
            for season in range(4) for t in range(6)]
    df = spark.createDataFrame(
        rows, "cell string, season int, t int, x double")
    r = seasonal_mann_kendall(df, "x", "t", "season",
                              ["cell"]).collect()[0]
    assert r.s == 0 and r.z is None and r.trend == "no trend"


# --- FIM transform ---------------------------------------------------------


def test_fim_reconstruction_and_determinism(spark):
    from flood_data_spark.datapipe.curation import fim_transform

    rows = [(i, "abcdefghijklmnopqrstuvwxyz" * 2) for i in range(200)]
    rows += [(900, "short")]                     # under min_len
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: r for r in fim_transform(df, rate=0.5).collect()}
    assert len(out) == 201
    applied = [r for r in out.values() if r.fim_applied]
    # ~half chosen (md5 prefix predicate; 200 docs -> loose band)
    assert 60 <= len(applied) <= 140
    for r in applied:
        # splits reconstruct the document exactly
        assert r.prefix + r.middle + r.suffix == \
            "abcdefghijklmnopqrstuvwxyz" * 2
        assert len(r.prefix) >= 1
        assert r.fim_text == ("<|fim_pre|>" + r.prefix + "<|fim_suf|>"
                              + r.suffix + "<|fim_mid|>" + r.middle)
    # short doc and rate-missed docs pass through untouched
    assert out[900].fim_applied is False
    assert out[900].fim_text == "short"
    missed = next(r for r in out.values() if not r.fim_applied
                  and r.id != 900)
    assert missed.fim_text == "abcdefghijklmnopqrstuvwxyz" * 2
    # determinism: a different partitioning picks the SAME docs/cuts
    out2 = {r.id: r for r in
            fim_transform(df.repartition(7), rate=0.5).collect()}
    assert all(out2[k].fim_text == v.fim_text for k, v in out.items())
    with pytest.raises(ValueError, match="min_len"):
        fim_transform(df, min_len=2)


# --- IDF curves ------------------------------------------------------------


def test_idf_matches_numpy_twin(spark):
    """IDF: rolling depths are monotone in duration, block maxima and
    the Gumbel fit match a direct numpy recomputation."""
    from flood_data_spark.operators.extremes import (
        gumbel_return_levels, idf_curves)

    rng = np.random.default_rng(23)
    rain = rng.gamma(1.5, 8.0, size=60)
    rows = [("c", t, int(t // 10), float(v))
            for t, v in enumerate(rain)]
    df = spark.createDataFrame(
        rows, "cell string, t int, blk int, rain double")
    got = {(r.duration, r.period): r for r in
           idf_curves(df, "rain", "t", "blk", ["cell"],
                      durations=(1, 3), periods=(10,)).collect()}
    # twin: quantized rolling sums, block maxima, then the operator's
    # own Gumbel fit on a hand-built AMS frame (fit itself is pinned
    # by test_gumbel_* already — this pins the rolling/block plumbing)
    q = np.floor(np.abs(rain) * 1e6 + 0.5) * np.sign(rain)
    for d in (1, 3):
        depths = np.array([q[max(0, i - d + 1):i + 1].sum()
                           for i in range(len(rain))])[d - 1:] / 1e6
        blocks = (np.arange(len(rain)) // 10)[d - 1:]
        ams = [(f"b{b}", float(depths[blocks == b].max()))
               for b in np.unique(blocks)]
        fit = gumbel_return_levels(
            spark.createDataFrame(ams, "blk string, am double"),
            "am", ["blk"], periods=(10,))
        # compare the pooled fit by refitting on the same AMS multiset
        ams_df = spark.createDataFrame(
            [("c", v) for _, v in ams], "cell string, am double")
        want = gumbel_return_levels(ams_df, "am", ["cell"],
                                    periods=(10,)).collect()[0]
        r = got[(d, 10)]
        assert r.n == len(ams)
        assert r.level == pytest.approx(want.level, abs=1e-9)
        assert r.loc == pytest.approx(want.loc, abs=1e-9)
    # depth quantiles grow with duration (longer windows accumulate)
    assert got[(3, 10)].level > got[(1, 10)].level


# --- conservative regrid ---------------------------------------------------


def _regrid_numpy(cells, rs, rd):
    """Brute-force interval-overlap twin: cells = [(lat, lon, v)]."""
    out = {}
    for lat, lon, v in cells:
        ylo, xlo = lat - rs / 2, lon - rs / 2
        yhi, xhi = ylo + rs, xlo + rs
        iy0, iy1 = math.floor(ylo / rd), math.ceil(yhi / rd)
        ix0, ix1 = math.floor(xlo / rd), math.ceil(xhi / rd)
        for iy in range(iy0, iy1):
            for ix in range(ix0, ix1):
                oy = min(yhi, (iy + 1) * rd) - max(ylo, iy * rd)
                ox = min(xhi, (ix + 1) * rd) - max(xlo, ix * rd)
                if oy > 1e-12 and ox > 1e-12:
                    w = oy * ox
                    sw, swv = out.get((iy, ix), (0.0, 0.0))
                    out[(iy, ix)] = (sw + w, swv + w * v)
    return {k: (swv / sw, sw / (rd * rd))
            for k, (sw, swv) in out.items()}


def test_regrid_coarsen_2x_and_conserve(spark):
    from flood_data_spark.operators.grid import conservative_regrid

    rng = np.random.default_rng(31)
    rs, rd = 0.05, 0.1
    cells = [(0.025 + i * rs, 0.025 + j * rs,
              float(rng.uniform(0, 100)))
             for i in range(8) for j in range(8)]
    df = spark.createDataFrame(cells, "lat double, lon double, v double")
    got = {(round(r.dlat, 6), round(r.dlon, 6)): r for r in
           conservative_regrid(df, "lat", "lon", "v", rs, rd)
           .collect()}
    assert len(got) == 16      # 8x8 src -> 4x4 dst, all complete
    vals = np.array([c[2] for c in cells]).reshape(8, 8)
    for bi in range(4):
        for bj in range(4):
            want = vals[2 * bi:2 * bi + 2, 2 * bj:2 * bj + 2].mean()
            r = got[(round(0.05 + bi * rd, 6),
                     round(0.05 + bj * rd, 6))]
            assert r.value == pytest.approx(want, abs=2e-6)
            assert r.coverage == pytest.approx(1.0, abs=1e-9)
    # conservation: total mass preserved under full coverage
    tot_src = vals.mean()
    tot_dst = np.mean([r.value for r in got.values()])
    assert tot_dst == pytest.approx(tot_src, abs=1e-5)


def test_regrid_refine_and_fractional_ratio(spark):
    from flood_data_spark.operators.grid import conservative_regrid

    # refinement 0.1 -> 0.05: each dst inherits its parent value
    cells = [(0.05, 0.05, 40.0), (0.15, 0.05, 80.0)]
    df = spark.createDataFrame(cells, "lat double, lon double, v double")
    got = {(round(r.dlat, 6), round(r.dlon, 6)): r for r in
           conservative_regrid(df, "lat", "lon", "v", 0.1, 0.05)
           .collect()}
    assert len(got) == 8
    assert got[(0.025, 0.025)].value == 40.0
    assert got[(0.125, 0.075)].value == 80.0
    assert all(r.coverage == pytest.approx(1.0, abs=1e-9)
               for r in got.values())
    # fractional ratio 0.075 -> 0.05: partial weights match the twin
    rng = np.random.default_rng(5)
    rs, rd = 0.075, 0.05
    cells = [(rs / 2 + i * rs, rs / 2 + j * rs,
              float(rng.uniform(0, 50)))
             for i in range(4) for j in range(4)]
    df = spark.createDataFrame(cells, "lat double, lon double, v double")
    got = {(round(r.dlat, 6), round(r.dlon, 6)): r for r in
           conservative_regrid(df, "lat", "lon", "v", rs, rd)
           .collect()}
    want = _regrid_numpy(cells, rs, rd)
    assert len(got) == len(want)
    for (iy, ix), (wv, wcov) in want.items():
        r = got[(round((iy + 0.5) * rd, 6), round((ix + 0.5) * rd, 6))]
        assert r.value == pytest.approx(wv, abs=5e-6)
        assert r.coverage == pytest.approx(wcov, abs=5e-6)
    with pytest.raises(ValueError, match="positive"):
        conservative_regrid(df, "lat", "lon", "v", -0.1, 0.05)


def test_regrid_misaligned_grids(spark):
    """Source cells NOT aligned to destination boundaries: a cell can
    straddle ⌈rs/rd⌉+1 destination cells — the span must include the
    last sliver (rs//rd+1 would silently drop mass)."""
    from flood_data_spark.operators.grid import conservative_regrid

    # src res 0.075, centers offset so cells straddle THREE 0.05 cells
    cells = [(0.0775, 0.0775, 60.0)]   # covers [0.04, 0.115) each axis
    df = spark.createDataFrame(cells, "lat double, lon double, v double")
    got = {(round(r.dlat, 6), round(r.dlon, 6)): r for r in
           conservative_regrid(df, "lat", "lon", "v", 0.075, 0.05)
           .collect()}
    want = _regrid_numpy(cells, 0.075, 0.05)
    assert len(got) == len(want) == 9    # 3x3 destination cells
    total_cov = sum(r.coverage for r in got.values())
    # mass conservation: total covered area == src cell area
    assert total_cov == pytest.approx((0.075 / 0.05) ** 2, abs=1e-5)
    for (iy, ix), (wv, wcov) in want.items():
        r = got[(round((iy + 0.5) * 0.05, 6),
                 round((ix + 0.5) * 0.05, 6))]
        assert r.value == pytest.approx(wv, abs=5e-6)
        assert r.coverage == pytest.approx(wcov, abs=5e-6)


def test_regional_levels_monotone_in_period(spark):
    """Return levels must increase with the return period for every
    site that receives a fit — the basic sanity every threshold-band
    consumer (q_rfa_thresholds) relies on."""
    from flood_data_spark.operators.extremes import (
        regional_growth_curve)

    rng = np.random.default_rng(55)
    rows = []
    for s, scale in (("a", 20.0), ("b", 35.0)):
        x = _ams(rng, 100.0, scale, 40)
        rows += [("r", s, float(v)) for v in x]
    df = spark.createDataFrame(rows,
                               "region string, site string, am double")
    out = regional_growth_curve(df, "am", ["region"], "site",
                                periods=(2, 5, 20, 100)).collect()
    by_site = {}
    for r in out:
        by_site.setdefault(r.site, {})[r.period] = r.level
    for site, lv in by_site.items():
        assert all(lv[p] is not None for p in (2, 5, 20, 100))
        assert lv[2] < lv[5] < lv[20] < lv[100]


# --- Pettitt ---------------------------------------------------------------


def test_pettitt_matches_numpy_twin(spark):
    from flood_data_spark.operators.stats import pettitt_test

    rng = np.random.default_rng(8)
    # clear mean shift at t = 30 of 60
    x = np.concatenate([rng.normal(50, 4, 30), rng.normal(70, 4, 30)])
    rows = [("c", t, float(v)) for t, v in enumerate(x)]
    df = spark.createDataFrame(rows, "cell string, t int, x double")
    r = pettitt_test(df, "x", "t", ["cell"]).collect()[0]
    # twin: direct U_t definition on micro-quantized values
    q = np.floor(np.abs(x) * 1e6 + 0.5) * np.sign(x)
    n = len(q)
    u = [sum(np.sign(q[j] - q[i])
             for i in range(t + 1) for j in range(t + 1, n))
         for t in range(n)]
    k = int(max(abs(v) for v in u))
    t_star = min(t for t, v in enumerate(u) if abs(v) == k)
    assert r.n == n and r.k_stat == k and r.t_change == t_star
    p = 2.0 * math.exp(-6.0 * k * k / (n ** 3 + n ** 2))
    assert r.p_value == pytest.approx(min(p, 2.0), abs=2e-6)
    assert r.shift is True and 25 <= r.t_change <= 35
    # no-shift control: white noise is not flagged
    y = rng.normal(50, 4, 60)
    df2 = spark.createDataFrame([("c", t, float(v))
                                 for t, v in enumerate(y)],
                                "cell string, t int, x double")
    r2 = pettitt_test(df2, "x", "t", ["cell"]).collect()[0]
    assert r2.shift is False
    with pytest.raises(ValueError, match="group key"):
        pettitt_test(df, "x", "t", [])


# --- Brier skill -----------------------------------------------------------


def test_brier_skill_identity_and_bounds(spark):
    from flood_data_spark.operators.verification import (
        brier_cells, brier_from_cells, brier_skill_from_cells)

    rng = np.random.default_rng(12)
    o = (rng.uniform(size=500) < 0.4).astype(int)
    p = np.clip(0.4 + 0.3 * (o - 0.4) + rng.normal(0, 0.15, 500),
                0.01, 0.99)                      # skilled forecast
    df = spark.createDataFrame(
        [(float(a), int(b)) for a, b in zip(p, o)],
        "p double, o int")
    cells = brier_cells(df, "p", "o", n_bins=10)
    d = brier_from_cells(cells).collect()[0]
    s = brier_skill_from_cells(cells).collect()[0]
    assert s.brier == d.brier
    assert s.uncertainty == d.uncertainty
    # BSS = 1 - BS/UNC on the quantized terms
    assert s.bss == pytest.approx(1.0 - d.brier / d.uncertainty,
                                  abs=2e-6)
    assert 0.0 < s.bss < 1.0                      # skilled, not perfect
    # climatology forecast itself scores ~zero skill
    clim = spark.createDataFrame(
        [(float(o.mean()), int(b)) for b in o], "p double, o int")
    s0 = brier_skill_from_cells(
        brier_cells(clim, "p", "o", n_bins=10)).collect()[0]
    assert abs(s0.bss) < 1e-2


# --- snow degree-day -------------------------------------------------------


def test_snow_mass_balance_and_regimes(spark):
    from flood_data_spark.operators.routing import snow_degree_day

    rng = np.random.default_rng(4)
    p = rng.uniform(0, 10, 40)
    t = np.concatenate([np.full(20, -5.0), np.full(20, 4.0)])
    rows = [("b", i, float(p[i]), float(t[i])) for i in range(40)]
    df = spark.createDataFrame(
        rows, "basin string, t int, precip double, temp double")
    out = sorted(snow_degree_day(df, "precip", "temp", "t", ["basin"],
                                 ddf=2.5, t_base=0.0).collect(),
                 key=lambda r: r.t)
    # cold phase: pack accumulates exactly, no melt, no rain
    assert all(r.melt == 0.0 and r.rain == 0.0 for r in out[:20])
    assert out[19].swe == pytest.approx(p[:20].sum(), abs=1e-9)
    # warm phase: melt is capped at 2.5*4 = 10/day until exhaustion
    assert all(r.rain == pytest.approx(p[r.t], abs=1e-12)
               for r in out[20:])
    assert all(r.melt <= 10.0 + 1e-12 for r in out[20:])
    # mass balance: snow in == melt out + residual pack
    snow_in = p[:20].sum()
    melted = sum(r.melt for r in out)
    assert melted + out[-1].swe == pytest.approx(snow_in, abs=1e-9)
    with pytest.raises(ValueError, match="ddf"):
        snow_degree_day(df, "precip", "temp", "t", ["basin"], ddf=0)


# --- low-flow frequency ----------------------------------------------------


def test_low_flow_frequency_duality(spark):
    """Q_{w,T} equals the negated Gumbel level of the negated block
    minima, and deeper return periods give LOWER flows."""
    from flood_data_spark.operators.extremes import (
        gumbel_return_levels, low_flow_frequency, low_flow_mam)

    rng = np.random.default_rng(15)
    rows = [("c", d, int(d // 30), float(v))
            for d, v in enumerate(rng.gamma(3.0, 20.0, 360))]
    df = spark.createDataFrame(
        rows, "cell string, d int, blk int, flow double")
    got = {r.period: r for r in
           low_flow_frequency(df, "flow", "d", "blk", ["cell"],
                              window=7, periods=(2, 20)).collect()}
    # twin: explicit MAM7 per block -> negate -> gumbel -> negate
    mams = low_flow_mam(df, "flow", "d", ["cell", "blk"],
                        window=7).collect()
    neg = spark.createDataFrame(
        [("c", -r.mam) for r in mams if r.mam is not None],
        "cell string, v double")
    fit = {r.period: r for r in
           gumbel_return_levels(neg, "v", ["cell"],
                                periods=(2, 20)).collect()}
    for t in (2, 20):
        assert got[t].q_low == pytest.approx(-fit[t].level, abs=1e-9)
    assert got[20].q_low < got[2].q_low     # rarer droughts are drier


# --- partition invariance (library-level twin of the gate perturbation) ----


def test_round14_ops_partition_invariant(spark):
    """FSS, quantile mapping, and Pettitt produce IDENTICAL rows under
    different partitionings — the library-level twin of the gate
    sweep's perturbation check (every accumulation is integer, so
    this must hold exactly, not approximately)."""
    from flood_data_spark.operators.postprocess import quantile_map
    from flood_data_spark.operators.stats import pettitt_test
    from flood_data_spark.operators.verification import fss

    rng = np.random.default_rng(99)
    f = (rng.uniform(size=(10, 10)) < 0.3).astype(int)
    o = np.roll(f, 1, axis=0)
    grid = _grid_df(spark, f, o)
    sim = spark.createDataFrame(
        [("g", float(v)) for v in rng.gamma(2, 5, 120)],
        "grp string, v double")
    obs = spark.createDataFrame(
        [("g", float(v)) for v in rng.gamma(2, 7, 80)],
        "grp string, v double")
    ser = spark.createDataFrame(
        [("c", t, float(v)) for t, v in
         enumerate(np.concatenate([rng.normal(10, 1, 20),
                                   rng.normal(14, 1, 20)]))],
        "cell string, t int, x double")
    for op, df in ((lambda d: fss(d, "i", "j", "fc", "ob", ["grp"],
                                  radius=2), grid),
                   (lambda d: quantile_map(d, obs, "v", ["grp"]), sim),
                   (lambda d: pettitt_test(d, "x", "t", ["cell"]),
                    ser)):
        a = sorted(map(tuple, op(df.repartition(1)).collect()))
        b = sorted(map(tuple, op(df.repartition(7)).collect()))
        assert a == b
