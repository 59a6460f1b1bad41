"""Forecast verification scores (operators/verification.py): brute-force
pairwise CRPS, the m=1 MAE collapse, rank-histogram golden (incl. the
tie rule), Brier BS = REL - RES + UNC reconstruction, spread-skill vs
numpy, and the se=0 NULL-ratio guard."""

from fractions import Fraction

import numpy as np
import pytest
from pyspark.sql import functions as F

from flood_data_spark.operators.verification import (
    brier_decomposition, crps_ensemble, rank_histogram, spread_skill)


def _q(x):
    """The micro quantizer both engines share (verification._micro)."""
    return int(np.sign(x) * np.floor(abs(x) * 1e6 + 0.5))


def _half_up(num: int, den: int) -> int:
    f = Fraction(abs(num), den)
    r = (2 * f.numerator + f.denominator) // (2 * f.denominator)
    return -r if num < 0 else r


def _crps_ref(xs, y):
    """Brute-force pairwise CRPS in the exact integer arithmetic the
    operator commits to: micro-quantized inputs, integer sums, one
    half-up integer rounding."""
    q = [_q(v) for v in xs]
    qy = _q(y)
    m = len(q)
    sae = sum(abs(a - qy) for a in q)
    pair = sum(abs(q[i] - q[j]) for i in range(m) for j in range(i + 1, m))
    return _half_up(sae * m - pair, m * m) / 1e6


def _ens_fixture(spark, n_groups=12, m=7, seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    truth = {}
    for g in range(n_groups):
        y = float(rng.normal(loc=5.0))
        xs = [float(v) for v in rng.normal(loc=5.0, scale=2.0, size=m)]
        truth[g] = (xs, y)
        rows += [(g, x, y) for x in xs]
    df = spark.createDataFrame(rows, "cell int, x double, y double")
    return df, truth


def test_crps_matches_bruteforce_pairwise(spark):
    df, truth = _ens_fixture(spark)
    got = {r.cell: (r.m, r.crps)
           for r in crps_ensemble(df, "x", "y", ["cell"]).collect()}
    assert len(got) == len(truth)
    for g, (xs, y) in truth.items():
        m, crps = got[g]
        assert m == len(xs)
        assert crps == _crps_ref(xs, y), g
        # sanity vs the real-number definition (quantization <= ~2e-6)
        xs_a = np.array(xs)
        real = (np.abs(xs_a - y).mean()
                - np.abs(xs_a[:, None] - xs_a[None, :]).sum()
                / (2 * len(xs) ** 2))
        assert crps == pytest.approx(real, abs=3e-6)


def test_crps_m1_collapses_to_mae(spark):
    rows = [(0, 3.25, 1.0), (1, -2.0, 0.5), (2, 7.0000005, 7.0)]
    df = spark.createDataFrame(rows, "cell int, x double, y double")
    got = {r.cell: r.crps
           for r in crps_ensemble(df, "x", "y", ["cell"]).collect()}
    assert got[0] == 2.25
    assert got[1] == 2.5
    # |7.0000005 - 7.0| quantizes to 1 micro (half-up of 0.5 micro)
    assert got[2] == 1e-6


def test_crps_partition_invariant(spark):
    df, _ = _ens_fixture(spark, n_groups=20)
    a = sorted(map(tuple,
                   crps_ensemble(df.coalesce(1), "x", "y",
                                 ["cell"]).collect()))
    b = sorted(map(tuple,
                   crps_ensemble(df.repartition(7), "x", "y",
                                 ["cell"]).collect()))
    assert a == b


def test_crps_guard(spark):
    df, _ = _ens_fixture(spark, n_groups=2)
    with pytest.raises(ValueError, match="group key"):
        crps_ensemble(df, "x", "y", [])


def test_rank_histogram_golden_with_tie_rule(spark):
    # group 0: obs 2.5 above one of three members -> rank 2
    # group 1: obs 0.0 below all -> rank 1
    # group 2: obs 9.0 above all -> rank 4
    # group 3: member EQUAL to obs -> tie goes below the observation
    #          (strictly-less count), so 5.0 among {1, 5.0, 9} -> rank 2
    rows = [(0, 1.0, 2.5), (0, 3.0, 2.5), (0, 4.0, 2.5),
            (1, 1.0, 0.0), (1, 2.0, 0.0), (1, 3.0, 0.0),
            (2, 1.0, 9.0), (2, 2.0, 9.0), (2, 3.0, 9.0),
            (3, 1.0, 5.0), (3, 5.0, 5.0), (3, 9.0, 5.0)]
    df = spark.createDataFrame(rows, "cell int, x double, y double")
    got = {r.rank: r.n_cells
           for r in rank_histogram(df, "x", "y", ["cell"]).collect()}
    assert got == {1: 1, 2: 2, 4: 1}
    with pytest.raises(ValueError, match="group key"):
        rank_histogram(df, "x", "y", [])


def test_rank_histogram_flat_for_calibrated_ensemble(spark):
    # plant the observation at every possible rank equally often: a
    # calibrated ensemble's histogram is exactly flat
    m = 4
    rows = []
    g = 0
    for rank in range(1, m + 2):
        for _ in range(3):
            members = [float(10 * k) for k in range(1, m + 1)]
            y = float(10 * rank - 5)  # falls between member rank-1 and rank
            rows += [(g, x, y) for x in members]
            g += 1
    df = spark.createDataFrame(rows, "cell int, x double, y double")
    got = {r.rank: r.n_cells
           for r in rank_histogram(df, "x", "y", ["cell"]).collect()}
    assert got == {r: 3 for r in range(1, m + 2)}


def test_brier_identity_and_bruteforce(spark):
    # probabilities constant within each bin (multiples of 0.05 land in
    # fixed 10-bin cells) -> the Murphy identity BS = REL - RES + UNC
    # holds exactly (no within-bin variance), up to four round-6 steps
    rng = np.random.default_rng(9)
    ps = rng.choice([0.05, 0.15, 0.35, 0.55, 0.75, 0.95], size=400)
    os_ = (rng.random(size=400) < ps).astype(int)
    df = spark.createDataFrame(
        [(float(p), int(o)) for p, o in zip(ps, os_)],
        "p double, o int")
    row = brier_decomposition(df, "p", "o", n_bins=10).collect()[0]
    bs_ref = float(np.mean((ps - os_) ** 2))
    assert row.brier == pytest.approx(bs_ref, abs=3e-6)
    assert row.uncertainty == pytest.approx(
        os_.mean() * (1 - os_.mean()), abs=2e-6)
    # numpy reference for REL/RES over the same 10 bins
    bins = np.minimum((ps * 10).astype(int), 9)
    rel = res = 0.0
    obar = os_.mean()
    for k in np.unique(bins):
        sel = bins == k
        nk = sel.sum()
        rel += nk * (ps[sel].mean() - os_[sel].mean()) ** 2
        res += nk * (os_[sel].mean() - obar) ** 2
    assert row.reliability == pytest.approx(rel / len(ps), abs=3e-6)
    assert row.resolution == pytest.approx(res / len(ps), abs=3e-6)
    # the identity itself, on the rounded outputs
    assert row.brier == pytest.approx(
        row.reliability - row.resolution + row.uncertainty, abs=5e-6)
    with pytest.raises(ValueError, match="n_bins"):
        brier_decomposition(df, "p", "o", n_bins=0)


def test_brier_partition_invariant(spark):
    rng = np.random.default_rng(4)
    ps = rng.random(size=300)
    os_ = (rng.random(size=300) < ps).astype(int)
    df = spark.createDataFrame(
        [(float(p), int(o)) for p, o in zip(ps, os_)], "p double, o int")
    a = brier_decomposition(df.coalesce(1), "p", "o").collect()
    b = brier_decomposition(df.repartition(7), "p", "o").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_spread_skill_matches_numpy(spark):
    rng = np.random.default_rng(7)
    rows = []
    cells = {}
    for lead in (1, 2):
        for c in range(8):
            y = float(rng.normal())
            xs = rng.normal(loc=y, scale=0.5 * lead, size=9)
            cells[(lead, c)] = (xs, y)
            rows += [(lead, c, float(x), y) for x in xs]
    df = spark.createDataFrame(rows, "lead int, cell int, x double, y double")
    got = {r.lead: r
           for r in spread_skill(df, "x", "y", ["cell"], "lead").collect()}
    for lead in (1, 2):
        sel = [(xs, y) for (ld, _), (xs, y) in cells.items() if ld == lead]
        spread_ref = float(np.mean([np.var(xs) for xs, _ in sel]))
        skill_ref = float(np.mean([(np.mean(xs) - y) ** 2
                                   for xs, y in sel]))
        r = got[lead]
        assert r.n_cells == 8
        assert r.spread == pytest.approx(spread_ref, abs=1e-4)
        assert r.skill == pytest.approx(skill_ref, abs=1e-4)
        assert r.ratio == pytest.approx(spread_ref / skill_ref, rel=1e-2)
    # wider-lead ensembles are more dispersed
    assert got[2].spread > got[1].spread


def test_spread_skill_zero_error_yields_null_ratio(spark):
    # a perfect deterministic forecast: every member equals the obs ->
    # se = 0; ratio must be NULL, never Infinity/NaN (ADVICE r10)
    rows = [(1, c, 5.0, 5.0) for c in range(3)]
    df = spark.createDataFrame(rows, "lead int, cell int, x double, y double")
    r = spread_skill(df, "x", "y", ["cell"], "lead").collect()[0]
    assert r.spread == 0.0 and r.skill == 0.0
    assert r.ratio is None
    with pytest.raises(ValueError, match="group key"):
        spread_skill(df, "x", "y", [], "lead")


def test_spread_skill_partition_invariant(spark):
    rng = np.random.default_rng(12)
    rows = [(int(rng.integers(1, 3)), c, float(rng.normal()),
             float(c % 3)) for c in range(40) for _ in range(5)]
    df = spark.createDataFrame(rows, "lead int, cell int, x double, y double")
    a = sorted(map(tuple, spread_skill(df.coalesce(1), "x", "y",
                                       ["cell"], "lead").collect()))
    b = sorted(map(tuple, spread_skill(df.repartition(9), "x", "y",
                                       ["cell"], "lead").collect()))
    assert a == b


def test_reliability_diagram_matches_numpy(spark):
    from flood_data_spark.operators.verification import reliability_diagram

    rng = np.random.default_rng(15)
    ps = rng.random(size=500)
    os_ = (rng.random(size=500) < ps).astype(int)
    df = spark.createDataFrame(
        [(float(p), int(o)) for p, o in zip(ps, os_)], "p double, o int")
    got = {r.bin: r for r in reliability_diagram(df, "p", "o").collect()}
    bins = np.minimum((ps * 10).astype(int), 9)
    for k in np.unique(bins):
        sel = bins == k
        r = got[int(k)]
        assert r.n == int(sel.sum())
        assert r.p_mean == pytest.approx(ps[sel].mean(), abs=2e-6)
        assert r.o_rate == pytest.approx(os_[sel].mean(), abs=2e-6)
        assert r.gap == pytest.approx(ps[sel].mean() - os_[sel].mean(),
                                      abs=3e-6)
    # a well-calibrated simulation keeps every gap small
    assert all(abs(r.gap) < 0.15 for r in got.values())


def test_reliability_diagram_partition_invariant(spark):
    from flood_data_spark.operators.verification import reliability_diagram

    rng = np.random.default_rng(16)
    ps = rng.random(size=300)
    os_ = (rng.random(size=300) < 0.4).astype(int)
    df = spark.createDataFrame(
        [(float(p), int(o)) for p, o in zip(ps, os_)], "p double, o int")
    a = sorted(map(tuple,
                   reliability_diagram(df.coalesce(1), "p", "o").collect()))
    b = sorted(map(tuple,
                   reliability_diagram(df.repartition(7), "p",
                                       "o").collect()))
    assert a == b


def test_brier_empty_input_yields_one_null_row(spark):
    from flood_data_spark.operators.verification import brier_decomposition

    df = spark.createDataFrame([], "p double, o int")
    rows = brier_decomposition(df, "p", "o").collect()
    assert len(rows) == 1
    assert all(v is None for v in rows[0])


# --- Hersbach (2000) CRPS decomposition -------------------------------


def _hersbach_ref(cells_xy, m):
    """Brute-force alpha/beta integrals straight from Hersbach's
    interval definitions (float reference; the operator's integer
    rounding is within 2e-6 of it)."""
    n = len(cells_xy)
    A = [0.0] * (m + 1)
    B = [0.0] * (m + 1)
    for xs, y in cells_xy:
        s = sorted(xs)
        for i in range(m + 1):
            if i == 0:
                a, b = 0.0, max(s[0] - y, 0.0)
            elif i == m:
                a, b = max(y - s[-1], 0.0), 0.0
            else:
                lo, hi = s[i - 1], s[i]
                if y >= hi:
                    a, b = hi - lo, 0.0
                elif y <= lo:
                    a, b = 0.0, hi - lo
                else:
                    a, b = y - lo, hi - y
            A[i] += a / n
            B[i] += b / n
    crps = sum(A[i] * (i / m) ** 2 + B[i] * (1 - i / m) ** 2
               for i in range(m + 1))
    reli = pot = 0.0
    for i in range(m + 1):
        g = A[i] + B[i]
        if g > 0:
            o = B[i] / g
            reli += g * (o - i / m) ** 2
            pot += g * o * (1 - o)
    return crps, reli, pot


def test_hersbach_matches_bruteforce_integrals(spark):
    from flood_data_spark.operators.verification import crps_hersbach

    df, truth = _ens_fixture(spark, n_groups=15, m=5, seed=11)
    row = crps_hersbach(df, "x", "y", ["cell"]).collect()
    assert len(row) == 1 and row[0].m == 5 and row[0].n_cells == 15
    c, r, p = _hersbach_ref(list(truth.values()), 5)
    assert abs(row[0].crps - c) < 2e-6
    assert abs(row[0].reliability - r) < 2e-6
    assert abs(row[0].crps_pot - p) < 2e-6


def test_hersbach_identity_and_mean_crps(spark):
    """CRPS = RELI + POT (exact rational identity; <= 1 micro per term
    after independent rounding) and the class CRPS equals the mean of
    the per-cell crps_ensemble scores (cells round independently there,
    so the mean drifts <= 1 micro per cell / n)."""
    from flood_data_spark.operators.verification import crps_hersbach

    df, truth = _ens_fixture(spark, n_groups=20, m=7, seed=5)
    row = crps_hersbach(df, "x", "y", ["cell"]).collect()[0]
    assert abs(row.crps - (row.reliability + row.crps_pot)) <= 2e-6
    per_cell = crps_ensemble(df, "x", "y", ["cell"]).collect()
    mean_crps = sum(r.crps for r in per_cell) / len(per_cell)
    assert abs(row.crps - mean_crps) <= 2e-6


def test_hersbach_m1_and_perfectly_calibrated_split(spark):
    """m = 1: CRPS collapses to MAE (= |x-y|), and intervals are the
    two outliers only.  A deterministic perfect forecast (x == y) has
    zero everything."""
    from flood_data_spark.operators.verification import crps_hersbach

    rows = [(0, 3.0, 7.5), (1, 9.0, 2.0), (2, 4.0, 4.0)]
    df = spark.createDataFrame(rows, "cell int, x double, y double")
    row = crps_hersbach(df, "x", "y", ["cell"]).collect()[0]
    assert row.m == 1 and row.n_cells == 3
    mae = (4.5 + 7.0 + 0.0) / 3
    assert abs(row.crps - mae) < 2e-6
    perfect = spark.createDataFrame([(0, 1.0, 1.0), (1, 2.5, 2.5)],
                                    "cell int, x double, y double")
    prow = crps_hersbach(perfect, "x", "y", ["cell"]).collect()[0]
    assert prow.crps == 0.0 and prow.reliability == 0.0 \
        and prow.crps_pot == 0.0


def test_hersbach_groups_by_ensemble_size(spark):
    """Mixed-m input decomposes per m class, never blends."""
    from flood_data_spark.operators.verification import crps_hersbach

    rows = [(0, 1.0, 2.0), (0, 3.0, 2.0),            # m=2 cell
            (1, 5.0, 6.0), (1, 7.0, 6.0),            # m=2 cell
            (2, 1.0, 1.5), (2, 2.0, 1.5), (2, 3.0, 1.5)]  # m=3 cell
    df = spark.createDataFrame(rows, "cell int, x double, y double")
    out = {r.m: r for r in
           crps_hersbach(df, "x", "y", ["cell"]).collect()}
    assert set(out) == {2, 3}
    assert out[2].n_cells == 2 and out[3].n_cells == 1
    for r in out.values():
        assert abs(r.crps - (r.reliability + r.crps_pot)) <= 2e-6


def test_hersbach_partition_invariant(spark):
    from flood_data_spark.operators.verification import crps_hersbach

    df, _ = _ens_fixture(spark, n_groups=18, m=6, seed=9)
    a = crps_hersbach(df, "x", "y", ["cell"]).collect()
    b = crps_hersbach(df.repartition(7), "x", "y", ["cell"]).collect()
    assert a == b


# --- streamed-CRPS member cells ---------------------------------------


def test_member_cells_reproduce_batch_crps(spark):
    """crps_member_cells -> crps_from_member_cells == crps_ensemble row
    for row (the shared _crps_finish makes the stream twin check whole-
    score parity)."""
    from flood_data_spark.operators.verification import (
        crps_ensemble as ce, crps_from_member_cells, crps_member_cells)

    df, _ = _ens_fixture(spark, n_groups=10, m=7, seed=21)
    cells = crps_member_cells(df, "x", "y", ["cell"])
    via_cells = {r.cell: (r.m, r.crps) for r in
                 crps_from_member_cells(cells, ["cell"]).collect()}
    direct = {r.cell: (r.m, r.crps) for r in
              ce(df, "x", "y", ["cell"]).collect()}
    assert via_cells == direct


# --- ECE cross-gate ----------------------------------------------------


def test_ece_from_cells_agrees_with_classifier(spark):
    """The verification bin ladder and the classifier bin ladder report
    the same ECE on mid-bin scores (the q_ece_cells contract)."""
    from flood_data_spark.datapipe.classifier import evaluate_binary
    from flood_data_spark.operators.verification import (brier_cells,
                                                         ece_from_cells)

    rng = np.random.default_rng(4)
    rows = [(float((k % 100 + 0.5) / 100.0), int(rng.random() < 0.4))
            for k in range(800)]
    df = spark.createDataFrame(rows, "p double, o int")
    ece_clf = evaluate_binary(df, "p", "o", bins=10) \
        .collect()[0]["ece"]
    ece_cells = ece_from_cells(brier_cells(df, "p", "o", 10)) \
        .collect()[0]["ece"]
    assert ece_cells == pytest.approx(ece_clf, abs=1.01e-6)


def test_ece_from_cells_golden(spark):
    """Two occupied bins with known masses: ECE = (n1|g1| + n2|g2|)/N."""
    from flood_data_spark.operators.verification import (brier_cells,
                                                         ece_from_cells)

    rows = ([(0.25, 1)] * 3 + [(0.25, 0)] * 1     # bin2: p=.25, o_rate=.75
            + [(0.85, 0)] * 4)                     # bin8: p=.85, o_rate=0
    df = spark.createDataFrame(rows, "p double, o int")
    got = ece_from_cells(brier_cells(df, "p", "o", 10)).collect()[0]
    expect = (4 * abs(0.25 - 0.75) + 4 * abs(0.85 - 0.0)) / 8
    assert got.ece == pytest.approx(expect, abs=1e-6)


def test_ece_empty_input_yields_one_null_row(spark):
    from flood_data_spark.operators.verification import (brier_cells,
                                                         ece_from_cells)

    df = spark.createDataFrame([], "p double, o int")
    rows = ece_from_cells(brier_cells(df, "p", "o", 10)).collect()
    assert len(rows) == 1 and rows[0].ece is None


# --- contingency skill scores ------------------------------------------


def test_contingency_golden_and_null_guards(spark):
    from flood_data_spark.operators.verification import contingency_scores

    rows = [(0.8, 1), (0.7, 0), (0.2, 1), (0.1, 0),
            (0.9, 1), (0.6, 0), (0.3, 0), (0.55, 1)]
    df = spark.createDataFrame(rows, "p double, o int")
    r = contingency_scores(df, "p", "o", 0.5).collect()[0]
    a, b, c, d, n = 3, 2, 1, 2, 8
    assert (r.n, r.hits, r.false_alarms, r.misses,
            r.correct_negatives) == (n, a, b, c, d)
    assert r.pod == pytest.approx(a / (a + c), abs=1e-6)
    assert r.far == pytest.approx(b / (a + b), abs=1e-6)
    assert r.csi == pytest.approx(a / (a + b + c), abs=1e-6)
    assert r.bias == pytest.approx((a + b) / (a + c), abs=1e-6)
    assert r.peirce == pytest.approx(
        (a * d - b * c) / ((a + c) * (b + d)), abs=1e-6)
    ar = (a + b) * (a + c) / n
    assert r.ets == pytest.approx((a - ar) / (a + b + c - ar), abs=1e-6)
    assert r.hss == pytest.approx(
        2 * (a * d - b * c) / ((a + c) * (c + d) + (a + b) * (b + d)),
        abs=1e-6)
    # all-positive outcomes: b = d = 0 -> peirce NULL, far defined
    allpos = spark.createDataFrame([(0.9, 1), (0.1, 1)],
                                   "p double, o int")
    r2 = contingency_scores(allpos, "p", "o", 0.5).collect()[0]
    assert r2.peirce is None            # (b+d) = 0
    assert r2.hss == pytest.approx(0.0, abs=1e-6)  # den = (a+c)(c+d)+(a+b)(b+d) > 0
    assert r2.pod == pytest.approx(0.5, abs=1e-6)
    # empty input: one row, zero counts, NULL scores
    r3 = contingency_scores(
        spark.createDataFrame([], "p double, o int"),
        "p", "o").collect()
    assert len(r3) == 1 and r3[0].n == 0 and r3[0].pod is None


def test_contingency_negative_skill_rounds_sign_aware(spark):
    """A systematically WRONG forecast has negative PSS/ETS/HSS; the
    sign-aware integer rounding must not clamp or flip it."""
    from flood_data_spark.operators.verification import contingency_scores

    rows = [(0.9, 0)] * 3 + [(0.1, 1)] * 3
    df = spark.createDataFrame(rows, "p double, o int")
    r = contingency_scores(df, "p", "o", 0.5).collect()[0]
    assert r.peirce == pytest.approx(-1.0, abs=1e-6)
    assert r.hss == pytest.approx(-1.0, abs=1e-6)


# --- ensemble quantile (pinball) score ----------------------------------


def test_quantile_score_matches_numpy(spark):
    from flood_data_spark.operators.verification import quantile_score

    df, truth = _ens_fixture(spark, n_groups=25, m=7, seed=13)
    out = {r.tau: (r.n_cells, r.qscore) for r in
           quantile_score(df, "x", "y", ["cell"],
                          taus=(0.1, 0.5, 0.9)).collect()}
    for tau in (0.1, 0.5, 0.9):
        tot = 0.0
        for xs, y in truth.values():
            q = float(np.quantile(xs, tau, method="linear"))
            tot += (y - q) * (tau - (1 if y < q else 0))
        n, got = out[tau]
        assert n == len(truth)
        assert got == pytest.approx(tot / len(truth), abs=3e-6)


def test_quantile_score_median_is_half_mae_and_tau_guard(spark):
    from flood_data_spark.operators.verification import quantile_score

    df, truth = _ens_fixture(spark, n_groups=10, m=5, seed=17)
    row = quantile_score(df, "x", "y", ["cell"], taus=(0.5,)) \
        .collect()[0]
    mae = np.mean([abs(y - np.median(xs)) for xs, y in truth.values()])
    assert row.qscore == pytest.approx(mae / 2, abs=2e-6)
    with pytest.raises(ValueError, match="multiple of 0.01"):
        quantile_score(df, "x", "y", ["cell"], taus=(0.123,))


# --- isotonic calibration (PAV minimax) ---------------------------------


def _pav_ref(ws, ss):
    """Sequential pool-adjacent-violators on (weight, success) pairs —
    the loop the relational minimax must reproduce."""
    blocks = []
    for w, s in zip(ws, ss):
        blocks.append([w, s])
        while len(blocks) > 1 and (blocks[-2][1] * blocks[-1][0]
                                   > blocks[-1][1] * blocks[-2][0]):
            w2, s2 = blocks.pop()
            blocks[-1][0] += w2
            blocks[-1][1] += s2
    out = []
    bi = 0
    for w, s in blocks:
        cacc = 0
        while cacc < w:
            cacc += ws[bi]
            out.append(s / w)
            bi += 1
    return out


def test_isotonic_equals_sequential_pav(spark):
    from flood_data_spark.operators.verification import (
        brier_cells, isotonic_calibration)

    rng = np.random.default_rng(8)
    rows = [(float((k % 100 + 0.5) / 100),
             int(rng.random() < (k % 100) / 130 + 0.05))
            for k in range(3000)]
    df = spark.createDataFrame(rows, "p double, o int")
    cells = brier_cells(df, "p", "o", 10)
    got = isotonic_calibration(cells).collect()
    craw = sorted(cells.collect(), key=lambda r: r["_b"])
    ref = _pav_ref([int(r["_n"]) for r in craw],
                   [int(r["_so"]) for r in craw])
    for g, e in zip(got, ref):
        assert g.iso_rate == pytest.approx(e, abs=2e-6)
    # monotone by construction
    rates = [g.iso_rate for g in got]
    assert all(x <= y + 1e-12 for x, y in zip(rates, rates[1:]))


def test_isotonic_already_monotone_is_identity(spark):
    from flood_data_spark.operators.verification import (
        brier_cells, isotonic_calibration)

    rows = [(0.05, 0)] * 10 + [(0.45, 1)] * 4 + [(0.45, 0)] * 6 \
        + [(0.95, 1)] * 9 + [(0.95, 0)] * 1
    df = spark.createDataFrame(rows, "p double, o int")
    got = isotonic_calibration(brier_cells(df, "p", "o", 10)).collect()
    for r in got:
        assert r.iso_rate == pytest.approx(r.o_rate, abs=1e-6)


def test_isotonic_partition_invariant(spark):
    from flood_data_spark.operators.verification import (
        brier_cells, isotonic_calibration)

    rng = np.random.default_rng(30)
    rows = [(float(rng.random()), int(rng.random() < 0.4))
            for _ in range(500)]
    df = spark.createDataFrame(rows, "p double, o int")
    a = isotonic_calibration(brier_cells(df, "p", "o", 10)).collect()
    b = isotonic_calibration(
        brier_cells(df.repartition(7), "p", "o", 10)).collect()
    assert a == b


# --- multivariate energy score ------------------------------------------


def test_energy_score_matches_numpy(spark):
    from flood_data_spark.operators.verification import energy_score

    rng = np.random.default_rng(19)
    rows, vecs = [], {}
    for g in range(5):
        for i in range(6):
            v = rng.normal(size=12)
            vecs[(g, i)] = v
            rows.append((g, g * 10 + i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "cell int, vid long,"
                                     " emb array<double>")
    got = {r.cell: (r.m, r.energy) for r in
           energy_score(df, "vid", "emb", ["cell"]).collect()}
    for g in range(5):
        y = vecs[(g, 0)]
        mem = [vecs[(g, i)] for i in range(1, 6)]
        m = len(mem)
        t1 = sum(np.linalg.norm(x - y) for x in mem) / m
        t2 = sum(np.linalg.norm(p - q) for p in mem for q in mem) \
            / (2 * m * m)
        assert got[g][0] == m
        assert got[g][1] == pytest.approx(t1 - t2, abs=3e-6)


def test_energy_score_duplicate_id_raises(spark):
    """Fail-loud unique-id precondition: a duplicated id within a
    group would multiply distances (dup min id) or drop i<j pairs
    (dup member id) — both must raise, never skew silently."""
    from flood_data_spark.operators.verification import energy_score

    rows = [(0, 1, [0.0, 0.0]), (0, 1, [1.0, 1.0]), (0, 2, [2.0, 2.0])]
    df = spark.createDataFrame(rows, "cell int, vid long,"
                                     " emb array<double>")
    with pytest.raises(Exception, match="duplicate id"):
        energy_score(df, "vid", "emb", ["cell"]).collect()


def test_energy_score_m1_is_plain_distance(spark):
    """One member: the pairwise term vanishes, ES = ||x - y||; a cell
    with ONLY the observation has no members and drops out."""
    from flood_data_spark.operators.verification import energy_score

    rows = [(0, 1, [0.0, 0.0]), (0, 2, [3.0, 4.0]),
            (1, 9, [1.0, 1.0])]
    df = spark.createDataFrame(rows, "cell int, vid long,"
                                     " emb array<double>")
    out = energy_score(df, "vid", "emb", ["cell"]).collect()
    assert len(out) == 1
    assert out[0].cell == 0 and out[0].m == 1
    assert out[0].energy == pytest.approx(5.0, abs=1e-6)


# --- anomaly correlation & cost-loss value -------------------------------


def test_acc_matches_numpy_and_edges(spark):
    from flood_data_spark.operators.verification import anomaly_correlation

    rng = np.random.default_rng(3)
    rows, truth = [], {}
    for g in ["a", "b"]:
        c = rng.uniform(5, 10, 40)
        o = c + rng.normal(0, 2, 40)
        f = o * 0.7 + c * 0.3 + rng.normal(0, 1, 40)
        truth[g] = (f, o, c)
        rows += [(g, float(x), float(y), float(z))
                 for x, y, z in zip(f, o, c)]
    df = spark.createDataFrame(rows, "lead string, f double, o double,"
                                     " c double")
    got = {r.lead: r.acc for r in
           anomaly_correlation(df, "f", "o", "c", ["lead"]).collect()}
    for g, (f, o, c) in truth.items():
        fa, oa = f - c, o - c
        ref = (fa * oa).sum() / np.sqrt((fa * fa).sum()
                                        * (oa * oa).sum())
        assert got[g] == pytest.approx(ref, abs=5e-6)
    # perfect anticorrelation and the zero-variance NULL guard
    d2 = spark.createDataFrame(
        [("x", 1.0, -1.0, 0.0), ("x", -2.0, 2.0, 0.0),
         ("y", 1.0, 2.0, 1.0), ("y", 1.0, 3.0, 1.0)],
        "lead string, f double, o double, c double")
    out = {r.lead: r.acc for r in
           anomaly_correlation(d2, "f", "o", "c", ["lead"]).collect()}
    assert out["x"] == pytest.approx(-1.0, abs=1e-6)
    assert out["y"] is None


def test_acc_large_sums_no_long_overflow(spark):
    """The denominator product sqrt(sff)·sqrt(soo) exceeds LONG at
    realistic magnitudes (floor(double) returns LongType — a silent
    clamp to 2^63−1 measured live as acc 0.33 vs 0.057); the
    per-factor quantization must keep large-magnitude inputs exact."""
    from flood_data_spark.operators.verification import anomaly_correlation

    rng = np.random.default_rng(5)
    # anomalies ~1e5 in micro -> 1e11; squares 1e22; sums 1e25 —
    # comfortably past the old clamp point after the product
    rows = [("g", float(v * 1e5), float(w * 1e5), 0.0)
            for v, w in rng.normal(0, 1, (4000, 2))]
    df = spark.createDataFrame(rows, "lead string, f double, o double,"
                                     " c double")
    got = anomaly_correlation(df, "f", "o", "c", ["lead"]).collect()[0]
    arr = np.array([(r[1], r[2]) for r in rows])
    ref = (arr[:, 0] * arr[:, 1]).sum() / np.sqrt(
        (arr[:, 0] ** 2).sum() * (arr[:, 1] ** 2).sum())
    assert got.acc == pytest.approx(ref, abs=5e-6)


def test_cost_loss_matches_closed_form_and_peak(spark):
    from flood_data_spark.operators.verification import (
        contingency_counts, cost_loss_value)

    rows = [(0.8, 1)] * 30 + [(0.7, 0)] * 10 + [(0.2, 1)] * 15 \
        + [(0.1, 0)] * 45
    df = spark.createDataFrame(rows, "p double, o int")
    cnt = contingency_counts(df, "p", "o", 0.5)
    vals = {r.alpha: r.value for r in cost_loss_value(cnt).collect()}
    a, b, c, d, n = 30, 10, 15, 45, 100
    H, Fr, ob = a / (a + c), b / (b + d), (a + c) / n
    for al, v in vals.items():
        num = min(al, ob) - Fr * al * (1 - ob) + H * ob * (1 - al) - ob
        den = min(al, ob) - al * ob
        assert v == pytest.approx(num / den, abs=2e-6), al
    # Richardson: value peaks where alpha = base rate; at the peak
    # V equals the Peirce skill score
    peak_alpha = min(vals, key=lambda k: abs(k - ob))
    pss = H - Fr
    assert vals[peak_alpha] == pytest.approx(pss, abs=0.08)
    # degenerate outcomes (all positive) -> NULL everywhere
    allpos = spark.createDataFrame([(0.9, 1), (0.1, 1)],
                                   "p double, o int")
    vs = cost_loss_value(
        contingency_counts(allpos, "p", "o", 0.5)).collect()
    assert all(r.value is None for r in vs)
    with pytest.raises(ValueError, match="alpha percent"):
        cost_loss_value(cnt, alphas=(0,)).collect()


def test_quantile_stream_finisher_matches_batch(spark):
    """quantile_score_from_member_cells over crps_member_cells equals
    the batch quantile_score on micro-exact inputs (the one-stream/
    two-finishers contract of q_quantile_stream)."""
    from flood_data_spark.operators.verification import (
        crps_member_cells, quantile_score,
        quantile_score_from_member_cells)

    rng = np.random.default_rng(23)
    rows = []
    for g in range(15):
        y = float(round(rng.uniform(0, 20), 3))
        for x in rng.integers(0, 40, 7):
            rows.append((g, float(x), y))
    df = spark.createDataFrame(rows, "cell int, x double, y double")
    batch = quantile_score(df, "x", "y", ["cell"],
                           taus=(0.1, 0.5, 0.9)).collect()
    cells = crps_member_cells(df, "x", "y", ["cell"])
    stream = quantile_score_from_member_cells(
        cells, taus=(0.1, 0.5, 0.9)).collect()
    assert [tuple(r) for r in batch] == [tuple(r) for r in stream]


def test_dm_test_matches_numpy_and_edges(spark):
    """Diebold-Mariano lag-0: statistic vs numpy, the sign convention
    (negative = A better under lower-is-better), and the zero-variance
    NULL guard."""
    from flood_data_spark.operators.verification import dm_test

    rng = np.random.default_rng(4)
    la = np.abs(rng.normal(2.0, 1.0, 400))
    lb = la + rng.normal(0.3, 0.5, 400)
    df = spark.createDataFrame(
        [("g", float(a), float(b)) for a, b in zip(la, lb)],
        "k string, la double, lb double")
    r = dm_test(df, "la", "lb", ["k"]).collect()[0]
    d = la - lb
    ref = d.mean() / np.sqrt(d.var() / len(d))
    assert r.n == 400
    assert r.mean_diff == pytest.approx(d.mean(), abs=2e-6)
    assert r.dm_stat == pytest.approx(ref, abs=1e-4)
    assert r.dm_stat < 0        # A systematically better
    # constant differential: zero variance -> NULL statistic
    d2 = spark.createDataFrame([("g", 1.0, 2.0), ("g", 3.0, 4.0)],
                               "k string, la double, lb double")
    r2 = dm_test(d2, "la", "lb", ["k"]).collect()[0]
    assert r2.dm_stat is None
    assert r2.mean_diff == pytest.approx(-1.0, abs=1e-9)


# --- SEEPS ----------------------------------------------------------------


def test_seeps_hand_golden(spark):
    """Hand-computed 4-row case (dry<10, wet split 30): p1 = 2/4,
    entries 0 / 3.0 / 1.6 / 0 -> SEEPS = 1.15, skill = -0.15."""
    from flood_data_spark.operators.verification import seeps_score

    rows = [("a", 5.0, 5.0), ("a", 15.0, 35.0),
            ("a", 35.0, 5.0), ("a", 15.0, 15.0)]
    df = spark.createDataFrame(rows, "g string, f double, o double")
    r = seeps_score(df, "f", "o", ("g",), 10.0, 30.0).collect()[0]
    assert r.n == 4
    assert r.seeps == pytest.approx(1.15, abs=1e-6)
    assert r.skill == pytest.approx(-0.15, abs=1e-6)


def test_seeps_perfect_forecast_and_degenerate(spark):
    """A perfect forecast scores 0 (skill 1); a group whose sample
    climatology is all-dry or never-dry returns NULL (undefined)."""
    from flood_data_spark.operators.verification import seeps_score

    rows = ([("p", v, v) for v in (1.0, 15.0, 40.0, 3.0)]
            + [("d", 50.0, 2.0), ("d", 1.0, 3.0)]      # all obs dry
            + [("w", 1.0, 20.0), ("w", 2.0, 45.0)])    # never dry
    df = spark.createDataFrame(rows, "g string, f double, o double")
    out = {r.g: r for r in
           seeps_score(df, "f", "o", ("g",), 10.0, 30.0).collect()}
    assert out["p"].seeps == 0.0 and out["p"].skill == 1.0
    assert out["d"].seeps is None and out["d"].skill is None
    assert out["w"].seeps is None
    with pytest.raises(ValueError, match="group key"):
        seeps_score(df, "f", "o", (), 10.0, 30.0)


def test_seeps_matches_numpy_matrix(spark):
    """Differential vs a numpy recomputation of the full Rodwell
    matrix on a planted 60-row mixed group."""
    from flood_data_spark.operators.verification import seeps_score

    rng = np.random.default_rng(7)
    f = rng.uniform(0, 50, 60)
    o = rng.uniform(0, 50, 60)
    df = spark.createDataFrame(
        [("g", float(a), float(b)) for a, b in zip(f, o)],
        "g string, f double, o double")
    got = seeps_score(df, "f", "o", ("g",), 17.0, 39.0).collect()[0]

    def cat(v):
        return 1 if v < 17.0 else (2 if v < 39.0 else 3)

    oc = np.array([cat(v) for v in o])
    fc = np.array([cat(v) for v in f])
    p1 = (oc == 1).sum() / len(oc)
    ent = {(1, 2): 0.5 * (1 / (1 - p1)), (1, 3): 0.5 * (4 / (1 - p1)),
           (2, 1): 0.5 * (1 / p1), (2, 3): 0.5 * (3 / (1 - p1)),
           (3, 1): 0.5 * (1 / p1 + 3 / (2 + p1)),
           (3, 2): 0.5 * (3 / (2 + p1))}
    want = np.mean([ent.get((a, b), 0.0) for a, b in zip(fc, oc)])
    assert got.seeps == pytest.approx(want, abs=2e-6)
    assert got.skill == pytest.approx(1 - want, abs=2e-6)


# --- Spiegelhalter calibration Z -------------------------------------------


def test_spiegelhalter_matches_numpy_and_flags(spark):
    from flood_data_spark.operators.verification import spiegelhalter_z

    rng = np.random.default_rng(3)
    ps = rng.choice([0.1, 0.3, 0.5, 0.7, 0.9], size=600)
    # calibrated outcomes: o ~ Bernoulli(p)
    os_cal = (rng.random(600) < ps).astype(int)
    # badly calibrated: outcomes ignore p entirely
    os_bad = (rng.random(600) < 0.95).astype(int)
    rows = [("cal", float(p), int(o)) for p, o in zip(ps, os_cal)] \
        + [("bad", float(p), int(o)) for p, o in zip(ps, os_bad)] \
        + [("deg", 1.0, 1), ("deg", 0.0, 0)]
    df = spark.createDataFrame(rows, "g string, p double, o int")
    out = {r.g: r for r in
           spiegelhalter_z(df, "p", "o", ("g",)).collect()}

    def z_ref(p, o):
        num = ((o - p) * (1 - 2 * p)).sum()
        den = np.sqrt((p * (1 - p) * (1 - 2 * p) ** 2).sum())
        return num / den

    assert out["cal"].z == pytest.approx(z_ref(ps, os_cal), abs=2e-5)
    assert out["bad"].z == pytest.approx(z_ref(ps, os_bad), abs=2e-5)
    assert out["cal"].well_calibrated
    assert not out["bad"].well_calibrated
    assert abs(out["bad"].z) > 10
    # degenerate probabilities: zero denominator -> NULL
    assert out["deg"].z is None and out["deg"].well_calibrated is None


# --- NSE / KGE hydrological efficiencies -----------------------------------


def test_nse_hand_golden_and_identities(spark):
    """Hand case: obs (1,2,3,4), sim (1.5,2.5,2.5,3.5) -> SSE = 4*0.25
    = 1.0, SSD = 5.0, NSE = 0.8.  Perfect sim -> 1.0; mean-as-sim -> 0;
    constant obs -> NULL."""
    from flood_data_spark.operators.verification import nse_score

    rows = ([("h", s, o) for s, o in
             zip((1.5, 2.5, 2.5, 3.5), (1.0, 2.0, 3.0, 4.0))]
            + [("p", v, v) for v in (1.0, 2.0, 7.0)]
            + [("m", 2.5, o) for o in (1.0, 2.0, 3.0, 4.0)]
            + [("c", 1.0, 5.0), ("c", 2.0, 5.0)])
    df = spark.createDataFrame(rows, "g string, s double, o double")
    out = {r.g: r for r in nse_score(df, "s", "o", ("g",)).collect()}
    assert out["h"].nse == pytest.approx(0.8, abs=1e-6)
    assert out["p"].nse == 1.0
    assert out["m"].nse == 0.0
    assert out["c"].nse is None
    with pytest.raises(ValueError, match="group key"):
        nse_score(df, "s", "o", ())


def test_nse_matches_numpy(spark):
    from flood_data_spark.operators.verification import nse_score

    rng = np.random.default_rng(11)
    o = rng.uniform(1, 40, 80)
    s = o + rng.normal(0, 5, 80)
    df = spark.createDataFrame(
        [("g", float(a), float(b)) for a, b in zip(s, o)],
        "g string, s double, o double")
    got = nse_score(df, "s", "o", ("g",)).collect()[0]
    want = 1 - ((s - o) ** 2).sum() / ((o - o.mean()) ** 2).sum()
    assert got.n == 80
    assert got.nse == pytest.approx(want, abs=2e-6)


def test_kge_perfect_and_degenerate(spark):
    from flood_data_spark.operators.verification import kge_score

    rows = ([("p", v, v) for v in (1.0, 2.0, 7.0, 4.0)]
            + [("c", 1.0, 5.0), ("c", 2.0, 5.0)])   # zero obs variance
    df = spark.createDataFrame(rows, "g string, s double, o double")
    out = {r.g: r for r in kge_score(df, "s", "o", ("g",)).collect()}
    p = out["p"]
    assert (p.r, p.alpha, p.beta, p.kge) == (1.0, 1.0, 1.0, 1.0)
    assert out["c"].kge is None and out["c"].r is None


def test_kge_matches_numpy(spark):
    """Differential vs numpy on 2 planted groups (population sd — the
    n-cleared variance identity the operator uses)."""
    from flood_data_spark.operators.verification import kge_score

    rng = np.random.default_rng(23)
    for g, n in (("a", 60), ("b", 91)):
        o = rng.uniform(5, 60, n)
        s = 0.8 * o + rng.normal(2, 6, n)
        df = spark.createDataFrame(
            [(g, float(x), float(y)) for x, y in zip(s, o)],
            "g string, s double, o double")
        got = kge_score(df, "s", "o", ("g",)).collect()[0]
        r = np.corrcoef(s, o)[0, 1]
        alpha = s.std() / o.std()
        beta = s.mean() / o.mean()
        kge = 1 - np.sqrt((r - 1) ** 2 + (alpha - 1) ** 2
                          + (beta - 1) ** 2)
        assert got.r == pytest.approx(r, abs=2e-6)
        assert got.alpha == pytest.approx(alpha, abs=2e-6)
        assert got.beta == pytest.approx(beta, abs=2e-6)
        assert got.kge == pytest.approx(kge, abs=4e-6)


# --- deterministic error battery --------------------------------------------


def test_error_summary_matches_numpy(spark):
    from flood_data_spark.operators.verification import error_summary

    rng = np.random.default_rng(31)
    o = rng.uniform(5, 50, 120)
    s = o + rng.normal(1.5, 4, 120)
    df = spark.createDataFrame(
        [("g", float(a), float(b)) for a, b in zip(s, o)],
        "g string, s double, o double")
    r = error_summary(df, "s", "o", ("g",)).collect()[0]
    d = s - o
    assert r.n == 120
    assert r.me == pytest.approx(d.mean(), abs=2e-6)
    assert r.mae == pytest.approx(np.abs(d).mean(), abs=2e-6)
    assert r.rmse == pytest.approx(np.sqrt((d ** 2).mean()), abs=2e-6)
    assert r.pbias == pytest.approx(100 * d.sum() / o.sum(), abs=2e-6)


def test_error_summary_perfect_and_degenerate(spark):
    from flood_data_spark.operators.verification import error_summary

    rows = ([("p", v, v) for v in (1.0, 2.0, 3.0)]
            + [("neg", 1.0, -2.0), ("neg", 2.0, -3.0)])  # sum(obs) < 0
    df = spark.createDataFrame(rows, "g string, s double, o double")
    out = {r.g: r for r in error_summary(df, "s", "o", ("g",))
           .collect()}
    p = out["p"]
    assert (p.me, p.mae, p.rmse) == (0.0, 0.0, 0.0)
    assert out["neg"].pbias is None
    with pytest.raises(ValueError, match="group key"):
        error_summary(df, "s", "o", ())


def test_nse_rmse_cross_identity(spark):
    """Cross-operator gate: NSE = 1 − (RMSE/σ_obs)² ties the error
    battery to the efficiency score on the same relation (population
    σ — the n-cleared convention both operators share)."""
    from flood_data_spark.operators.verification import (
        error_summary, nse_score)

    rng = np.random.default_rng(41)
    o = rng.uniform(5, 50, 300)
    s = o + rng.normal(0.5, 3, 300)
    df = spark.createDataFrame(
        [("g", float(a), float(b)) for a, b in zip(s, o)],
        "g string, s double, o double")
    nse = nse_score(df, "s", "o", ("g",)).collect()[0].nse
    rmse = error_summary(df, "s", "o", ("g",)).collect()[0].rmse
    want = 1 - (rmse / o.std()) ** 2
    assert nse == pytest.approx(want, abs=5e-5)


def test_persistence_skill_matches_numpy(spark):
    from flood_data_spark.operators.verification import persistence_skill

    rng = np.random.default_rng(47)
    o = np.cumsum(rng.normal(0, 2, 100)) + 50
    s = o + rng.normal(0, 1, 100)        # better than persistence
    df = spark.createDataFrame(
        [("g", t, float(a), float(b))
         for t, (a, b) in enumerate(zip(s, o))],
        "g string, t long, s double, o double")
    r = persistence_skill(df, "s", "o", "t", ("g",)).collect()[0]
    d2 = ((s[1:] - o[1:]) ** 2).sum()
    p2 = (np.diff(o) ** 2).sum()
    assert r.n == 99
    assert r.ss_persist == pytest.approx(1 - d2 / p2, abs=2e-6)
    assert r.theils_u2 == pytest.approx(np.sqrt(d2 / p2), abs=2e-6)
    assert r.ss_persist > 0           # the model beats persistence
    # constant obs: no benchmark
    flat = spark.createDataFrame(
        [("f", t, 1.0, 7.0) for t in range(5)],
        "g string, t long, s double, o double")
    fr = persistence_skill(flat, "s", "o", "t", ("g",)).collect()[0]
    assert fr.ss_persist is None and fr.theils_u2 is None
    with pytest.raises(ValueError, match="group key"):
        persistence_skill(df, "s", "o", "t", ())
