"""ACF (operators/stats.acf) + decision stump (datapipe/classifier
.best_split) — closed-form tests."""

import pytest

from pyspark.sql import functions as F

from flood_data_spark.datapipe.classifier import best_split, split_candidates
from flood_data_spark.operators.stats import acf


def _series(spark, rows):
    return spark.createDataFrame(rows, "k string, t int, v double")


def test_acf_linear_series_is_one(spark):
    df = _series(spark, [("a", i, float(i)) for i in range(1, 8)])
    got = {r.lag: (r.n, r.acf) for r in
           acf(df, "v", "t", ("k",), max_lag=3).collect()}
    # a linear series is perfectly autocorrelated at every lag
    assert got[1] == (6, 1.0)
    assert got[2] == (5, 1.0)
    assert got[3] == (4, 1.0)


def test_acf_alternating_series(spark):
    df = _series(spark, [("a", i, float(1 if i % 2 else -1))
                         for i in range(8)])
    got = {r.lag: r.acf for r in
           acf(df, "v", "t", ("k",), max_lag=2).collect()}
    assert got[1] == -1.0
    assert got[2] == 1.0


def test_acf_constant_series_is_null(spark):
    df = _series(spark, [("a", i, 5.0) for i in range(5)])
    got = [r.acf for r in acf(df, "v", "t", ("k",), max_lag=1).collect()]
    assert got == [None]


def test_acf_short_series_drops_lags(spark):
    df = _series(spark, [("a", 0, 1.0), ("a", 1, 2.0)])
    lags = {r.lag for r in acf(df, "v", "t", ("k",), max_lag=5).collect()}
    assert lags == {1}          # only one overlapping pair exists


def test_acf_keys_are_independent(spark):
    df = _series(spark, [("a", i, float(i)) for i in range(5)]
                 + [("b", i, float(-i)) for i in range(5)])
    got = {(r.k, r.lag): r.acf
           for r in acf(df, "v", "t", ("k",), max_lag=1).collect()}
    assert got[("a", 1)] == 1.0 and got[("b", 1)] == 1.0


def test_acf_rejects_bad_max_lag(spark):
    df = _series(spark, [("a", 0, 1.0)])
    with pytest.raises(ValueError, match="max_lag"):
        acf(df, "v", "t", ("k",), max_lag=0)


def _stump_df(spark, rows):
    return spark.createDataFrame(rows, "x double, z double, y int")


def test_best_split_finds_perfect_separator(spark):
    # label is exactly x > 4; z is noise constant (no candidates)
    rows = [(float(i), 1.0, int(i > 4)) for i in range(1, 9)]
    df = _stump_df(spark, rows)
    best = best_split(df, ("x", "z"), "y", n_buckets=4).collect()
    assert len(best) == 1
    b = best[0]
    assert b.feature == "x"
    assert b.threshold == pytest.approx(4.5)
    assert b.split_gini_micro == 0
    assert (b.n_left, b.n_right, b.pos_left, b.pos_right) == (4, 4, 0, 4)


def test_split_candidates_drops_degenerate_and_constant(spark):
    rows = [(float(i), 7.0, i % 2) for i in range(1, 9)]
    cand = split_candidates(_stump_df(spark, rows), ("x", "z"), "y",
                            n_buckets=4).collect()
    feats = {c.feature for c in cand}
    assert feats == {"x"}       # constant z yields no usable boundary
    for c in cand:
        assert c.n_left > 0 and c.n_right > 0
        assert c.n_left + c.n_right == 8


def test_best_split_per_feature_mode(spark):
    rows = [(float(i), float(i % 3), int(i > 4)) for i in range(1, 13)]
    per = best_split(_stump_df(spark, rows), ("x", "z"), "y",
                     n_buckets=4, per_feature=True).collect()
    assert {p.feature for p in per} == {"x", "z"}
    by = {p.feature: p for p in per}
    # x separates perfectly, z barely helps
    assert by["x"].split_gini_micro < by["z"].split_gini_micro


def test_split_candidates_gini_closed_form(spark):
    # one feature, force the 50% boundary: left {0,0}, right {0,1}
    rows = [(1.0, 0.0, 0), (2.0, 0.0, 0), (3.0, 0.0, 0), (4.0, 0.0, 1)]
    cand = {c.threshold: c for c in
            split_candidates(_stump_df(spark, rows), ("x",), "y",
                             n_buckets=2).collect()}
    # single boundary at median 2.5: left {1,2}→pure, right {3,4}→gini .5
    c = cand[2.5]
    assert (c.n_left, c.n_right, c.pos_left, c.pos_right) == (2, 2, 0, 1)
    assert c.split_gini_micro == 250000     # (2*0 + 2*0.5)/4 = 0.25


def test_split_candidates_rejects_bad_buckets(spark):
    df = _stump_df(spark, [(1.0, 1.0, 0)])
    with pytest.raises(ValueError, match="n_buckets"):
        split_candidates(df, ("x",), "y", n_buckets=1)


def test_fd_report_detects_key_and_violations(spark):
    from flood_data_spark.operators.stats import fd_report
    rows = [(1, "a", "x"), (2, "a", "x"), (3, "b", "y"), (4, "b", "z")]
    df = spark.createDataFrame(rows, "id long, g string, v string")
    got = {(r.determinant, r.dependent): r
           for r in fd_report(df, ("id", "g", "v")).collect()}
    # id is a key: determines everything with zero violations
    assert got[("id", "g")].holds and got[("id", "v")].holds
    assert got[("id", "g")].n_violations == 0
    assert got[("id", "g")].n_groups == 4
    # g -> v violated exactly once (b maps to y AND z)
    gv = got[("g", "v")]
    assert not gv.holds and gv.n_violations == 1 and gv.n_groups == 2
    # v -> g holds (each of x,y,z maps to one g)
    assert got[("v", "g")].holds


def test_fd_report_needs_two_columns(spark):
    from flood_data_spark.operators.stats import fd_report
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="columns"):
        fd_report(df, ("id",))


def test_benford_uniform_digits_fail_the_law(spark):
    from flood_data_spark.operators.stats import benford_profile
    # 1000..1999 (all leading digit 1): extreme non-Benford
    df = spark.createDataFrame([(float(v),) for v in range(1000, 2000)],
                               "v double")
    rows = benford_profile(df, "v").collect()
    assert len(rows) == 1 and rows[0].digit == 1 and rows[0].n == 1000
    # expected p(1)=0.301: chi term is huge
    assert rows[0].chi2_term_micro > 100_000_000


def test_benford_excludes_nonpositive(spark):
    from flood_data_spark.operators.stats import benford_profile
    df = spark.createDataFrame([(1.5,), (-2.0,), (0.0,), (None,)],
                               "v double")
    rows = benford_profile(df, "v").collect()
    assert [(r.digit, r.n) for r in rows] == [(1, 1)]


def test_benford_subunit_values(spark):
    from flood_data_spark.operators.stats import benford_profile
    # 0.042 -> micro 42000 -> leading digit 4
    df = spark.createDataFrame([(0.042,)], "v double")
    assert benford_profile(df, "v").collect()[0].digit == 4


def test_gini_closed_forms(spark):
    from flood_data_spark.operators.stats import gini_concentration
    rows = ([("eq", 5.0)] * 4                  # perfect equality: G = 0
            + [("sk", 0.000001)] * 3 + [("sk", 9.0)])  # one holder
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r.g: (r.n, r.gini) for r in
           gini_concentration(df, "v", ("g",)).collect()}
    assert got["eq"] == (4, 0.0)
    # near-total concentration in a 4-row group approaches (n-1)/n = .75
    assert got["sk"][1] == pytest.approx(0.75, abs=0.01)


def test_gini_tie_order_invariant(spark):
    from flood_data_spark.operators.stats import gini_concentration
    df = spark.createDataFrame([("a", 2.0), ("a", 2.0), ("a", 6.0)],
                               "g string, v double")
    g = gini_concentration(df, "v", ("g",)).collect()[0].gini
    # G = 2*(1*2+2*2+3*6)/(3*10) - 4/3 = 48/30 - 4/3 = 0.266667
    assert g == pytest.approx(0.266667)


def test_best_split_approx_mode_matches_exact_shape(spark):
    # approx boundaries differ slightly but the perfect split survives
    rows = [(float(i), 1.0, int(i > 50)) for i in range(1, 101)]
    df = _stump_df(spark, rows)
    b = best_split(df, ("x",), "y", n_buckets=4,
                   accuracy_mode="approx").collect()
    assert len(b) == 1 and b[0].feature == "x"
    assert b[0].split_gini_micro <= 20000   # near-pure split found


def test_split_candidates_rejects_bad_mode(spark):
    df = _stump_df(spark, [(1.0, 1.0, 0)])
    with pytest.raises(ValueError, match="accuracy_mode"):
        split_candidates(df, ("x",), "y", accuracy_mode="fast")


def test_psi_identical_distributions_near_zero(spark):
    from flood_data_spark.operators.stats import psi_report
    rows = [(float(i % 50),) for i in range(2000)]
    ref = spark.createDataFrame(rows, "v double")
    cur = spark.createDataFrame(rows, "v double")
    out = psi_report(ref, cur, "v", n_buckets=10).collect()
    total = sum(r.psi_term_micro for r in out)
    assert total < 1000          # identical: PSI ~ 0 (micro-units)


def test_psi_detects_shift(spark):
    from flood_data_spark.operators.stats import psi_report
    ref = spark.createDataFrame([(float(i % 50),) for i in range(2000)],
                                "v double")
    cur = spark.createDataFrame([(float(i % 50) + 30,) for i in
                                 range(2000)], "v double")
    out = psi_report(ref, cur, "v", n_buckets=10).collect()
    total = sum(r.psi_term_micro for r in out)
    assert total > 250_000       # a 30-unit shift blows past the 0.25 cut


def test_psi_empty_reference_raises(spark):
    from flood_data_spark.operators.stats import psi_report
    empty = spark.createDataFrame([], "v double")
    cur = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError, match="reference"):
        psi_report(empty, cur, "v")


def test_bucket_count_stream_matches_batch(spark, tmp_path):
    import os
    from flood_data_spark.operators.stats import (
        bucket_counts, equidepth_bounds)
    from flood_data_spark.streaming.file_stream import (
        bucket_count_stream, run_available_now)
    src = str(tmp_path / "src")
    os.makedirs(src)
    df = spark.createDataFrame([(float(i % 40),) for i in range(400)],
                               "v double")
    df.coalesce(1).write.parquet(src, mode="overwrite")
    bounds = equidepth_bounds(df, "v", 5)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = run_available_now(bucket_count_stream(stream, "v", bounds),
                          str(tmp_path / "ckpt"),
                          query_name="psi_test", output_mode="complete")
    q.awaitTermination()
    got = {r.bucket: r.n_cur
           for r in spark.table("psi_test").collect()}
    want = {r.bucket: r.n
            for r in bucket_counts(df, "v", bounds, "n").collect()}
    assert got == want
