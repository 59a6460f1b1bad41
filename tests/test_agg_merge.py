"""Incremental aggregate maintenance (plans/scale.summarize_increment /
merge_summaries) — merge-equals-rescan and monoid-identity tests."""

import pytest

from pyspark.sql import functions as F

from flood_data_spark.plans.scale import (
    merge_summaries, summarize_increment, summary_stats)


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, v double")


def test_merge_equals_from_scratch(spark):
    rows = [("a", 1.0), ("a", 2.0), ("b", 10.0), ("a", 3.0), ("b", 20.0)]
    df = _df(spark, rows)
    full = {r.g: (r.n, r.sum_micro, r.min_value, r.max_value)
            for r in summarize_increment(df, ("g",), "v").collect()}
    half1 = summarize_increment(_df(spark, rows[:2]), ("g",), "v")
    half2 = summarize_increment(_df(spark, rows[2:]), ("g",), "v")
    merged = {r.g: (r.n, r.sum_micro, r.min_value, r.max_value)
              for r in merge_summaries(half1, half2, ("g",)).collect()}
    assert merged == full


def test_merge_disjoint_keys_pass_through(spark):
    a = summarize_increment(_df(spark, [("a", 1.0)]), ("g",), "v")
    b = summarize_increment(_df(spark, [("b", 5.0)]), ("g",), "v")
    got = {r.g: (r.n, r.min_value, r.max_value)
           for r in merge_summaries(a, b, ("g",)).collect()}
    assert got == {"a": (1, 1.0, 1.0), "b": (1, 5.0, 5.0)}


def test_nulls_carry_no_mass(spark):
    df = _df(spark, [("a", 1.0), ("a", None)])
    row = summarize_increment(df, ("g",), "v").collect()[0]
    assert (row.n, row.sum_micro) == (1, 1_000_000)


def test_summary_stats_mean(spark):
    df = _df(spark, [("a", 1.0), ("a", 2.0)])
    s = summary_stats(summarize_increment(df, ("g",), "v")).collect()[0]
    assert s.mean == pytest.approx(1.5)


def test_merge_is_associative(spark):
    parts = [_df(spark, [("a", float(i))]) for i in range(1, 4)]
    s = [summarize_increment(p, ("g",), "v") for p in parts]
    left = merge_summaries(merge_summaries(s[0], s[1], ("g",)), s[2],
                           ("g",)).collect()[0]
    right = merge_summaries(s[0], merge_summaries(s[1], s[2], ("g",)),
                            ("g",)).collect()[0]
    assert (left.n, left.sum_micro, left.min_value, left.max_value) == \
           (right.n, right.sum_micro, right.min_value, right.max_value)


def _boot_df(spark, n, gap=0.0):
    rows = [(i, "g", float(10 + (i % 7)) + gap) for i in range(n)]
    return spark.createDataFrame(rows, "id long, g string, v double")


def test_bootstrap_ci_brackets_the_mean(spark):
    from flood_data_spark.operators.experiment import bootstrap_ci
    df = _boot_df(spark, 500)
    row = bootstrap_ci(df, "v", "id", ("g",), n_replicas=32).collect()[0]
    assert row.n == 500
    assert row.ci_lo <= row.mean <= row.ci_hi
    # a 500-row sample of a bounded variable: the CI is tight
    assert row.ci_hi - row.ci_lo < 1.0


def test_bootstrap_ci_width_shrinks_with_n(spark):
    from flood_data_spark.operators.experiment import bootstrap_ci
    small = bootstrap_ci(_boot_df(spark, 40), "v", "id", ("g",),
                         n_replicas=32).collect()[0]
    big = bootstrap_ci(_boot_df(spark, 4000), "v", "id", ("g",),
                       n_replicas=32).collect()[0]
    assert (big.ci_hi - big.ci_lo) < (small.ci_hi - small.ci_lo)


def test_bootstrap_ci_deterministic(spark):
    from flood_data_spark.operators.experiment import bootstrap_ci
    df = _boot_df(spark, 100)
    a = bootstrap_ci(df, "v", "id", ("g",), n_replicas=16).collect()[0]
    b = bootstrap_ci(df, "v", "id", ("g",), n_replicas=16).collect()[0]
    assert (a.ci_lo, a.ci_hi, a.mean) == (b.ci_lo, b.ci_hi, b.mean)


def test_bootstrap_ci_validation(spark):
    from flood_data_spark.operators.experiment import bootstrap_ci
    df = _boot_df(spark, 5)
    with pytest.raises(ValueError, match="n_replicas"):
        bootstrap_ci(df, "v", "id", n_replicas=1)
    with pytest.raises(ValueError, match="alpha"):
        bootstrap_ci(df, "v", "id", alpha=0.0)


def test_bootstrap_fast_path_same_shape(spark):
    from flood_data_spark.operators.experiment import bootstrap_ci
    df = _boot_df(spark, 200)
    fast = bootstrap_ci(df, "v", "id", ("g",), n_replicas=16,
                        portable_hash=False).collect()[0]
    slow = bootstrap_ci(df, "v", "id", ("g",), n_replicas=16,
                        portable_hash=True).collect()[0]
    # different hash families, same estimator: identical n/mean, both
    # CIs bracket the mean with comparable width
    assert fast.n == slow.n and fast.mean == slow.mean
    assert fast.ci_lo <= fast.mean <= fast.ci_hi
    assert abs((fast.ci_hi - fast.ci_lo) - (slow.ci_hi - slow.ci_lo)) < 1.0


def test_conformal_closed_form_and_coverage(spark):
    from flood_data_spark.operators.experiment import conformal_interval
    # calibration residuals |y - yhat| = 0..9 (yhat = 0): with alpha=0.2
    # and n=10, level = ceil(11*0.8)/10 = 0.9 -> q = percentile .9
    cal = spark.createDataFrame([(float(i), 0.0) for i in range(10)],
                                "y double, yhat double")
    new = spark.createDataFrame([(5.0, 4.0), (50.0, 4.0)],
                                "y double, yhat double")
    out = conformal_interval(cal, new, "y", "yhat", alpha=0.2).collect()
    q = out[0].conformal_q
    assert q == pytest.approx(8.1)    # percentile(0..9, 0.9)
    covered = [r.conformal_lo <= r.y <= r.conformal_hi for r in out]
    assert covered == [True, False]   # 5 inside, 50 far outside


def test_conformal_validation(spark):
    from flood_data_spark.operators.experiment import conformal_interval
    cal = spark.createDataFrame([(1.0, 1.0)], "y double, yhat double")
    empty = spark.createDataFrame([], "y double, yhat double")
    with pytest.raises(ValueError, match="alpha"):
        conformal_interval(cal, cal, "y", "yhat", alpha=1.0)
    with pytest.raises(ValueError, match="calibration"):
        conformal_interval(empty, cal, "y", "yhat")


def test_conformal_null_residuals_use_effective_n(spark):
    # r9 ADVICE: n must count what the quantile sees.  10 real residuals
    # + 5 NULL ones must yield the SAME q as the 10 alone — under the
    # old count(*), n=15 would shift the ⌈(n+1)(1-α)⌉/n level.
    from flood_data_spark.operators.experiment import conformal_interval
    clean = [(float(i), 0.0) for i in range(10)]
    nulls = [(None, 0.0), (1.0, None), (None, None)] * 2
    cal = spark.createDataFrame(clean + nulls[:5], "y double, yhat double")
    new = spark.createDataFrame([(5.0, 4.0)], "y double, yhat double")
    q = conformal_interval(cal, new, "y", "yhat", alpha=0.2) \
        .collect()[0].conformal_q
    assert q == pytest.approx(8.1)    # ceil(11*0.8)/10 = .9 over 0..9

    all_null = spark.createDataFrame(nulls[:4], "y double, yhat double")
    with pytest.raises(ValueError, match="calibration"):
        conformal_interval(all_null, new, "y", "yhat", alpha=0.2)
