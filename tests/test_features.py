"""Categorical feature encoders (datapipe/features.py) — closed-form,
leakage, and plan-shape tests."""

import math

import pytest

from pyspark.sql import functions as F

from flood_data_spark.datapipe.features import (
    MICRO, apply_target_encoding, loo_encoding, target_encoding,
    woe_encoding)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, cat string, y double")


def test_target_encoding_closed_form(spark):
    # cat a: [1, 3] (mean 2), cat b: [10] — global mean 14/3
    df = _df(spark, [(1, "a", 1.0), (2, "a", 3.0), (3, "b", 10.0)])
    enc = {r.cat: (r.n, r.target_sum_micro, r.enc)
           for r in target_encoding(df, ("cat",), "y",
                                    smoothing=2.0).collect()}
    g = 14.0 * MICRO / 3 / MICRO
    assert enc["a"][0] == 2 and enc["a"][1] == 4 * MICRO
    assert enc["a"][2] == pytest.approx((4.0 + 2 * g) / 4, abs=1e-12)
    assert enc["b"][2] == pytest.approx((10.0 + 2 * g) / 3, abs=1e-12)


def test_target_encoding_zero_smoothing_is_plain_mean(spark):
    df = _df(spark, [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 7.0)])
    enc = {r.cat: r.enc
           for r in target_encoding(df, ("cat",), "y",
                                    smoothing=0.0).collect()}
    assert enc["a"] == pytest.approx(1.5)
    assert enc["b"] == pytest.approx(7.0)


def test_target_encoding_rejects_negative_smoothing(spark):
    df = _df(spark, [(1, "a", 1.0)])
    with pytest.raises(ValueError, match="smoothing"):
        target_encoding(df, ("cat",), "y", smoothing=-1.0)


def test_apply_target_encoding_unseen_default_and_broadcast(spark):
    train = _df(spark, [(1, "a", 1.0), (2, "a", 3.0)])
    enc = target_encoding(train, ("cat",), "y", smoothing=0.0)
    test = _df(spark, [(10, "a", 0.0), (11, "zz", 0.0)])
    out = apply_target_encoding(test, enc, ("cat",), default=-1.0)
    got = {r.id: r.enc for r in out.collect()}
    assert got[10] == pytest.approx(2.0)
    assert got[11] == -1.0
    # the encode-apply join must be broadcast, not a shuffled exchange
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_loo_encoding_closed_form_and_singleton_null(spark):
    df = _df(spark, [(1, "a", 1.0), (2, "a", 3.0), (3, "a", 5.0),
                     (4, "b", 9.0)])
    got = {r.id: r.loo for r in loo_encoding(df, ("cat",), "y").collect()}
    assert got[1] == pytest.approx((3.0 + 5.0) / 2)
    assert got[2] == pytest.approx((1.0 + 5.0) / 2)
    assert got[3] == pytest.approx((1.0 + 3.0) / 2)
    assert got[4] is None          # singleton category: no peers


def test_loo_encoding_never_sees_own_label(spark):
    # two categories where every row's label is an extreme outlier of its
    # own category: loo must differ from the plain category mean
    df = _df(spark, [(1, "a", 0.0), (2, "a", 100.0)])
    got = {r.id: r.loo for r in loo_encoding(df, ("cat",), "y").collect()}
    assert got[1] == pytest.approx(100.0)
    assert got[2] == pytest.approx(0.0)


def test_loo_encoding_no_window_in_plan(spark):
    # the scale contract: broadcast-join + arithmetic, never a
    # corpus-wide category window
    df = _df(spark, [(1, "a", 1.0), (2, "a", 3.0)])
    out = loo_encoding(df, ("cat",), "y")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


def test_woe_closed_form(spark):
    # a: 2 pos / 1 neg; b: 0 pos / 3 neg; K=2, laplace 0.5
    rows = [(1, "a", 1), (2, "a", 1), (3, "a", 0),
            (4, "b", 0), (5, "b", 0), (6, "b", 0)]
    df = spark.createDataFrame(rows, "id long, cat string, lab int")
    got = {r.cat: (r.n_pos, r.n_neg, r.woe_micro, r.iv_micro)
           for r in woe_encoding(df, ("cat",), "lab").collect()}
    ps_a = 2.5 / (2 + 0.5 * 2)
    ns_a = 1.5 / (4 + 0.5 * 2)
    woe_a = math.log(ps_a) - math.log(ns_a)
    assert got["a"][0] == 2 and got["a"][1] == 1
    assert got["a"][2] == round(woe_a * MICRO)
    assert got["a"][3] == round((ps_a - ns_a) * woe_a * MICRO)
    # b has zero positives — the Laplace floor keeps woe finite
    ps_b = 0.5 / 3.0
    ns_b = 3.5 / 5.0
    assert got["b"][2] == round((math.log(ps_b) - math.log(ns_b)) * MICRO)


def test_woe_rejects_nonpositive_laplace(spark):
    df = spark.createDataFrame([(1, "a", 1)], "id long, cat string, lab int")
    with pytest.raises(ValueError, match="laplace"):
        woe_encoding(df, ("cat",), "lab", laplace=0.0)


def test_target_encoding_multi_column_key(spark):
    rows = [(1, "a", "x", 1.0), (2, "a", "x", 3.0), (3, "a", "y", 5.0)]
    df = spark.createDataFrame(rows, "id long, c1 string, c2 string, "
                                     "y double")
    enc = {(r.c1, r.c2): r.n
           for r in target_encoding(df, ("c1", "c2"), "y",
                                    smoothing=1.0).collect()}
    assert enc[("a", "x")] == 2 and enc[("a", "y")] == 1


def test_oof_encoding_excludes_own_fold(spark):
    from flood_data_spark.datapipe.features import oof_target_encoding
    rows = [(i, "a", float(i)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, cat string, y double")
    out = oof_target_encoding(df, ("cat",), "y", "id", n_folds=3)
    got = out.collect()
    # reconstruct per-fold means in python from the SAME md5 assignment
    import hashlib
    def fold(i):
        h = hashlib.md5(f"fold:{i}".encode()).hexdigest()[:13]
        return int(h, 16) % 3
    by_fold = {}
    for i in range(60):
        by_fold.setdefault(fold(i), []).append(float(i))
    total_s, total_n = sum(range(60)), 60
    for r in got:
        f = r.fold
        s_f, n_f = sum(by_fold[f]), len(by_fold[f])
        want = (total_s - s_f) / (total_n - n_f)
        assert r.oof_enc == pytest.approx(want, abs=1e-9)


def test_oof_single_fold_category_gets_null(spark):
    from flood_data_spark.datapipe.features import oof_target_encoding
    # one row -> its category has nothing outside its own fold
    df = spark.createDataFrame([(1, "solo", 5.0)],
                               "id long, cat string, y double")
    row = oof_target_encoding(df, ("cat",), "y", "id",
                              n_folds=2).collect()[0]
    assert row.oof_enc is None


def test_oof_validation(spark):
    from flood_data_spark.datapipe.features import oof_target_encoding
    df = spark.createDataFrame([(1, "a", 1.0)],
                               "id long, cat string, y double")
    with pytest.raises(ValueError, match="n_folds"):
        oof_target_encoding(df, ("cat",), "y", "id", n_folds=1)
