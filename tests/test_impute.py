"""Missing-value imputation (datapipe/curation.impute_missing) —
strategy goldens and edge cases."""

import pytest

from flood_data_spark.datapipe.curation import impute_missing


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, g string, v double")


BASE = [(1, "a", 1.0), (2, "a", 3.0), (3, "a", None), (4, "b", 10.0),
        (5, "b", None)]


def test_median_fill(spark):
    got = {r.id: (r.v, r.was_imputed)
           for r in impute_missing(_df(spark, BASE), "v",
                                   ("g",), "median").collect()}
    assert got[3] == (2.0, True)      # median of {1, 3}
    assert got[5] == (10.0, True)
    assert got[1] == (1.0, False)


def test_mean_fill(spark):
    got = {r.id: r.v for r in impute_missing(
        _df(spark, BASE), "v", ("g",), "mean").collect()}
    assert got[3] == pytest.approx(2.0)


def test_mode_fill_breaks_ties_low(spark):
    rows = [(1, "a", 5.0), (2, "a", 5.0), (3, "a", 2.0), (4, "a", 2.0),
            (5, "a", 9.0), (6, "a", None)]
    got = {r.id: r.v for r in impute_missing(
        _df(spark, rows), "v", ("g",), "mode").collect()}
    assert got[6] == 2.0              # 5.0 and 2.0 tie at 2 -> lowest wins


def test_all_null_group_keeps_nulls(spark):
    rows = [(1, "a", 1.0), (2, "z", None)]
    got = {r.id: (r.v, r.was_imputed)
           for r in impute_missing(_df(spark, rows), "v",
                                   ("g",), "median").collect()}
    assert got[2] == (None, False)    # nothing to impute from


def test_global_fill_without_groups(spark):
    rows = [(1, "a", 2.0), (2, "b", 4.0), (3, "c", None)]
    got = {r.id: r.v for r in impute_missing(
        _df(spark, rows), "v", (), "median").collect()}
    assert got[3] == 3.0


def test_out_col_preserves_original(spark):
    out = impute_missing(_df(spark, BASE), "v", ("g",), "median",
                         out_col="v2")
    row = {r.id: r for r in out.collect()}[3]
    assert row.v is None and row.v2 == 2.0


def test_unknown_strategy(spark):
    with pytest.raises(ValueError, match="strategy"):
        impute_missing(_df(spark, BASE), "v", ("g",), "magic")
