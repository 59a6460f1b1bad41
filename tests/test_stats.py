"""Equi-depth histogram operator (operators/stats.py)."""

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
