"""KMV bottom-k sketches (datapipe/sketches.py) — exactness, estimator
accuracy, set algebra, and mergeability."""

import pytest

from pyspark.sql import functions as F

from flood_data_spark.datapipe.sketches import (
    kmv_distinct_estimate, kmv_jaccard, kmv_sketch)


def _keys(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "k long")


def test_unsaturated_sketch_is_exact(spark):
    sk = kmv_sketch(_keys(spark, range(10)), "k", k=64)
    row = kmv_distinct_estimate(sk, 64).collect()[0]
    assert row.n_kept == 10
    assert row.est_distinct == 10.0


def test_duplicates_do_not_inflate(spark):
    sk = kmv_sketch(_keys(spark, [1, 1, 2, 2, 3]), "k", k=16)
    row = kmv_distinct_estimate(sk, 16).collect()[0]
    assert (row.n_kept, row.est_distinct) == (3, 3.0)


def test_saturated_estimator_accuracy(spark):
    # 2000 distinct keys, k=128: relative error ~1/sqrt(k) ≈ 9%
    sk = kmv_sketch(_keys(spark, range(2000)), "k", k=128)
    row = kmv_distinct_estimate(sk, 128).collect()[0]
    assert row.n_kept == 128
    assert 2000 * 0.6 < row.est_distinct < 2000 * 1.4


def test_jaccard_identical_sets(spark):
    a = kmv_sketch(_keys(spark, range(500)), "k", k=64)
    b = kmv_sketch(_keys(spark, range(500)), "k", k=64)
    assert kmv_jaccard(a, b, 64).collect()[0].jaccard == 1.0


def test_jaccard_disjoint_sets(spark):
    a = kmv_sketch(_keys(spark, range(0, 300)), "k", k=64)
    b = kmv_sketch(_keys(spark, range(1000, 1300)), "k", k=64)
    assert kmv_jaccard(a, b, 64).collect()[0].jaccard == 0.0


def test_jaccard_estimate_known_overlap(spark):
    # A = 0..999, B = 500..1499 → true J = 500/1500 = 1/3
    a = kmv_sketch(_keys(spark, range(0, 1000)), "k", k=256)
    b = kmv_sketch(_keys(spark, range(500, 1500)), "k", k=256)
    j = kmv_jaccard(a, b, 256).collect()[0]
    assert j.n_union_kept == 256
    assert abs(j.jaccard - 1 / 3) < 0.15


def test_merge_equals_rescan(spark):
    # bottom-k of the union of two sketches == sketch of the unioned keys
    a = kmv_sketch(_keys(spark, range(0, 800)), "k", k=64)
    b = kmv_sketch(_keys(spark, range(400, 1200)), "k", k=64)
    merged = (a.unionByName(b).distinct()
              .orderBy(F.asc("h")).limit(64))
    direct = kmv_sketch(_keys(spark, range(0, 1200)), "k", k=64)
    assert ({r.h for r in merged.collect()}
            == {r.h for r in direct.collect()})


def test_k_validation(spark):
    with pytest.raises(ValueError, match="k must"):
        kmv_sketch(_keys(spark, [1]), "k", k=1)
