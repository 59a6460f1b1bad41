"""NULL-safety contracts for the session-4 operators: NULL labels,
targets, keys, and embeddings must degrade explicitly, never silently
bias a statistic or diverge across engines."""

import pytest

from pyspark.sql import functions as F


def test_target_encoding_ignores_null_targets(spark):
    from flood_data_spark.datapipe.features import target_encoding
    rows = [(1, "a", 2.0), (2, "a", None), (3, "a", 4.0)]
    df = spark.createDataFrame(rows, "id long, cat string, y double")
    enc = {r.cat: (r.n, r.enc)
           for r in target_encoding(df, ("cat",), "y",
                                    smoothing=0.0).collect()}
    # n counts non-null targets only; the mean is unbiased
    assert enc["a"] == (2, pytest.approx(3.0))


def test_loo_null_target_gets_null_not_peers_bias(spark):
    from flood_data_spark.datapipe.features import loo_encoding
    rows = [(1, "a", 2.0), (2, "a", None), (3, "a", 4.0)]
    df = spark.createDataFrame(rows, "id long, cat string, y double")
    got = {r.id: r.loo for r in loo_encoding(df, ("cat",), "y").collect()}
    assert got[2] is None
    # peers' denominators use the non-null count (2-1), not the row count
    assert got[1] == pytest.approx(4.0)
    assert got[3] == pytest.approx(2.0)


def test_acf_null_values_drop_pairs(spark):
    from flood_data_spark.operators.stats import acf
    rows = [("a", 0, 1.0), ("a", 1, None), ("a", 2, 3.0), ("a", 3, 4.0)]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    got = {r.lag: r.n for r in acf(df, "v", "t", ("k",),
                                   max_lag=1).collect()}
    # only the (3.0, 4.0) pair survives; the NULL never reaches a moment
    assert got[1] == 1


def test_kmv_drops_null_keys(spark):
    from flood_data_spark.datapipe.sketches import (
        kmv_distinct_estimate, kmv_sketch)
    df = spark.createDataFrame([(1,), (None,), (2,)], "k int")
    row = kmv_distinct_estimate(kmv_sketch(df, "k", k=8), 8).collect()[0]
    assert (row.n_kept, row.est_distinct) == (2, 2.0)


def test_bitext_drops_null_embeddings(spark):
    from flood_data_spark.datapipe.similarity import mine_bitext
    src = spark.createDataFrame([(0, [1.0, 0.0]), (2, None)],
                                "vec_id long, embedding array<float>")
    tgt = spark.createDataFrame([(1, [1.0, 0.0])],
                                "vec_id long, embedding array<float>")
    got = mine_bitext(src, tgt, k=1).collect()
    assert [(r.src_id, r.tgt_id) for r in got] == [(0, 1)]


def test_stump_drops_null_labels(spark):
    from flood_data_spark.datapipe.classifier import split_candidates
    rows = [(1.0, 0), (2.0, 0), (3.0, None), (4.0, 1)]
    df = spark.createDataFrame(rows, "x double, y int")
    cand = split_candidates(df, ("x",), "y", n_buckets=2).collect()
    for c in cand:
        assert c.n_left + c.n_right == 3      # the NULL-label row is out


def test_stump_null_features_move_no_counts(spark):
    # the r9 VERDICT bug: NULL feature values used to take every
    # otherwise(0) in bucket_expr and land in bucket 1, silently
    # inflating n_left/pos_left of EVERY candidate split.  Contract:
    # per-feature available-case — a NULL-x row moves none of x's
    # counts, while still counting for its non-NULL features.
    from flood_data_spark.datapipe.classifier import split_candidates
    base = [(float(i), float(i % 7), i % 2) for i in range(1, 21)]
    nulls = [(None, 3.0, 1), (None, 5.0, 0), (None, 1.0, 1)]
    df = spark.createDataFrame(base + nulls, "x double, z double, y int")

    with_n = sorted(map(tuple,
                        split_candidates(df, ("x",), "y",
                                         n_buckets=4).collect()))
    without = sorted(map(tuple,
                         split_candidates(df.filter(F.col("x").isNotNull()),
                                          ("x",), "y",
                                          n_buckets=4).collect()))
    assert with_n == without          # NULL-x rows moved nothing
    for c in with_n:
        assert c[3] + c[4] == len(base)   # n_left + n_right

    # …but the same rows DO count for the non-NULL feature z
    z_cand = split_candidates(df, ("z",), "y", n_buckets=4).collect()
    for c in z_cand:
        assert c.n_left + c.n_right == len(base) + len(nulls)


def test_bucket_expr_null_yields_null_bucket(spark):
    from flood_data_spark.operators.stats import bucket_expr
    df = spark.createDataFrame([(1.0,), (None,), (9.0,)], "v double")
    got = [r.b for r in
           df.select(bucket_expr("v", [2.0, 5.0]).alias("b")).collect()]
    assert got == [1, None, 3]
