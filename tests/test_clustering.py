"""Distributed Lloyd's k-means (datapipe/clustering.py)."""

import pytest

from pyspark.sql import functions as F

from flood_data_spark.datapipe.clustering import kmeans_assign, kmeans_fit


def _blobs(spark, n=90, sep=5.0, noise=0.2, d=8):
    """3 well-separated blobs on coordinate axes; blob = vec_id % 3."""
    import random
    rng = random.Random(7)
    centers = [[sep] + [0.0] * (d - 1),
               [0.0] * (d // 2) + [sep] + [0.0] * (d - d // 2 - 1),
               [0.0] * (d - 1) + [sep]]
    rows = [(i, [x + rng.uniform(-noise, noise) for x in centers[i % 3]])
            for i in range(n)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")


def test_recovers_separated_blobs(spark):
    df = _blobs(spark)
    centroids, history = kmeans_fit(df, k=3, max_iter=8)
    asg = kmeans_assign(df, centroids)
    # each blob maps to exactly one cluster and clusters don't mix
    pur = (asg.withColumn("blob", F.col("vec_id") % 3)
           .groupBy("blob").agg(F.countDistinct("cluster").alias("k"))
           .collect())
    assert all(r.k == 1 for r in pur)
    assert asg.select("cluster").distinct().count() == 3


def test_inertia_non_increasing(spark):
    df = _blobs(spark, noise=1.0)
    _, history = kmeans_fit(df, k=3, max_iter=6)
    assert len(history) >= 2
    assert all(a >= b - 1e-9 for a, b in zip(history, history[1:]))


def test_deterministic_across_partitionings(spark):
    df = _blobs(spark, n=60)
    c1, h1 = kmeans_fit(df.repartition(13), k=4, max_iter=4)
    c2, h2 = kmeans_fit(df.coalesce(1), k=4, max_iter=4)
    # init is hash-ranked (order-independent) and every step is an exact
    # aggregate, so centroids agree to float-sum reordering noise
    flat1 = [x for row in c1 for x in row]
    flat2 = [x for row in c2 for x in row]
    assert max(abs(a - b) for a, b in zip(flat1, flat2)) < 1e-9
    a1 = {r.vec_id: r.cluster for r in kmeans_assign(df, c1).collect()}
    a2 = {r.vec_id: r.cluster for r in kmeans_assign(df, c2).collect()}
    assert a1 == a2


def test_k_larger_than_needed_keeps_empty_clusters_valid(spark):
    # 2 distinct points, k=4: two clusters stay empty (keep their seed
    # position), every point still assigned to a valid id
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]),
         (2, [1.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    centroids, _ = kmeans_fit(df, k=4, max_iter=3)
    assert len(centroids) == 4
    asg = kmeans_assign(df, centroids)
    assert asg.filter(~F.col("cluster").between(0, 3)).count() == 0
    assert asg.count() == 4


def test_rejects_bad_k_and_empty_input(spark):
    df = _blobs(spark, n=6)
    with pytest.raises(ValueError):
        kmeans_fit(df, k=0)
    empty = df.filter(F.col("vec_id") < 0)
    with pytest.raises(ValueError):
        kmeans_fit(empty, k=2)


def test_assign_is_expression_only_no_shuffle(spark):
    """kmeans_assign must add no exchange: the centroid literal rides into
    the scan stage (broadcast-free, join-free map)."""
    df = _blobs(spark, n=30)
    centroids, _ = kmeans_fit(df, k=2, max_iter=2)
    plan = kmeans_assign(df, centroids)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_cluster_balanced_sample_quota_and_determinism(spark):
    from flood_data_spark.datapipe.clustering import cluster_balanced_sample

    # 30 vectors in 3 axis-aligned blobs of 10 (dims 0/2/4 of a 6-dim space)
    rows = []
    for i in range(30):
        v = [0.0] * 6
        v[(i % 3) * 2] = 1.0 + i * 0.01
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[1.0, 0, 0, 0, 0, 0], [0, 0, 1.0, 0, 0, 0],
             [0, 0, 0, 0, 1.0, 0]]
    out = cluster_balanced_sample(df, cents, per_cluster=4).collect()
    # exactly 4 per cluster, all three clusters represented
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster, []).append(r.vec_id)
    assert set(by_cluster) == {0, 1, 2}
    assert all(len(v) == 4 for v in by_cluster.values())
    # members really belong to their cluster (blob structure preserved)
    for c, ids in by_cluster.items():
        assert all(i % 3 == c for i in ids)
    # deterministic across invocations
    again = cluster_balanced_sample(df, cents, per_cluster=4).collect()
    assert sorted((r.vec_id, r.cluster) for r in out) \
        == sorted((r.vec_id, r.cluster) for r in again)


def test_cluster_balanced_sample_small_cluster_kept_whole(spark):
    from flood_data_spark.datapipe.clustering import cluster_balanced_sample
    import pytest as _pytest

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.1, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    cents = [[1.0, 0.0], [0.0, 1.0]]
    out = cluster_balanced_sample(df, cents, per_cluster=5).collect()
    assert len(out) == 3                       # quota above size: all kept
    with _pytest.raises(ValueError):
        cluster_balanced_sample(df, cents, per_cluster=0)
