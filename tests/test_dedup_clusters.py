"""Connected-components dedup clustering tests."""

from pyspark.sql import functions as F

from flood_data_spark.datapipe.dedup import dedup_clusters


def test_chain_and_triangle_components(spark):
    # chain 1-2-3-4, triangle 10-11-12, isolated pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long")
    got = {r.doc_id: r.cluster_id for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10,
                   20: 20, 21: 20}


def test_long_chain_converges(spark):
    # path graph of 30 nodes: worst case for propagation rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long")
    got = dedup_clusters(pairs)
    assert got.select("cluster_id").distinct().count() == 1
    assert got.count() == 31
    assert got.agg(F.min("cluster_id")).first()[0] == 0


def test_representatives_are_min_ids(spark):
    pairs = spark.createDataFrame(
        [(7, 3), (3, 9), (100, 42)], "id_a long, id_b long")
    got = {r.doc_id: r.cluster_id for r in dedup_clusters(pairs).collect()}
    assert got[7] == got[3] == got[9] == 3
    assert got[100] == got[42] == 42
