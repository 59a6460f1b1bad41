"""nDCG@k (datapipe/similarity.ndcg_at_k) — closed-form tests."""

import math

import pytest

from flood_data_spark.datapipe.similarity import ndcg_at_k


def _ranked(spark, rows):
    return spark.createDataFrame(rows,
                                 "query_id long, neighbor_id long, rank int")


def _rel(spark, rows):
    return spark.createDataFrame(rows, "query_id long, neighbor_id long")


def _g(i):
    return round(1_000_000 / math.log2(i + 1))


def test_perfect_ranking_scores_one(spark):
    ranked = _ranked(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3)])
    rel = _rel(spark, [(1, 10), (1, 11)])
    row = ndcg_at_k(ranked, rel, k=10).collect()[0]
    assert (row.n_relevant, row.ndcg) == (2, 1.0)
    assert row.dcg_mu == row.idcg_mu == _g(1) + _g(2)


def test_zero_hits_scores_zero(spark):
    ranked = _ranked(spark, [(1, 10, 1)])
    rel = _rel(spark, [(1, 99)])
    row = ndcg_at_k(ranked, rel, k=10).collect()[0]
    assert (row.dcg_mu, row.ndcg) == (0, 0.0)


def test_late_hit_discounted(spark):
    ranked = _ranked(spark, [(1, 10, 1), (1, 99, 3)])
    rel = _rel(spark, [(1, 99)])
    row = ndcg_at_k(ranked, rel, k=10).collect()[0]
    # relevant doc at rank 3 vs ideal rank 1
    assert row.dcg_mu == _g(3)
    assert row.ndcg == pytest.approx(round(_g(3) / _g(1), 6))


def test_idcg_truncates_at_k(spark):
    # 5 relevant but k=2: ideal only counts the first 2 positions
    ranked = _ranked(spark, [(1, 10, 1), (1, 11, 2)])
    rel = _rel(spark, [(1, 10), (1, 11), (1, 12), (1, 13), (1, 14)])
    row = ndcg_at_k(ranked, rel, k=2).collect()[0]
    assert row.n_relevant == 5
    assert row.idcg_mu == _g(1) + _g(2)
    assert row.ndcg == 1.0


def test_duplicate_relevance_pairs_deduped(spark):
    ranked = _ranked(spark, [(1, 10, 1)])
    rel = _rel(spark, [(1, 10), (1, 10)])
    row = ndcg_at_k(ranked, rel, k=5).collect()[0]
    assert (row.n_relevant, row.ndcg) == (1, 1.0)


def test_hits_beyond_k_ignored(spark):
    ranked = _ranked(spark, [(1, 10, 11)])
    rel = _rel(spark, [(1, 10)])
    row = ndcg_at_k(ranked, rel, k=10).collect()[0]
    assert (row.dcg_mu, row.ndcg) == (0, 0.0)


def test_k_validation(spark):
    with pytest.raises(ValueError, match="k must"):
        ndcg_at_k(_ranked(spark, [(1, 1, 1)]), _rel(spark, [(1, 1)]), k=0)
