"""Margin-based bitext mining (datapipe/similarity.mine_bitext) —
closed-form mutual-NN and margin tests."""

import pytest

from flood_data_spark.datapipe.similarity import mine_bitext


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_mutual_nn_pairs(spark):
    src = _vecs(spark, [(0, [1.0, 0.0]), (2, [0.0, 1.0])])
    tgt = _vecs(spark, [(1, [0.9, 0.1]), (3, [0.1, 0.9]),
                        (5, [0.7, 0.7])])
    got = {(r.src_id, r.tgt_id): r.margin
           for r in mine_bitext(src, tgt, k=2).collect()}
    # axis-aligned sources pair with their aligned targets; the diagonal
    # t5 is nobody's mutual top-1
    assert set(got) == {(0, 1), (2, 3)}
    for m in got.values():
        assert m > 1.0        # a true pair stands out above its neighborhood


def test_forward_mode_keeps_all_sources(spark):
    src = _vecs(spark, [(0, [1.0, 0.0]), (2, [0.0, 1.0]),
                        (4, [0.6, 0.8])])
    tgt = _vecs(spark, [(1, [0.9, 0.1]), (3, [0.1, 0.9])])
    fwd = mine_bitext(src, tgt, k=2, mutual=False).collect()
    assert {r.src_id for r in fwd} == {0, 2, 4}
    by = {r.src_id: r.tgt_id for r in fwd}
    assert by[0] == 1 and by[2] == 3 and by[4] == 3  # 0.8 beats 0.6


def test_margin_closed_form(spark):
    # one source, two targets: margin = cos1 / ((mean_src + cos1)/2)
    # with k=2 the src mean covers both targets, tgt means are just cos
    src = _vecs(spark, [(0, [1.0, 0.0])])
    tgt = _vecs(spark, [(1, [1.0, 0.0]), (3, [0.0, 1.0])])
    rows = mine_bitext(src, tgt, k=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.src_id, r.tgt_id, r.cosine_mu) == (0, 1, 1_000_000)
    # src mean = (1e6 + 0)/2 = 5e5; tgt1 mean = 1e6 (only one source)
    den = (500000.0 + 1000000.0) / 2
    assert r.margin == pytest.approx(round(1_000_000 / den, 6))


def test_hubness_discounts_popular_targets(spark):
    # t1 is everyone's neighbor (a hub); margin must rank the exclusive
    # pair above the hub pair even at equal raw cosine
    src = _vecs(spark, [(0, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])])
    tgt = _vecs(spark, [(1, [0.8, 0.6, 0.0]),    # hub: close to both
                        (3, [0.0, 0.995, 0.1])])  # exclusive to s2
    fwd = {r.src_id: r for r in
           mine_bitext(src, tgt, k=2, mutual=False).collect()}
    assert fwd[2].tgt_id == 3
    assert fwd[2].margin > fwd[0].margin


def test_k_validation(spark):
    v = _vecs(spark, [(0, [1.0])])
    with pytest.raises(ValueError, match="k must"):
        mine_bitext(v, v, k=0)
