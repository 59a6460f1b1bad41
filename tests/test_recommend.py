"""Item-item CF (datapipe/recommend.py) — closed-form and cap tests."""

import pytest

from pyspark.sql import functions as F

from flood_data_spark.datapipe.recommend import (
    item_cooccurrence, item_similarity, item_topk)


def _inter(spark, rows):
    return spark.createDataFrame(rows, "u long, i long")


def test_cooccurrence_counts(spark):
    df = _inter(spark, [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 3)])
    got = {(r.item_a, r.item_b): r.n_common
           for r in item_cooccurrence(df, "u", "i",
                                      max_basket=None).collect()}
    assert got == {(1, 2): 2, (1, 3): 1}


def test_cooccurrence_dedups_repeat_interactions(spark):
    # the same (user, item) twice must not double-count
    df = _inter(spark, [(1, 1), (1, 1), (1, 2)])
    got = item_cooccurrence(df, "u", "i", max_basket=None).collect()
    assert [(r.item_a, r.item_b, r.n_common) for r in got] == [(1, 2, 1)]


def test_similarity_closed_form(spark):
    df = _inter(spark, [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 3)])
    sim = {(r.item_a, r.item_b): r
           for r in item_similarity(df, "u", "i",
                                    max_basket=None).collect()}
    s12 = sim[(1, 2)]
    assert (s12.n_common, s12.n_a, s12.n_b) == (2, 3, 2)
    assert s12.cosine == pytest.approx(round(2 / 6 ** 0.5, 6))
    assert sim[(1, 3)].cosine == pytest.approx(round(1 / 3 ** 0.5, 6))


def test_basket_cap_keeps_lowest_item_ids(spark):
    df = _inter(spark, [(1, 5), (1, 3), (1, 9), (2, 3), (2, 5)])
    got = {(r.item_a, r.item_b): r.n_common
           for r in item_cooccurrence(df, "u", "i",
                                      max_basket=2).collect()}
    # user 1 truncated to {3, 5}: the (3,9)/(5,9) pairs vanish
    assert got == {(3, 5): 2}


def test_min_count_prunes(spark):
    df = _inter(spark, [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 3)])
    got = item_cooccurrence(df, "u", "i", max_basket=None,
                            min_count=2).collect()
    assert [(r.item_a, r.item_b) for r in got] == [(1, 2)]


def test_topk_symmetric_and_ranked(spark):
    df = _inter(spark, [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 3)])
    sim = item_similarity(df, "u", "i", max_basket=None)
    got = {(r.item, r.rank): r.neighbor
           for r in item_topk(sim, k=2).collect()}
    # item 1 sees both neighbors, higher-cosine first
    assert got[(1, 1)] == 2 and got[(1, 2)] == 3
    # the reverse directions exist too
    assert got[(2, 1)] == 1 and got[(3, 1)] == 1


def test_validation(spark):
    df = _inter(spark, [(1, 1)])
    with pytest.raises(ValueError, match="max_basket"):
        item_cooccurrence(df, "u", "i", max_basket=1)
    with pytest.raises(ValueError, match="k must"):
        item_topk(item_similarity(df, "u", "i"), k=0)


def test_item_cf_plan_has_no_cartesian(spark):
    # the scale contract: pair generation is a keyed self-join, degree
    # lookups broadcast — never a nested-loop/cartesian anywhere
    df = _inter(spark, [(u, i) for u in range(20) for i in range(u % 5)])
    plan = (item_topk(item_similarity(df, "u", "i", max_basket=8), 3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Cartesian" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_similarity_broadcast_contract(spark):
    # r9 ADVICE: the degree relation is item-cardinality — never an
    # unconditional broadcast hint.  Default leaves the choice to AQE
    # (no authored ResolvedHint); True forces it; values agree across
    # all three modes.
    rows = [(u, i) for u in range(6) for i in range(u % 4 + 1)]
    df = _inter(spark, rows)
    base = sorted(map(tuple, item_similarity(df, "u", "i").collect()))
    forced = sorted(map(tuple,
                        item_similarity(df, "u", "i",
                                        broadcast_degrees=True).collect()))
    shuffled = sorted(map(tuple,
                          item_similarity(df, "u", "i",
                                          broadcast_degrees=False)
                          .collect()))
    assert base == forced == shuffled and base
    default_plan = item_similarity(df, "u", "i") \
        ._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in default_plan
