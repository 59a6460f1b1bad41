"""Association rules (datapipe/market.py) + mutual information
(datapipe/bayes.mutual_information)."""

import math

import pytest

from flood_data_spark.datapipe.bayes import MU, mutual_information
from flood_data_spark.datapipe.market import (
    association_rules, frequent_pairs)


def _b(spark, rows):
    return spark.createDataFrame(rows, "basket_id long, item string")


def test_frequent_pairs_closed_form(spark):
    # 4 baskets: {m,b}, {m,b}, {m,d}, {b}
    rows = [(1, "milk"), (1, "bread"), (2, "milk"), (2, "bread"),
            (3, "milk"), (3, "diapers"), (4, "bread")]
    got = {(r.item_a, r.item_b): (r.pair_count, r.n_a, r.n_b, r.n_baskets)
           for r in frequent_pairs(_b(spark, rows),
                                   min_support=0.5).collect()}
    # threshold = ceil(0.5*4) = 2: only (bread, milk) qualifies
    assert got == {("bread", "milk"): (2, 3, 3, 4)}


def test_apriori_prunes_infrequent_items(spark):
    # 'rare' co-occurs with milk once; with support 0.5 it must be
    # pruned BEFORE pairing (and the pair is below threshold anyway)
    rows = [(1, "milk"), (1, "rare"), (2, "milk"), (3, "milk")]
    got = frequent_pairs(_b(spark, rows), min_support=0.5).collect()
    assert got == []


def test_association_rules_support_confidence_lift(spark):
    rows = [(1, "milk"), (1, "bread"), (2, "milk"), (2, "bread"),
            (3, "milk"), (3, "diapers"), (4, "bread")]
    got = {(r.antecedent, r.consequent): (r.support, r.confidence, r.lift)
           for r in association_rules(_b(spark, rows),
                                      min_support=0.5).collect()}
    s = round(2 / 4, 6)
    lift = round(2 * 4.0 / (3 * 3.0), 6)
    assert got[("bread", "milk")] == (s, round(2 / 3, 6), lift)
    assert got[("milk", "bread")] == (s, round(2 / 3, 6), lift)
    # min_confidence filters directionally
    half = association_rules(_b(spark, rows), min_support=0.25,
                             min_confidence=0.99).collect()
    assert all(r.confidence >= 0.99 for r in half)


def test_basket_cap_and_guards(spark):
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b")]
    capped = frequent_pairs(_b(spark, rows), min_support=0.1,
                            max_basket_size=2).collect()
    # basket 1 (3 items) dropped whole: only basket 2's pair remains
    assert {(r.item_a, r.item_b, r.pair_count) for r in capped} \
        == {("a", "b", 1)}
    with pytest.raises(ValueError, match="min_support"):
        frequent_pairs(_b(spark, rows), min_support=0.0)
    with pytest.raises(ValueError, match="max_basket_size"):
        frequent_pairs(_b(spark, rows), max_basket_size=1)


def test_market_deterministic_across_partitionings(spark):
    rows = [(i, f"it{(i * j) % 7}") for i in range(40) for j in range(4)]
    d = _b(spark, rows)
    a = {tuple(r) for r in association_rules(
        d.coalesce(1), min_support=0.05).collect()}
    b = {tuple(r) for r in association_rules(
        d.repartition(8), min_support=0.05).collect()}
    assert a == b


def test_mutual_information_independent_and_identical(spark):
    # independent uniform 2x2: MI = 0 in every cell
    rows = [(a, b) for a in "xy" for b in "uv" for _ in range(5)]
    d = spark.createDataFrame(rows, "a string, b string")
    r = mutual_information(d, "a", "b").first()
    assert r.mi_mu == 0 and r.n == 20 and r.n_cells == 4
    assert r.h_a_mu == 2 * round(-0.5 * math.log(0.5) * MU)
    # perfectly dependent: MI = H(A) = ln 2
    rows2 = [("x", "u")] * 5 + [("y", "v")] * 5
    d2 = spark.createDataFrame(rows2, "a string, b string")
    r2 = mutual_information(d2, "a", "b").first()
    assert r2.mi_mu == 2 * round(0.5 * math.log(2) * MU)
    assert r2.mi_mu == r2.h_a_mu == r2.h_b_mu


def test_mutual_information_nulls_are_a_category(spark):
    d = spark.createDataFrame(
        [("x", "u"), (None, "u"), ("x", None)], "a string, b string")
    r = mutual_information(d, "a", "b").first()
    assert r.n == 3 and r.n_cells == 3
