"""Blocked fuzzy matching (datapipe/fuzzy.py): Python-difflib-free truth —
a tiny local levenshtein reimplementation is the oracle, plus plan-shape
asserts that the join is blocked, never cartesian."""

import pytest
from pyspark.sql import functions as F

from flood_data_spark.datapipe.fuzzy import (
    blocked_fuzzy_pairs, fuzzy_match_against, name_groups)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


NAMES = ["small ring", "smal ring", "small  Ring", "red widget",
         "red widgets", "blue bolt", "blue belt", "green bolt",
         "lone entity"]


@pytest.fixture()
def corpus(spark):
    rows = [(i, n) for i, n in enumerate(NAMES)]
    # duplicate one row to exercise the distinct-name shrink
    rows.append((99, "small ring"))
    return spark.createDataFrame(rows, "p_partkey int, p_name string")


def test_name_groups_collapses_and_counts(corpus):
    got = {r.name: (r.rep_id, r.n_rows)
           for r in name_groups(corpus).collect()}
    # "small  Ring" normalizes onto "small ring"
    assert got["small ring"] == (0, 3)
    assert got["lone entity"] == (8, 1)
    assert len(got) == len(NAMES) - 1


def test_blocked_pairs_match_local_truth_within_block(corpus):
    got = {(r.name_a, r.name_b): r.dist
           for r in blocked_fuzzy_pairs(corpus, max_dist=2).collect()}
    names = sorted({n.lower().strip().replace("  ", " ") for n in NAMES})
    expect = {}
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            if a.split(" ")[-1] != b.split(" ")[-1]:
                continue  # blocking contract: same last token only
            d = _lev(a, b)
            if d <= 2:
                expect[(a, b)] = d
    assert got == expect
    assert got  # non-vacuous: at least the smal/small pair survives
    wide = {(r.name_a, r.name_b): r.dist
            for r in blocked_fuzzy_pairs(corpus, max_dist=4).collect()}
    assert wide[("blue bolt", "green bolt")] == 4  # bounded DP, wider band


def test_blocking_misses_cross_block_pairs_by_contract(corpus):
    got = blocked_fuzzy_pairs(corpus, max_dist=2).collect()
    # bolt vs belt differ in the LAST token: dist 1 but never candidates
    assert not [r for r in got if {r.name_a, r.name_b}
                == {"blue bolt", "blue belt"}]
    # widget vs widgets likewise: the plural edit lives in the block key
    assert not [r for r in got if {r.name_a, r.name_b}
                == {"red widget", "red widgets"}]


def test_ids_and_counts_ride_the_pairs(corpus):
    row = [r for r in blocked_fuzzy_pairs(corpus, max_dist=2).collect()
           if (r.name_a, r.name_b) == ("smal ring", "small ring")]
    assert row and row[0].id_b == 0 and row[0].n_b == 3 and row[0].n_a == 1


def test_max_block_caps_hot_blocks(spark):
    rows = [(i, f"name{i} common") for i in range(20)]
    rows += [(100, "aa rare"), (101, "ab rare")]
    df = spark.createDataFrame(rows, "p_partkey int, p_name string")
    capped = blocked_fuzzy_pairs(df, max_dist=2, max_block=5).collect()
    assert {(r.name_a, r.name_b) for r in capped} == {("aa rare", "ab rare")}
    with pytest.raises(ValueError, match="max_block"):
        blocked_fuzzy_pairs(df, max_block=1)
    with pytest.raises(ValueError, match="max_dist"):
        blocked_fuzzy_pairs(df, max_dist=0)


def test_plan_is_blocked_join_not_cartesian(corpus):
    plan = blocked_fuzzy_pairs(corpus)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_match_against_picks_best_deterministically(spark):
    batch = spark.createDataFrame(
        [(1, "blu bolt"), (2, "rad widget"), (3, "nomatch thing")],
        "doc_id int, text string")
    ref = spark.createDataFrame(
        [(10, "blue bolt"), (11, "blow bolt"), (12, "red widget")],
        "ref_id int, name string")
    got = {r.name: (r.match_name, r.match_id, r.dist)
           for r in fuzzy_match_against(batch, ref, max_dist=2).collect()}
    assert got["blu bolt"] == ("blue bolt", 10, 1)
    assert got["rad widget"] == ("red widget", 12, 1)
    assert "nomatch thing" not in got  # 'thing' block has no ref names


def test_match_tiebreak_on_name_then_id(spark):
    batch = spark.createDataFrame([(1, "aa bolt")], "doc_id int, text string")
    ref = spark.createDataFrame(
        [(20, "ab bolt"), (10, "ac bolt"), (30, "ab bolt")],
        "ref_id int, name string")
    r = fuzzy_match_against(batch, ref, max_dist=2).collect()[0]
    # both dist 1 -> lexicographically smaller match_name wins; the
    # duplicate ref name collapsed to its min id by name_groups
    assert (r.match_name, r.match_id, r.dist) == ("ab bolt", 20, 1)


def test_prefix_blocking_strategy(spark):
    df = spark.createDataFrame(
        [(1, "alpha one"), (2, "alphq one"), (3, "beta one")],
        "p_partkey int, p_name string")
    got = blocked_fuzzy_pairs(df, max_dist=2, block="prefix",
                              prefix_len=4).collect()
    assert {(r.name_a, r.name_b) for r in got} == {("alpha one", "alphq one")}
    with pytest.raises(ValueError, match="blocking"):
        blocked_fuzzy_pairs(df, block="soundex")


def test_snm_pairs_finds_sort_neighbors(spark):
    from flood_data_spark.datapipe.fuzzy import snm_pairs
    rows = [(1, "widget alpha"), (2, "widget alphb"), (3, "widget omega"),
            (4, "zz unrelated")]
    df = spark.createDataFrame(rows, "p_partkey long, p_name string")
    got = {(r.name_a, r.name_b): r.dist
           for r in snm_pairs(df, window=2, max_dist=2).collect()}
    # the near-identical pair is adjacent in sort order
    assert got[("widget alpha", "widget alphb")] == 1
    # 'widget omega' is within window of alpha/alphb but > max_dist away
    assert ("widget alpha", "widget omega") not in got


def test_snm_prefix_partition_boundary_contract(spark):
    from flood_data_spark.datapipe.fuzzy import snm_pairs
    # first-char edit sorts into a different partition: documented miss
    rows = [(1, "aname x"), (2, "bname x")]
    df = spark.createDataFrame(rows, "p_partkey long, p_name string")
    assert snm_pairs(df, window=3, max_dist=2).count() == 0


def test_snm_window_bounds_candidates(spark):
    from flood_data_spark.datapipe.fuzzy import snm_pairs
    # 5 names all within dist 1 of sort-adjacent ones; window=1 only
    # yields adjacent pairs
    rows = [(i, f"name {chr(97 + i)}") for i in range(5)]
    df = spark.createDataFrame(rows, "p_partkey long, p_name string")
    got = snm_pairs(df, window=1, max_dist=2).collect()
    assert len(got) == 4            # exactly the 4 adjacent pairs


def test_snm_validation(spark):
    from flood_data_spark.datapipe.fuzzy import snm_pairs
    df = spark.createDataFrame([(1, "a")], "p_partkey long, p_name string")
    import pytest as _pt
    with _pt.raises(ValueError, match="window"):
        snm_pairs(df, window=0)


def test_fs_linkage_weights_hand_golden(spark):
    """4 labeled pairs, one field: m = (2+0.5)/(2+1), u = (1+0.5)/(2+1)
    -> w_agree = ln(2.5/1.5), w_disagree = ln(0.5/1.5), micro-rounded
    once; pair scores are exact sums of those integers."""
    import math

    from flood_data_spark.datapipe.fuzzy import (fs_linkage_weights,
                                                 fs_score_pairs)

    rows = [(1, 2, True, 1), (3, 4, True, 0),
            (5, 6, False, 1), (7, 8, False, 0)]
    df = spark.createDataFrame(
        rows, "id1 int, id2 int, agr boolean, match int")
    w = fs_linkage_weights(df, ("agr",)).collect()[0]
    assert (w.n_match, w.n_nonmatch) == (2, 2)
    assert (w.agree_match, w.agree_nonmatch) == (1, 1)
    m, u = 1.5 / 3.0, 1.5 / 3.0
    assert w.w_agree_micro == round(math.log(m / u) * 1e6) == 0
    assert w.w_disagree_micro == 0      # symmetric toy: no signal
    # an informative field: agreement only among matches
    rows2 = [(1, 2, True, 1), (3, 4, True, 1),
             (5, 6, False, 0), (7, 8, False, 0)]
    d2 = spark.createDataFrame(
        rows2, "id1 int, id2 int, agr boolean, match int")
    w2 = fs_linkage_weights(d2, ("agr",)).collect()[0]
    wa = round(math.log((2.5 / 3.0) / (0.5 / 3.0)) * 1e6)
    wd = round(math.log((0.5 / 3.0) / (2.5 / 3.0)) * 1e6)
    assert w2.w_agree_micro == wa and w2.w_disagree_micro == wd
    scored = {(r.id1): r.score for r in
              fs_score_pairs(d2, ("id1", "id2"), ("agr",)).collect()}
    assert scored[1] == pytest.approx(wa / 1e6, abs=1e-9)
    assert scored[5] == pytest.approx(wd / 1e6, abs=1e-9)
    with pytest.raises(ValueError, match="agreement"):
        fs_linkage_weights(d2, ())
    with pytest.raises(ValueError, match="laplace"):
        fs_linkage_weights(d2, ("agr",), laplace=0.0)


def test_fs_score_sums_fields_and_is_partition_invariant(spark):
    from flood_data_spark.datapipe.fuzzy import (fs_linkage_weights,
                                                 fs_score_pairs)

    rows = [(i, i + 100, i % 2 == 0, i % 3 == 0, 1 if i < 10 else 0)
            for i in range(30)]
    df = spark.createDataFrame(
        rows, "id1 int, id2 int, f1 boolean, f2 boolean, match int")
    w = {r.field: (r.w_agree_micro, r.w_disagree_micro)
         for r in fs_linkage_weights(df, ("f1", "f2")).collect()}
    got = {r.id1: r.score for r in
           fs_score_pairs(df, ("id1", "id2"), ("f1", "f2")).collect()}
    for i, _, f1, f2, _m in rows:
        want = (w["f1"][0 if f1 else 1] + w["f2"][0 if f2 else 1]) / 1e6
        assert got[i] == pytest.approx(want, abs=1e-9), i
    a = sorted(map(tuple, fs_score_pairs(
        df.coalesce(1), ("id1", "id2"), ("f1", "f2")).collect()))
    b = sorted(map(tuple, fs_score_pairs(
        df.repartition(7), ("id1", "id2"), ("f1", "f2")).collect()))
    assert a == b
