"""Bradley-Terry preference fitting (datapipe/preference.py): a pure-
Python integer-arithmetic reference is the differential oracle, plus
ordering/guard/invariance properties."""

from fractions import Fraction

import numpy as np
import pytest
from pyspark.sql import functions as F

from flood_data_spark.datapipe.preference import (
    bradley_terry, pairwise_counts)


def _half_up(num: int, den: int) -> int:
    f = Fraction(abs(num), den)
    r = (2 * f.numerator + f.denominator) // (2 * f.denominator)
    return -r if num < 0 else r


def _bt_ref(games, iterations):
    """The exact integer-micro MM recurrence the operator commits to,
    in plain Python.  `games` = list of (winner, loser)."""
    items = sorted({x for g in games for x in g})
    n = {}
    wins = {i: 0 for i in items}
    tot = {i: 0 for i in items}
    for w, l_ in games:
        a, b = min(w, l_), max(w, l_)
        n[(a, b)] = n.get((a, b), 0) + 1
        wins[w] += 1
        tot[w] += 1
        tot[l_] += 1
    k = len(items)
    wq = {i: 1_000_000 for i in items}
    for _ in range(iterations):
        new = {}
        for i in items:
            denom = _half_up(2 * 10 ** 12, wq[i] + 1_000_000)
            for (a, b), cnt in n.items():
                if i in (a, b):
                    j = b if i == a else a
                    denom += _half_up(cnt * 10 ** 12, wq[i] + wq[j])
            new[i] = _half_up((wins[i] + 1) * 10 ** 12, denom)
        s = sum(new.values())
        wq = {i: max(_half_up(new[i] * k * 1_000_000, s), 1)
              for i in items}
    return {i: (wins[i], tot[i], wq[i] / 1e6) for i in items}


def _games(seed=5, n=400, k=6):
    # planted strengths: item i has strength (i+1)^2 — later items
    # should rank higher
    rng = np.random.default_rng(seed)
    s = [(i + 1) ** 2 for i in range(k)]
    out = []
    for _ in range(n):
        i, j = rng.choice(k, size=2, replace=False)
        p = s[i] / (s[i] + s[j])
        if rng.random() < p:
            out.append((int(i), int(j)))
        else:
            out.append((int(j), int(i)))
    return out


def test_pairwise_counts_canonical(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 1), (3, 1), (1, 1), (None, 2)],
        "w int, l int")
    got = {(r.item_a, r.item_b): (r.n_games, r.wins_a)
           for r in pairwise_counts(df, "w", "l").collect()}
    assert got == {(1, 2): (3, 1), (1, 3): (1, 0)}


def test_bradley_terry_matches_integer_reference(spark):
    games = _games()
    df = spark.createDataFrame(games, "w int, l int")
    got = {r.item: (r.n_wins, r.n_games, r.strength)
           for r in bradley_terry(df, "w", "l", iterations=2).collect()}
    ref = _bt_ref(games, 2)
    assert got == ref


def test_bradley_terry_recovers_planted_ordering(spark):
    games = _games(n=1500)
    df = spark.createDataFrame(games, "w int, l int")
    out = bradley_terry(df, "w", "l", iterations=6).collect()
    by_item = {r.item: r.strength for r in out}
    ranked = sorted(by_item, key=by_item.get)
    assert ranked == sorted(by_item)      # planted order 0 < 1 < ... < 5
    # mean-1 rescale holds (to rounding)
    assert sum(by_item.values()) == pytest.approx(len(by_item), abs=1e-4)


def test_bradley_terry_zero_win_item_stays_finite(spark):
    # item 9 loses every game: the prior keeps its weight > 0
    df = spark.createDataFrame([(0, 9)] * 10 + [(1, 9)] * 10,
                               "w int, l int")
    got = {r.item: r.strength
           for r in bradley_terry(df, "w", "l", iterations=4).collect()}
    assert got[9] > 0
    assert got[9] < got[0] and got[9] < got[1]


def test_bradley_terry_partition_invariant(spark):
    games = _games(seed=11, n=600)
    df = spark.createDataFrame(games, "w int, l int")
    a = sorted(map(tuple,
                   bradley_terry(df.coalesce(1), "w", "l", 3).collect()))
    b = sorted(map(tuple,
                   bradley_terry(df.repartition(7), "w", "l", 3).collect()))
    assert a == b


def test_bradley_terry_guard(spark):
    df = spark.createDataFrame([(1, 2)], "w int, l int")
    with pytest.raises(ValueError, match="iterations"):
        bradley_terry(df, "w", "l", iterations=0)
