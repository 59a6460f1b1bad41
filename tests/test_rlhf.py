"""RLHF preference-data curation (datapipe/rlhf.py): GRPO group
advantages vs numpy, degenerate-group zeroing, best-of-n / DPO-pair
tiebreak determinism, the margin cut, and partition invariance."""

import numpy as np
import pytest

from flood_data_spark.datapipe.rlhf import (best_of_n, dpo_pairs,
                                            group_advantages)


def _fixture(spark, seed=2, n_groups=20):
    rng = np.random.default_rng(seed)
    rows, truth = [], {}
    for g in range(n_groups):
        n = int(rng.integers(1, 9))
        rs = np.round(rng.uniform(-3, 3, n), 4)
        truth[g] = rs
        rows += [(g, 100 * g + i, float(r)) for i, r in enumerate(rs)]
    df = spark.createDataFrame(rows, "prompt int, rid long,"
                                     " reward double")
    return df, truth


def test_group_advantages_match_numpy(spark):
    df, truth = _fixture(spark)
    got = {(r.prompt, r.rid): r.advantage for r in
           group_advantages(df, "prompt", "rid", "reward").collect()}
    for g, rs in truth.items():
        mu, sd = rs.mean(), rs.std()
        for i, r in enumerate(rs):
            e = 0.0 if (len(rs) == 1 or sd < 1e-12) else (r - mu) / sd
            assert got[(g, 100 * g + i)] == pytest.approx(e, abs=5e-6)


def test_group_advantages_degenerate_groups_zero(spark):
    """n = 1 and all-equal-reward groups carry no gradient signal —
    advantage is exactly 0, never NaN/Inf."""
    rows = [(0, 1, 2.5),                       # singleton
            (1, 1, 1.0), (1, 2, 1.0), (1, 3, 1.0)]   # zero variance
    df = spark.createDataFrame(rows, "prompt int, rid long,"
                                     " reward double")
    out = group_advantages(df, "prompt", "rid", "reward").collect()
    assert all(r.advantage == 0.0 for r in out)
    assert len(out) == 4


def test_group_advantages_sum_to_zero_and_unit_scale(spark):
    """Within every non-degenerate group, advantages sum to ~0 and
    have ~unit population variance (the GRPO normalization
    contract)."""
    df, truth = _fixture(spark, seed=7)
    rows = group_advantages(df, "prompt", "rid", "reward").collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r.prompt, []).append(r.advantage)
    for g, advs in by_g.items():
        if len(advs) > 1 and truth[g].std() > 1e-9:
            assert abs(sum(advs)) < 5e-5
            assert np.std(advs) == pytest.approx(1.0, abs=1e-4)


def test_best_of_n_and_tiebreak(spark):
    df, truth = _fixture(spark, seed=4)
    got = {r.prompt: (r.best_id, r.best_reward, r.n_candidates)
           for r in best_of_n(df, "prompt", "rid", "reward").collect()}
    for g, rs in truth.items():
        bi = int(np.argmax(rs))
        assert got[g][0] == 100 * g + bi
        assert got[g][1] == pytest.approx(float(rs[bi]), abs=1e-6)
        assert got[g][2] == len(rs)
    # ties go to the SMALLEST id
    d2 = spark.createDataFrame([(0, 5, 2.0), (0, 3, 2.0), (0, 9, 1.0)],
                               "prompt int, rid long, reward double")
    assert best_of_n(d2, "prompt", "rid", "reward") \
        .collect()[0].best_id == 3


def test_dpo_pairs_margin_and_guards(spark):
    df, truth = _fixture(spark, seed=9)
    got = {r.prompt: r for r in
           dpo_pairs(df, "prompt", "rid", "reward").collect()}
    for g, rs in truth.items():
        if len(rs) < 2 or rs.max() == rs.min():
            assert g not in got
        else:
            r = got[g]
            assert r.chosen_id == 100 * g + int(np.argmax(rs))
            assert r.rejected_id == 100 * g + int(np.argmin(rs))
            assert r.margin == pytest.approx(
                float(rs.max() - rs.min()), abs=2e-6)
            assert r.chosen_reward > r.rejected_reward
    # min_margin cut is strict and micro-quantized
    d2 = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 1.4), (1, 1, 1.0), (1, 2, 2.0)],
        "prompt int, rid long, reward double")
    out = dpo_pairs(d2, "prompt", "rid", "reward",
                    min_margin=0.5).collect()
    assert [r.prompt for r in out] == [1]


def test_rlhf_partition_invariant(spark):
    df, _ = _fixture(spark, seed=11)
    a = group_advantages(df, "prompt", "rid", "reward") \
        .orderBy("prompt", "rid").collect()
    b = group_advantages(df.repartition(7), "prompt", "rid", "reward") \
        .orderBy("prompt", "rid").collect()
    assert a == b
    pa = dpo_pairs(df, "prompt", "rid", "reward").collect()
    pb = dpo_pairs(df.repartition(5), "prompt", "rid", "reward") \
        .collect()
    assert pa == pb
