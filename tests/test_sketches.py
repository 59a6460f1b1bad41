"""Sketch corpus statistics: HLL bounds contract holds, heavy hitters match
a hand-computed truth, and the one-pass stats query has no per-column
distinct expand in its plan."""

import pytest
from pyspark.sql import functions as F

from flood_data_spark.datapipe.sketches import (
    cms_build,
    cms_estimate,
    cms_merge,
    corpus_distinct_stats,
    hll_contract,
    token_heavy_hitters,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"alpha beta w{i % 97} w{i % 13}", f"src{i % 7}")
            for i in range(2000)]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_hll_contract_within_bounds(spark, docs):
    row = hll_contract(docs, ["doc_id", "source"]).collect()[0]
    assert row.n_rows == 2000
    assert row.doc_id_distinct == 2000
    assert row.source_distinct == 7
    assert row.doc_id_hll_ok and row.source_hll_ok


def test_corpus_distinct_stats_single_pass_plan(spark, docs):
    stats = corpus_distinct_stats(docs, ["doc_id", "source", "text"])
    row = stats.collect()[0]
    assert row.n_rows == 2000
    # rsd=0.05, 4 sigma slack
    assert abs(row.doc_id_approx_distinct - 2000) <= 0.2 * 2000
    assert abs(row.source_approx_distinct - 7) <= 3
    # the whole summary is ONE aggregate — no Expand node (the plan shape
    # `count(DISTINCT ...)` per column would force)
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_token_heavy_hitters_exact_truth(spark, docs):
    # every doc contributes 4 tokens: alpha, beta appear once per doc each
    # -> fraction 0.25; w{i%97}/w{i%13} are each far below 10%
    out = token_heavy_hitters(docs, min_fraction=0.2).collect()
    assert [r.token for r in out] == ["alpha", "beta"]
    assert all(r.occurrences == 2000 and abs(r.fraction - 0.25) < 1e-9
               for r in out)


def test_token_heavy_hitters_empty_text(spark):
    df = spark.createDataFrame([(0, " "), (1, "")], "doc_id long, text string")
    assert token_heavy_hitters(df, min_fraction=0.01).count() == 0


def test_corpus_report_long_format(spark, docs):
    from flood_data_spark.datapipe.sketches import corpus_report

    rows = {r.metric: r.value for r in corpus_report(docs).collect()}
    assert rows["n_docs"] == 2000.0
    assert rows["n_sources"] == 7.0
    assert rows["n_blank"] == 0.0
    assert rows["total_chars"] > 0
    # fixture has no lang column -> n_langs reported only when present
    assert set(rows) == {"n_docs", "total_chars", "avg_chars", "n_blank",
                         "n_sources"}


@pytest.fixture(scope="module")
def tokens(spark):
    # skewed token frequencies: t0 x 600, t1 x 300, ... long tail of 1s
    rows = ([("t0",)] * 600 + [("t1",)] * 300 + [("t2",)] * 90
            + [(f"tail{i}",) for i in range(400)])
    return spark.createDataFrame(rows, "token string")


def test_cms_never_undercounts(spark, tokens):
    sk = cms_build(tokens, width=256, depth=4)
    exact = tokens.groupBy("token").agg(F.count(F.lit(1)).alias("exact"))
    got = (cms_estimate(sk, exact.select("token"), width=256, depth=4)
           .join(exact, "token").collect())
    assert len(got) == 403
    assert all(r.est >= r.exact for r in got)
    heavy = {r.token: (r.est, r.exact) for r in got if r.exact >= 90}
    # heavy hitters dominate their cells: estimates stay tight
    for est, exact in heavy.values():
        assert est - exact <= 1390 * 3 // 256  # eps*N at e/width, loose


def test_cms_merge_equals_single_build(spark, tokens):
    rows = ([("t0",)] * 600 + [("t1",)] * 300 + [("t2",)] * 90
            + [(f"tail{i}",) for i in range(400)])
    h1 = spark.createDataFrame(rows[:700], "token string")
    h2 = spark.createDataFrame(rows[700:], "token string")
    merged = cms_merge(cms_build(h1, width=128, depth=3),
                       cms_build(h2, width=128, depth=3))
    full = cms_build(tokens, width=128, depth=3)
    a = {(r.row, r.col): r.cnt for r in merged.collect()}
    b = {(r.row, r.col): r.cnt for r in full.collect()}
    assert a == b


def test_cms_weighted_and_guards(spark):
    df = spark.createDataFrame([("a", 5), ("a", 7), ("b", 1)],
                               "token string, w int")
    sk = cms_build(df, width=64, depth=2, weight_col="w")
    got = {r.token: r.est
           for r in cms_estimate(sk, df.select("token").distinct(),
                                 width=64, depth=2).collect()}
    assert got["a"] >= 12 and got["b"] >= 1
    with pytest.raises(ValueError, match="width"):
        cms_build(df, width=1)
    with pytest.raises(ValueError, match="width"):
        cms_estimate(sk, df, width=64, depth=0)


def test_cms_sketch_is_bounded(spark, tokens):
    sk = cms_build(tokens, width=64, depth=3)
    assert sk.count() <= 64 * 3
    # probe join broadcasts the sketch, not the keys
    plan = cms_estimate(sk, tokens.select("token").distinct(),
                        width=64, depth=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_cms_estimate_rejects_mismatched_depth(spark, tokens):
    sk = cms_build(tokens, width=64, depth=3)
    with pytest.raises(ValueError, match="parameters must match"):
        cms_estimate(sk, tokens.select("token").distinct(),
                     width=64, depth=4).collect()
    with pytest.raises(ValueError, match="parameters must match"):
        cms_estimate(sk, tokens.select("token").distinct(),
                     width=32, depth=3).collect()
