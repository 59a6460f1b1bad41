"""Sketch corpus statistics: HLL bounds contract holds, heavy hitters match
a hand-computed truth, and the one-pass stats query has no per-column
distinct expand in its plan."""

import pytest
from pyspark.sql import functions as F

from flood_data_spark.datapipe.sketches import (
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
