"""Naive Bayes + chi2 feature selection (datapipe/bayes.py) —
closed-form and invariant tests."""

import math

import pytest

from pyspark.sql import functions as F

from flood_data_spark.datapipe.bayes import (
    MU, chi2_terms, naive_bayes_score, naive_bayes_train)


def _mu(x):
    return round(math.log(x) * MU)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, "
                                       "label string")


def test_nb_train_closed_form(spark):
    docs = _docs(spark, [(1, "a a b", "x"), (2, "b b", "y")])
    terms, classes = naive_bayes_train(docs, alpha=0.5)
    tw = {(r.term, r.label): r.w_mu for r in terms.collect()}
    # V = 2, one unseen slot -> denominator N_c + 0.5 * 3
    assert tw[("a", "x")] == _mu(2.5 / 4.5)
    assert tw[("b", "x")] == _mu(1.5 / 4.5)
    assert tw[("b", "y")] == _mu(2.5 / 3.5)
    assert ("a", "y") not in tw
    cl = {r.label: (r.n_docs, r.prior_mu, r.w0_mu)
          for r in classes.collect()}
    assert cl["x"] == (1, _mu(0.5), _mu(0.5 / 4.5))
    assert cl["y"] == (1, _mu(0.5), _mu(0.5 / 3.5))


def test_nb_score_matches_manual_sum(spark):
    train = _docs(spark, [(1, "a a b", "x"), (2, "b b", "y")])
    terms, classes = naive_bayes_train(train, alpha=0.5)
    test = _docs(spark, [(10, "a b c", None)])  # c is unseen everywhere
    got = {(r.doc_id, r.label): (r.score_mu, r.predicted)
           for r in naive_bayes_score(
               test.select("doc_id", "text"), terms, classes).collect()}
    sx = _mu(0.5) + _mu(2.5 / 4.5) + _mu(1.5 / 4.5) + _mu(0.5 / 4.5)
    sy = _mu(0.5) + _mu(0.5 / 3.5) + _mu(2.5 / 3.5) + _mu(0.5 / 3.5)
    assert got[(10, "x")][0] == sx
    assert got[(10, "y")][0] == sy
    assert got[(10, "x")][1] == (sx > sy)
    assert got[(10, "y")][1] == (sy > sx)


def test_nb_predicts_dominant_class_and_tiebreak(spark):
    train = _docs(spark, [(1, "cat cat dog", "pets"),
                          (2, "cat dog dog", "pets"),
                          (3, "tax form money", "finance"),
                          (4, "money tax", "finance")])
    terms, classes = naive_bayes_train(train)
    test = _docs(spark, [(10, "cat dog", None), (11, "tax money", None),
                         (12, "zzz", None)])
    got = {r.doc_id: r.label
           for r in naive_bayes_score(test.select("doc_id", "text"),
                                      terms, classes)
           .filter("predicted").collect()}
    assert got[10] == "pets" and got[11] == "finance"
    # doc 12: all-unseen token — equal-prior classes tie on the unseen
    # weight only when their vocab-normalizers match; either way exactly
    # ONE predicted row exists (lexicographic tie-break)
    assert 12 in got


def test_nb_guards_and_empty_text(spark):
    docs = _docs(spark, [(1, "a", "x"), (2, None, "y")])
    terms, classes = naive_bayes_train(docs)  # NULL text = empty doc
    assert classes.filter("label = 'y'").first().n_docs == 1
    with pytest.raises(ValueError, match="alpha"):
        naive_bayes_train(docs, alpha=0.0)
    with pytest.raises(ValueError, match="NULL"):
        naive_bayes_train(_docs(spark, [(1, "a", None)]))


def test_nb_deterministic_across_partitionings(spark):
    rows = [(i, f"w{i % 7} w{i % 3} common", "x" if i % 2 else "y")
            for i in range(40)]
    d = _docs(spark, rows)
    outs = []
    for df in (d.coalesce(1), d.repartition(8)):
        terms, classes = naive_bayes_train(df)
        outs.append({(r.doc_id, r.label): (r.score_mu, r.predicted)
                     for r in naive_bayes_score(
                         df.select("doc_id", "text"), terms,
                         classes).collect()})
    assert outs[0] == outs[1]


def _chi2(a, b, n_pos, n_neg):
    n = n_pos + n_neg
    num = n * (a * (n_neg - b) - b * (n_pos - a)) ** 2
    den = (a + b) * (n - (a + b)) * n_pos * n_neg
    return round(num / den, 6)


def test_chi2_closed_form_and_filters(spark):
    rows = [(1, "hot alpha", 1), (2, "hot beta", 1), (3, "cold alpha", 0),
            (4, "cold beta", 0), (5, "hot alpha", 1), (6, "cold beta", 0)]
    d = spark.createDataFrame(rows, "doc_id long, text string, label int")
    got = {r.term: (r.df_pos, r.df_neg, r.chi2)
           for r in chi2_terms(d, top_k=10, min_df=1).collect()}
    # 'hot' appears in all 3 positives, 0 negatives: perfectly dependent
    assert got["hot"] == (3, 0, _chi2(3, 0, 3, 3))
    assert got["cold"] == (0, 3, _chi2(0, 3, 3, 3))
    assert got["alpha"] == (2, 1, _chi2(2, 1, 3, 3))
    assert got["hot"][2] == 6.0  # N when perfectly dependent


def test_chi2_ordering_topk_and_degenerate_terms(spark):
    rows = [(i, f"always tag{i % 2}", i % 2) for i in range(20)]
    d = spark.createDataFrame(rows, "doc_id long, text string, label int")
    out = chi2_terms(d, top_k=2).collect()
    # 'always' is in EVERY doc -> degenerate, dropped; tag0/tag1 lead
    assert [r.term for r in out] == ["tag0", "tag1"]
    assert out[0].chi2 == out[1].chi2 == 20.0
    # NULL labels are excluded from the table entirely
    rows.append((99, "always tag0", None))
    d2 = spark.createDataFrame(rows, "doc_id long, text string, label int")
    assert {r.term for r in chi2_terms(d2, top_k=5).collect()} \
        == {"tag0", "tag1"}
