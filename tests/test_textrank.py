"""TextRank keywords (datapipe/text.textrank_keywords) — hand-computed
iteration goldens and graph-construction tests."""

import pytest

from flood_data_spark.datapipe.text import textrank_keywords


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_symmetric_two_word_graph_is_fixed_point(spark):
    # "a b a b": single edge (a,b) w=3 — symmetric, rank stays 1e6
    df = _docs(spark, [(1, "a b a b")])
    got = {r.keyword: (r.rank_mu, r.pos)
           for r in textrank_keywords(df, n_iter=3, k=5).collect()}
    assert got == {"a": (1_000_000, 1), "b": (1_000_000, 2)}


def test_one_iteration_hand_computed(spark):
    # "a b c b": edges (a,b):1, (b,c):2, (a,c):1
    # wdeg a=2, b=3, c=3; after one damped round:
    #   s_a = round(1e6/3)*2 = 666666 -> r_a = round(.15e6 + .85*666666)
    #   s_b = s_c = 500000 + 666667 = 1166667
    df = _docs(spark, [(1, "a b c b")])
    got = {r.keyword: (r.rank_mu, r.pos)
           for r in textrank_keywords(df, n_iter=1, k=5).collect()}
    assert got["a"][0] == 716666
    assert got["b"][0] == got["c"][0] == 1141667
    # tie between b and c breaks alphabetically
    assert got["b"][1] == 1 and got["c"][1] == 2 and got["a"][1] == 3


def test_hub_word_outranks_peripheral(spark):
    # 'the' co-occurs with everything — highest rank
    df = _docs(spark, [(1, "the cat the dog the bird")])
    top = textrank_keywords(df, n_iter=3, k=1).collect()
    assert len(top) == 1 and top[0].keyword == "the"


def test_single_word_doc_yields_nothing(spark):
    df = _docs(spark, [(1, "solo"), (2, ""), (3, "a b")])
    got = textrank_keywords(df, n_iter=2, k=5).collect()
    assert {r.doc_id for r in got} == {3}


def test_documents_are_independent(spark):
    df = _docs(spark, [(1, "x y x y"), (2, "p q r q p")])
    got = textrank_keywords(df, n_iter=2, k=5).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, set()).add(r.keyword)
    assert by_doc[1] == {"x", "y"}
    assert by_doc[2] == {"p", "q", "r"}


def test_validation(spark):
    df = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError, match="must all"):
        textrank_keywords(df, n_iter=0)
    with pytest.raises(ValueError, match="damping"):
        textrank_keywords(df, damping=1.5)
