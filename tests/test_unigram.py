"""Unigram tokenizer (datapipe/unigram.py) — Viterbi goldens,
seed-vocabulary closed forms, EM prune/floor semantics."""

import math

import pytest

from flood_data_spark.datapipe.unigram import (
    em_reestimate, seed_vocabulary, viterbi_segment, word_table)


def _words(spark, rows):
    return spark.createDataFrame(rows, "word string, freq long")


def _pieces(spark, rows):
    return spark.createDataFrame(rows, "piece string, cost_micro long")


def test_viterbi_optimal_segmentation(spark):
    words = _words(spark, [("ab", 1), ("aab", 1), ("abab", 1)])
    pieces = _pieces(spark, [("a", 100), ("b", 100), ("ab", 150)])
    got = {r.word: (r.pieces, r.total_cost_micro)
           for r in viterbi_segment(words, pieces,
                                    max_piece_len=3).collect()}
    assert got["ab"] == (["ab"], 150)
    assert got["aab"] == (["a", "ab"], 250)
    assert got["abab"] == (["ab", "ab"], 300)


def test_viterbi_tie_prefers_longest_piece(spark):
    words = _words(spark, [("ab", 1)])
    pieces = _pieces(spark, [("a", 100), ("b", 100), ("ab", 200)])
    row = viterbi_segment(words, pieces, max_piece_len=2).collect()[0]
    assert row.pieces == ["ab"] and row.total_cost_micro == 200


def test_viterbi_uncoverable_and_overlong_words(spark):
    words = _words(spark, [("zq", 1), ("a" * 20, 1)])
    pieces = _pieces(spark, [("a", 100)])
    got = {r.word: r.pieces
           for r in viterbi_segment(words, pieces,
                                    max_word_len=12).collect()}
    assert got["zq"] is None          # 'q' not in vocab
    assert got["a" * 20] is None      # over max_word_len


def test_seed_vocabulary_closed_form(spark):
    words = _words(spark, [("ab", 2)])
    got = {r.piece: (r.freq, r.cost_micro)
           for r in seed_vocabulary(words, max_piece_len=4,
                                    top_multichar=8).collect()}
    # chars a, b each weighted 2; char mass 4; 'ab' weighted 2
    assert got["a"][0] == 2 and got["b"][0] == 2 and got["ab"][0] == 2
    assert got["a"][1] == round(-math.log(2 / 4) * 1_000_000)


def test_em_prunes_unused_and_floors_chars(spark):
    words = _words(spark, [("ab", 5)])
    # 'ab' piece is cheapest -> only segmentation used; 'xy'-style
    # multichar junk ('ba') must prune, chars keep the +1 floor
    pieces = _pieces(spark, [("a", 100), ("b", 100), ("ab", 150),
                             ("ba", 150)])
    got = {r.piece: r["count"] for r in em_reestimate(words, pieces,
                                                      max_piece_len=2)
           .collect()}
    assert got["ab"] == 5             # used by the one word, freq 5
    assert got["a"] == 1 and got["b"] == 1   # unused chars floor at 1
    assert "ba" not in got            # unused multichar pruned


def test_word_table_counts(spark):
    docs = spark.createDataFrame([(1, "x y x"), (2, "  y  ")],
                                 "doc_id long, text string")
    got = {r.word: r.freq for r in word_table(docs).collect()}
    assert got == {"x": 2, "y": 2}


def test_validation(spark):
    w = _words(spark, [("a", 1)])
    p = _pieces(spark, [("a", 1)])
    with pytest.raises(ValueError, match="lengths"):
        viterbi_segment(w, p, max_word_len=0)
    with pytest.raises(ValueError, match="max_piece_len"):
        seed_vocabulary(w, max_piece_len=1)
