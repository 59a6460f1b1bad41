"""BPE tokenizer training (datapipe/bpe.py) — classic hand-computed goldens."""

import pytest

from pyspark.sql import functions as F

from flood_data_spark.datapipe.bpe import (
    bpe_encode, bpe_train, pair_counts, word_frequencies, _char_symbols)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_word_frequencies_lowercases_and_splits(spark):
    docs = _docs(spark, ["Hug hug, HUG! pug 42 pun"])
    wf = {r.word: r.freq for r in word_frequencies(docs).collect()}
    assert wf == {"hug": 3, "pug": 1, "pun": 1}


def test_pair_counts_weighted_by_freq(spark):
    docs = _docs(spark, ["hug hug hug pug"])
    wf = (word_frequencies(docs)
          .select(_char_symbols(F.col("word")).alias("symbols"), "freq"))
    pc = {(r.left, r.right): r.pair_count
          for r in pair_counts(wf).collect()}
    assert pc == {("h", "u"): 3, ("u", "g"): 4, ("p", "u"): 1}


def test_train_classic_example(spark):
    # the textbook corpus: hug x5, pug x2, hugs x2, pun x3, bun x1
    docs = _docs(spark, ["hug hug hug hug hug pug pug "
                         "hugs hugs pun pun pun bun"])
    merges, vocab = bpe_train(docs, n_merges=4)
    assert merges == [("u", "g", 9), ("h", "ug", 7),
                      ("u", "n", 4), ("p", "un", 3)]
    v = {r.symbol: r.freq for r in vocab.collect()}
    assert v["hug"] == 7 and v["pun"] == 3 and v["ug"] == 2


def test_merge_is_greedy_left_to_right_non_overlapping(spark):
    # Sennrich semantics: 'aaaa' under rule (a,a) -> ['aa','aa'],
    # 'aaa' -> ['aa','a']
    docs = _docs(spark, ["aaaa aaa"])
    merges, _ = bpe_train(docs, n_merges=1)
    assert merges[0][:2] == ("a", "a")
    enc = bpe_encode(docs, merges)
    assert enc.first().bpe_tokens == ["aa", "aa", "aa", "a"]


def test_encode_replays_merges_in_order(spark):
    docs = _docs(spark, ["hug hug hug hug hug pug pug "
                         "hugs hugs pun pun pun bun"])
    merges, _ = bpe_train(docs, n_merges=4)
    toks = bpe_encode(_docs(spark, ["hugs bun"]), merges) \
        .first().bpe_tokens
    assert toks == ["hug", "s", "b", "un"]


def test_train_zero_merges_and_guard(spark):
    docs = _docs(spark, ["ab ab"])
    merges, vocab = bpe_train(docs, n_merges=0)
    assert merges == []
    assert {r.symbol for r in vocab.collect()} == {"a", "b"}
    with pytest.raises(ValueError):
        bpe_train(docs, n_merges=-1)


def test_train_stops_when_no_pairs_remain(spark):
    # single-char words: zero adjacent pairs, trainer stops early
    docs = _docs(spark, ["a b a b a"])
    merges, _ = bpe_train(docs, n_merges=5)
    assert merges == []


def test_determinism_across_partitionings(spark):
    docs = _docs(spark, ["spark shuffle spark scan shuffle spark",
                         "scan window shuffle window spark scan"])
    m1, _ = bpe_train(docs.repartition(7), n_merges=5)
    m2, _ = bpe_train(docs.coalesce(1), n_merges=5)
    assert m1 == m2


def test_dict_encoder_matches_per_row_encoder(spark):
    from flood_data_spark.datapipe.bpe import bpe_encode_with_dict
    docs = _docs(spark, ["hug hug hug hug hug pug pug "
                         "hugs hugs pun pun pun bun",
                         "pun hugs bun hug",
                         "",            # zero-word doc -> [] tokens
                         "42 !!"])      # no alphabetic words -> [] tokens
    merges, _ = bpe_train(docs.filter(F.col("doc_id") == 0), n_merges=4)
    a = {r.doc_id: r.bpe_tokens
         for r in bpe_encode(docs, merges).collect()}
    b = {r.doc_id: r.bpe_tokens
         for r in bpe_encode_with_dict(docs, merges).collect()}
    assert a == b
    assert b[2] == [] and b[3] == []


def test_dict_encoder_broadcasts_dictionary(spark):
    from flood_data_spark.datapipe.bpe import bpe_encode_with_dict
    docs = _docs(spark, ["hug pug pun"] * 3)
    merges, _ = bpe_train(docs, n_merges=2)
    plan = bpe_encode_with_dict(docs, merges)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_dict_encoder_keeps_duplicate_rows_distinct(spark):
    from flood_data_spark.datapipe.bpe import bpe_encode_with_dict
    # two fully identical rows must each keep their own token stream
    docs = spark.createDataFrame([("hug pug",), ("hug pug",)],
                                 "text string")
    merges = [("u", "g", 2)]
    out = bpe_encode_with_dict(docs, merges).collect()
    assert len(out) == 2
    assert all(r.bpe_tokens == ["h", "ug", "p", "ug"] for r in out)
