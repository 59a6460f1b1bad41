"""Shingle document-frequency cap (`_cap_doc_freq`) — the similarity-join
skew guard.

The scenario these tests model is THE failure mode of shingle-based
similarity joins at 100 TB: a boilerplate substring shared by every document
(site header, license blurb) makes each of its shingles appear in all k docs,
so the per-shingle self-join emits O(k²) candidate rows on a single shuffle
key.  With the cap, those shingles are dropped before the join and candidate
volume collapses to the true near-dup pairs.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flood_data_spark.datapipe.dedup import (
    _cap_doc_freq,
    _shingle_rows,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)

BOILER = "all rights reserved worldwide forever"


def _corpus(spark, n_docs=26):
    """n_docs (<= 26) documents sharing ONE boilerplate substring; payloads
    are 12-char runs of a doc-unique letter, so (including the space-boundary
    shingles) no two payloads share a single 3-gram.  Docs 0/1 are a planted
    near-dup pair that still shares payload shingles after capping."""
    assert n_docs <= 26
    rows = []
    for i in range(n_docs):
        payload = chr(ord("a") + i) * 12
        rows.append((i, f"{payload} {BOILER}"))
    # doc 1: doc 0's payload with a one-char tweak → true near-dups even
    # after the boilerplate shingles are capped away
    rows[1] = (1, rows[0][1].replace("aaaa", "aaba", 1))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cap_drops_only_hot_shingles(spark):
    docs = _corpus(spark)
    shingles = _shingle_rows(docs, "doc_id", "text", 3)
    capped = _cap_doc_freq(shingles, max_doc_freq=5)
    freqs = (capped.groupBy("gh").agg(F.count("*").alias("df"))
             .agg(F.max("df")).collect()[0][0])
    assert freqs <= 5
    # discriminative shingles survive: every doc keeps rows
    assert capped.select("id").distinct().count() == docs.count()


def test_candidate_pairs_bounded_under_hot_shingle(spark):
    docs = _corpus(spark, n_docs=26)
    # uncapped: every doc pair shares the boilerplate shingles → full O(k²)
    # candidate blowup (threshold 0 keeps every materialized candidate)
    uncapped = ngram_jaccard_pairs(docs, threshold=0.0)
    assert uncapped.count() == 26 * 25 // 2
    # capped: boilerplate gone, only the planted near-dup pair shares grams
    capped = ngram_jaccard_pairs(docs, threshold=0.0, max_doc_freq=5)
    got = capped.select("id_a", "id_b").collect()
    assert [(r.id_a, r.id_b) for r in got] == [(0, 1)]


def test_capped_jaccard_scores_capped_sets(spark):
    """With the cap on, the score is the Jaccard of the surviving shingle
    sets (intersection AND denominators both capped)."""
    docs = _corpus(spark)
    pair = (ngram_jaccard_pairs(docs, threshold=0.0, max_doc_freq=5)
            .filter((F.col("id_a") == 0) & (F.col("id_b") == 1))
            .collect()[0])
    # ground truth from the two capped shingle sets computed independently
    capped = _cap_doc_freq(_shingle_rows(docs, "doc_id", "text", 3), 5)
    sets = {r.id: set() for r in capped.select("id").distinct().collect()}
    for r in capped.collect():
        sets.setdefault(r.id, set()).add(r.gh)
    inter = len(sets[0] & sets[1])
    expected = inter / (len(sets[0]) + len(sets[1]) - inter)
    assert pair.jaccard == pytest.approx(expected, abs=1e-6)


def test_minhash_lsh_cap_kills_boilerplate_collisions(spark):
    docs = _corpus(spark, n_docs=26)
    # uncapped: the boilerplate dominates min-hashes → spurious band
    # collisions between payload-disjoint docs
    uncapped = minhash_lsh_pairs(docs, num_hashes=32, bands=16)
    capped = minhash_lsh_pairs(docs, num_hashes=32, bands=16, max_doc_freq=5)
    n_uncapped, n_capped = uncapped.count(), capped.count()
    assert n_capped < n_uncapped
    # the planted near-dup still collides after capping
    assert capped.filter((F.col("id_a") == 0) & (F.col("id_b") == 1)).count() == 1


def test_cap_none_is_identity(spark):
    docs = _corpus(spark)
    base = ngram_jaccard_pairs(docs, threshold=0.5)
    again = ngram_jaccard_pairs(docs, threshold=0.5, max_doc_freq=None)
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, again.collect()))


def test_cap_validation(spark):
    docs = _corpus(spark)
    with pytest.raises(ValueError, match="max_doc_freq"):
        ngram_jaccard_pairs(docs, max_doc_freq=0)


def test_simhash_blankness_is_flag_not_signature(spark):
    """simhash() reports blankness via has_tokens, and simhash_dup_pairs
    filters on THAT flag — a legitimate zero signature (all bit votes
    <= 0) must not eject a document from the pairwise path (review
    finding)."""
    from flood_data_spark.datapipe.dedup import simhash

    df = spark.createDataFrame(
        [(1, "real text here"), (2, "   "), (3, "")],
        "doc_id long, text string")
    rows = {r.id: r for r in simhash(df).collect()}
    assert rows[1].has_tokens and rows[1].simhash != 0
    assert not rows[2].has_tokens and rows[2].simhash == 0
    assert not rows[3].has_tokens
