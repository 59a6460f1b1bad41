"""Incremental (batch-vs-corpus) dedup: dedup_against exact anti-join and
ngram_jaccard_join cross-relation similarity (datapipe/dedup.py)."""

import pytest

from pyspark.sql import functions as F

from flood_data_spark.datapipe.dedup import (
    dedup_against, ngram_jaccard_join, ngram_jaccard_pairs)


@pytest.fixture(scope="module")
def corpus(spark):
    ref = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "pack my box with five dozen liquor jugs"),
         (2, "sphinx of black quartz judge my vow")],
        "doc_id long, text string")
    batch = spark.createDataFrame(
        [(10, "The quick brown   fox jumps over the lazy dog"),  # dup of 0 (normalized)
         (11, "a genuinely new document about spark"),
         (12, "a genuinely new document about spark"),            # in-batch dup of 11
         (13, "pack my box with five dozen liquor jugs"),         # dup of 1
         (14, "completely novel text with no twin")],
        "doc_id long, text string")
    return ref, batch


def test_dedup_against_drops_ref_dups_and_batch_dups(spark, corpus):
    ref, batch = corpus
    out = dedup_against(batch, ref)
    assert sorted(r.doc_id for r in out.collect()) == [11, 14]
    assert out.columns == batch.columns     # schema preserved


def test_dedup_against_without_normalization(spark, corpus):
    ref, batch = corpus
    out = dedup_against(batch, ref, normalize=False)
    # doc 10 differs in case/whitespace from doc 0 → survives raw
    assert sorted(r.doc_id for r in out.collect()) == [10, 11, 14]


def test_dedup_against_empty_reference_is_batch_dedup(spark, corpus):
    _, batch = corpus
    empty = spark.createDataFrame([], "doc_id long, text string")
    out = dedup_against(batch, empty)
    assert sorted(r.doc_id for r in out.collect()) == [10, 11, 13, 14]


def test_ngram_jaccard_join_matches_self_join_on_split_corpus(spark):
    """Splitting one corpus into two relations and cross-joining must find
    exactly the cross pairs the self-join finds."""
    rows = [(i, f"document number {i} about shared spark topics common text")
            for i in range(10)]
    rows += [(100 + i, f"document number {i} about shared spark topics common text")
             for i in range(5)]  # near/exact twins of 0..4 across the split
    df = spark.createDataFrame(rows, "doc_id long, text string")
    left = df.filter(F.col("doc_id") < 100)
    right = df.filter(F.col("doc_id") >= 100)
    cross = {(r.id_l, r.id_r, r.jaccard) for r in
             ngram_jaccard_join(left, right, threshold=0.5).collect()}
    full = {(r.id_a, r.id_b, r.jaccard) for r in
            ngram_jaccard_pairs(df, threshold=0.5).collect()
            if r.id_a < 100 <= r.id_b}
    assert cross == full
    assert (0, 100, 1.0) in cross           # exact twin scores 1.0


def test_ngram_jaccard_join_doc_freq_cap(spark):
    boiler = "shared boilerplate header line common to every doc "
    left = spark.createDataFrame(
        [(i, boiler + f"left unique {i}") for i in range(8)],
        "doc_id long, text string")
    right = spark.createDataFrame(
        [(100 + i, boiler + f"right unique {i}") for i in range(8)],
        "doc_id long, text string")
    uncapped = ngram_jaccard_join(left, right, threshold=0.5)
    capped = ngram_jaccard_join(left, right, threshold=0.5, max_doc_freq=4)
    # boilerplate makes EVERY cross pair look similar (8x8 all above 0.5);
    # with hot shingles capped, similarity is scored over discriminative
    # shingles only — exactly the digit-twin pairs (i, 100+i) survive
    assert uncapped.count() == 64
    assert sorted((r.id_l, r.id_r) for r in capped.collect()) == \
        [(i, 100 + i) for i in range(8)]


def test_corpus_diff_statuses(spark):
    from flood_data_spark.datapipe.dedup import corpus_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(2, "b"), (3, "C2"), (4, "d")], "doc_id long, text string")
    rows = {r.doc_id: r for r in corpus_diff(old, new).collect()}
    assert rows[1].status == "removed" and rows[1].new_digest is None
    assert rows[2].status == "unchanged"
    assert rows[3].status == "changed" \
        and rows[3].old_digest != rows[3].new_digest
    assert rows[4].status == "added" and rows[4].old_digest is None


def test_corpus_diff_null_text_is_presence_not_absence(spark):
    """NULL text != missing row: same-id NULL->NULL is unchanged,
    NULL->text is changed (review finding: digest-null conflation)."""
    from flood_data_spark.datapipe.dedup import corpus_diff

    old = spark.createDataFrame([(1, None), (2, None)],
                                "doc_id long, text string")
    new = spark.createDataFrame([(1, None), (2, "now real")],
                                "doc_id long, text string")
    rows = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    assert rows[1] == "unchanged"
    assert rows[2] == "changed"


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    """Every true duplicate must be flagged maybe-seen (Bloom's no-false-
    negative guarantee); false-positive rate stays near theory."""
    from flood_data_spark.datapipe.dedup import (
        bloom_bits, bloom_dedup_against, with_bloom_seen)

    ref = spark.createDataFrame([(i, f"ref doc {i}") for i in range(200)],
                                "doc_id long, text string")
    # batch: 50 true dups of ref + 150 fresh
    rows = [(1000 + i, f"ref doc {i}") for i in range(50)]
    rows += [(2000 + i, f"fresh doc {i}") for i in range(150)]
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    bits = bloom_bits(ref, n_bits=1 << 14, n_hashes=4)
    flagged = {r.doc_id: r.bloom_maybe_seen for r in
               with_bloom_seen(batch, bits, n_bits=1 << 14, n_hashes=4)
               .collect()}
    assert all(flagged[1000 + i] for i in range(50))      # no false negs
    fp = sum(1 for i in range(150) if flagged[2000 + i]) / 150
    # m/n = 16384/200 -> theoretical fp ~ (1-e^(-4*200/16384))^4 ~ 5e-6
    assert fp <= 0.02
    kept = bloom_dedup_against(batch, ref, n_bits=1 << 14, n_hashes=4)
    ids = {r.doc_id for r in kept.collect()}
    assert not any(1000 + i in ids for i in range(50))
    assert len(ids) >= 148                                # ~all fresh kept


def test_bloom_normalization_matches_dedup_against(spark):
    """Whitespace/case variants of a reference doc count as duplicates
    under normalize=True — same key as dedup_against."""
    from flood_data_spark.datapipe.dedup import bloom_dedup_against

    ref = spark.createDataFrame([(0, "Hello   World")],
                                "doc_id long, text string")
    batch = spark.createDataFrame([(1, "  hello world "), (2, "other")],
                                  "doc_id long, text string")
    kept = {r.doc_id for r in bloom_dedup_against(batch, ref).collect()}
    assert kept == {2}


def test_bloom_bits_param_guard(spark):
    from flood_data_spark.datapipe.dedup import bloom_bits

    ref = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n_bits"):
        bloom_bits(ref, n_bits=1, n_hashes=0)


def test_bloom_unioned_bits_do_not_duplicate_rows(spark):
    """Incremental maintenance (union of two bits relations) repeats
    shared positions; the probe must not fan batch rows out."""
    from flood_data_spark.datapipe.dedup import bloom_bits, with_bloom_seen

    ref = spark.createDataFrame([(0, "shared doc")],
                                "doc_id long, text string")
    bits = bloom_bits(ref, n_bits=256, n_hashes=4).union(
        bloom_bits(ref, n_bits=256, n_hashes=4))
    batch = spark.createDataFrame([(1, "shared doc"), (2, "new doc")],
                                  "doc_id long, text string")
    rows = with_bloom_seen(batch, bits, n_bits=256, n_hashes=4).collect()
    assert len(rows) == 2                      # no fan-out
    flags = {r.doc_id: r.bloom_maybe_seen for r in rows}
    assert flags[1] is True
