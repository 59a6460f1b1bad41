"""Prefix-filtered Jaccard join (dedup.jaccard_prefix_pairs): lossless
vs the brute-force ngram_jaccard_pairs on every fixture."""

import hashlib

import pytest

from flood_data_spark.datapipe.dedup import (jaccard_prefix_pairs,
                                             ngram_jaccard_pairs,
                                             token_jaccard_pairs)


def _corpus(spark, n_docs=60, seed_tag="jp"):
    """Word-salad docs with planted near-duplicates (suffix edits)."""
    words = ["flood", "river", "basin", "rain", "model", "peak",
             "data", "alert", "grid", "cell"]
    rows = []
    for i in range(n_docs):
        h = int(hashlib.md5(f"{seed_tag}:{i}".encode()).hexdigest(), 16)
        body = " ".join(words[(h >> (3 * j)) % 10]
                        for j in range(5 + h % 10))
        rows.append((2 * i, body))
        if h % 3 == 0:                       # planted near-dup
            rows.append((2 * i + 1, body + " extra"))
    rows += [(10_000, ""), (10_001, None), (10_002, "ab")]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("threshold", [0.5, 0.8])
def test_prefix_matches_brute_force_char(spark, threshold):
    docs = _corpus(spark)
    brute = {(r.id_a, r.id_b): r.jaccard
             for r in ngram_jaccard_pairs(docs, threshold=threshold)
             .collect()}
    fast = {(r.id_a, r.id_b): r.jaccard
            for r in jaccard_prefix_pairs(docs, threshold=threshold,
                                          shingle="char").collect()}
    assert fast == brute
    assert brute                              # fixture actually has pairs


@pytest.mark.parametrize("threshold", [0.5, 0.8])
def test_prefix_matches_brute_force_word(spark, threshold):
    docs = _corpus(spark, seed_tag="jpw")
    brute = {(r.id_a, r.id_b): r.jaccard
             for r in token_jaccard_pairs(docs, threshold=threshold)
             .collect()}
    fast = {(r.id_a, r.id_b): r.jaccard
            for r in jaccard_prefix_pairs(docs, threshold=threshold)
            .collect()}
    assert fast == brute
    assert brute


def test_prefix_matches_brute_force_with_cap(spark):
    docs = _corpus(spark, seed_tag="jpc")
    kw = dict(threshold=0.5, max_doc_freq=20)
    brute = {(r.id_a, r.id_b): r.jaccard
             for r in ngram_jaccard_pairs(docs, **kw).collect()}
    fast = {(r.id_a, r.id_b): r.jaccard
            for r in jaccard_prefix_pairs(docs, shingle="char",
                                          **kw).collect()}
    assert fast == brute


def test_prefix_candidates_shrink(spark):
    """The point of the filter: candidate pairs (docs sharing a PREFIX
    gram) must be far fewer than docs sharing ANY gram."""
    from pyspark.sql import functions as F
    from flood_data_spark.datapipe.dedup import _shingle_rows

    # diverse vocabulary (hex words) — the regime prefix filtering
    # targets; the tiny shared-vocabulary _corpus is its worst case and
    # is covered by the equality tests above
    rows = []
    for i in range(80):
        h = hashlib.md5(f"jps:{i}".encode()).hexdigest()
        body = " ".join(h[j:j + 4] for j in range(0, 28, 4))
        rows.append((i, body + (" sharedtail" if i % 4 == 0 else "")))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    shingles = _shingle_rows(docs, "doc_id", "text", 3)
    all_pairs = (shingles.alias("a")
                 .join(shingles.alias("b"),
                       (F.col("a.gh") == F.col("b.gh"))
                       & (F.col("a.id") < F.col("b.id")))
                 .select("a.id", "b.id").distinct().count())
    # reproduce the operator's candidate relation at threshold 0.8
    from pyspark.sql import Window
    freq = shingles.groupBy("gh").agg(F.count(F.lit(1)).alias("gdf"))
    by_id = Window.partitionBy("id")
    ranked = (shingles.join(freq, "gh")
              .select("id", "gh",
                      F.row_number().over(
                          by_id.orderBy("gdf", "gh")).alias("rn"),
                      F.count(F.lit(1)).over(by_id).alias("sz")))
    prefix = ranked.filter(
        F.col("rn") <= F.col("sz")
        - F.floor(F.col("sz") * F.lit(0.8)) + 1).select("id", "gh")
    cand = (prefix.alias("pa")
            .join(prefix.alias("pb"),
                  (F.col("pa.gh") == F.col("pb.gh"))
                  & (F.col("pa.id") < F.col("pb.id")))
            .select("pa.id", "pb.id").distinct().count())
    assert cand < all_pairs / 2, (cand, all_pairs)


def test_prefix_validation(spark):
    docs = _corpus(spark, n_docs=2)
    with pytest.raises(ValueError, match="threshold"):
        jaccard_prefix_pairs(docs, threshold=0.0)
    with pytest.raises(ValueError, match="threshold"):
        jaccard_prefix_pairs(docs, threshold=1.5)
    with pytest.raises(ValueError, match="shingle"):
        jaccard_prefix_pairs(docs, shingle="byte")
