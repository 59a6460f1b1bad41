"""Curation operators: deterministic hash sampling, chunking, sequence
packing, per-key caps (datapipe/curation.py)."""

import pytest

from pyspark.sql import functions as F

from flood_data_spark.datapipe.curation import (
    cap_per_key,
    chunk_documents,
    hash_cut,
    hash_sample,
    pack_sequences,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"src{i % 4}", "tok " * (10 + (i % 7) * 30)) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_hash_sample_deterministic_and_partition_independent(spark, docs):
    a = sorted(r.doc_id for r in hash_sample(docs, 0.3).collect())
    b = sorted(r.doc_id for r in
               hash_sample(docs.repartition(7), 0.3).collect())
    assert a == b          # same keys regardless of layout / rerun
    assert 0.15 * 200 < len(a) < 0.45 * 200   # rate honored (±noise)


def test_hash_sample_salts_give_different_samples(spark, docs):
    a = {r.doc_id for r in hash_sample(docs, 0.3, salt="s1").collect()}
    b = {r.doc_id for r in hash_sample(docs, 0.3, salt="s2").collect()}
    assert a != b


def test_hash_sample_rate_edges(spark, docs):
    assert hash_sample(docs, 0.0).count() == 0
    assert hash_sample(docs, 1.0).count() == 200
    with pytest.raises(ValueError, match="rate"):
        hash_cut(1.5)


def test_chunk_documents_covers_text_with_overlap(spark):
    text = "abcdefghijklmnopqrstuvwxyz" * 10   # 260 chars
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = (chunk_documents(df, chunk_size=100, overlap=20)
           .orderBy("chunk_id").collect())
    # stride 80: ceil((260-20)/80) = 3 chunks
    assert [r.chunk_id for r in out] == [0, 1, 2]
    assert out[0].chunk_text == text[0:100]
    assert out[1].chunk_text == text[80:180]
    assert out[2].chunk_text == text[160:260]
    # consecutive chunks agree on the overlap region
    assert out[0].chunk_text[-20:] == out[1].chunk_text[:20]
    # stitching chunk strides reconstructs the document exactly
    assert "".join(r.chunk_text[:80] for r in out[:-1]) + out[-1].chunk_text \
        == text


def test_chunk_documents_short_and_empty_docs(spark):
    df = spark.createDataFrame([(1, "short"), (2, "")],
                               "doc_id long, text string")
    out = {r.doc_id: r for r in chunk_documents(df, 100, 20).collect()}
    assert out[1].chunk_text == "short" and out[1].chunk_id == 0
    assert out[2].chunk_text == "" and out[2].chunk_chars == 0
    assert len(out) == 2   # no rows silently dropped


def test_chunk_documents_validates_overlap(spark, docs):
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_size=50, overlap=50)


def test_pack_sequences_first_fit_by_order(spark):
    rows = [(i, "s", 100) for i in range(10)]   # 100 tokens each
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out = {r.doc_id: r.pack_id for r in
           pack_sequences(df, token_budget=250).collect()}
    # cumulative-before: 0,100,200,300,... → packs 0,0,0,1,1,2,2,2,3,3
    assert [out[i] for i in range(10)] == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]


def test_pack_sequences_partitioned_per_source(spark):
    rows = [(i, f"s{i % 2}", 100) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out = pack_sequences(df, token_budget=250)
    # each source packs independently from zero
    firsts = (out.groupBy("source").agg(F.min("pack_id").alias("m"))
              .collect())
    assert all(r.m == 0 for r in firsts)


def test_pack_sequences_oversized_doc_gets_own_room(spark):
    df = spark.createDataFrame([(0, "s", 1000), (1, "s", 10)],
                               "doc_id long, source string, n_tokens long")
    out = {r.doc_id: r.pack_id for r in
           pack_sequences(df, token_budget=100).collect()}
    assert out[0] == 0 and out[1] == 10   # next doc lands past the big one


def test_cap_per_key_keeps_first_n(spark, docs):
    out = cap_per_key(docs, cap=5)
    assert out.columns == docs.columns     # helper column dropped
    per = out.groupBy("source").count().collect()
    assert all(r["count"] == 5 for r in per)
    kept = sorted(r.doc_id for r in out.filter("source = 'src0'").collect())
    assert kept == [0, 4, 8, 12, 16]       # first 5 in doc_id order
