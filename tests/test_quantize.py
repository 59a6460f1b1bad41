"""Int8 embedding quantization: bounded reconstruction error, degenerate
inputs, byte-width of the persisted codes, and top-k recall of the
quantized brute-force twin against the exact ranking."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from flood_data_spark.datapipe.quantize import (
    cosine_topk_quantized,
    dequantize_col,
    quantize_embeddings,
)
from flood_data_spark.datapipe.similarity import cosine_topk_bruteforce


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(0, 2.0, 16)]) for i in range(200)]
    rows.append((200, [0.0] * 16))  # all-zero vector (padding / failed encoder)
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_roundtrip_error_bounded_by_half_scale(spark, emb):
    q = quantize_embeddings(emb)
    err = q.select(
        F.aggregate(
            F.zip_with(dequantize_col(F.col("qvec"), F.col("qscale")),
                       F.col("embedding"),
                       lambda d, o: F.abs(d - o)),
            F.lit(0.0), lambda acc, e: F.greatest(acc, e)).alias("max_err"),
        F.col("qscale")).collect()
    for r in err:
        assert r.max_err <= r.qscale / 2 + 1e-12


def test_codes_span_int8_and_zero_vector_is_safe(spark, emb):
    q = quantize_embeddings(emb)
    stats = q.select(
        F.array_max(F.col("qvec")).alias("hi"),
        F.array_min(F.col("qvec")).alias("lo"),
        F.col("vec_id")).collect()
    assert all(-127 <= r.lo <= r.hi <= 127 for r in stats)
    zero = [r for r in stats if r.vec_id == 200][0]
    assert zero.hi == 0 and zero.lo == 0
    # max-|v| component of every nonzero vector must hit ±127 (full range)
    full = q.filter("vec_id < 200").select(
        F.greatest(F.array_max("qvec"), -F.array_min("qvec")).alias("m")).collect()
    assert all(r.m == 127 for r in full)


def test_persisted_codes_are_one_byte(spark, emb, tmp_path):
    path = str(tmp_path / "q")
    quantize_embeddings(emb).drop("embedding").write.parquet(path)
    back = spark.read.parquet(path)
    [qvec_field] = [f for f in back.schema.fields if f.name == "qvec"]
    assert qvec_field.dataType.elementType.typeName() == "byte"


def test_quantized_topk_recall_against_exact(spark, emb):
    queries = emb.filter("vec_id < 10")
    exact = cosine_topk_bruteforce(emb, queries, k=5)
    quant = cosine_topk_quantized(emb, queries, k=5)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in quant.collect()}
    # int8 on 16-dim gaussians: ranking perturbed only within quantization
    # noise -> overlap stays high
    assert len(e & a) / len(e) >= 0.9


def test_full_code_range_on_subunit_vectors(spark):
    """L2-normalized embeddings have max|v| < 1; the scale floor must be an
    epsilon (all-zero guard), not a 1.0 clamp that collapses sub-unit
    vectors onto a handful of code levels (ADVICE r5, high severity)."""
    df = spark.createDataFrame(
        [(1, [0.1, -0.05, 0.02]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>")
    rows = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    # max|v| = 0.1 -> scale = 0.1/127; the max component must hit code 127
    assert max(abs(c) for c in rows[1].qvec) == 127
    assert abs(rows[1].qscale - 0.1 / 127.0) < 1e-12
    # all-zero vector: codes all zero, finite scale, exact reconstruction
    assert all(c == 0 for c in rows[2].qvec)
    deq = [c * rows[2].qscale for c in rows[2].qvec]
    assert deq == [0.0, 0.0, 0.0]
