"""Int8 scalar quantization for embedding columns (array<float/double>).

100 TB rationale: embeddings dominate corpus bytes (a 1024-dim float32
vector is 4 KB/row; the text it encodes is often smaller).  Symmetric
per-vector int8 — q[i] = round(v[i] / s), s = max|v| / 127 — cuts vector
bytes 4× vs float32 / 8× vs double, shrinking every downstream scan,
shuffle, and broadcast in the ANN/near-dup operators; reconstruction error
is bounded by s/2 per component.  All pure JVM Column expressions
(transform/aggregate folds) — no UDFs, quantization is deterministic, so
the DuckDB oracle reproduces the exact int8 codes.

No reference analog (the reference has no embedding operators); part of the
beyond-reference datapipe inventory (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flood_data_spark.datapipe.similarity import _as_double, cosine_similarity


def quantize_embeddings(df: DataFrame, vec_col: str = "embedding",
                        q_col: str = "qvec",
                        scale_col: str = "qscale") -> DataFrame:
    """Attach (int8 codes, per-vector scale) for `vec_col`.

    Symmetric quantization: scale = max|v| / 127 so codes span the full
    [-127, 127] range whatever the vector's magnitude — L2-normalized
    embeddings routinely have max|v| << 1, so the floor on the scale is an
    epsilon guard against the all-zero vector ONLY (codes all 0,
    dequantizes back to exact zeros), never a clamp that would collapse
    sub-unit vectors onto a few code levels.  The original column is
    kept — drop it at persist time to realize the byte savings::

        quantize_embeddings(emb).drop("embedding").write.parquet(idx)
    """
    v = _as_double(F.col(vec_col))
    maxabs = F.aggregate(v, F.lit(0.0),
                         lambda acc, x: F.greatest(acc, F.abs(x)))
    out = df.withColumn(scale_col,
                        F.greatest(maxabs, F.lit(1e-30)) / F.lit(127.0))
    return out.withColumn(
        q_col,
        F.transform(_as_double(F.col(vec_col)),
                    lambda x: F.round(x / F.col(scale_col)).cast("tinyint")))


def dequantize_col(q_col, scale_col) -> Column:
    """array<double> reconstruction: q[i] * scale."""
    return F.transform(q_col, lambda q: q.cast("double") * scale_col)


def cosine_topk_quantized(corpus: DataFrame, queries: DataFrame, k: int = 5,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          broadcast_queries: bool = True) -> DataFrame:
    """Brute-force cosine top-k with the CORPUS side int8-quantized — the
    compressed twin of `cosine_topk_bruteforce`: identical plan shape, but
    the streamed (big) side carries int8 codes + one double instead of a
    double array, so at scale the scan/broadcast volume drops ~8×.  Queries
    stay full-precision (they are few).  Ranking runs on the dequantized
    corpus vectors; order differs from exact only within quantization noise
    (recall contract: tests/test_quantize.py, q_quantized_recall)."""
    from flood_data_spark.datapipe.similarity import _spread

    qc = quantize_embeddings(
        corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col)), vec_col)
    c = _spread(qc.select(
        "neighbor_id",
        dequantize_col(F.col("qvec"), F.col("qscale")).alias("cvec")))
    q = queries.select(F.col(id_col).alias("query_id"),
                       _as_double(F.col(vec_col)).alias("qv"))
    if broadcast_queries:
        q = F.broadcast(q)
    scored = (c.join(q, F.col("query_id") != F.col("neighbor_id"))
              .select("query_id", "neighbor_id",
                      F.round(cosine_similarity(F.col("qv"), F.col("cvec")), 6)
                      .alias("cosine")))
    w = (Window.partitionBy("query_id")
         .orderBy(F.desc("cosine"), F.asc("neighbor_id")))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
