"""Text-corpus sources for the datapipe layer: JSONL (the lingua franca of
LLM training corpora) and CSV document readers.

Design (same discipline as parquet.py):
- EXPLICIT schema always — an inference pass over 100 TB of JSONL is a
  full extra read of the corpus; with a schema the scan is single-pass and
  column-pruned (unreferenced JSON fields are never parsed);
- malformed lines are quarantined, not fatal: PERMISSIVE mode routes them
  to a `_corrupt_record` column so one bad crawl record can't kill a
  day-long job, and `corrupt_to` surfaces them for inspection;
- compression (gz/zstd) is handled transparently by the line reader, but
  note gzip is NOT splittable — one task per .gz file, so shard uploads
  (many ~100 MB-1 GB files), or recompress to zstd/bzip2 when a single
  giant archive would serialize the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the conventional JSONL document shape; pass a custom schema for other
# corpora (the reader never infers)
DOCUMENT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])


def read_jsonl(spark: SparkSession, path: str,
               schema: T.StructType = DOCUMENT_SCHEMA,
               keep_corrupt: bool = False) -> DataFrame:
    """Read a JSONL document corpus (glob ok) with an explicit schema.

    Malformed lines: PERMISSIVE parse puts the raw line in
    `_corrupt_record` and NULLs the data columns.  By default those rows
    are dropped and the clean relation is returned; `keep_corrupt=True`
    returns them too (filter on `_corrupt_record IS NOT NULL` to audit).

    Formulated as a `text` scan + `from_json` expression rather than the
    JSON datasource: same Jackson parser, but (a) the corrupt-record
    column is an ordinary column — no QUERY_ONLY_CORRUPT_RECORD_COLUMN
    restriction, no cache() workaround from the Spark docs — and (b) the
    line scan splits on every splittable codec exactly like any text
    input.
    """
    full = T.StructType(schema.fields + [
        T.StructField("_corrupt_record", T.StringType())])
    df = (spark.read.text(path)
          .select(F.from_json(
              "value", full,
              {"mode": "PERMISSIVE",
               "columnNameOfCorruptRecord": "_corrupt_record"}).alias("d"))
          .select("d.*"))
    if keep_corrupt:
        return df
    return (df.filter(F.col("_corrupt_record").isNull())
            .drop("_corrupt_record"))


def read_csv_docs(spark: SparkSession, path: str,
                  schema: T.StructType = DOCUMENT_SCHEMA,
                  header: bool = True, sep: str = ",") -> DataFrame:
    """CSV variant (explicit schema, quoted/escaped multiline text
    supported); for anything at real scale prefer JSONL or parquet —
    multiline CSV defeats input splitting."""
    return (spark.read
            .schema(schema)
            .option("header", header)
            .option("sep", sep)
            .option("multiLine", True)
            .option("escape", '"')
            .csv(path))


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite",
                compression: str | None = None,
                partition_by: list | None = None) -> None:
    """JSONL sink (interchange with tokenizer/training pipelines).
    Use zstd/gzip compression for cold storage; partition by source/date
    for pruned re-reads."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)
