"""Parquet sources & sinks (SURVEY.md §2.1 S7-S10).

Reference behaviors preserved:
- big forecast scans use an *explicit* schema + multi-file glob
  (glofas-forecast-computation.py:110-132) — no inference pass, pushdown and
  column pruning enabled from the first plan;
- every ingest point rounds (latitude, longitude) to the configured
  precision before anything downstream can join (§1.4 float-key discipline);
- sinks write snappy Parquet, mode=overwrite (glofas-forecast-computation.py
  :276-280; raster_converter.py:8-11).

Scale posture beyond the reference: writers can partition by `issued_on`
(daily batches prune to one folder) and optionally sort within partitions by
(latitude, longitude) for row-group min/max locality — the distributed
equivalent of the reference's driver-side global sort-before-save
(threshold-data-joining.py:120) without the global range shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flood_data_spark.functions.keys import round_keys
from flood_data_spark.functions.temporal import normalize_forecast_times
from flood_data_spark.schemas import RAW_FORECAST_SCHEMA


def read_forecast(spark: SparkSession, path: str,
                  precision: int | None = None,
                  normalize_times: bool = True) -> DataFrame:
    """Read raw filtered-forecast parquet (glob ok), apply key + time
    normalization."""
    df = spark.read.schema(RAW_FORECAST_SCHEMA).parquet(path)
    df = round_keys(df, precision)
    if normalize_times:
        df = normalize_forecast_times(df)
    return df


def read_thresholds(spark: SparkSession, path: str,
                    precision: int | None = None) -> DataFrame:
    """Small static table: inferred schema, rounded keys
    (reference :148-150)."""
    return round_keys(spark.read.parquet(path), precision)


def read_control(spark: SparkSession, path: str,
                 precision: int | None = None) -> DataFrame:
    """External control forecast → (latitude, longitude, control_dis)."""
    from flood_data_spark.operators.summary import normalize_control
    df = spark.read.schema(RAW_FORECAST_SCHEMA).parquet(path)
    return normalize_control(df, precision)


def write_parquet(df: DataFrame, path: str,
                  mode: str = "overwrite",
                  partition_by: list | None = None,
                  sort_within_partitions: list | None = None) -> None:
    if sort_within_partitions:
        df = df.sortWithinPartitions(*sort_within_partitions)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def upsert_partitions(df: DataFrame, path: str, partition_by) -> None:
    """Replace exactly the partitions present in `df`, leave the rest.

    The daily-operations primitive the reference performs by rewriting
    whole dated folders (databricks/glofas-forecast-computation.py:110-113
    convention): a re-issued forecast for 2024-01-05 must replace that
    day's data without touching any other day and without the
    read-modify-write of the full table.  `partitionOverwriteMode=dynamic`
    scopes mode="overwrite" to the partitions the incoming frame actually
    contains — set per-write here, not globally, so plain overwrite writes
    elsewhere keep their whole-table semantics.
    """
    pb = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    (df.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy(*pb)
     .parquet(path))


def publish_directory(spark, src: str, dest: str,
                      overwrite: bool = True) -> None:
    """S12 object-store publish: move a computed output directory to its
    published location through the Hadoop FileSystem API — the engine-side
    equivalent of the reference's `dbutils.fs.rm(dest, recurse=True)` +
    `dbutils.fs.mv(src, dest, recurse=True)` publish step
    (databricks/glofas-forecast-computation.py:306-321).  Works against
    any Hadoop-supported store (file://, s3a://, gs://, abfs://): rename
    is atomic on HDFS/local, copy+delete on object stores — either way
    readers only ever see the old or the complete new directory at
    `dest`, never a half-written one (the reason the reference computes
    into a staging dir and publishes by move)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    src_path = jvm.org.apache.hadoop.fs.Path(src)
    dest_path = jvm.org.apache.hadoop.fs.Path(dest)
    fs = dest_path.getFileSystem(conf)
    if not fs.exists(src_path):
        raise FileNotFoundError(f"publish source missing: {src}")
    if fs.exists(dest_path):
        if not overwrite:
            raise FileExistsError(f"publish destination exists: {dest}")
        fs.delete(dest_path, True)
    parent = dest_path.getParent()
    if parent is not None and not fs.exists(parent):
        fs.mkdirs(parent)
    if not fs.rename(src_path, dest_path):
        raise IOError(f"publish rename failed: {src} -> {dest}")
