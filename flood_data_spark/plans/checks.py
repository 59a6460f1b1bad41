"""Pipeline QA checks (SURVEY §2.4 A5).

The reference guards its threshold build with runtime count-preservation
asserts around every join (threshold-data-joining.py:84-100) — cheap
invariants that catch the classic silent failures of this engine family:
float-key joins going empty (§1.4), a 1:1 join fanning out, nulls leaking
into key columns.  Same idea here, as reusable check functions that raise
`PipelineCheckError` with the offending counts.

Each check costs one action (a count / limit-1 scan) on a plan Spark will
usually have cached or can prune heavily; at 100 TB run them on the
per-day increment, not the full history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class PipelineCheckError(AssertionError):
    """A pipeline invariant failed."""


def fast_table_count(spark, path: str) -> int:
    """Metadata-only row count of a parquet table: the read happens under
    the DataSource-v2 scan, where `spark.sql.parquet.aggregatePushdown`
    (set by the session factory) pushes COUNT(*) to the footer statistics —
    no row group is ever decoded.  At 100 TB this turns the before/after
    table-level count asserts into pure metadata reads.

    Scoped: the v2 conf is set on a `newSession()` clone (own SQLConf,
    shared SparkContext/executors), so concurrent queries on the caller's
    session keep planning against the v1 scan — mutating and restoring the
    shared conf would briefly flip THEIR plans to v2 too.
    """
    s2 = spark.newSession()
    s2.conf.set("spark.sql.sources.useV1SourceList", "")
    s2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    return s2.read.parquet(path).count()


def assert_count_preserved(before: DataFrame, after: DataFrame,
                           label: str = "join") -> None:
    """1:1 joins and projections must not change cardinality (the
    reference's pre/post-join equality asserts)."""
    nb, na = before.count(), after.count()
    if nb != na:
        raise PipelineCheckError(
            f"{label}: row count changed {nb} -> {na} "
            f"({'fan-out' if na > nb else 'row loss'})")


def assert_unique_key(df: DataFrame, keys, label: str = "table") -> None:
    """The grain claim: at most one row per key (e.g. summary = 1 row/cell)."""
    cols = [keys] if isinstance(keys, str) else list(keys)
    dup = (df.groupBy(*cols).count().filter(F.col("count") > 1).limit(1)
           .collect())
    if dup:
        raise PipelineCheckError(
            f"{label}: duplicate key {tuple(dup[0][c] for c in cols)} "
            f"(x{dup[0]['count']}) violates 1-row-per-{cols} grain")


def assert_no_nulls(df: DataFrame, cols, label: str = "table") -> None:
    """Key/required columns must be fully populated (a null lat/lon would
    silently drop out of every downstream equi-join)."""
    cs = [cols] if isinstance(cols, str) else list(cols)
    pred = None
    for c in cs:
        p = F.col(c).isNull()
        pred = p if pred is None else (pred | p)
    bad = df.filter(pred).limit(1).collect()
    if bad:
        raise PipelineCheckError(
            f"{label}: null in required column(s) {cs}: {bad[0].asDict()}")


def assert_join_not_empty(df: DataFrame, label: str = "join") -> None:
    """The §1.4 tripwire: a rounded-float-key join that produces zero rows
    almost always means the rounding discipline was skipped on one side."""
    if not df.limit(1).collect():
        raise PipelineCheckError(
            f"{label}: produced 0 rows — check key rounding/precision on "
            "both join inputs (SURVEY §1.4)")
