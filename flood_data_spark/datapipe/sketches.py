"""Sketch-backed corpus statistics — the one-pass summary path at 100 TB.

Exact per-column cardinality needs a distinct shuffle per column; the HLL++
sketch (`approx_count_distinct`, Spark-native, mergeable across partitions)
answers all columns in ONE scan with ~rsd relative error and constant
memory.  Heavy-hitter extraction stays exact but shuffle-light: tokens
partial-aggregate map-side, so the exchange carries one row per DISTINCT
token, not per occurrence — the groupBy formulation IS the scalable one
when the domain (vocabulary) is far smaller than the corpus.

No reference analog (SURVEY.md §2.11 family); same zero-UDF discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_distinct_stats(df: DataFrame, cols, rsd: float = 0.05) -> DataFrame:
    """One row: exact row count + HLL++ approximate distinct per column.

    One pass, no shuffle beyond the single-row final merge — the scale
    replacement for `SELECT count(DISTINCT c1), count(DISTINCT c2), ...`
    which plans one expand+shuffle per distinct column.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.approx_count_distinct(c, rsd)
                    .alias(f"{c}_approx_distinct"))
    return df.agg(*aggs)


def hll_contract(df: DataFrame, cols, rsd: float = 0.05,
                 tolerance_multiple: float = 4.0) -> DataFrame:
    """Bounds contract for the HLL path: one row with the EXACT distinct
    counts (oracle-checkable) plus a boolean per column asserting the
    sketch landed within tolerance_multiple × rsd of the truth.

    HLL++ rsd is a standard deviation, not a hard bound — 4σ makes a false
    alarm vanishingly rare while still catching implementation drift.
    """
    exact = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.countDistinct(c).alias(f"{c}_distinct") for c in cols])
    approx = df.agg(
        *[F.approx_count_distinct(c, rsd).alias(f"{c}_approx") for c in cols])
    checks = [
        (F.abs(F.col(f"{c}_approx") - F.col(f"{c}_distinct"))
         <= F.lit(tolerance_multiple * rsd) * F.col(f"{c}_distinct"))
        .alias(f"{c}_hll_ok")
        for c in cols]
    return (exact.crossJoin(approx)
            .select("n_rows",
                    *[F.col(f"{c}_distinct") for c in cols],
                    *checks))


def token_heavy_hitters(df: DataFrame, text_col: str = "text",
                        min_fraction: float = 0.01) -> DataFrame:
    """Tokens appearing in at least `min_fraction` of all token positions:
    (token, occurrences, fraction), descending.

    explode → groupBy partial-aggregates map-side: the shuffle moves one
    row per distinct token per partition — vocabulary-bounded, not
    corpus-bounded.  The total derives from the already-aggregated counts
    relation (sum of per-token occurrences == total token positions), so
    the corpus text is scanned and tokenized exactly ONCE — an
    independent `toks.agg(count)` plan would pay the full explode twice.
    """
    toks = (df.select(F.explode(
        F.split(F.trim(F.col(text_col)), r"\s+")).alias("token"))
        .filter(F.col("token") != ""))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("occurrences"))
    total = counts.agg(F.sum("occurrences").alias("_total"))
    return (counts.crossJoin(F.broadcast(total))
            .filter(F.col("occurrences") >= F.col("_total") * min_fraction)
            .select("token", "occurrences",
                    F.round(F.col("occurrences") / F.col("_total"), 6)
                    .alias("fraction"))
            .orderBy(F.desc("occurrences"), F.asc("token")))


def corpus_report(df: DataFrame, text_col: str = "text",
                  lang_col: str = "lang",
                  source_col: str = "source") -> DataFrame:
    """Long-format corpus summary: (metric, value) rows from ONE scan —
    the ops artifact a curation run logs next to its output.  All metrics
    are conditional aggregates of a single groupBy-less agg (one partial-
    agg pass, one single-row merge), unpivoted JVM-side with `stack`."""
    t = F.trim(F.col(text_col))
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length(text_col)).alias("total_chars"),
        F.round(F.avg(F.length(text_col)), 6).alias("avg_chars"),
        F.sum((t == "").cast("long")).alias("n_blank"),
    ]
    # lang/source are conventions, not requirements — report what exists
    if source_col in df.columns:
        aggs.append(F.countDistinct(source_col).alias("n_sources"))
    if lang_col in df.columns:
        aggs.append(F.countDistinct(lang_col).alias("n_langs"))
    agg = df.agg(*aggs)
    n = len(agg.columns)
    pairs = ", ".join(f"'{c}', cast({c} as double)" for c in agg.columns)
    return agg.select(F.expr(f"stack({n}, {pairs}) as (metric, value)"))
