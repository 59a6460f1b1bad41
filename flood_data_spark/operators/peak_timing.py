"""Flood peak-timing classification (SURVEY.md §2.5 W1 + §2.4 A4 + §2.3 J2).

Parity with reference flood/spark/transforms.py:58-109
(`compute_flood_peak_timing`):

1. severity rank per (cell, step): 1 if p_above_20y >= 0.3, 2 if p_above_5y
   >= 0.3, 3 if p_above_2y >= 0.3, else 4;
2. peak step = argmax by (severity ASC, median_dis DESC) per cell
   (row_number window, keep row 1); peak_day = that step's valid_for;
3. max_2y_start = max(p_above_2y) over the first 10 steps per cell;
4. label: 'BB' (black border) if peak_step in 1..3; 'GC' (grayed color) if
   peak_step > 10 AND max_2y_start < 0.30; else 'GB' (gray border).

Spark-first difference: the reference materializes max_2y_start with a
separate groupBy + left self-join back to the detail (transforms.py:61-71,
its J2).  We compute it as a whole-partition window aggregate over the SAME
partitionBy(lat, lon) used by the row_number window — Catalyst plans both
Window nodes over one Exchange, so the extra aggregate shuffle *and* the join
disappear.  At 100 TB that removes one full shuffle of the detailed table.

Determinism: the reference's ordering (severity, median_dis) is tie-broken
nondeterministically (SURVEY §7.3, reference comment transforms.py:92-95).
We append `step ASC` as a final deterministic tiebreaker — on ties the
earliest lead time wins, which is also the hydrologically sensible choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flood_data_spark.config import DEFAULT_CONFIG


def severity_rank(prob_threshold: float = 0.30):
    """1 (worst) .. 4 (none) from the exceedance-probability ladder."""
    return (
        F.when(F.col("p_above_20y") >= prob_threshold, F.lit(1))
         .when(F.col("p_above_5y") >= prob_threshold, F.lit(2))
         .when(F.col("p_above_2y") >= prob_threshold, F.lit(3))
         .otherwise(F.lit(4))
    )


def flood_peak_timing(detailed_df: DataFrame,
                      peak_timings: dict | None = None,
                      prob_threshold: float | None = None,
                      early_window: tuple | None = None,
                      black_border_window: tuple | None = None,
                      col_name: str = "peak_timing",
                      key_cols=("latitude", "longitude"),
                      carry_cols=("issued_on",)) -> DataFrame:
    labels = peak_timings or DEFAULT_CONFIG.peak_timings
    bar = (prob_threshold if prob_threshold is not None
           else DEFAULT_CONFIG.intensity_prob_threshold)
    early_lo, early_hi = early_window or DEFAULT_CONFIG.peak_early_window
    bb_lo, bb_hi = black_border_window or DEFAULT_CONFIG.peak_black_border_window

    cell = Window.partitionBy(*key_cols)
    by_severity = cell.orderBy(
        F.asc("condition"), F.desc("median_dis"), F.asc("step"))

    peaked = (
        detailed_df
        .withColumn("condition", severity_rank(bar))
        # early-window max as a frame-less window agg: shares the Exchange
        # with the row_number window below (no join, no extra shuffle).
        .withColumn(
            "max_2y_start",
            F.max(F.when(F.col("step").between(early_lo, early_hi),
                         F.col("p_above_2y"))).over(cell))
        .withColumn("rn", F.row_number().over(by_severity))
        .filter(F.col("rn") == 1)
        .select(
            *key_cols, "max_2y_start", *carry_cols,
            F.col("step").alias("peak_step"),
            F.col("valid_for").alias("peak_day"),
        )
    )
    label = (
        F.when(F.col("peak_step").between(bb_lo, bb_hi), labels["black_border"])
         .when((F.col("peak_step") > early_hi) & (F.col("max_2y_start") < bar),
               labels["grayed_color"])
         .otherwise(labels["gray_border"])
    )
    return peaked.withColumn(col_name, label).drop("max_2y_start")
