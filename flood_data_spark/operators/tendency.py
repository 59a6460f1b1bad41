"""Flood tendency classification (SURVEY.md §2.4 A2 + §2.8 when-ladder).

Parity with reference flood/spark/transforms.py:4-29 (`compute_flood_tendency`):
per cell, aggregate the detailed forecast over all lead-time steps, then
classify against the control discharge:

- increasing ('U'):  max(median_dis) >  1.10 * control_dis
- decreasing ('D'):  min(median_dis) <= 0.90 * control_dis
                     AND max(median_dis) <= 1.10 * control_dis
- stagnant  ('C'):  otherwise

Determinism note: the reference uses F.first('control_dis'), which is only
safe because control_dis is constant within a cell (transforms.py:13; risk
flagged in SURVEY §7.5).  We use F.min — identical under the constancy
invariant, and deterministic even if it is violated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flood_data_spark.config import DEFAULT_CONFIG


def flood_tendency(detailed_with_control: DataFrame,
                   tendencies: dict | None = None,
                   up_factor: float | None = None,
                   down_factor: float | None = None,
                   col_name: str = "tendency",
                   key_cols=("latitude", "longitude")) -> DataFrame:
    t = tendencies or DEFAULT_CONFIG.tendencies
    up = up_factor if up_factor is not None else DEFAULT_CONFIG.tendency_up_factor
    down = down_factor if down_factor is not None else DEFAULT_CONFIG.tendency_down_factor

    per_cell = (
        detailed_with_control
        .groupBy(*key_cols)
        .agg(
            F.max("median_dis").alias("max_median_dis"),
            F.min("median_dis").alias("min_median_dis"),
            F.min("control_dis").alias("control_dis"),
            F.max("max_dis").alias("max_max_dis"),
            F.min("min_dis").alias("min_min_dis"),
        )
    )
    label = (
        F.when(F.col("max_median_dis") > F.col("control_dis") * up,
               t["increasing"])
         .when((F.col("min_median_dis") <= F.col("control_dis") * down)
               & (F.col("max_median_dis") <= F.col("control_dis") * up),
               t["decreasing"])
         .otherwise(t["stagnant"])
    )
    return per_cell.withColumn(col_name, label)
