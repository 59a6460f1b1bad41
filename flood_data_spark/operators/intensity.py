"""Flood intensity classification (SURVEY.md §2.4 A3 + ladder).

Parity with reference flood/spark/transforms.py:31-56
(`compute_flood_intensity`): per cell, take the max exceedance probability
over all steps for each return period, then pick the severest color whose
probability clears the 0.30 bar:

- purple 'P' if max p_above_20y >= 0.30
- red    'R' elif max p_above_5y >= 0.30
- yellow 'Y' elif max p_above_2y >= 0.30
- gray   'G' otherwise
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flood_data_spark.config import DEFAULT_CONFIG


def flood_intensity(detailed_df: DataFrame,
                    intensities: dict | None = None,
                    prob_threshold: float | None = None,
                    col_name: str = "intensity",
                    key_cols=("latitude", "longitude")) -> DataFrame:
    c = intensities or DEFAULT_CONFIG.intensities
    bar = (prob_threshold if prob_threshold is not None
           else DEFAULT_CONFIG.intensity_prob_threshold)

    per_cell = (
        detailed_df
        .groupBy(*key_cols)
        .agg(
            F.max("p_above_20y").alias("max_p_above_20y"),
            F.max("p_above_5y").alias("max_p_above_5y"),
            F.max("p_above_2y").alias("max_p_above_2y"),
        )
    )
    label = (
        F.when(F.col("max_p_above_20y") >= bar, c["purple"])
         .when(F.col("max_p_above_5y") >= bar, c["red"])
         .when(F.col("max_p_above_2y") >= bar, c["yellow"])
         .otherwise(c["gray"])
    )
    return per_cell.withColumn(col_name, label)
