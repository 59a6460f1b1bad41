"""Temporal normalization for raw forecasts.

Reference semantics (glofas-forecast-computation.py:124-132):
- `time` / `valid_time` arrive as **nanosecond** epoch longs (GRIB convention);
  normalize via to_timestamp(col / 1e9) then to_date.
- `step` arrives as nanoseconds of lead time; divide by 86400e9, cast int
  → whole days (1..30).
- `valid_for` = valid_time date minus one day (date_sub(..., 1)) — the
  off-by-one is part of the semantics: dis24 is the discharge of the 24 h
  *ending* at valid_time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NS_PER_SEC = 1e9
NS_PER_DAY = 60 * 60 * 24 * 1e9


def normalize_forecast_times(df: DataFrame,
                             time_col: str = "time",
                             step_col: str = "step",
                             valid_time_col: str = "valid_time") -> DataFrame:
    """ns-epoch raw forecast → (issued_on: date, step: int days, valid_for: date)."""
    return (
        df
        .withColumn("issued_on", F.to_date(F.to_timestamp(F.col(time_col) / NS_PER_SEC)))
        .drop(time_col)
        .withColumn(step_col, (F.col(step_col) / NS_PER_DAY).cast("int"))
        .withColumn(valid_time_col, F.to_date(F.to_timestamp(F.col(valid_time_col) / NS_PER_SEC)))
        .withColumn("valid_for", F.date_sub(valid_time_col, 1))
        .drop(valid_time_col)
    )
