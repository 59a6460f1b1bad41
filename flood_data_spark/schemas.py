"""Explicit table schemas (SURVEY.md §1.2).

The reference declares the big forecast schema explicitly on read to skip
inference and enable pushdown (databricks/glofas-forecast-computation.py:98-106,
:124) and infers only the small static tables.  We keep that discipline.
"""

from pyspark.sql.types import (
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Raw (filtered) forecast as written by ingestion — ns-epoch longs for time
# columns, one row per (ensemble member, lead-time step, grid cell).
# Reference: glofas-forecast-computation.py:98-106.
RAW_FORECAST_SCHEMA = StructType([
    StructField("number", LongType(), True),
    StructField("latitude", DoubleType(), True),
    StructField("longitude", DoubleType(), True),
    StructField("time", LongType(), True),        # ns epoch, forecast issue time
    StructField("step", LongType(), True),        # ns lead time
    StructField("valid_time", LongType(), True),  # ns epoch
    StructField("dis24", FloatType(), True),      # m^3/s discharge, last 24h
])

# Normalized forecast after key rounding + temporal normalization.
FORECAST_SCHEMA = StructType([
    StructField("number", LongType(), True),
    StructField("latitude", DoubleType(), True),
    StructField("longitude", DoubleType(), True),
    StructField("issued_on", DateType(), True),
    StructField("step", IntegerType(), True),     # whole days 1..30
    StructField("valid_for", DateType(), True),
    StructField("dis24", FloatType(), True),
])

# Static per-cell return-period thresholds.
# Reference: threshold-data-joining.py:70-110, threshold-data-conversion.py:58-65.
THRESHOLDS_SCHEMA = StructType([
    StructField("latitude", DoubleType(), True),
    StructField("longitude", DoubleType(), True),
    StructField("threshold_2y", DoubleType(), True),
    StructField("threshold_5y", DoubleType(), True),
    StructField("threshold_20y", DoubleType(), True),
])

# Static per-cell upstream catchment area (m^2).
UPSTREAM_SCHEMA = StructType([
    StructField("latitude", DoubleType(), True),
    StructField("longitude", DoubleType(), True),
    StructField("uparea", DoubleType(), True),
])

# Control forecast (1 row per cell).
CONTROL_SCHEMA = StructType([
    StructField("latitude", DoubleType(), True),
    StructField("longitude", DoubleType(), True),
    StructField("control_dis", DoubleType(), True),
])

# Detailed forecast product (1 row per cell, step).
# Reference output schema asserted at test/test_spark_transforms.py:536-538.
DETAILED_FORECAST_COLUMNS = [
    "latitude", "longitude", "issued_on", "valid_for", "step",
    "p_above_2y", "p_above_5y", "p_above_20y",
    "min_dis", "Q1_dis", "median_dis", "Q3_dis", "max_dis",
]

# Summary forecast product (1 row per cell).
# Reference: glofas-forecast-computation.py:215-242.
SUMMARY_FORECAST_COLUMNS = [
    "latitude", "longitude",
    "peak_step", "peak_day", "peak_timing",
    "max_median_dis", "min_median_dis", "control_dis",
    "max_max_dis", "min_min_dis", "tendency",
    "max_p_above_20y", "max_p_above_5y", "max_p_above_2y",
    "intensity",
]
