"""Reference-shaped end-to-end invariant test: a seeded synthetic day with
the real workload geometry (30 lead-time steps, multi-member ensemble)
through the full pipeline, checking the structural invariants that
hand-built golden fixtures are too small to exercise:

- probability ladder monotonicity: thresholds are ordered 2y < 5y < 20y,
  so p_above_20y <= p_above_5y <= p_above_2y on every row;
- grain arithmetic: detailed = cells x steps for exactly the summary cells;
- closed label domains and step/probability ranges.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from flood_data_spark.plans.daily_pipeline import DailyForecastPipeline

CELLS, MEMBERS, STEPS = 15 * 15, 11, 30


@pytest.fixture(scope="module")
def products(spark):
    rng = np.random.default_rng(2024)
    lat_idx = np.arange(CELLS) % 15
    lon_idx = np.arange(CELLS) // 15
    lat = np.round(0.025 + lat_idx * 0.05, 3)
    lon = np.round(0.025 + lon_idx * 0.05, 3)

    n = CELLS * MEMBERS * STEPS
    cell = np.tile(np.arange(CELLS), MEMBERS * STEPS)
    step = np.repeat(np.arange(1, STEPS + 1), CELLS * MEMBERS)
    # per-cell base discharge with a mid-horizon bump so all three peak
    # timings and all intensities occur
    base = rng.gamma(2.0, 60.0, CELLS)[cell]
    # per-cell bump centers so every peak-timing class occurs (a single
    # global center lands in one regime and BB never appears)
    centers = rng.integers(1, 31, CELLS)[cell]
    bump = 1.0 + 0.8 * np.exp(-((step - centers) ** 2) / 18.0)
    dis = (base * bump * rng.lognormal(0.0, 0.25, n)).astype("float32")

    forecast = spark.createDataFrame(pd.DataFrame({
        "latitude": lat[cell], "longitude": lon[cell],
        "issued_on": pd.Timestamp("2024-06-01").date(),
        "valid_for": [pd.Timestamp("2024-06-01").date()] * n,
        "step": step.astype("int32"), "dis24": dis}))
    forecast = forecast.withColumn(
        "valid_for", F.date_add(F.col("issued_on"), F.col("step")))

    thresholds = spark.createDataFrame(pd.DataFrame({
        "latitude": lat, "longitude": lon,
        "threshold_2y": 90.0, "threshold_5y": 180.0, "threshold_20y": 320.0}))

    p = DailyForecastPipeline(accuracy_mode="exact").run(
        forecast, thresholds, run_checks=True)
    p.detailed.cache().count()
    p.summary.cache().count()
    return p


def test_probability_ladder_is_monotone(products):
    bad = products.detailed.filter(
        (F.col("p_above_20y") > F.col("p_above_5y") + 1e-12)
        | (F.col("p_above_5y") > F.col("p_above_2y") + 1e-12))
    assert bad.count() == 0


def test_probabilities_and_quantiles_in_range(products):
    d = products.detailed
    assert d.filter((F.col("p_above_2y") < 0) | (F.col("p_above_2y") > 1)
                    | (F.col("p_above_5y") < 0) | (F.col("p_above_5y") > 1)
                    | (F.col("p_above_20y") < 0) | (F.col("p_above_20y") > 1)
                    ).count() == 0
    assert d.filter(~((F.col("min_dis") <= F.col("Q1_dis"))
                      & (F.col("Q1_dis") <= F.col("median_dis"))
                      & (F.col("median_dis") <= F.col("Q3_dis"))
                      & (F.col("Q3_dis") <= F.col("max_dis")))).count() == 0


def test_grain_arithmetic(products):
    s_cells = products.summary.select("latitude", "longitude").distinct()
    n_summary_cells = s_cells.count()
    assert products.summary.count() == n_summary_cells  # 1 row/cell
    # detailed restricted to summary cells: exactly cells x steps
    assert products.detailed.count() == n_summary_cells * STEPS


def test_label_domains_and_ranges(products):
    s = products.summary
    assert {r.tendency for r in s.select("tendency").distinct().collect()} \
        <= {"U", "D", "C"}
    assert {r.intensity for r in s.select("intensity").distinct().collect()} \
        <= {"P", "R", "Y"}  # gray dropped
    # every peak-timing class must actually occur (subset-only assertions
    # pass vacuously when a classifier regression drops a class)
    assert {r.peak_timing for r in
            s.select("peak_timing").distinct().collect()} == {"BB", "GC", "GB"}
    assert s.filter((F.col("peak_step") < 1)
                    | (F.col("peak_step") > STEPS)).count() == 0
    assert s.filter(F.col("wkt").rlike(r"^POLYGON \(\(")).count() == s.count()
