"""Full-chain integration: E2 (distributed raster ingest) feeding E1 (daily
pipeline) feeding J8 (serving lookup) — the whole reference system on one
engine, one logical plan family, no driver-side loops."""

import json
import os

from pyspark.sql import functions as F

from flood_data_spark.functions.keys import round_keys, snap_to_grid
from flood_data_spark.functions.temporal import normalize_forecast_times
from flood_data_spark.operators.grid import upstream_mask
from flood_data_spark.operators.serving import neighborhood_lookup, point_lookup
from flood_data_spark.plans.daily_pipeline import DailyForecastPipeline
from flood_data_spark.sources.raster import read_rasters, synthetic_grib_decoder


def test_raster_to_products_to_lookup(spark, tmp_path):
    # --- E2: 5 lead-time files x 6 members x 4x4 cells, decoded in executors
    t0 = 1_704_067_200 * 10**9  # 2024-01-01
    for s in range(1, 6):
        hdr = {"step_days": s, "time_ns": t0, "members": 6,
               "lat0": 0.025, "lon0": 0.025, "nlat": 4, "nlon": 4,
               "resolution": 0.05}
        with open(os.path.join(str(tmp_path), f"fc-{s}.grib"), "w") as f:
            json.dump(hdr, f)

    raw = read_rasters(spark, str(tmp_path) + "/*.grib",
                       decoder=synthetic_grib_decoder)
    assert raw.count() == 5 * 6 * 16

    # upstream mask: half the cells are large catchments
    upstream = spark.createDataFrame(
        [(round(0.025 + i * 0.05, 3), round(0.025 + j * 0.05, 3),
          3e8 if (i + j) % 2 == 0 else 1e8)
         for i in range(4) for j in range(4)],
        "latitude double, longitude double, uparea double")
    masked = upstream_mask(round_keys(raw), upstream, threshold=2.5e8)
    n_masked = masked.count()
    assert n_masked == 5 * 6 * 8  # half the cells survive

    forecast = normalize_forecast_times(masked.drop("uparea"))

    # --- E1: thresholds sized so synthetic dis24 values straddle them
    thresholds = spark.createDataFrame(
        [(round(0.025 + i * 0.05, 3), round(0.025 + j * 0.05, 3),
          1100.0, 2600.0, 4600.0)
         for i in range(4) for j in range(4)],
        "latitude double, longitude double, threshold_2y double,"
        " threshold_5y double, threshold_20y double")
    products = DailyForecastPipeline(accuracy_mode="exact").run(
        forecast, thresholds)

    summary = products.summary
    detailed = products.detailed
    assert summary.count() > 0
    # summary is 1 row per surviving, non-gray cell
    assert summary.groupBy("latitude", "longitude").count() \
        .filter("count > 1").count() == 0
    for c in ("peak_step", "peak_day", "peak_timing", "tendency",
              "intensity", "wkt"):
        assert c in summary.columns, c
    # detailed restricted to summary cells, 1 row per (cell, step)
    s_cells = {(r.latitude, r.longitude)
               for r in summary.select("latitude", "longitude").collect()}
    d_cells = {(r.latitude, r.longitude)
               for r in detailed.select("latitude", "longitude").distinct().collect()}
    assert d_cells == s_cells

    # --- J8: serving lookup against the published summary
    some_lat, some_lon = next(iter(s_cells))
    hit = point_lookup(summary, some_lat + 0.01, some_lon + 0.01)
    assert hit.count() == 1
    got = hit.first()
    assert (got.latitude, got.longitude) == (some_lat, some_lon)
    hood = neighborhood_lookup(summary, some_lat + 0.01, some_lon + 0.01)
    assert 1 <= hood.count() <= 9
    assert hood.filter("is_primary").count() == 1
