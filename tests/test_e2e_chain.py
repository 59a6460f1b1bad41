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


def test_real_grib2_bytes_to_products(spark, tmp_path):
    """The same E2 -> E1 chain, but the raster files are REAL GRIB2
    messages (hand-assembled per the WMO spec in test_grib2) decoded by the
    default grib_decoder through its native simple-packing branch — the
    pipeline's actual ingest path running on genuine bytes end-to-end."""
    from tests.test_grib2 import build_message

    # 3 lead-time files x 3 members x 4x4 cells; value = 100*(m+1) + X*2
    # with X = cell index 0..15 -> 100..530, constant across steps
    for s in range(1, 4):
        blob = b"".join(
            build_message(list(range(16)), nj=4, ni=4, la1=0.175,
                          lo1=0.025, d=0.05, ref=100.0 * (m + 1),
                          e_scale=1, member=m, ftime_hours=24 * s)
            for m in range(3))
        (tmp_path / f"fc-{s}.grib").write_bytes(blob)

    raw = read_rasters(spark, str(tmp_path) + "/*.grib")
    assert raw.count() == 3 * 3 * 16

    forecast = normalize_forecast_times(round_keys(raw))
    assert {r.step for r in forecast.select("step").distinct().collect()} \
        == {1, 2, 3}

    thresholds = spark.createDataFrame(
        [(round(0.025 + i * 0.05, 3), round(0.025 + j * 0.05, 3),
          150.0, 250.0, 400.0)
         for i in range(4) for j in range(4)],
        "latitude double, longitude double, threshold_2y double,"
        " threshold_5y double, threshold_20y double")
    products = DailyForecastPipeline(accuracy_mode="exact").run(
        forecast, thresholds)
    summary = products.summary.collect()
    assert len(summary) > 0
    # member medians per cell: 200 + X*2 (members 100/200/300 + X*2), so
    # every cell's median exceeds threshold_2y=150 when X >= 0 -> p2 > 0
    # and cells with 200 + 2X >= 400 (X >= 100: none) stay below 20y
    cells = {(r.latitude, r.longitude): r for r in summary}
    # per cell X: p_above_5y = 1/3 (only member 3's 300+2X clears 250),
    # >= the 0.30 bar -> every surviving cell labels red
    assert all(r.intensity == "R" for r in cells.values())
    # detailed carries real exceedance fractions from the decoded values
    det = products.detailed.filter("step = 1").collect()
    assert len(det) == len(cells)
    assert all(0.0 <= r.p_above_2y <= 1.0 for r in det)
