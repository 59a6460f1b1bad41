"""Upstream-area masking via grid-snap equi-join — models reference
test/test_upstream_filtering.py (seeded random grid, programmatic ground
truth)."""

import random

from flood_data_spark.operators.grid import nearest_grid_join, upstream_mask


def test_upstream_mask_keeps_only_large_catchments(spark):
    rng = random.Random(42)
    res = 0.05
    # 20x20 grid of cells; discharge constant 100
    cells = [(round(0.025 + res * i, 3), round(0.025 + res * j, 3))
             for i in range(20) for j in range(20)]
    forecast = spark.createDataFrame(
        [(lat, lon, 100.0) for lat, lon in cells],
        ["latitude", "longitude", "dis24"])

    # sparse upstream raster: 30 random cells get 300_000_000 m², rest null
    big = set(rng.sample(cells, 30))
    upstream = spark.createDataFrame(
        [(lat, lon, 300_000_000.0 if (lat, lon) in big else None)
         for lat, lon in cells],
        ["latitude", "longitude", "uparea"])

    out = upstream_mask(forecast, upstream, threshold=250_000_000.0)
    got = {(r.latitude, r.longitude) for r in out.collect()}
    assert got == big
    assert "uparea" not in out.columns


def test_nearest_grid_join_snaps_float_noise(spark):
    # right side has sub-resolution coordinate noise — still joins
    left = spark.createDataFrame([(0.025, 0.075, 1.0)],
                                 ["latitude", "longitude", "v"])
    right = spark.createDataFrame([(0.0250004, 0.0749996, 42.0)],
                                  ["latitude", "longitude", "w"])
    out = nearest_grid_join(left, right).collect()
    assert len(out) == 1
    assert out[0].w == 42.0
    # canonical coordinates come from the left side
    assert out[0].latitude == 0.025 and out[0].longitude == 0.075
