"""J5 threshold combine — fold-join of per-return-period rasters into the
single per-cell threshold table (reference databricks/threshold-data-joining
.py:70-110), with the reference's count-preservation guards."""

import pytest

from pyspark.sql import functions as F

from flood_data_spark.operators.threshold import combine_threshold_rasters
from flood_data_spark.plans.checks import PipelineCheckError


def _raster(spark, col, n=12, noise=0.0, factor=1.0):
    """n-cell raster on a 4-wide grid with optionally float-noisy keys."""
    rows = [(0.025 + (i % 4) * 0.05 + noise,
             0.025 + (i // 4) * 0.05 - noise,
             factor * (i + 1.0)) for i in range(n)]
    return spark.createDataFrame(rows, f"latitude double, longitude double, {col} double")


def test_combine_happy_path(spark):
    out = combine_threshold_rasters(
        [_raster(spark, "threshold_2y", noise=2e-7, factor=0.8),
         _raster(spark, "threshold_5y", noise=-3e-7),
         _raster(spark, "threshold_20y", factor=1.2)],
        precision=3, half_grid_size=0.025)
    rows = out.collect()
    assert len(rows) == 12                       # count preserved, 1 row/cell
    assert set(out.columns) == {"latitude", "longitude", "threshold_2y",
                                "threshold_5y", "threshold_20y", "wkt"}
    # the float noise was canonicalized away: every value matches the
    # noise-free grid and the 5y/2y ratio is exact per cell
    for r in rows:
        assert round(r.latitude, 3) == r.latitude
        assert r.threshold_2y == pytest.approx(0.8 * r.threshold_5y)
        assert r.wkt.startswith("POLYGON ((")
    # sorted serving layout (reference sorts on [latitude, longitude])
    assert [(r.latitude, r.longitude) for r in rows] == sorted(
        (r.latitude, r.longitude) for r in rows)


def test_combine_rename_maps(spark):
    out = combine_threshold_rasters(
        [_raster(spark, "2yRP_GloFASv4"), _raster(spark, "5yRP_GloFASv4")],
        rename_maps=[{"2yRP_GloFASv4": "threshold_2y"},
                     {"5yRP_GloFASv4": "threshold_5y"}],
        add_geom=False)
    assert {"threshold_2y", "threshold_5y"} <= set(out.columns)


def test_combine_rejects_count_mismatch(spark):
    with pytest.raises(PipelineCheckError, match="cell count"):
        combine_threshold_rasters(
            [_raster(spark, "threshold_2y", n=12),
             _raster(spark, "threshold_5y", n=10)])


def test_combine_rejects_misaligned_grids(spark):
    # same count, shifted by one full cell → inner join loses rows
    shifted = _raster(spark, "threshold_5y").withColumn(
        "latitude", F.col("latitude") + 0.05)
    with pytest.raises(PipelineCheckError, match="row loss"):
        combine_threshold_rasters([_raster(spark, "threshold_2y"), shifted])


def test_combine_rejects_duplicate_cells(spark):
    # a cell duplicated in BOTH rasters (e.g. a double-ingested tile) fans
    # the join out: 2x2 matches for that key push the output count past the
    # input count.  (A dup on only ONE side is invisible to the reference's
    # count check — the +1 fan-out and the -1 unmatched-cell loss cancel —
    # so the operator inherits that documented blind spot.)
    def with_dup(col):
        r = _raster(spark, col, n=11)
        return r.unionByName(r.orderBy("latitude", "longitude").limit(1))
    with pytest.raises(PipelineCheckError, match="fan-out"):
        combine_threshold_rasters([with_dup("threshold_2y"),
                                   with_dup("threshold_5y")])


def test_combine_check_off_skips_actions(spark):
    out = combine_threshold_rasters(
        [_raster(spark, "threshold_2y", n=12),
         _raster(spark, "threshold_5y", n=10)],
        add_geom=False, sort=False, check=False)
    assert out.count() == 10  # inner join result, no guard raised


def test_combine_needs_two(spark):
    with pytest.raises(ValueError, match=">= 2"):
        combine_threshold_rasters([_raster(spark, "threshold_2y")])


def test_rename_maps_length_mismatch_raises(spark):
    import pytest

    from flood_data_spark.operators.threshold import combine_threshold_rasters

    df = spark.createDataFrame([(0.025, 0.025, 1.0)],
                               "latitude double, longitude double, x double")
    with pytest.raises(ValueError, match="rename_maps"):
        combine_threshold_rasters([df, df, df],
                                  rename_maps=[{"x": "threshold_2y"}])
