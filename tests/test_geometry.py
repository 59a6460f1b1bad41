"""WKT geometry + serving-predicate tests — models reference
test/test_spark_transforms.py:617-645 exact-string golden rows."""

from flood_data_spark.functions.geometry import (
    add_geometry,
    bbox_filter,
    cell_bbox_for_point,
    neighbor_filter,
)


def test_wkt_exact_string(spark):
    df = spark.createDataFrame([(16.975, -17.975)], ["latitude", "longitude"])
    out = add_geometry(df, half_grid_size=0.025, precision=3).first()
    assert out.wkt == ("POLYGON ((-18.0 16.95,-18.0 17.0,-17.95 17.0,"
                       "-17.95 16.95,-18.0 16.95))")


def test_wkt_no_trailing_zero_padding(spark):
    df = spark.createDataFrame([(0.025, 0.025)], ["latitude", "longitude"])
    out = add_geometry(df, 0.025, 3).first()
    assert out.wkt == "POLYGON ((0.0 0.0,0.0 0.05,0.05 0.05,0.05 0.0,0.0 0.0))"


def test_cell_bbox_for_point():
    lat_min, lat_max, lon_min, lon_max = cell_bbox_for_point(16.99, -17.96)
    assert (round(lat_min, 3), round(lat_max, 3)) == (16.95, 17.0)
    assert (round(lon_min, 3), round(lon_max, 3)) == (-18.0, -17.95)


def test_bbox_filter_and_neighbors(spark):
    cells = [(0.025 + 0.05 * i, 0.025 + 0.05 * j)
             for i in range(5) for j in range(5)]
    df = spark.createDataFrame(cells, ["latitude", "longitude"])
    # box covering the 2x2 lower corner
    assert bbox_filter(df, 0.0, 0.08, 0.0, 0.08).count() == 4
    # 3x3 neighborhood around the center cell (0.125, 0.125)
    assert neighbor_filter(df, 0.13, 0.11, ring=1).count() == 9
