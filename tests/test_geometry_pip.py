"""Point-in-polygon (functions/geometry.point_in_polygon) — closed-form
ray-casting tests."""

import pytest

from flood_data_spark.functions.geometry import point_in_polygon

SQUARE = [(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)]
# C-shape opening to the right: the notch (x>1, 1<y<2) is OUTSIDE
CSHAPE = [(0.0, 0.0), (3.0, 0.0), (3.0, 1.0), (1.0, 1.0),
          (1.0, 2.0), (3.0, 2.0), (3.0, 3.0), (0.0, 3.0)]


def _pts(spark, rows):
    return spark.createDataFrame(rows, "id long, lat double, lon double")


def test_square_inside_outside(spark):
    df = _pts(spark, [(1, 1.0, 1.0), (2, 1.0, 3.0), (3, 3.0, 1.0),
                      (4, -0.5, 1.0)])
    got = {r.id: r.inside
           for r in point_in_polygon(df, "lat", "lon", SQUARE).collect()}
    assert got == {1: True, 2: False, 3: False, 4: False}


def test_concave_notch_is_outside(spark):
    df = _pts(spark, [(1, 1.5, 2.0),    # in the notch
                      (2, 0.5, 2.0),    # lower arm
                      (3, 2.5, 2.0),    # upper arm
                      (4, 1.5, 0.5)])   # spine
    got = {r.id: r.inside
           for r in point_in_polygon(df, "lat", "lon", CSHAPE).collect()}
    assert got == {1: False, 2: True, 3: True, 4: True}


def test_crossings_parity(spark):
    # a point left of the C's notch sees both arms: 2 crossings right of
    # the notch opening at its latitude? — check raw counts directly
    df = _pts(spark, [(1, 1.5, 0.5), (2, 1.5, 2.0)])
    got = {r.id: r.n_crossings
           for r in point_in_polygon(df, "lat", "lon", CSHAPE).collect()}
    assert got[1] % 2 == 1 and got[2] % 2 == 0


def test_zero_shuffle_plan(spark):
    df = _pts(spark, [(1, 1.0, 1.0)])
    plan = (point_in_polygon(df, "lat", "lon", SQUARE)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_validation(spark):
    df = _pts(spark, [(1, 1.0, 1.0)])
    with pytest.raises(ValueError, match="vertices"):
        point_in_polygon(df, "lat", "lon", [(0.0, 0.0), (1.0, 1.0)])
