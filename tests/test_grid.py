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


def test_nearest_reindex_offset_grids(spark):
    """Source grid offset by an arbitrary delta (the case the snap-equi-join
    cannot express): every target must match the truly nearest source point,
    verified against a brute-force python argmin."""
    from flood_data_spark.operators.grid import nearest_reindex

    res = 0.05
    # source on a grid shifted +0.018/+0.007 from the canonical centers
    src_pts = [(round(0.018 + i * res, 6), round(0.007 + j * res, 6),
                float(i * 10 + j))
               for i in range(6) for j in range(6)]
    source = spark.createDataFrame(
        src_pts, "latitude double, longitude double, uparea double")
    tgt_pts = [(0.0, 0.0), (0.11, 0.04), (0.26, 0.26), (0.029, 0.251)]
    target = spark.createDataFrame(
        tgt_pts, "latitude double, longitude double")

    out = {(r.latitude, r.longitude): r
           for r in nearest_reindex(target, source, resolution=res).collect()}
    assert len(out) == len(tgt_pts)
    for (tla, tlo) in tgt_pts:
        best = min(src_pts,
                   key=lambda s: ((tla - s[0]) ** 2 + (tlo - s[1]) ** 2,
                                  s[0], s[1]))
        r = out[(tla, tlo)]
        assert (r.latitude_src, r.longitude_src) == (best[0], best[1])
        assert r.uparea_src == best[2]
        assert abs(r.distance_src
                   - ((tla - best[0]) ** 2 + (tlo - best[1]) ** 2) ** 0.5) < 1e-12


def test_nearest_reindex_max_distance_and_left_outer(spark):
    from flood_data_spark.operators.grid import nearest_reindex

    source = spark.createDataFrame(
        [(0.025, 0.025, 1.0)], "latitude double, longitude double, v double")
    target = spark.createDataFrame(
        [(0.03, 0.03), (5.0, 5.0)], "latitude double, longitude double")
    rows = {(r.latitude, r.longitude): r
            for r in nearest_reindex(target, source, resolution=0.05,
                                     max_distance=0.1).collect()}
    # in-range point matches; far point survives with nulls (left outer)
    assert rows[(0.03, 0.03)].v_src == 1.0
    assert rows[(5.0, 5.0)].v_src is None
    assert rows[(5.0, 5.0)].distance_src is None


def test_nearest_reindex_plan_no_cross_join(spark):
    """The candidate stage must be an equi-join on the bucket key — never a
    cartesian/BNLJ (the anti-scale formulation)."""
    from flood_data_spark.operators.grid import nearest_reindex

    source = spark.createDataFrame(
        [(0.025, 0.025, 1.0)], "latitude double, longitude double, v double")
    target = spark.createDataFrame(
        [(0.03, 0.03)], "latitude double, longitude double")
    plan = (nearest_reindex(target, source, resolution=0.05)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_nearest_reindex_single_branch_consistency(spark):
    """One output row per target even through nondeterministic input
    layout (repartition) — the monotonically_increasing_id is generated
    and consumed inside one plan branch (review finding: two-branch
    desync)."""
    from flood_data_spark.operators.grid import nearest_reindex

    src = spark.createDataFrame(
        [(0.025 + i * 0.05, 0.025, float(i)) for i in range(4)],
        "latitude double, longitude double, v double")
    tgt = (spark.createDataFrame(
        [(0.03 + i * 0.01, 0.02) for i in range(40)],
        "latitude double, longitude double")
        .repartition(7))
    out = nearest_reindex(tgt, src, resolution=0.05)
    assert out.count() == 40
    assert out.select("latitude", "longitude").distinct().count() == 40
