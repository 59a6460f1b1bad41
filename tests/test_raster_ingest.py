"""Distributed raster-ingestion tests (reference E2 redesign) — binaryFile +
mapInPandas with the deterministic synthetic decoder."""

import json
import os

import pytest
from pyspark.sql import functions as F

from flood_data_spark.sources.raster import (
    grib_decoder,
    merge_control_and_ensemble,
    read_rasters,
    synthetic_grib_decoder,
)
from flood_data_spark.functions.geometry import bbox_filter


def _write_fake_gribs(tmpdir, n_steps=3, members=4):
    t0 = 1_704_067_200 * 10**9  # 2024-01-01 ns
    for s in range(1, n_steps + 1):
        hdr = {"step_days": s, "time_ns": t0, "members": members,
               "lat0": 0.025, "lon0": 0.025, "nlat": 3, "nlon": 3,
               "resolution": 0.05}
        with open(os.path.join(tmpdir, f"forecast-{s}.grib"), "w") as f:
            json.dump(hdr, f)
    return t0


def test_read_rasters_end_to_end(spark, tmp_path):
    t0 = _write_fake_gribs(str(tmp_path))
    df = read_rasters(spark, str(tmp_path) + "/*.grib",
                      decoder=synthetic_grib_decoder)
    # 3 steps x 4 members x 9 cells
    assert df.count() == 3 * 4 * 9
    assert [f.name for f in df.schema] == [
        "number", "latitude", "longitude", "time", "step", "valid_time",
        "dis24"]
    # decode output is pre-rounding (raw floats like 0.025+0.05 =
    # 0.07500000000000001); the key discipline applies downstream
    row = df.filter((F.col("number") == 2)
                    & (F.round("latitude", 3) == 0.075)
                    & (F.round("longitude", 3) == 0.125)
                    & (F.col("step") == 2 * 86400 * 10**9)).first()
    # dis = 10 + m + i*100 + j + step_days*1000 = 10+2+100+2+2000
    assert row.dis24 == pytest.approx(2114.0)
    assert row.time == t0
    assert row.valid_time == t0 + 2 * 86400 * 10**9


def test_member_filter_dispatch(spark, tmp_path):
    _write_fake_gribs(str(tmp_path), n_steps=1, members=5)
    cf = read_rasters(spark, str(tmp_path) + "/*.grib",
                      decoder=synthetic_grib_decoder, member_filter="cf")
    pf = read_rasters(spark, str(tmp_path) + "/*.grib",
                      decoder=synthetic_grib_decoder, member_filter="pf")
    assert cf.select("number").distinct().count() == 1
    assert pf.select("number").distinct().count() == 4
    merged = merge_control_and_ensemble(cf, pf)
    assert merged.count() == 5 * 9
    assert merged.select("number").distinct().count() == 5


def test_spatial_slice_on_decoded(spark, tmp_path):
    _write_fake_gribs(str(tmp_path), n_steps=1, members=1)
    df = read_rasters(spark, str(tmp_path) + "/*.grib",
                      decoder=synthetic_grib_decoder)
    # 3x3 grid at 0.025..0.125; slice the lower 2x2
    sliced = bbox_filter(df, 0.0, 0.08, 0.0, 0.08)
    assert sliced.count() == 4


def test_real_grib_decoder_raises_without_cfgrib(spark):
    with pytest.raises(NotImplementedError):
        grib_decoder(b"GRIB")
