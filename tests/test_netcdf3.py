"""Classic-NetCDF reader tests: the file under test is hand-assembled
byte-by-byte from the public NetCDF classic-format spec inside this test
module (there is no writer in the package — decode correctness cannot lean
on a sibling encoder), then decoded by sources.netcdf3 and, end-to-end,
through netcdf_decoder inside a Spark mapInPandas boundary."""

import math
import struct

import numpy as np
import pandas as pd
import pytest

from flood_data_spark.sources.netcdf3 import parse_netcdf3, to_dataframe
from flood_data_spark.sources.raster import netcdf_decoder

NC_DIMENSION, NC_VARIABLE, NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C
SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 4, 6: 8}
PACK = {1: "b", 3: "h", 4: "i", 5: "f", 6: "d"}


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * ((4 - len(b) % 4) % 4)


def _name(s: str) -> bytes:
    raw = s.encode()
    return struct.pack(">i", len(raw)) + _pad4(raw)


def _values(nc_type: int, vals) -> bytes:
    body = b"".join(struct.pack(">" + PACK[nc_type], v) for v in vals)
    return _pad4(body)


def _attrs(d: dict) -> bytes:
    # d: name -> (nc_type, [values])
    if not d:
        return struct.pack(">ii", 0, 0)
    out = struct.pack(">ii", NC_ATTRIBUTE, len(d))
    for nm, (t, vals) in d.items():
        out += _name(nm) + struct.pack(">ii", t, len(vals)) \
            + _values(t, vals)
    return out


def build_cdf1(dims, variables):
    """dims: [(name, size)]; variables: [(name, dimids, attrs, nc_type,
    values-flat)].  Returns classic CDF-1 bytes with correct begin
    offsets, data in var-list order."""
    header = b"CDF\x01" + struct.pack(">i", 0)          # numrecs = 0
    header += struct.pack(">ii", NC_DIMENSION, len(dims))
    for nm, sz in dims:
        header += _name(nm) + struct.pack(">i", sz)
    header += struct.pack(">ii", 0, 0)                  # no global attrs

    var_blobs, payloads = [], []
    for nm, dimids, attrs, t, vals in variables:
        data = _values(t, vals)
        vsize = len(data)
        blob = (_name(nm) + struct.pack(">i", len(dimids))
                + b"".join(struct.pack(">i", i) for i in dimids)
                + _attrs(attrs) + struct.pack(">ii", t, vsize))
        var_blobs.append(blob)
        payloads.append(data)

    fixed = (len(header) + struct.pack(">ii", NC_VARIABLE,
                                       len(variables)).__len__()
             + sum(len(b) + 4 for b in var_blobs))      # +4: begin int32
    out = header + struct.pack(">ii", NC_VARIABLE, len(variables))
    begin = fixed
    for blob, data in zip(var_blobs, payloads):
        out += blob + struct.pack(">i", begin)
        begin += len(data)
    return out + b"".join(payloads)


def _golden_raster() -> bytes:
    """2x3 grid: double coords, short band with CF fill (-999) and
    scale_factor 0.1."""
    return build_cdf1(
        dims=[("latitude", 2), ("longitude", 3)],
        variables=[
            ("latitude", [0], {}, 6, [10.0, 10.5]),
            ("longitude", [1], {}, 6, [20.0, 20.25, 20.5]),
            ("band", [0, 1],
             {"_FillValue": (3, [-999]), "scale_factor": (6, [0.1])},
             3, [10, -999, 30, 40, 50, -999]),
        ])


def test_parse_header_and_raw_data():
    dims, variables, gatts = parse_netcdf3(_golden_raster())
    assert dims == {"latitude": 2, "longitude": 3}
    assert gatts == {}
    assert set(variables) == {"latitude", "longitude", "band"}
    band = variables["band"]
    assert band["dims"] == ["latitude", "longitude"]
    assert band["data"].tolist() == [[10, -999, 30], [40, 50, -999]]
    assert band["attrs"]["_FillValue"] == -999
    assert variables["latitude"]["data"].tolist() == [10.0, 10.5]


def test_to_dataframe_cf_semantics():
    pdf = to_dataframe(_golden_raster())
    assert list(pdf.columns) == ["latitude", "longitude", "band"]
    assert pdf["latitude"].tolist() == [10.0, 10.0, 10.0, 10.5, 10.5, 10.5]
    assert pdf["longitude"].tolist() == [20.0, 20.25, 20.5] * 2
    got = pdf["band"].tolist()
    # fill -> NaN BEFORE scaling: -999 never leaks as -99.9
    expect = [1.0, math.nan, 3.0, 4.0, 5.0, math.nan]
    for g, e in zip(got, expect):
        assert (math.isnan(g) and math.isnan(e)) or g == pytest.approx(e)


def test_record_variables_raise():
    nc = build_cdf1(dims=[("time", 0), ("x", 2)],
                    variables=[("v", [0, 1], {}, 5, [])])
    with pytest.raises(NotImplementedError, match="record"):
        parse_netcdf3(nc)


def test_bad_magic_and_hdf5_raise():
    with pytest.raises(ValueError, match="bad magic"):
        parse_netcdf3(b"not netcdf")
    # HDF5-signature bytes now route to the native minimal reader
    # (tests/test_hdf5.py); a bare signature is a truncated file
    with pytest.raises(ValueError, match="truncated"):
        netcdf_decoder(b"\x89HDF\r\n\x1a\n")


def test_netcdf_decoder_routes_classic_natively():
    pdf = netcdf_decoder(_golden_raster())
    assert isinstance(pdf, pd.DataFrame)
    assert len(pdf) == 6
    assert np.isnan(pdf["band"]).sum() == 2


def test_classic_netcdf_through_spark(spark, tmp_path):
    """End-to-end: binaryFile scan -> netcdf_decoder in mapInPandas — the
    static-raster ingest path running on REAL classic-NetCDF bytes."""
    from pyspark.sql.types import (DoubleType, StructField, StructType)

    (tmp_path / "upstream.nc").write_bytes(_golden_raster())
    files = (spark.read.format("binaryFile")
             .load(str(tmp_path) + "/*.nc").select("content"))
    schema = StructType([StructField("latitude", DoubleType()),
                         StructField("longitude", DoubleType()),
                         StructField("band", DoubleType())])

    def decode(batches):
        for pdf in batches:
            for content in pdf["content"]:
                yield netcdf_decoder(bytes(content))

    out = files.mapInPandas(decode, schema=schema).collect()
    assert len(out) == 6
    vals = {(r.latitude, r.longitude): r.band for r in out}
    assert vals[(10.0, 20.0)] == pytest.approx(1.0)
    # CF fill -> NaN in pandas -> SQL NULL across the Arrow boundary:
    # exactly what the NA-drop/mask operators (P8) key on
    assert vals[(10.0, 20.25)] is None
    assert vals[(10.5, 20.5)] is None
    assert vals[(10.5, 20.25)] == pytest.approx(5.0)
