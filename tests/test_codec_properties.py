"""Property-based tests (hypothesis) for the dependency-free codecs:
PNG encode/decode roundtrip over arbitrary images, GRIB2 simple-packing
roundtrip over arbitrary bit widths, classic-NetCDF header/data integrity
over arbitrary grids.  Pure-Python — no Spark session needed."""

import numpy as np
from hypothesis import given, settings, strategies as st

from flood_data_spark.sources.grib2 import grib2_to_dataframe
from flood_data_spark.sources.netcdf3 import to_dataframe
from flood_data_spark.datapipe.codecs import decode_png, encode_png

from tests.test_grib2 import build_message
from tests.test_netcdf3 import build_cdf1


@given(h=st.integers(1, 24), w=st.integers(1, 24),
       c=st.integers(1, 4), seed=st.integers(0, 2**31 - 1))
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_any_shape(h, w, c, seed):
    img = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, c), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


@given(nbits=st.integers(1, 24), seed=st.integers(0, 2**31 - 1),
       e_scale=st.integers(-3, 3), d_scale=st.integers(-2, 2))
@settings(max_examples=60, deadline=None)
def test_grib2_simple_packing_roundtrip(nbits, seed, e_scale, d_scale):
    """value = (R + X*2^E)/10^D must reproduce exactly for any bit width:
    X is integral, R float32, and the formula is evaluated in float64 on
    both sides (the test computes it independently)."""
    rng = np.random.default_rng(seed)
    xs = rng.integers(0, 2**nbits, size=6).tolist()
    msg = build_message(xs, nbits=nbits, ref=50.0,
                        e_scale=e_scale, d_scale=d_scale)
    got = grib2_to_dataframe(msg)["dis24"].astype(np.float64).to_numpy()
    expect = (np.float32(50.0) + np.asarray(xs, dtype=np.float64)
              * 2.0 ** e_scale) / 10.0 ** d_scale
    assert np.allclose(got, expect.astype(np.float32), rtol=1e-6)


@given(nj=st.integers(1, 8), ni=st.integers(1, 8),
       seed=st.integers(0, 2**31 - 1))
@settings(max_examples=40, deadline=None)
def test_netcdf3_grid_integrity(nj, ni, seed):
    """Arbitrary grid sizes: the long-form frame is the exact cartesian
    flattening of the packed array, row-major."""
    rng = np.random.default_rng(seed)
    vals = rng.integers(-1000, 1000, size=nj * ni).tolist()
    nc = build_cdf1(
        dims=[("y", nj), ("x", ni)],
        variables=[
            ("y", [0], {}, 6, [float(i) for i in range(nj)]),
            ("x", [1], {}, 6, [float(j) for j in range(ni)]),
            ("v", [0, 1], {}, 4, vals),
        ])
    pdf = to_dataframe(nc)
    assert len(pdf) == nj * ni
    assert pdf["v"].tolist() == vals
    assert pdf["y"].tolist() == [float(i) for i in range(nj)
                                 for _ in range(ni)]
    assert pdf["x"].tolist() == [float(j) for j in range(ni)] * nj
