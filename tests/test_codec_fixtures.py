"""Hand-assembled byte fixtures for the from-spec codec stack.

Provenance and what this does/doesn't prove: this container ships no
third-party encoder (no ecCodes, libaec, OpenJPEG, libnetcdf), so true
independent-encoder fixtures cannot be produced here.  These streams
are the next-strongest evidence: each was assembled BIT BY BIT from the
public spec clauses (CCSDS 121.0-B Blue Book section 3-4; WMO FM-92
GRIB2 section/template octet tables; the NetCDF classic-format spec's
BNF), with the expected decoded samples computed BY HAND from the
mapper/value formulas — never by running this repo's encoders.  That
kills the encoder/decoder mirror-bug class (a bit-layout or
state-update error shared by `encode` and `decode` passes round-trip
tests but fails here, because the fixture bits come from the spec text,
not from `encode`).  What it cannot kill: a spec clause misread the
same way during decoding and during hand-assembly.  Closing that last
gap needs real third-party bytes — tracked as the standing ADVICE item.

Every fixture is FROZEN as a hex literal (the derivation lives in the
comments): the test must keep decoding these exact bytes forever, so a
regression in any bit-level path fails loudly against an immutable
artifact rather than a co-evolving encoder.
"""

import calendar

import numpy as np
import pytest

# ---------------------------------------------------------------------
# CCSDS 121.0-B — sources/ccsds121.py
#
# Shared derivation machinery (in comments): FS(v) = v zeros then a 1;
# option-ID width is 3 bits for 8-bit samples; the first sample of a
# reference block rides raw; mapped values unmap through the standard
# mapper with theta = min(p, xmax - p).
# ---------------------------------------------------------------------

# Block 0 (reference, FS option id=001): raw 100, then FS of the
# hand-mapped deltas of x = 100,101,99,102,100,100,103,98 ->
# d = 2,3,6,3,0,6,9.  Block 1 (id=000 + extension bit 0): zero-block
# run, FS(0) => run of 1 block => 8 samples equal to the predictor (98).
# bits: 001 01100100 001 0001 0000001 0001 1 0000001 0000000001 000 0 1
CCSDS_FS_ZERORUN = bytes.fromhex("2c84408c080210")
CCSDS_FS_ZERORUN_SAMPLES = [100, 101, 99, 102, 100, 100, 103, 98,
                            98, 98, 98, 98, 98, 98, 98, 98]

# One reference block, sample splitting k=2 (id = k+1 = 3 = 011):
# raw 50, FS of d>>2 for hand-mapped d = 5,2,9,0,13,7,4, then the two
# split LSBs of each d in sample order.
# bits: 011 00110010 01 1 001 1 0001 01 1 01 10 01 00 01 11 00
CCSDS_SPLIT_K2 = bytes.fromhex("664cc5591c")
CCSDS_SPLIT_K2_SAMPLES = [50, 47, 48, 43, 43, 36, 32, 34]

# Block 0: FS reference block from raw 200 with d = 1,3,0,2,4,0,1.
# Block 1: SECOND EXTENSION (id=000 + extension bit 1): the 8 mapped
# values 0,1,2,0,1,1,0,0 pair into gammas (a+b)(a+b+1)/2 + b =
# 2,3,4,0, each FS-coded.
CCSDS_SECOND_EXTENSION = bytes.fromhex("3908c868910c")
CCSDS_SECOND_EXTENSION_SAMPLES = [200, 199, 197, 197, 198, 200, 200,
                                  199, 199, 198, 199, 199, 198, 197,
                                  197, 197]

# One reference block, NO COMPRESSION (id = 111): raw 10, then the 7
# mapped values 255,7,0,200,13,1,99 at full 8 bits each.  Unmapping
# exercises both large-delta branches (d > 2*theta with theta = p and
# theta = xmax - p).
CCSDS_NO_COMPRESSION = bytes.fromhex("e15fe0e01901a02c60")
CCSDS_NO_COMPRESSION_SAMPLES = [10, 255, 248, 248, 55, 48, 47, 99]


def test_ccsds_fs_and_zero_run_fixture():
    from flood_data_spark.sources.ccsds121 import decode

    got = decode(CCSDS_FS_ZERORUN, 16, 8, block_size=8, rsi=2)
    assert got.tolist() == CCSDS_FS_ZERORUN_SAMPLES


def test_ccsds_sample_splitting_fixture():
    from flood_data_spark.sources.ccsds121 import decode

    got = decode(CCSDS_SPLIT_K2, 8, 8, block_size=8, rsi=64)
    assert got.tolist() == CCSDS_SPLIT_K2_SAMPLES


def test_ccsds_second_extension_fixture():
    from flood_data_spark.sources.ccsds121 import decode

    got = decode(CCSDS_SECOND_EXTENSION, 16, 8, block_size=8, rsi=64)
    assert got.tolist() == CCSDS_SECOND_EXTENSION_SAMPLES


def test_ccsds_no_compression_fixture():
    from flood_data_spark.sources.ccsds121 import decode

    got = decode(CCSDS_NO_COMPRESSION, 8, 8, block_size=8, rsi=64)
    assert got.tolist() == CCSDS_NO_COMPRESSION_SAMPLES


def test_ccsds_fixtures_not_self_produced():
    """The mirror-bug argument only holds if these bytes do NOT all
    match what this repo's own encoder would emit — the hand assembly
    picked non-optimal option codes (an FS block the encoder
    second-extends; an explicit f=0 zero run where the encoder emits a
    different count form), so the fixture bits are an independent code
    path, not a frozen encoder output.  (split_k2 / no-compression DO
    coincide with the encoder's optimal choice — unavoidable when the
    optimum is unique — which is why the two divergent streams carry
    the independence argument.)"""
    from flood_data_spark.sources.ccsds121 import encode

    own_fs = encode(CCSDS_FS_ZERORUN_SAMPLES, 8, 8, 2)
    assert own_fs != CCSDS_FS_ZERORUN
    own_se = encode(CCSDS_SECOND_EXTENSION_SAMPLES, 8, 8, 64)
    assert own_se != CCSDS_SECOND_EXTENSION


# ---------------------------------------------------------------------
# GRIB2 — sources/grib2.py: one complete message hand-assembled from
# the WMO FM-92 octet tables (indicator + sections 1/3/4/5/6/7 + 7777),
# grid template 3.0 (2x2, la1=60.0 lo1=10.0, d=0.5, scan +i -j),
# product template 4.0 (unit=hour, forecast time 12, reference time
# 2023-03-05T06:00Z), data template 5.0 (R=0 E=0 D=0, 8 bits),
# no bitmap, packed bytes 01 02 03 04.
# ---------------------------------------------------------------------

GRIB2_SIMPLE_MESSAGE = bytes.fromhex(
    "475249420000010200000000000000b700000015010062000002010107e7"
    "03050600000001000000480300000000040000000006000000000000000000"
    "00000000000000000002000000020000000000000000039387000098968030"
    "038be5e000a037a00007a1200007a12000000000220400000000000402000000"
    "0000010000000c010000000000ff0000000000000000150500000004000000"
    "0000000000000008000000000606ff00000009070102030437373737")


def test_grib2_hand_assembled_message():
    from flood_data_spark.sources.grib2 import grib2_to_dataframe

    pdf = grib2_to_dataframe(GRIB2_SIMPLE_MESSAGE)
    t = calendar.timegm((2023, 3, 5, 6, 0, 0)) * 10**9
    assert pdf["time"].tolist() == [t] * 4
    assert pdf["step"].tolist() == [12 * 3600 * 10**9] * 4
    assert pdf["valid_time"].tolist() == [t + 12 * 3600 * 10**9] * 4
    assert pdf["number"].tolist() == [0] * 4
    assert pdf["dis24"].tolist() == [1.0, 2.0, 3.0, 4.0]
    assert pdf["latitude"].tolist() == [60.0, 60.0, 59.5, 59.5]
    assert pdf["longitude"].tolist() == [10.0, 10.5, 10.0, 10.5]


def test_grib2_fixture_not_self_produced():
    from flood_data_spark.sources.grib2 import build_simple_message

    own = build_simple_message([1, 2, 3, 4], nj=2, ni=2, la1=60.0,
                               lo1=10.0, d=0.5, nbits=8,
                               year=2023, month=3, day=5,
                               ftime_hours=12)
    # same field, different bytes: the hand assembly sets centre 98,
    # table version 1 and a 06Z reference hour the builder does not
    assert own != GRIB2_SIMPLE_MESSAGE
    # but both must DECODE identically where the semantics overlap
    from flood_data_spark.sources.grib2 import grib2_to_dataframe
    a = grib2_to_dataframe(GRIB2_SIMPLE_MESSAGE)
    b = grib2_to_dataframe(own)
    assert a["dis24"].tolist() == b["dis24"].tolist()
    assert a["latitude"].tolist() == b["latitude"].tolist()
    assert a["longitude"].tolist() == b["longitude"].tolist()


# ---------------------------------------------------------------------
# NetCDF classic (CDF-1) — sources/netcdf3.py: magic + 0 records,
# dim_list [lat=2, lon=2], no global attributes, var_list with three
# doubles (lat, lon, uparea[lat,lon]), data section with hand-written
# IEEE-754 big-endian doubles.  Header offsets computed by hand
# (header = 172 bytes; lat@172, lon@188, uparea@204).
# ---------------------------------------------------------------------

NETCDF3_CLASSIC_FILE = bytes.fromhex(
    "43444601000000000000000a00000002000000036c61740000000002000000"
    "036c6f6e000000000200000000000000000000000b0000000300000003"
    "6c617400000000010000000000000000000000000000000600000010000000"
    "ac000000036c6f6e0000000001000000010000000000000000000000060000"
    "0010000000bc0000000675706172656100000000000200000000000000010000"
    "0000000000000000000600000020000000cc"
    "404e000000000000404dc000000000004024000000000000402500000000"
    "00003ff000000000000040000000000000004008000000000000401000000000"
    "0000")


def test_netcdf3_hand_assembled_file():
    from flood_data_spark.sources.netcdf3 import (parse_netcdf3,
                                                  to_dataframe)

    dims, variables, _ = parse_netcdf3(NETCDF3_CLASSIC_FILE)
    assert dims == {"lat": 2, "lon": 2}
    assert np.array_equal(variables["uparea"]["data"],
                          np.array([[1.0, 2.0], [3.0, 4.0]]))
    pdf = to_dataframe(NETCDF3_CLASSIC_FILE)
    assert pdf["lat"].tolist() == [60.0, 60.0, 59.5, 59.5]
    assert pdf["lon"].tolist() == [10.0, 10.5, 10.0, 10.5]
    assert pdf["uparea"].tolist() == [1.0, 2.0, 3.0, 4.0]


# ---------------------------------------------------------------------
# JPEG 2000 — sources/jpeg2000.py: a hand-assembled codestream
# (SOC/SIZ/COD/QCD/SOT/SOD/EOC for a 3x2 8-bit image, 0 DWT levels,
# one EMPTY packet).  The decoder's GRIB profile rejects empty packets
# by design; this fixture pins that the marker chain PARSES all the way
# to the first packet bit and then fails loudly with the named escape
# hatch — hand-assembling a NON-empty packet would mean hand-running
# the MQ coder, which is re-implementation, not independent evidence.
# ---------------------------------------------------------------------

J2K_EMPTY_PACKET_CODESTREAM = bytes.fromhex(
    "ff4fff51002900000000000300000002000000000000000000000003000000"
    "0200000000000000000001070101ff52000c00000001000004040001"
    "ff5c00042040ff90000a00000000000f0001ff9300ffd9")


def test_jpeg2000_marker_chain_parses_to_first_packet():
    from flood_data_spark.sources.jpeg2000 import decode_codestream

    with pytest.raises(NotImplementedError, match="empty packets"):
        decode_codestream(J2K_EMPTY_PACKET_CODESTREAM)
