"""CCSDS 121.0-B codec (sources/ccsds121.py): layered spec tests —
bit I/O, mapper bijectivity, per-option round trips (FS, splitting,
second extension, zero runs with ROS, no-compression), reference
sample handling, full fuzz, and the GRIB2 template 5.42 wiring."""

import numpy as np
import pytest

from flood_data_spark.sources.ccsds121 import (
    _BitReader, _BitWriter, _id_len, _map_delta, _unmap, decode, encode)


def test_bit_io_round_trip():
    w = _BitWriter()
    w.write_bits(0b101, 3)
    w.fs(5)                      # 000001
    w.write_bits(0x1234, 16)
    data = w.flush()
    r = _BitReader(data)
    assert r.read_bits(3) == 0b101
    assert r.read_fs() == 5
    assert r.read_bits(16) == 0x1234
    with pytest.raises(ValueError, match="exhausted"):
        _BitReader(b"").read()


def test_mapper_is_a_bijection_of_the_sample_range():
    # spec 121.0-B mapper: for every predictor value, delta -> code is a
    # bijection [x_min..x_max] -> [0..x_max]
    for nbits in (3, 4, 8):
        xmax = (1 << nbits) - 1
        for prev in range(xmax + 1):
            codes = [_map_delta(x, prev, xmax) for x in range(xmax + 1)]
            assert sorted(codes) == list(range(xmax + 1)), prev
            for x in range(xmax + 1):
                assert _unmap(_map_delta(x, prev, xmax), prev, xmax) == x


def test_mapper_small_deltas_get_short_codes():
    # the whole point of the preprocessor: |delta| d maps to ~2|d|
    assert _map_delta(100, 100, 255) == 0
    assert _map_delta(101, 100, 255) == 2
    assert _map_delta(99, 100, 255) == 1
    assert _map_delta(102, 100, 255) == 4


def test_id_len_table():
    assert _id_len(3) == 3 and _id_len(8) == 3
    assert _id_len(9) == 4 and _id_len(16) == 4
    assert _id_len(17) == 5 and _id_len(32) == 5


@pytest.mark.parametrize("fo", ["split:0", "split:2", "split:5",
                                "se", "unc", "zero"])
def test_every_option_round_trips(fo):
    rng = np.random.default_rng(3)
    if fo == "zero":
        xs = [7] * 200          # constant -> all-zero mapped blocks
    elif fo == "se":
        xs = [50 + int(v) for v in rng.integers(0, 2, size=200)]
    else:
        xs = [int(v) for v in rng.integers(0, 256, size=200)]
    enc = encode(xs, 8, 16, 64, force_option=fo)
    assert (decode(enc, len(xs), 8, 16, 64) == np.array(xs)).all()


def test_zero_run_lengths_and_ros():
    # runs of 1..10 zero blocks between non-zero sentinels exercise the
    # q<5 / q>=5 / ROS encodings; J=8 so block counts are easy
    J = 8
    for run in (1, 2, 3, 4, 5, 6, 9, 10):
        xs = [99] * J + [99] * (J * run) + [1] * J
        # constant 99 after the first block -> zero mapped blocks
        got = decode(encode(xs, 8, J, 1000), len(xs), 8, J, 1000)
        assert (got == np.array(xs)).all(), run
    # ROS: trailing zeros to the end of data
    xs = [5] * (J * 20)
    got = decode(encode(xs, 8, J, 1000), len(xs), 8, J, 1000)
    assert (got == np.array(xs)).all()


def test_zero_run_respects_reference_boundaries():
    # constant data with rsi=4: every 4th block is a reference block,
    # so zero runs must break there and restart
    J, rsi = 8, 4
    xs = [123] * (J * 13)
    got = decode(encode(xs, 8, J, rsi), len(xs), 8, J, rsi)
    assert (got == np.array(xs)).all()


def test_second_extension_gamma_inversion():
    # gamma = (a+b)(a+b+1)/2 + b must invert exactly for all small pairs
    from math import isqrt
    for a in range(20):
        for b in range(20):
            g = (a + b) * (a + b + 1) // 2 + b
            m = (isqrt(8 * g + 1) - 1) // 2
            d2 = g - m * (m + 1) // 2
            assert (m - d2, d2) == (a, b)


def test_reference_samples_resynchronize_the_predictor():
    # with rsi=1 EVERY block carries a raw reference sample — the
    # stream decodes even though cross-block prediction never applies
    rng = np.random.default_rng(9)
    xs = [int(v) for v in rng.integers(0, 4096, size=150)]
    for rsi in (1, 2, 1000):
        got = decode(encode(xs, 12, 16, rsi), len(xs), 12, 16, rsi)
        assert (got == np.array(xs)).all(), rsi


def test_fuzz_round_trip_across_profiles():
    rng = np.random.default_rng(17)
    for nbits in (3, 8, 13, 16, 24, 32):
        for J in (8, 16, 32, 64):
            for rsi in (1, 7, 128):
                n = int(rng.integers(1, 300))
                hi = min(1 << nbits, 1 << 20)
                xs = [int(v) for v in rng.integers(0, hi, size=n)]
                got = decode(encode(xs, nbits, J, rsi), n, nbits, J, rsi)
                assert (got == np.array(xs)).all(), (nbits, J, rsi)


def test_smooth_data_actually_compresses():
    xs = [int(1000 + 30 * np.sin(i / 10)) for i in range(5000)]
    enc = encode(xs, 16, 16, 128)
    assert len(enc) < 0.3 * 5000 * 2    # < 30% of the raw 16-bit size


def test_profile_guards():
    with pytest.raises(NotImplementedError, match="bit samples"):
        encode([0, 1], 2, 16, 64)
    with pytest.raises(NotImplementedError, match="block size"):
        encode([0, 1], 8, 10, 64)
    with pytest.raises(ValueError, match="outside"):
        encode([300], 8, 16, 64)
    with pytest.raises(ValueError, match="rsi"):
        decode(b"\x00", 1, 8, 16, 0)


def test_grib2_template_542_round_trip():
    from flood_data_spark.sources.grib2 import (
        build_ccsds_message, grib2_to_dataframe)

    xs = [(11 * k) % 65536 for k in range(24)]
    msg = build_ccsds_message(xs, nj=4, ni=6, la1=0.175, lo1=0.025,
                              d=0.05, nbits=16, block_size=8, rsi=2,
                              member=3, e_scale=0, d_scale=1)
    pdf = grib2_to_dataframe(msg)
    assert len(pdf) == 24
    assert (pdf["number"] == 3).all()
    got = np.round(pdf["dis24"].to_numpy() * 10).astype(np.int64)
    assert (got == np.array(xs)).all()


def test_grib2_542_rejects_unsupported_option_masks():
    from flood_data_spark.sources.grib2 import (
        build_ccsds_message, grib2_to_dataframe)

    msg = bytearray(build_ccsds_message(
        [1, 2, 3, 4, 5, 6], nj=2, ni=3, la1=0.125, lo1=0.025, d=0.05,
        nbits=8))
    # find section 5 (skip the 16-byte indicator: sections carry
    # 4-byte length + 1-byte number)
    pos = 16
    while msg[pos + 4] != 5:
        pos += int.from_bytes(msg[pos:pos + 4], "big")
    assert msg[pos + 4] == 5
    msg[pos + 21] |= 1                   # flip AEC_DATA_SIGNED
    with pytest.raises(NotImplementedError, match="options mask"):
        grib2_to_dataframe(bytes(msg))

    # round 13 (VERDICT r12 #4): the FULL rejection contract, one pin
    # per named unsupported CCSDS profile — signed (above), 3-byte,
    # restricted, RSI-padded, and the two REQUIRED flags cleared
    from flood_data_spark.sources.ccsds121 import (
        FLAG_3BYTE, FLAG_MSB, FLAG_PAD_RSI, FLAG_PREPROCESS,
        FLAG_RESTRICTED)
    for patch in (lambda f: f | FLAG_3BYTE,
                  lambda f: f | FLAG_RESTRICTED,
                  lambda f: f | FLAG_PAD_RSI,
                  lambda f: f & ~FLAG_MSB,
                  lambda f: f & ~FLAG_PREPROCESS):
        bad = bytearray(msg)
        bad[pos + 21] = patch(bad[pos + 21] & ~1)   # un-sign, re-patch
        with pytest.raises(NotImplementedError, match="options mask"):
            grib2_to_dataframe(bytes(bad))


def test_zero_run_crossing_boundary_rejected():
    # hand-assemble a nonconformant stream: a valid reference block
    # followed by an explicit zero run of 10 blocks where only 3 fit
    # before the next reference sample (rsi=4) — the decoder must fail
    # loudly, never silently skip the required raw reference (r11
    # self-review; a conformant encoder emits ROS at the boundary)
    w = _BitWriter()
    w.write_bits(1, 3)            # block 0: split k=0 (ref block)
    w.write_bits(42, 8)           # raw reference sample
    for _ in range(7):
        w.fs(0)                   # seven zero deltas
    w.write_bits(0, 3)            # block 1: id 0 ...
    w.write(0)                    # ... extension 0 -> zero run
    w.fs(10)                      # run of 10 (> the 3 blocks allowed)
    with pytest.raises(NotImplementedError, match="boundary"):
        decode(w.flush(), 8 * 5, 8, 8, 4)
