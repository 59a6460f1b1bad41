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
    # bijection [x_min..x_max] -> [0..x_max - x_min], for both the
    # unsigned (x_min = 0) and two's-complement signed ranges
    for nbits in (3, 4, 8):
        for xmin in (0, -(1 << (nbits - 1))):
            xmax = (1 << nbits) - 1 + xmin
            span = xmax - xmin
            for prev in range(xmin, xmax + 1):
                codes = [_map_delta(x, prev, xmin, xmax)
                         for x in range(xmin, xmax + 1)]
                assert sorted(codes) == list(range(span + 1)), prev
                for x in range(xmin, xmax + 1):
                    assert _unmap(_map_delta(x, prev, xmin, xmax),
                                  prev, xmin, xmax) == x


def test_mapper_small_deltas_get_short_codes():
    # the whole point of the preprocessor: |delta| d maps to ~2|d|
    assert _map_delta(100, 100, 0, 255) == 0
    assert _map_delta(101, 100, 0, 255) == 2
    assert _map_delta(99, 100, 0, 255) == 1
    assert _map_delta(102, 100, 0, 255) == 4
    # signed range: same short codes around a negative predictor
    assert _map_delta(-100, -100, -128, 127) == 0
    assert _map_delta(-99, -100, -128, 127) == 2
    assert _map_delta(-101, -100, -128, 127) == 1


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
    # round 16 narrowed the rejection contract: signed (flag 1) and
    # RSI-padded (flag 128) streams now decode, 3-byte (flag 2) is a
    # no-op for 17-24-bit samples; what remains OUT is restricted
    # coding (flag 64 — a different option-ID table for nbits<=4), a
    # 3-byte flag on samples outside 17-24 bits, and the two REQUIRED
    # flags (MSB, preprocess) cleared
    from flood_data_spark.sources.grib2 import (
        build_ccsds_message, grib2_to_dataframe)
    from flood_data_spark.sources.ccsds121 import (
        FLAG_3BYTE, FLAG_MSB, FLAG_PREPROCESS, FLAG_RESTRICTED)

    msg = bytearray(build_ccsds_message(
        [1, 2, 3, 4, 5, 6], nj=2, ni=3, la1=0.125, lo1=0.025, d=0.05,
        nbits=8))
    # find section 5 (skip the 16-byte indicator: sections carry
    # 4-byte length + 1-byte number)
    pos = 16
    while msg[pos + 4] != 5:
        pos += int.from_bytes(msg[pos:pos + 4], "big")
    assert msg[pos + 4] == 5
    for patch in (lambda f: f | FLAG_RESTRICTED,
                  lambda f: f & ~FLAG_MSB,
                  lambda f: f & ~FLAG_PREPROCESS):
        bad = bytearray(msg)
        bad[pos + 21] = patch(bad[pos + 21])
        with pytest.raises(NotImplementedError, match="options mask"):
            grib2_to_dataframe(bytes(bad))
    # 3-byte on 8-bit samples: meaningless, rejected by name
    bad = bytearray(msg)
    bad[pos + 21] |= FLAG_3BYTE
    with pytest.raises(NotImplementedError, match="3-byte"):
        grib2_to_dataframe(bytes(bad))


def test_grib2_542_3byte_flag_is_a_noop_for_17_to_24_bit():
    # the flag describes the unpacked AEC buffer layout only — the
    # codestream is identical, so an 18-bit message decodes the same
    # with the flag set
    from flood_data_spark.sources.ccsds121 import FLAG_3BYTE
    from flood_data_spark.sources.grib2 import (
        build_ccsds_message, grib2_to_dataframe)

    xs = [(1 << 17) + 311 * k for k in range(12)]
    msg = bytearray(build_ccsds_message(
        xs, nj=3, ni=4, la1=0.175, lo1=0.025, d=0.05, nbits=18))
    base = grib2_to_dataframe(bytes(msg))["dis24"].to_numpy()
    pos = 16
    while msg[pos + 4] != 5:
        pos += int.from_bytes(msg[pos:pos + 4], "big")
    msg[pos + 21] |= FLAG_3BYTE
    flagged = grib2_to_dataframe(bytes(msg))["dis24"].to_numpy()
    assert (base == flagged).all()
    assert (np.round(base).astype(np.int64) == np.array(xs)).all()


def test_signed_round_trip_across_profiles():
    rng = np.random.default_rng(21)
    for nbits in (3, 8, 16, 24, 32):
        lo, hi = -(1 << (nbits - 1)), (1 << (nbits - 1)) - 1
        for J in (8, 16, 64):
            for rsi in (1, 4, 128):
                n = int(rng.integers(1, 300))
                xs = [int(v) for v in rng.integers(
                    max(lo, -(1 << 20)), min(hi, 1 << 20) + 1, size=n)]
                got = decode(encode(xs, nbits, J, rsi, signed=True),
                             n, nbits, J, rsi, signed=True)
                assert (got == np.array(xs)).all(), (nbits, J, rsi)
    # extremes: the sign boundary and both rails, every coding option
    xs = ([-128, 127] * 40 + [0] * 16 + [-1, 1] * 20)
    for fo in ("split:0", "split:3", "se", "unc", None):
        enc = encode(xs, 8, 8, 4, force_option=fo, signed=True)
        assert (decode(enc, len(xs), 8, 8, 4, signed=True)
                == np.array(xs)).all(), fo
    # range guard names the signed bounds
    with pytest.raises(ValueError, match=r"\[-128, 127\]"):
        encode([128], 8, 16, 64, signed=True)


def test_signed_hand_assembled_fixture():
    # frozen bit-level fixture built clause-by-clause from the Blue
    # Book signed profile (NOT produced by this encoder): nbits=4
    # (idlen=3), J=8, one reference block, sample-splitting k=0.
    #   samples  [-3, -2, -4, -4, 0, -8, 7, -1], xmin=-8 xmax=7
    #   ref raw  -3 -> 1101 (4-bit two's complement)
    #   mapped   (theta = min(prev-xmin, xmax-prev)):
    #     -2: d=+1  th=5  -> 2      -4: d=-2 th=6 -> 3
    #     -4: d=0        -> 0        0: d=+4 th=4 -> 8
    #     -8: d=-8  th=7 -> 15       7: d=+15 th=0 -> 15
    #     -1: d=-8  th=0 -> 8
    #   bits: 001 | 1101 | FS(2,3,0,8,15,15,8) + pad
    stream = bytes.fromhex("3a4601000100010080")
    got = decode(stream, 8, 4, 8, 1000, signed=True)
    assert got.tolist() == [-3, -2, -4, -4, 0, -8, 7, -1]
    # the same bytes under the UNSIGNED profile must decode differently
    # (the raw reference reads as 13, not -3)
    assert decode(stream, 8, 4, 8, 1000)[0] == 13


def test_pad_rsi_byte_alignment():
    rng = np.random.default_rng(5)
    xs = [int(v) for v in rng.integers(0, 256, size=200)]
    plain = encode(xs, 8, 8, 4)
    padded = encode(xs, 8, 8, 4, pad_rsi=True)
    # padding really inserted (odds of every interval self-aligning ~0)
    assert padded != plain and len(padded) >= len(plain)
    assert (decode(padded, 200, 8, 8, 4, pad_rsi=True)
            == np.array(xs)).all()
    # a decoder NOT expecting padding must not round-trip the padded
    # stream (it would read pad zeros as FS prefixes)
    # (pad zeros parse as bogus FS prefixes / option IDs: either a
    # corrupt-stream error or wrong samples, never a silent round-trip)
    try:
        wrong = decode(padded, 200, 8, 8, 4)
        assert not (wrong == np.array(xs)).all()
    except (ValueError, NotImplementedError):
        pass
    # signed + padded combined
    ys = [int(v) for v in rng.integers(-128, 128, size=150)]
    enc = encode(ys, 8, 16, 2, signed=True, pad_rsi=True)
    assert (decode(enc, 150, 8, 16, 2, signed=True, pad_rsi=True)
            == np.array(ys)).all()


def test_grib2_542_signed_and_padded_messages_decode():
    from flood_data_spark.sources.grib2 import (
        build_ccsds_message, grib2_to_dataframe)

    # signed packed values: value = (ref + X * 2^E) / 10^D with X < 0
    xs = [-120, -60, -1, 0, 1, 77, -128, 127, -5, 9, 33, -44]
    msg = build_ccsds_message(
        xs, nj=3, ni=4, la1=0.175, lo1=0.025, d=0.05, nbits=8,
        block_size=8, rsi=1, ref=1000.0, d_scale=1, signed=True)
    got = grib2_to_dataframe(msg)["dis24"].to_numpy()
    want = (1000.0 + np.array(xs, dtype=np.float64)) / 10.0
    assert np.allclose(got, want)

    # RSI-padded message
    ys = [(37 * k) % 4096 for k in range(24)]
    msg2 = build_ccsds_message(
        ys, nj=4, ni=6, la1=0.175, lo1=0.025, d=0.05, nbits=12,
        block_size=8, rsi=1, pad_rsi=True)
    got2 = grib2_to_dataframe(msg2)["dis24"].to_numpy()
    assert (np.round(got2).astype(np.int64) == np.array(ys)).all()


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
