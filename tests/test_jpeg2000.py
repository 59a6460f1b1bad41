"""From-spec JPEG 2000 codec (sources/jpeg2000.py) + the GRIB2 template
5.40 branch it powers.  Layered: each Annex-level primitive round-trips
on adversarial fuzz before the full codestream does — an encoder/decoder
pair can hide mutually-cancelling bugs only if BOTH sides misread the
same table the same way at every layer."""

import numpy as np
import pytest

from flood_data_spark.sources.jpeg2000 import (
    MQDecoder, MQEncoder, TagTree, _BitReader, _BitWriter, _fwd53_1d,
    _fwd53_2d, _inv53_1d, _inv53_2d, decode_codestream, encode_codestream,
    t1_decode, t1_encode)


def test_mq_coder_round_trip_fuzz():
    rng = np.random.default_rng(0)
    for trial in range(12):
        n = int(rng.integers(1, 2000))
        ctxs = rng.integers(0, 19, size=n)
        bits = rng.integers(0, 2, size=n)
        enc = MQEncoder()
        for c, b in zip(ctxs, bits):
            enc.encode(int(c), int(b))
        dec = MQDecoder(enc.flush())
        assert [dec.decode(int(c)) for c in ctxs] == list(bits)


def test_mq_coder_skewed_streams():
    # long MPS runs + rare LPS flips walk the full Qe state ladder and
    # force byte-stuffing (0xFF) and carry paths
    for p in (0.999, 0.5, 0.01):
        rng = np.random.default_rng(int(p * 1000))
        bits = (rng.random(5000) < p).astype(int)
        enc = MQEncoder()
        for b in bits:
            enc.encode(0, int(b))
        dec = MQDecoder(enc.flush())
        assert [dec.decode(0) for _ in bits] == list(bits)


def test_tag_tree_round_trip():
    rng = np.random.default_rng(1)
    for _ in range(20):
        w, h = int(rng.integers(1, 7)), int(rng.integers(1, 7))
        vals = rng.integers(0, 9, size=(h, w))
        te = TagTree(w, h)
        te.set_values(vals)
        bw = _BitWriter()
        for y in range(h):
            for x in range(w):
                te.encode(bw, x, y, int(vals[y, x]) + 1)
        td = TagTree(w, h)
        br = _BitReader(bw.flush())
        for y in range(h):
            for x in range(w):
                assert td.decode_value(br, x, y) == vals[y, x]


def test_bit_io_ff_stuffing():
    # a run of 1s forces 0xFF bytes; the post-FF byte must carry 7 bits
    bw = _BitWriter()
    for _ in range(30):
        bw.write(1)
    data = bw.flush()
    assert 0xFF in data and data[-1] != 0xFF
    br = _BitReader(data)
    assert [br.read() for _ in range(30)] == [1] * 30


def test_dwt53_reversible_all_shapes():
    rng = np.random.default_rng(2)
    for n in (1, 2, 3, 4, 5, 17, 101):
        a = rng.integers(-1000, 1000, size=n)
        assert (_inv53_1d(_fwd53_1d(a)) == a).all()
    for h, w in ((1, 1), (1, 7), (7, 1), (5, 9), (13, 21), (64, 37)):
        a = rng.integers(-5000, 5000, size=(h, w))
        assert (_inv53_2d(_fwd53_2d(a), h, w) == a).all()


def test_dwt53_matches_spec_equations():
    # independent restatement of Annex F on a hand-checkable signal:
    # y[2n+1] = x[2n+1] - floor((x[2n] + x[2n+2]) / 2)
    # y[2n]   = x[2n]   + floor((y[2n-1] + y[2n+1] + 2) / 4)
    x = np.array([10, 20, 30, 40, 50, 60])
    y = _fwd53_1d(x)
    import math
    h = [20 - math.floor((10 + 30) / 2), 40 - math.floor((30 + 50) / 2),
         60 - math.floor((50 + 50) / 2)]          # x[6] mirrors to x[4]
    l = [10 + math.floor((h[0] + h[0] + 2) / 4),   # y[-1] mirrors y[1]
         30 + math.floor((h[0] + h[1] + 2) / 4),
         50 + math.floor((h[1] + h[2] + 2) / 4)]
    assert list(y[0::2]) == l and list(y[1::2]) == h


@pytest.mark.parametrize("band", ["LL", "HL", "LH", "HH"])
def test_tier1_round_trip(band):
    rng = np.random.default_rng(hash(band) % 2**32)
    for trial in range(4):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        vals = rng.integers(-3000, 3001, size=(h, w))
        if trial == 1:
            vals[:] = 0                    # all-zero block
        used = max(int(np.abs(vals).max(initial=0)).bit_length(), 1)
        data, nps = t1_encode(vals, band, used - 1)
        mag, sgn = t1_decode(data, h, w, band, nps, used - 1)
        assert (mag * sgn == vals).all()


@pytest.mark.parametrize("h,w,depth,levels", [
    (8, 8, 8, 2), (5, 9, 12, 2), (1, 1, 8, 0), (64, 64, 16, 5),
    (37, 101, 11, 4), (3, 200, 9, 5),
])
def test_codestream_round_trip(h, w, depth, levels):
    rng = np.random.default_rng(h * 1000 + w)
    arr = rng.integers(0, 1 << depth, size=(h, w)).astype(np.int64)
    assert (decode_codestream(
        encode_codestream(arr, depth, levels=levels)) == arr).all()


def test_codestream_smooth_field_compresses():
    # GRIB-like smooth field: the wavelet + EBCOT must actually compress
    yy, xx = np.mgrid[0:48, 0:64]
    arr = (2000 + 500 * np.sin(yy / 9.0) * np.cos(xx / 11.0)).astype(
        np.int64)
    cs = encode_codestream(arr, 12, levels=5)
    assert (decode_codestream(cs) == arr).all()
    assert len(cs) < arr.size * 12 // 8      # beats raw bit packing


def test_decoder_guards_name_escape_hatch():
    arr = np.arange(12, dtype=np.int64).reshape(3, 4)
    cs = bytearray(encode_codestream(arr, 4, levels=1))
    i = cs.find(b"\xff\x52")                 # COD marker
    cs[i + 2 + 2 + 9] = 0                    # transform byte -> 9/7
    with pytest.raises(NotImplementedError, match="cfgrib"):
        decode_codestream(bytes(cs))
    with pytest.raises(ValueError, match="SOC"):
        decode_codestream(b"\x00\x01")


def test_grib2_template_540_round_trip():
    from flood_data_spark.sources.grib2 import (
        build_jpeg2000_message, grib2_to_dataframe)
    rng = np.random.default_rng(7)
    nj, ni = 6, 9
    xs = rng.integers(0, 4000, size=nj * ni)
    msg = build_jpeg2000_message(
        xs, nj=nj, ni=ni, la1=50.0, lo1=10.0, d=0.1, ref=5.0,
        e_scale=-1, d_scale=2, nbits=12, member=2)
    pdf = grib2_to_dataframe(msg)
    assert len(pdf) == nj * ni
    want = (5.0 + xs * 2.0 ** -1) / 10.0 ** 2
    got = pdf.sort_values(["latitude", "longitude"],
                          ascending=[False, True])["dis24"].to_numpy()
    want2 = want.reshape(nj, ni).reshape(-1)
    assert np.allclose(got, want2, atol=1e-9)
    assert (pdf["number"] == 2).all()


def test_grib2_540_through_raster_decoder():
    from flood_data_spark.sources.grib2 import build_jpeg2000_message
    from flood_data_spark.sources.raster import grib_decoder
    xs = np.arange(20)
    msg = build_jpeg2000_message(xs, nj=4, ni=5, la1=10.0, lo1=0.0,
                                 d=0.5, nbits=5)
    pdf = grib_decoder(msg)
    assert len(pdf) == 20
    assert set(pdf["dis24"]) == set(float(v) for v in xs)


def test_grib2_540_compression_type_octet():
    # since round 11 the codestream's own COD/QCD markers select the
    # lossless/lossy path: a 5.40 message whose compression-type octet
    # claims lossy but whose codestream is reversible still decodes
    # exactly; an unknown compression type rejects loudly
    from flood_data_spark.sources.grib2 import (
        build_jpeg2000_message, grib2_to_dataframe)
    msg = bytearray(build_jpeg2000_message(
        np.arange(6), nj=2, ni=3, la1=1.0, lo1=1.0, d=1.0, nbits=3))
    i = msg.find(b"\x00\x28", 16)            # template number 40
    msg[i + 12] = 1                          # octet 22 -> lossy
    pdf = grib2_to_dataframe(bytes(msg))
    assert (pdf["dis24"].to_numpy().astype(np.int64)
            == np.arange(6)).all()
    msg[i + 12] = 7
    with pytest.raises(NotImplementedError, match="compression type"):
        grib2_to_dataframe(bytes(msg))


def test_decoder_uses_parsed_qcd_exponents():
    # ADVICE r10: Mb must come from the PARSED SPqcd exponents, not an
    # assumed depth+gain.  Rewrite the QCD of a valid stream with
    # guard-1 and every exponent+1 — Mb = guard + eps - 1 is unchanged,
    # so a conformant decoder reproduces the pixels exactly; a decoder
    # that derives Mb from depth+gain+guard-1 would be off by one bit
    # plane and mis-decode.
    rng = np.random.default_rng(21)
    arr = rng.integers(0, 1 << 10, size=(17, 23)).astype(np.int64)
    cs = bytearray(encode_codestream(arr, 10, levels=2))
    i = cs.find(b"\xff\x5c")                 # QCD marker
    ln = int.from_bytes(cs[i + 2:i + 4], "big")
    guard = cs[i + 4] >> 5
    assert guard >= 1
    cs[i + 4] = (guard - 1) << 5
    for j in range(i + 5, i + 2 + ln):
        cs[j] = ((cs[j] >> 3) + 1) << 3
    assert (decode_codestream(bytes(cs)) == arr).all()


def test_decoder_rejects_wrong_qcd_exponent_count():
    arr = np.arange(20, dtype=np.int64).reshape(4, 5)
    cs = bytearray(encode_codestream(arr, 5, levels=1))
    i = cs.find(b"\xff\x5c")
    ln = int.from_bytes(cs[i + 2:i + 4], "big")
    # drop the last SPqcd byte (shrink the segment by one)
    del cs[i + 2 + ln - 1]
    cs[i + 2:i + 4] = (ln - 1).to_bytes(2, "big")
    with pytest.raises(NotImplementedError, match="QCD exponents"):
        decode_codestream(bytes(cs))


def test_decoder_accepts_all_five_progression_orders():
    # 1 layer x 1 component x 1 precinct: every progression order emits
    # the identical resolution-major packet sequence, so the declared
    # order must not matter
    rng = np.random.default_rng(22)
    arr = rng.integers(0, 1 << 8, size=(9, 11)).astype(np.int64)
    cs = bytearray(encode_codestream(arr, 8, levels=2))
    i = cs.find(b"\xff\x52")                 # COD marker
    for order in range(5):
        cs[i + 2 + 2 + 1] = order            # SGcod progression byte
        assert (decode_codestream(bytes(cs)) == arr).all(), order
    cs[i + 2 + 2 + 1] = 5
    with pytest.raises(NotImplementedError, match="progression"):
        decode_codestream(bytes(cs))


# ----------------------------------------------------- lossy 9/7 path

def test_dwt97_reconstruction_all_shapes():
    from flood_data_spark.sources.jpeg2000 import (
        _fwd97_1d, _fwd97_2d, _inv97_1d, _inv97_2d)
    rng = np.random.default_rng(2)
    for n in (1, 2, 3, 7, 16, 33):
        x = rng.normal(size=n) * 100
        assert np.abs(_inv97_1d(_fwd97_1d(x)) - x).max() < 1e-9, n
    x = rng.normal(size=(13, 21)) * 50
    r = _inv97_2d(_fwd97_2d(x), 13, 21)
    assert np.abs(r - x).max() < 1e-9


def test_lossy_codestream_error_bounded_by_step():
    from flood_data_spark.sources.jpeg2000 import (
        decode_codestream, encode_codestream_lossy)
    rng = np.random.default_rng(4)
    for (h, w, depth, levels, step) in [
            (8, 8, 8, 1, 1.0), (17, 23, 12, 3, 2.0),
            (32, 32, 16, 5, 0.5), (5, 9, 10, 2, 4.0)]:
        arr = rng.integers(0, 1 << depth, size=(h, w)).astype(np.int64)
        cs = encode_codestream_lossy(arr, depth, levels=levels,
                                     step=step)
        got = decode_codestream(cs)
        # midpoint reconstruction: per-band error <= delta/2, amplified
        # by the synthesis gain across levels — 6x step is a generous
        # envelope the measured errors sit well inside
        assert np.abs(got - arr).max() <= max(4, 6 * step), (h, w)


def test_lossy_smooth_field_compresses_hard():
    from flood_data_spark.sources.jpeg2000 import (
        decode_codestream, encode_codestream_lossy)
    ii = np.arange(64)
    smooth = (1000 + 200 * np.sin(ii[:, None] / 7)
              * np.cos(ii[None, :] / 9)).astype(np.int64)
    cs = encode_codestream_lossy(smooth, 12, levels=4, step=8.0)
    got = decode_codestream(cs)
    assert len(cs) < 0.1 * (64 * 64 * 12 // 8)     # > 10x compression
    assert np.abs(got - smooth).max() <= 48        # 6 x step


def test_lossy_quantizer_snaps_to_representable_delta():
    from flood_data_spark.sources.jpeg2000 import _lossy_qparams
    for rb in (8, 12, 18):
        for target in (0.5, 1.0, 1.75, 3.3, 8.0):
            eps, mu, delta = _lossy_qparams(rb, target)
            assert 0 <= eps <= 31 and 0 <= mu <= 2047
            assert delta == 2.0 ** (rb - eps) * (1 + mu / 2048.0)
            assert abs(delta - target) / target < 1.0 / 2048 + 1e-9
    with pytest.raises(ValueError, match="step"):
        _lossy_qparams(8, 0.0)


def test_grib2_540_lossy_round_trip():
    from flood_data_spark.sources.grib2 import (
        build_jpeg2000_lossy_message, grib2_to_dataframe)
    rng = np.random.default_rng(6)
    xs = rng.integers(0, 4096, size=24)
    msg = build_jpeg2000_lossy_message(
        xs, nj=4, ni=6, la1=0.175, lo1=0.025, d=0.05, nbits=12,
        levels=2, step=1.0, member=2)
    pdf = grib2_to_dataframe(msg)
    assert len(pdf) == 24 and (pdf["number"] == 2).all()
    got = pdf["dis24"].to_numpy().astype(np.int64)
    assert np.abs(got - xs).max() <= 6


def test_lossy_rejects_mismatched_quantization_style():
    # a 9/7 stream whose QCD claims reversible style must fail loudly
    from flood_data_spark.sources.jpeg2000 import (
        decode_codestream, encode_codestream_lossy)
    cs = bytearray(encode_codestream_lossy(
        np.arange(12, dtype=np.int64).reshape(3, 4), 4, levels=1))
    i = cs.find(b"\xff\x5c")
    cs[i + 4] = cs[i + 4] & 0xE0             # style 2 -> 0
    with pytest.raises(NotImplementedError, match="quantization style"):
        decode_codestream(bytes(cs))
