"""Minimal HDF5/NetCDF-4 reader (sources/hdf5.py).

No HDF5-producing library exists in this container, so the fixture
builder below writes files BYTE-BY-BYTE from the public HDF5 File Format
Specification (superblock v0, v1 object headers, symbol-table groups,
v1 attributes, contiguous/chunked layouts, deflate filter, global heap).
Structural offsets are asserted against the spec's fixed layout — the
writer is test scaffolding, the spec is the contract.
"""

import struct
import zlib

import numpy as np
import pytest

from flood_data_spark.sources.hdf5 import (
    SIGNATURE, parse_hdf5, to_dataframe)

UNDEF = 0xFFFFFFFFFFFFFFFF


def _u(n, size):
    return int(n).to_bytes(size, "little")


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


def _msg(mtype: int, body: bytes) -> bytes:
    body = _pad8(body)
    return _u(mtype, 2) + _u(len(body), 2) + b"\x00" * 4 + body


def _ohdr(messages: list[bytes]) -> bytes:
    body = b"".join(messages)
    return (b"\x01\x00" + _u(len(messages), 2) + _u(1, 4)
            + _u(len(body), 4) + b"\x00" * 4 + body)


def _dataspace(dims) -> bytes:
    return (b"\x01" + _u(len(dims), 1) + b"\x00" * 6
            + b"".join(_u(d, 8) for d in dims))


DT_F8 = (b"\x11" + b"\x20\x3f\x00" + _u(8, 4)
         + _u(0, 2) + _u(64, 2) + bytes([52, 11, 0, 52]) + _u(1023, 4))
DT_I4 = b"\x10" + b"\x08\x00\x00" + _u(4, 4) + _u(0, 2) + _u(32, 2)
DT_I2 = b"\x10" + b"\x08\x00\x00" + _u(2, 4) + _u(0, 2) + _u(16, 2)
DT_REF = b"\x17" + b"\x00\x00\x00" + _u(8, 4)
DT_VLEN_REF = b"\x19" + b"\x00\x00\x00" + _u(16, 4) + DT_REF


def _dt_str(n: int) -> bytes:
    return b"\x13" + b"\x00\x00\x00" + _u(n, 4)


def _attr(name: str, dt: bytes, ds: bytes, payload: bytes) -> bytes:
    nm = name.encode() + b"\x00"
    body = (b"\x01\x00" + _u(len(nm), 2) + _u(len(dt), 2) + _u(len(ds), 2)
            + _pad8(nm) + _pad8(dt) + _pad8(ds) + payload)
    return _msg(0x000C, body)


def _str_attr(name: str, value: str) -> bytes:
    v = value.encode() + b"\x00"
    return _attr(name, _dt_str(len(v)), b"", v)


class MiniH5:
    """Append-only HDF5 writer: superblock v0 + one symbol-table root
    group; datasets added before close()."""

    def __init__(self):
        self.buf = bytearray(96)            # superblock v0 reserved
        self.buf[0:8] = SIGNATURE
        self.buf[13] = 8                    # size of offsets
        self.buf[14] = 8                    # size of lengths
        self.buf[16:18] = _u(4, 2)          # leaf k
        self.buf[18:20] = _u(16, 2)         # internal k
        self.buf[32:40] = _u(UNDEF, 8)      # free-space address
        self.buf[48:56] = _u(UNDEF, 8)      # driver info
        self.entries = []                   # (name, ohdr addr)

    def append(self, block: bytes) -> int:
        addr = len(self.buf)
        self.buf += block
        return addr

    def add_dataset(self, name: str, data: np.ndarray, dt: bytes,
                    attrs=(), chunked_deflate: bool = False,
                    dim_refs=None) -> int:
        data = np.ascontiguousarray(data)
        raw = data.astype(data.dtype.newbyteorder("<")).tobytes()
        msgs = [_msg(0x0001, _dataspace(data.shape)), _msg(0x0003, dt)]
        if chunked_deflate:
            comp = zlib.compress(raw, 6)
            caddr = self.append(comp)
            rank = data.ndim + 1
            key = (_u(len(comp), 4) + _u(0, 4)
                   + b"".join(_u(0, 8) for _ in range(rank)))
            endkey = (_u(0, 4) + _u(0, 4)
                      + b"".join(_u(d, 8) for d in data.shape)
                      + _u(data.dtype.itemsize, 8))
            node = (b"TREE" + bytes([1, 0]) + _u(1, 2)
                    + _u(UNDEF, 8) + _u(UNDEF, 8)
                    + key + _u(caddr, 8) + endkey)
            baddr = self.append(node)
            chunk_dims = list(data.shape) + [data.dtype.itemsize]
            msgs.append(_msg(0x000B,                      # deflate
                             b"\x01\x01" + b"\x00" * 6
                             + _u(1, 2) + _u(0, 2) + _u(0, 2) + _u(1, 2)
                             + _u(6, 4) + _u(0, 4)))
            msgs.append(_msg(0x0008,
                             b"\x03\x02" + _u(len(chunk_dims), 1)
                             + _u(baddr, 8)
                             + b"".join(_u(d, 4) for d in chunk_dims)))
        else:
            daddr = self.append(raw)
            msgs.append(_msg(0x0008, b"\x03\x01" + _u(daddr, 8)
                             + _u(len(raw), 8)))
        if dim_refs is not None:
            # DIMENSION_LIST: vlen-of-ref per dim through a global heap
            payload = b""
            for ref in dim_refs:
                obj = _pad8(_u(ref, 8))
                gcol = (b"GCOL\x01" + b"\x00" * 3 + _u(16 + 16 + len(obj)
                                                       + 16, 8)
                        + _u(1, 2) + _u(1, 2) + b"\x00" * 4 + _u(8, 8) + obj
                        + _u(0, 2) + _u(0, 2) + b"\x00" * 4 + _u(0, 8))
                gaddr = self.append(gcol)
                payload += _u(1, 4) + _u(gaddr, 8) + _u(1, 4)
            msgs.append(_attr("DIMENSION_LIST", DT_VLEN_REF,
                              _dataspace([data.ndim]), payload))
        msgs.extend(attrs)
        addr = self.append(_ohdr(msgs))
        self.entries.append((name, addr))
        return addr

    def close(self) -> bytes:
        # local heap: empty string at 0, then names at 8-byte slots
        names = sorted(n for n, _ in self.entries)
        seg = bytearray(8)
        offsets = {}
        for n in names:
            offsets[n] = len(seg)
            seg += _pad8(n.encode() + b"\x00")
        heap_hdr = (b"HEAP\x00" + b"\x00" * 3 + _u(len(seg), 8)
                    + _u(UNDEF, 8))
        heap_addr = self.append(heap_hdr + _u(0, 8))
        seg_addr = self.append(bytes(seg))
        self.buf[heap_addr + 24:heap_addr + 32] = _u(seg_addr, 8)

        snod = (b"SNOD\x01\x00" + _u(len(self.entries), 2)
                + b"".join(_u(offsets[n], 8) + _u(a, 8) + b"\x00" * 24
                           for n, a in sorted(self.entries)))
        snod_addr = self.append(snod)
        btree = (b"TREE" + bytes([0, 0]) + _u(1, 2)
                 + _u(UNDEF, 8) + _u(UNDEF, 8)
                 + _u(0, 8) + _u(snod_addr, 8)
                 + _u(offsets[names[-1]] if names else 0, 8))
        btree_addr = self.append(btree)
        root = self.append(_ohdr(
            [_msg(0x0011, _u(btree_addr, 8) + _u(heap_addr, 8))]))
        # superblock root symbol-table entry + EOF
        self.buf[40:48] = _u(len(self.buf), 8)
        ste = 56
        self.buf[ste + 8:ste + 16] = _u(root, 8)
        self.buf[ste + 16:ste + 20] = _u(1, 4)
        self.buf[ste + 24:ste + 32] = _u(btree_addr, 8)
        self.buf[ste + 32:ste + 40] = _u(heap_addr, 8)
        return bytes(self.buf)


def _scale_attrs(dim_name: str):
    return [_str_attr("CLASS", "DIMENSION_SCALE"), _str_attr("NAME", dim_name)]


def _build_raster(chunked=False, with_dim_list=False) -> bytes:
    w = MiniH5()
    lat = np.array([10.0, 10.5, 11.0])
    lon = np.array([20.0, 20.25])
    grid = np.arange(6, dtype=np.float64).reshape(3, 2) * 1.5
    a_lat = w.add_dataset("lat", lat, DT_F8, attrs=_scale_attrs("lat"))
    a_lon = w.add_dataset("lon", lon, DT_F8, attrs=_scale_attrs("lon"))
    w.add_dataset("uparea", grid, DT_F8, chunked_deflate=chunked,
                  dim_refs=[a_lat, a_lon] if with_dim_list else None)
    return w.close()


def test_superblock_and_structure():
    content = _build_raster()
    assert content[:8] == SIGNATURE and content[8] == 0
    dims, variables, _ = parse_hdf5(content)
    assert dims == {"lat": 3, "lon": 2}
    assert set(variables) == {"lat", "lon", "uparea"}
    assert variables["uparea"]["dims"] == ["lat", "lon"]   # size match


def test_contiguous_values_roundtrip():
    dims, variables, _ = parse_hdf5(_build_raster())
    np.testing.assert_array_equal(variables["lat"]["data"],
                                  [10.0, 10.5, 11.0])
    np.testing.assert_array_equal(
        variables["uparea"]["data"],
        np.arange(6, dtype=np.float64).reshape(3, 2) * 1.5)


def test_chunked_deflate_roundtrip():
    dims, variables, _ = parse_hdf5(_build_raster(chunked=True))
    np.testing.assert_array_equal(
        variables["uparea"]["data"],
        np.arange(6, dtype=np.float64).reshape(3, 2) * 1.5)


def test_dimension_list_references_beat_size_matching():
    """With equal-sized dims only DIMENSION_LIST can order them; build a
    square grid and check the refs resolve (size matching alone would be
    ambiguous)."""
    w = MiniH5()
    lat = np.array([1.0, 2.0])
    lon = np.array([5.0, 6.0])
    a_lat = w.add_dataset("lat", lat, DT_F8, attrs=_scale_attrs("lat"))
    a_lon = w.add_dataset("lon", lon, DT_F8, attrs=_scale_attrs("lon"))
    grid = np.array([[1.0, 2.0], [3.0, 4.0]])
    w.add_dataset("v", grid, DT_F8, dim_refs=[a_lon, a_lat])
    dims, variables, _ = parse_hdf5(w.close())
    assert variables["v"]["dims"] == ["lon", "lat"]


def test_cf_unpack_and_flatten():
    """int16 + scale/offset/fill → the same CF semantics as the classic
    reader (shared flatten_grid)."""
    w = MiniH5()
    lat = np.array([0.0, 1.0, 2.0])
    lon = np.array([10.0, 11.0])
    w.add_dataset("lat", lat, DT_F8, attrs=_scale_attrs("lat"))
    w.add_dataset("lon", lon, DT_F8, attrs=_scale_attrs("lon"))
    packed = np.array([[0, 1], [2, 3], [-999, 5]], dtype=np.int16)
    attrs = [
        _attr("scale_factor", DT_F8, b"", struct.pack("<d", 0.5)),
        _attr("add_offset", DT_F8, b"", struct.pack("<d", 100.0)),
        _attr("_FillValue", DT_I2, b"", struct.pack("<h", -999)),
    ]
    w.add_dataset("thresh", packed, DT_I2, attrs=attrs)
    pdf = to_dataframe(w.close())
    assert list(pdf.columns) == ["lat", "lon", "thresh"]
    assert len(pdf) == 6
    got = pdf.set_index(["lat", "lon"])["thresh"]
    assert got[(0.0, 10.0)] == 100.0            # 0*0.5+100
    assert got[(1.0, 11.0)] == 101.5            # 3*0.5+100
    assert np.isnan(got[(2.0, 10.0)])           # fill → NaN before scaling


def test_netcdf_decoder_dispatches_hdf5_natively():
    """raster.netcdf_decoder must route HDF5-signature bytes through the
    dependency-free reader (no xarray in this container)."""
    from flood_data_spark.sources.raster import netcdf_decoder

    pdf = netcdf_decoder(_build_raster(chunked=True))
    assert {"lat", "lon", "uparea"} <= set(pdf.columns)
    assert len(pdf) == 6


def test_unsupported_shape_names_escape_hatch():
    content = bytearray(_build_raster())
    content[8] = 7                              # bogus superblock version
    with pytest.raises(NotImplementedError, match="superblock version"):
        parse_hdf5(bytes(content))
    # and a genuinely exotic feature points at the xarray path
    with pytest.raises((NotImplementedError, ValueError)):
        parse_hdf5(SIGNATURE + b"\x00" * 88)


def test_unwritten_dataset_reads_fill_value():
    """A dataset with a defined fill value but no allocated storage
    (address UNDEF) must read as the fill, not zeros — unwritten
    threshold cells read as 0.0 would make every discharge 'exceed'."""
    w = MiniH5()
    lat = np.array([0.0, 1.0])
    w.add_dataset("lat", lat, DT_F8, attrs=_scale_attrs("lat"))
    # hand-build a dataset header: dataspace + datatype + fill(v2,
    # defined, 9.96921e36 — the libnetcdf default) + contiguous@UNDEF
    fill = struct.pack("<d", 9.96921e36)
    msgs = [
        _msg(0x0001, _dataspace([2])),
        _msg(0x0003, DT_F8),
        _msg(0x0005, b"\x02\x02\x00\x01" + _u(8, 4) + fill),
        _msg(0x0008, b"\x03\x01" + _u(UNDEF, 8) + _u(16, 8)),
    ]
    addr = w.append(_ohdr(msgs))
    w.entries.append(("empty_var", addr))
    dims, variables, _ = parse_hdf5(w.close())
    np.testing.assert_array_equal(variables["empty_var"]["data"],
                                  np.full(2, 9.96921e36))


def test_undefined_fill_v2_still_zeros():
    from flood_data_spark.sources.hdf5 import _fill_scalar, _fill_value
    assert _fill_value(b"\x02\x02\x00\x00") is None        # not defined
    assert _fill_scalar(None, np.dtype("<f8")) == 0


def test_latest_format_fractal_heap_dispatches_to_xarray():
    """Since round 11 in-profile dense layouts PARSE
    (test_dense_links_match_symbol_table_layout); the remaining
    contract is that malformed/out-of-profile dense metadata still
    fails LOUDLY with the xarray/h5netcdf escape hatch named, never a
    garbled parse.  Hand-crafted bytes: superblock v3 → root OHDR with
    a Link Info message whose fractal-heap address is defined but whose
    name-index B-tree address points at nothing."""
    buf = bytearray(200)
    buf[0:8] = SIGNATURE
    buf[8] = 3                                   # superblock v3
    buf[9] = 8                                   # offset size
    buf[10] = 8                                  # length size
    buf[36:44] = (96).to_bytes(8, "little")      # root object header
    buf[96:100] = b"OHDR"
    buf[100] = 2                                 # header version
    buf[101] = 0                                 # flags: 1-byte size, untracked
    # Link Info message: version 0, flags 0, fractal heap addr DEFINED,
    # name-index v2-btree addr (undefined here; the heap is the trigger)
    data = (bytes([0, 0]) + (0x1000).to_bytes(8, "little")
            + (0xFFFFFFFFFFFFFFFF).to_bytes(8, "little"))
    buf[102] = 4 + len(data) + 4                 # chunk0: msg + checksum
    buf[103] = 0x02                              # Link Info
    buf[104:106] = len(data).to_bytes(2, "little")
    buf[107:107 + len(data)] = data
    with pytest.raises(NotImplementedError) as e:
        parse_hdf5(bytes(buf))
    assert "v2 B-tree" in str(e.value)
    assert "xarray" in str(e.value)              # the named dependency


class MiniH5Dense(MiniH5):
    """v2 superblock + DENSE root-group links (fractal heap + link-name
    v2 B-tree) — the libver='latest' layout libnetcdf emits past the
    compact-link threshold.  Written byte-by-byte from spec sections
    III.A.2 (v2 B-trees) and III.G (fractal heap): one root direct
    block, managed v0 heap IDs, single BTLF leaf.  Name hashes in the
    leaf records are fake increasing values — the reader enumerates the
    whole leaf and never consults them (documented profile)."""

    def __init__(self):
        self.buf = bytearray(48)
        self.buf[0:8] = SIGNATURE
        self.buf[8] = 2                      # superblock v2
        self.buf[9] = 8                      # offsets
        self.buf[10] = 8                     # lengths
        self.buf[20:28] = _u(UNDEF, 8)       # superblock extension
        self.entries = []

    def close(self) -> bytes:
        off_w = len_w = 2                    # 16-bit heap, 512-max objs
        links = []
        for name, addr in sorted(self.entries):
            nb = name.encode()
            links.append(bytes([1, 0, len(nb)]) + nb + _u(addr, 8))
        frhp_addr = len(self.buf)
        h = bytearray(146)                   # 5 + 137 fields + checksum
        h[0:4] = b"FRHP"
        p = 5
        h[p:p + 2] = _u(1 + off_w + len_w, 2)      # heap ID length
        h[p + 5:p + 9] = _u(512, 4)                # max managed object
        h[p + 17:p + 25] = _u(UNDEF, 8)            # huge-object B-tree
        h[p + 33:p + 41] = _u(UNDEF, 8)            # free-space manager
        h[p + 41:p + 49] = _u(512, 8)              # managed space
        h[p + 49:p + 57] = _u(512, 8)              # allocated space
        h[p + 65:p + 73] = _u(len(links), 8)       # n managed objects
        h[p + 105:p + 107] = _u(4, 2)              # table width
        h[p + 107:p + 115] = _u(512, 8)            # starting block size
        h[p + 115:p + 123] = _u(512, 8)            # max direct block
        h[p + 123:p + 125] = _u(16, 2)             # max heap size (bits)
        h[p + 135:p + 137] = _u(0, 2)              # current rows: direct
        self.append(bytes(h))
        db = bytearray(b"FHDB" + bytes([0]) + _u(frhp_addr, 8)
                       + _u(0, off_w))
        ids = []
        for ln in links:
            ids.append(bytes([0]) + _u(len(db), off_w)
                       + _u(len(ln), len_w))
            db += ln
        db += b"\x00" * (512 - len(db))
        db_addr = self.append(bytes(db))
        self.buf[frhp_addr + 5 + 127:frhp_addr + 5 + 135] = _u(db_addr, 8)
        recs = b"".join(_u(i, 4) + hid for i, hid in enumerate(ids))
        leaf_addr = self.append(b"BTLF" + bytes([0, 5]) + recs + _u(0, 4))
        bthd_addr = self.append(
            b"BTHD" + bytes([0, 5]) + _u(4096, 4) + _u(9, 2) + _u(0, 2)
            + bytes([100, 40]) + _u(leaf_addr, 8) + _u(len(ids), 2)
            + _u(len(ids), 8) + _u(0, 4))
        root = self.append(_ohdr(
            [_msg(0x0002, bytes([0, 0]) + _u(frhp_addr, 8)
                  + _u(bthd_addr, 8))]))
        self.buf[28:36] = _u(len(self.buf), 8)     # EOF
        self.buf[36:44] = _u(root, 8)              # root object header
        return bytes(self.buf)


def _close_multiblock(w) -> bytes:
    """MiniH5Dense finisher with a ROOT INDIRECT fractal heap: starting
    block size 32, table width 2, one link per direct block (32 - 15
    header bytes leaves 17 -- exactly one link), so three links span
    rows 0 and 1 of the doubling table.  Exercises the round-12
    multi-block resolution path end to end."""
    S, W = 32, 2
    off_w = len_w = 2
    links = []
    for name, addr in sorted(w.entries):
        nb = name.encode()
        links.append(bytes([1, 0, len(nb)]) + nb + _u(addr, 8))
    assert all(len(ln) <= S - 15 for ln in links)
    frhp_addr = len(w.buf)
    h = bytearray(146)
    h[0:4] = b"FRHP"
    p = 5
    h[p:p + 2] = _u(1 + off_w + len_w, 2)      # heap ID length
    h[p + 5:p + 9] = _u(512, 4)                # max managed object
    h[p + 17:p + 25] = _u(UNDEF, 8)            # huge-object B-tree
    h[p + 33:p + 41] = _u(UNDEF, 8)            # free-space manager
    h[p + 41:p + 49] = _u(4 * S, 8)            # managed space
    h[p + 49:p + 57] = _u(4 * S, 8)            # allocated space
    h[p + 65:p + 73] = _u(len(links), 8)       # n managed objects
    h[p + 105:p + 107] = _u(W, 2)              # table width
    h[p + 107:p + 115] = _u(S, 8)              # starting block size
    h[p + 115:p + 123] = _u(512, 8)            # max direct block
    h[p + 123:p + 125] = _u(16, 2)             # max heap size (bits)
    nrows = (len(links) + W - 1) // W
    h[p + 135:p + 137] = _u(nrows, 2)          # current rows: indirect
    w.append(bytes(h))
    ids, dblock_addrs = [], []
    for i, ln in enumerate(links):
        r, c = i // W, i % W
        assert r < 2, "writer profile: rows 0-1 (size S) only"
        block_start = (0 if r == 0 else W * S) + c * S
        db = bytearray(b"FHDB" + bytes([0]) + _u(frhp_addr, 8)
                       + _u(block_start, off_w))
        ids.append(bytes([0]) + _u(block_start + len(db), off_w)
                   + _u(len(ln), len_w))
        db += ln
        db += b"\x00" * (S - len(db))
        dblock_addrs.append(w.append(bytes(db)))
    fhib = bytearray(b"FHIB" + bytes([0]) + _u(frhp_addr, 8)
                     + _u(0, off_w))
    for slot in range(nrows * W):
        fhib += _u(dblock_addrs[slot] if slot < len(dblock_addrs)
                   else UNDEF, 8)
    fhib += _u(0, 4)                           # checksum (unchecked)
    fhib_addr = w.append(bytes(fhib))
    w.buf[frhp_addr + 5 + 127:frhp_addr + 5 + 135] = _u(fhib_addr, 8)
    recs = b"".join(_u(i, 4) + hid for i, hid in enumerate(ids))
    leaf_addr = w.append(b"BTLF" + bytes([0, 5]) + recs + _u(0, 4))
    bthd_addr = w.append(
        b"BTHD" + bytes([0, 5]) + _u(4096, 4) + _u(9, 2) + _u(0, 2)
        + bytes([100, 40]) + _u(leaf_addr, 8) + _u(len(ids), 2)
        + _u(len(ids), 8) + _u(0, 4))
    root = w.append(_ohdr(
        [_msg(0x0002, bytes([0, 0]) + _u(frhp_addr, 8)
              + _u(bthd_addr, 8))]))
    w.buf[28:36] = _u(len(w.buf), 8)
    w.buf[36:44] = _u(root, 8)
    return bytes(w.buf)


def _build_dense_raster() -> bytes:
    w = MiniH5Dense()
    lat = np.array([10.0, 10.5, 11.0])
    lon = np.array([20.0, 20.25])
    grid = np.arange(6, dtype=np.float64).reshape(3, 2) * 1.5
    w.add_dataset("lat", lat, DT_F8, attrs=_scale_attrs("lat"))
    w.add_dataset("lon", lon, DT_F8, attrs=_scale_attrs("lon"))
    w.add_dataset("uparea", grid, DT_F8)
    return w.close()


def test_dense_links_match_symbol_table_layout():
    # the SAME logical file through both group layouts must parse
    # identically — dense (fractal heap + v2 B-tree) vs old-style
    dims_d, vars_d, _ = parse_hdf5(_build_dense_raster())
    dims_s, vars_s, _ = parse_hdf5(_build_raster())
    assert dims_d == dims_s == {"lat": 3, "lon": 2}
    assert set(vars_d) == set(vars_s)
    np.testing.assert_array_equal(vars_d["uparea"]["data"],
                                  vars_s["uparea"]["data"])
    np.testing.assert_array_equal(vars_d["lat"]["data"],
                                  vars_s["lat"]["data"])


def test_dense_links_to_dataframe():
    pdf = to_dataframe(_build_dense_raster())
    assert len(pdf) == 6
    assert set(pdf.columns) == {"lat", "lon", "uparea"}
    assert pdf["uparea"].tolist() == [0.0, 1.5, 3.0, 4.5, 6.0, 7.5]


def test_dense_profile_guards_fail_loudly():
    content = bytearray(_build_dense_raster())
    # depth claimed without an internal node -> loud dispatch (depth>=1
    # trees themselves are SUPPORTED since round 13 — builders below)
    i = content.find(b"BTHD")
    patched = bytearray(content)
    patched[i + 12:i + 14] = _u(1, 2)        # depth 1, root is a leaf
    with pytest.raises(NotImplementedError, match="internal node"):
        parse_hdf5(bytes(patched))
    # claiming rows on a root-DIRECT heap walks to a non-FHIB block ->
    # loud dispatch (filtered heaps and nested indirect blocks are
    # SUPPORTED since round 13 — see the builders below)
    j = content.find(b"FRHP")
    patched = bytearray(content)
    patched[j + 5 + 135:j + 5 + 137] = _u(2, 2)
    with pytest.raises(NotImplementedError, match="indirect"):
        parse_hdf5(bytes(patched))
    # huge objects -> loud dispatch
    patched = bytearray(content)
    patched[j + 5 + 81:j + 5 + 89] = _u(1, 8)
    with pytest.raises(NotImplementedError, match="huge"):
        parse_hdf5(bytes(patched))


def _build_dense_multiblock_raster() -> bytes:
    w = MiniH5Dense()
    lat = np.array([10.0, 10.5, 11.0])
    lon = np.array([20.0, 20.25])
    grid = np.arange(6, dtype=np.float64).reshape(3, 2) * 1.5
    w.add_dataset("lat", lat, DT_F8, attrs=_scale_attrs("lat"))
    w.add_dataset("lon", lon, DT_F8, attrs=_scale_attrs("lon"))
    w.add_dataset("uparea", grid, DT_F8)
    return _close_multiblock(w)


def test_multiblock_dense_links_match_single_block():
    """The SAME logical file through a root-indirect (multi-block)
    heap parses identically to the single-direct-block layout."""
    dims_m, vars_m, _ = parse_hdf5(_build_dense_multiblock_raster())
    dims_s, vars_s, _ = parse_hdf5(_build_dense_raster())
    assert dims_m == dims_s == {"lat": 3, "lon": 2}
    assert set(vars_m) == set(vars_s)
    np.testing.assert_array_equal(vars_m["uparea"]["data"],
                                  vars_s["uparea"]["data"])
    pdf = to_dataframe(_build_dense_multiblock_raster())
    assert pdf["uparea"].tolist() == [0.0, 1.5, 3.0, 4.5, 6.0, 7.5]


def test_multiblock_doubling_row_math():
    """Row >= 2 of the doubling table (block size S·2^(r-1)) resolved
    against a hand-built synthetic heap: S=32, W=2, max direct 64 ->
    rows 0/1 at 32 bytes, row 2 at 64; an object parked in the row-2
    col-0 block (heap offset 128+) must come back exactly."""
    from flood_data_spark.sources.hdf5 import _fractal_heap_object

    # max direct block 64 -> length field width 1 (min(bytes(63),
    # bytes(512)) per the spec rule), so heap IDs are 1+2+1 = 4 bytes
    S, W, off_w, len_w = 32, 2, 2, 1
    buf = bytearray(64)                      # scratch so addr 0 unused
    def app(block):
        addr = len(buf); buf.extend(block); return addr
    frhp_addr = len(buf)
    h = bytearray(146)
    h[0:4] = b"FRHP"
    p = 5
    h[p:p + 2] = _u(1 + off_w + len_w, 2)
    h[p + 5:p + 9] = _u(512, 4)              # max managed object
    h[p + 17:p + 25] = _u(UNDEF, 8)
    h[p + 33:p + 41] = _u(UNDEF, 8)
    h[p + 105:p + 107] = _u(W, 2)
    h[p + 107:p + 115] = _u(S, 8)            # starting block size
    h[p + 115:p + 123] = _u(64, 8)           # max direct block -> 3 rows
    h[p + 123:p + 125] = _u(16, 2)
    h[p + 135:p + 137] = _u(3, 2)            # rows 0..2 present
    app(bytes(h))
    payload = b"row-two-object"
    block_start = W * S * 2                  # row 2 starts at 128
    db = bytearray(b"FHDB" + bytes([0]) + _u(frhp_addr, 8)
                   + _u(block_start, off_w))
    obj_off = block_start + len(db)
    db += payload
    db += b"\x00" * (64 - len(db))
    db_addr = app(bytes(db))
    fhib = bytearray(b"FHIB" + bytes([0]) + _u(frhp_addr, 8)
                     + _u(0, off_w))
    for slot in range(3 * W):
        fhib += _u(db_addr if slot == 4 else UNDEF, 8)  # row2 col0
    fhib += _u(0, 4)
    fhib_addr = app(bytes(fhib))
    buf[frhp_addr + 5 + 127:frhp_addr + 5 + 135] = _u(fhib_addr, 8)
    hid = bytes([0]) + _u(obj_off, off_w) + _u(len(payload), len_w)
    got = _fractal_heap_object(bytes(buf), frhp_addr, hid)
    assert got == payload
    # boundary-crossing object -> loud
    hid_bad = bytes([0]) + _u(obj_off, off_w) + _u(64, len_w)
    with pytest.raises(NotImplementedError, match="crossing"):
        _fractal_heap_object(bytes(buf), frhp_addr, hid_bad)
    # unallocated block -> loud
    hid_un = bytes([0]) + _u(70, off_w) + _u(4, len_w)   # row1 col0
    with pytest.raises(NotImplementedError, match="unallocated"):
        _fractal_heap_object(bytes(buf), frhp_addr, hid_un)


def test_nested_indirect_heap_resolves():
    """Round 13: NESTED indirect blocks — S=32, W=2, max direct 64
    gives 3 direct rows; root row 3 (block size 128) holds CHILD
    indirect blocks of 2 rows each.  An object parked in the child's
    row-1 col-1 direct block (global heap offset 352+) must resolve
    through the two-level walk: root lookup -> indirect entry (past
    the 6 direct entries) -> child lookup RELATIVE to base 256 ->
    direct block."""
    from flood_data_spark.sources.hdf5 import _fractal_heap_object

    S, W, off_w, len_w = 32, 2, 2, 1
    buf = bytearray(64)
    def app(block):
        addr = len(buf); buf.extend(block); return addr
    frhp_addr = len(buf)
    h = bytearray(146)
    h[0:4] = b"FRHP"
    p = 5
    h[p:p + 2] = _u(1 + off_w + len_w, 2)
    h[p + 5:p + 9] = _u(512, 4)              # max managed object
    h[p + 17:p + 25] = _u(UNDEF, 8)
    h[p + 33:p + 41] = _u(UNDEF, 8)
    h[p + 105:p + 107] = _u(W, 2)
    h[p + 107:p + 115] = _u(S, 8)            # starting block size
    h[p + 115:p + 123] = _u(64, 8)           # max direct -> 3 dir rows
    h[p + 123:p + 125] = _u(16, 2)
    h[p + 135:p + 137] = _u(4, 2)            # root rows 0..3
    app(bytes(h))
    # child-local row 1 col 1: base 256 + row_start 64 + 32 = 352
    payload = b"nested-object"
    bstart = 352
    db = bytearray(b"FHDB" + bytes([0]) + _u(frhp_addr, 8)
                   + _u(bstart, off_w))
    obj_off = bstart + len(db)
    db += payload
    db += b"\x00" * (S - len(db))
    db_addr = app(bytes(db))
    child = bytearray(b"FHIB" + bytes([0]) + _u(frhp_addr, 8)
                      + _u(256, off_w))
    for slot in range(2 * W):                # child rows 0..1
        child += _u(db_addr if slot == 3 else UNDEF, 8)
    child += _u(0, 4)
    child_addr = app(bytes(child))
    root = bytearray(b"FHIB" + bytes([0]) + _u(frhp_addr, 8)
                     + _u(0, off_w))
    for _ in range(3 * W):                   # direct rows 0..2: empty
        root += _u(UNDEF, 8)
    root += _u(child_addr, 8)                # row 3 col 0 -> child
    root += _u(UNDEF, 8)                     # row 3 col 1
    root += _u(0, 4)
    root_addr = app(bytes(root))
    buf[frhp_addr + 5 + 127:frhp_addr + 5 + 135] = _u(root_addr, 8)
    hid = bytes([0]) + _u(obj_off, off_w) + _u(len(payload), len_w)
    assert _fractal_heap_object(bytes(buf), frhp_addr, hid) == payload
    # an offset landing in the UNALLOCATED row-3 col-1 child -> loud
    hid_un = bytes([0]) + _u(256 + 128 + 20, off_w) + _u(4, len_w)
    with pytest.raises(NotImplementedError, match="unallocated"):
        _fractal_heap_object(bytes(buf), frhp_addr, hid_un)


def _filter_info_deflate() -> bytes:
    """Encoded filter pipeline (v2, one deflate filter, level 6) — the
    12-byte Filter Information blob a filtered heap header carries."""
    return bytes([2, 1]) + _u(1, 2) + _u(0, 2) + _u(1, 2) + _u(6, 4)


def test_filtered_root_direct_heap_resolves():
    """Round 13: FILTERED (deflate) fractal heap with a root direct
    block — the header grows {filtered root size, filter mask, filter
    info}; the stored block is the zlib stream of the WHOLE direct
    block, decompressed before the offset slice."""
    import zlib

    from flood_data_spark.sources.hdf5 import _fractal_heap_object

    off_w = len_w = 2
    finfo = _filter_info_deflate()
    buf = bytearray(64)
    def app(block):
        addr = len(buf); buf.extend(block); return addr
    payload = b"deflated-heap-object"
    db = bytearray(b"FHDB" + bytes([0]) + _u(0, 8) + _u(0, off_w))
    # placeholder heap addr patched below; record object offset now
    obj_off = len(db)
    db += payload
    db += b"\x00" * (512 - len(db))
    frhp_addr = len(buf)
    db[5:13] = _u(frhp_addr, 8)
    comp = zlib.compress(bytes(db), 6)
    h = bytearray(146 + 8 + 4 + len(finfo))
    h[0:4] = b"FRHP"
    p = 5
    h[p:p + 2] = _u(1 + off_w + len_w, 2)
    h[p + 2:p + 4] = _u(len(finfo), 2)       # I/O filter length
    h[p + 5:p + 9] = _u(512, 4)
    h[p + 17:p + 25] = _u(UNDEF, 8)
    h[p + 33:p + 41] = _u(UNDEF, 8)
    h[p + 105:p + 107] = _u(4, 2)
    h[p + 107:p + 115] = _u(512, 8)
    h[p + 115:p + 123] = _u(512, 8)
    h[p + 123:p + 125] = _u(16, 2)
    h[p + 135:p + 137] = _u(0, 2)            # root direct
    h[p + 137:p + 145] = _u(len(comp), 8)    # filtered root size
    h[p + 145:p + 149] = _u(0, 4)            # filter mask
    h[p + 149:p + 149 + len(finfo)] = finfo
    app(bytes(h))
    db_addr = app(comp)
    buf[frhp_addr + 5 + 127:frhp_addr + 5 + 135] = _u(db_addr, 8)
    hid = bytes([0]) + _u(obj_off, off_w) + _u(len(payload), len_w)
    assert _fractal_heap_object(bytes(buf), frhp_addr, hid) == payload


def _close_filtered(w) -> bytes:
    """MiniH5Dense finisher with a FILTERED (deflate) root-direct
    fractal heap — the whole-file parse-equality twin of the plain
    dense layout."""
    import zlib

    off_w = len_w = 2
    finfo = _filter_info_deflate()
    links = []
    for name, addr in sorted(w.entries):
        nb = name.encode()
        links.append(bytes([1, 0, len(nb)]) + nb + _u(addr, 8))
    frhp_addr = len(w.buf)
    db = bytearray(b"FHDB" + bytes([0]) + _u(frhp_addr, 8)
                   + _u(0, off_w))
    ids = []
    for ln in links:
        ids.append(bytes([0]) + _u(len(db), off_w) + _u(len(ln), len_w))
        db += ln
    db += b"\x00" * (512 - len(db))
    comp = zlib.compress(bytes(db), 6)
    h = bytearray(146 + 8 + 4 + len(finfo))
    h[0:4] = b"FRHP"
    p = 5
    h[p:p + 2] = _u(1 + off_w + len_w, 2)
    h[p + 2:p + 4] = _u(len(finfo), 2)
    h[p + 5:p + 9] = _u(512, 4)
    h[p + 17:p + 25] = _u(UNDEF, 8)
    h[p + 33:p + 41] = _u(UNDEF, 8)
    h[p + 41:p + 49] = _u(512, 8)
    h[p + 49:p + 57] = _u(512, 8)
    h[p + 65:p + 73] = _u(len(links), 8)
    h[p + 105:p + 107] = _u(4, 2)
    h[p + 107:p + 115] = _u(512, 8)
    h[p + 115:p + 123] = _u(512, 8)
    h[p + 123:p + 125] = _u(16, 2)
    h[p + 135:p + 137] = _u(0, 2)
    h[p + 137:p + 145] = _u(len(comp), 8)
    h[p + 145:p + 149] = _u(0, 4)
    h[p + 149:p + 149 + len(finfo)] = finfo
    w.append(bytes(h))
    db_addr = w.append(comp)
    w.buf[frhp_addr + 5 + 127:frhp_addr + 5 + 135] = _u(db_addr, 8)
    recs = b"".join(_u(i, 4) + hid for i, hid in enumerate(ids))
    leaf_addr = w.append(b"BTLF" + bytes([0, 5]) + recs + _u(0, 4))
    bthd_addr = w.append(
        b"BTHD" + bytes([0, 5]) + _u(4096, 4) + _u(9, 2) + _u(0, 2)
        + bytes([100, 40]) + _u(leaf_addr, 8) + _u(len(ids), 2)
        + _u(len(ids), 8) + _u(0, 4))
    root = w.append(_ohdr(
        [_msg(0x0002, bytes([0, 0]) + _u(frhp_addr, 8)
              + _u(bthd_addr, 8))]))
    w.buf[28:36] = _u(len(w.buf), 8)
    w.buf[36:44] = _u(root, 8)
    return bytes(w.buf)


def test_filtered_heap_file_matches_plain_dense():
    """The SAME logical file through a deflate-filtered link heap
    parses identically to the unfiltered single-block layout."""
    w = MiniH5Dense()
    lat = np.array([10.0, 10.5, 11.0])
    lon = np.array([20.0, 20.25])
    grid = np.arange(6, dtype=np.float64).reshape(3, 2) * 1.5
    w.add_dataset("lat", lat, DT_F8, attrs=_scale_attrs("lat"))
    w.add_dataset("lon", lon, DT_F8, attrs=_scale_attrs("lon"))
    w.add_dataset("uparea", grid, DT_F8)
    dims_f, vars_f, _ = parse_hdf5(_close_filtered(w))
    dims_s, vars_s, _ = parse_hdf5(_build_dense_raster())
    assert dims_f == dims_s == {"lat": 3, "lon": 2}
    assert set(vars_f) == set(vars_s)
    np.testing.assert_array_equal(vars_f["uparea"]["data"],
                                  vars_s["uparea"]["data"])


def test_filtered_multiblock_heap_resolves():
    """Round 13: filtered heap with a root INDIRECT block — direct
    entries widen to 20 bytes {addr, filtered size, filter mask}; an
    object in the row-1 col-0 block resolves through decompression."""
    import zlib

    from flood_data_spark.sources.hdf5 import _fractal_heap_object

    S, W, off_w, len_w = 32, 2, 2, 1
    finfo = _filter_info_deflate()
    buf = bytearray(64)
    def app(block):
        addr = len(buf); buf.extend(block); return addr
    frhp_addr = len(buf)
    h = bytearray(146 + 8 + 4 + len(finfo))
    h[0:4] = b"FRHP"
    p = 5
    h[p:p + 2] = _u(1 + off_w + len_w, 2)
    h[p + 2:p + 4] = _u(len(finfo), 2)
    h[p + 5:p + 9] = _u(512, 4)
    h[p + 17:p + 25] = _u(UNDEF, 8)
    h[p + 33:p + 41] = _u(UNDEF, 8)
    h[p + 105:p + 107] = _u(W, 2)
    h[p + 107:p + 115] = _u(S, 8)
    h[p + 115:p + 123] = _u(64, 8)
    h[p + 123:p + 125] = _u(16, 2)
    h[p + 135:p + 137] = _u(2, 2)            # rows 0..1
    h[p + 137:p + 145] = _u(0, 8)            # (root not direct)
    h[p + 149:p + 149 + len(finfo)] = finfo
    app(bytes(h))
    payload = b"row1-deflated"
    bstart = W * S                           # row 1 col 0
    db = bytearray(b"FHDB" + bytes([0]) + _u(frhp_addr, 8)
                   + _u(bstart, off_w))
    obj_off = bstart + len(db)
    db += payload
    db += b"\x00" * (S - len(db))
    comp = zlib.compress(bytes(db), 6)
    db_addr = app(comp)
    fhib = bytearray(b"FHIB" + bytes([0]) + _u(frhp_addr, 8)
                     + _u(0, off_w))
    for slot in range(2 * W):                # 20-byte direct entries
        if slot == 2:                        # row 1 col 0
            fhib += _u(db_addr, 8) + _u(len(comp), 8) + _u(0, 4)
        else:
            fhib += _u(UNDEF, 8) + _u(0, 8) + _u(0, 4)
    fhib += _u(0, 4)
    fhib_addr = app(bytes(fhib))
    buf[frhp_addr + 5 + 127:frhp_addr + 5 + 135] = _u(fhib_addr, 8)
    hid = bytes([0]) + _u(obj_off, off_w) + _u(len(payload), len_w)
    assert _fractal_heap_object(bytes(buf), frhp_addr, hid) == payload


def test_v2_btree_depth1_walk():
    """Round 13: multi-level v2 B-trees — a depth-1 tree (BTIN root
    with one link record and two BTLF children) enumerates ALL records
    in order: leaf0's, the internal node's own, then leaf1's.  Child
    pointer entries are {addr(8), nrec(2)} — the number-of-records
    width follows the leaf maximum (4086//9 = 454 -> 2 bytes)."""
    from flood_data_spark.sources.hdf5 import _v2_btree_heap_ids

    rec_size = 9                             # 4-byte hash + 5-byte id
    ids = [bytes([0]) + _u(100 + i, 2) + _u(7, 2) for i in range(5)]
    buf = bytearray(64)
    def app(block):
        addr = len(buf); buf.extend(block); return addr
    def leaf(recs):
        body = b"".join(_u(i, 4) + hid for i, hid in enumerate(recs))
        return app(b"BTLF" + bytes([0, 5]) + body + _u(0, 4))
    l0 = leaf(ids[0:2])
    l1 = leaf(ids[3:5])
    btin = (b"BTIN" + bytes([0, 5])
            + _u(9, 4) + ids[2]              # the internal record
            + _u(l0, 8) + _u(2, 2)           # child ptr 0
            + _u(l1, 8) + _u(2, 2)           # child ptr 1
            + _u(0, 4))
    root = app(btin)
    bthd = app(b"BTHD" + bytes([0, 5]) + _u(4096, 4) + _u(rec_size, 2)
               + _u(1, 2) + bytes([100, 40]) + _u(root, 8) + _u(1, 2)
               + _u(5, 8) + _u(0, 4))
    got = _v2_btree_heap_ids(bytes(buf), bthd)
    assert got == ids                        # in order, hashes skipped


def _close_depth1(w) -> bytes:
    """MiniH5Dense finisher with a DEPTH-1 link-name v2 B-tree over a
    single-direct-block heap: links split leaf0 / internal-record /
    leaf1 — the whole-file parse-equality twin of the depth-0 layout."""
    off_w = len_w = 2
    links = []
    for name, addr in sorted(w.entries):
        nb = name.encode()
        links.append(bytes([1, 0, len(nb)]) + nb + _u(addr, 8))
    frhp_addr = len(w.buf)
    h = bytearray(146)
    h[0:4] = b"FRHP"
    p = 5
    h[p:p + 2] = _u(1 + off_w + len_w, 2)
    h[p + 5:p + 9] = _u(512, 4)
    h[p + 17:p + 25] = _u(UNDEF, 8)
    h[p + 33:p + 41] = _u(UNDEF, 8)
    h[p + 41:p + 49] = _u(512, 8)
    h[p + 49:p + 57] = _u(512, 8)
    h[p + 65:p + 73] = _u(len(links), 8)
    h[p + 105:p + 107] = _u(4, 2)
    h[p + 107:p + 115] = _u(512, 8)
    h[p + 115:p + 123] = _u(512, 8)
    h[p + 123:p + 125] = _u(16, 2)
    h[p + 135:p + 137] = _u(0, 2)
    w.append(bytes(h))
    db = bytearray(b"FHDB" + bytes([0]) + _u(frhp_addr, 8)
                   + _u(0, off_w))
    ids = []
    for ln in links:
        ids.append(bytes([0]) + _u(len(db), off_w) + _u(len(ln), len_w))
        db += ln
    db += b"\x00" * (512 - len(db))
    db_addr = w.append(bytes(db))
    w.buf[frhp_addr + 5 + 127:frhp_addr + 5 + 135] = _u(db_addr, 8)
    assert len(ids) >= 3, "depth-1 writer needs >= 3 links"
    rec_size = 4 + len(ids[0])               # 9
    def leaf(recs, base):
        body = b"".join(_u(base + i, 4) + hid
                        for i, hid in enumerate(recs))
        return w.append(b"BTLF" + bytes([0, 5]) + body + _u(0, 4))
    mid = len(ids) // 2
    l0 = leaf(ids[:mid], 0)
    l1 = leaf(ids[mid + 1:], mid + 1)
    root = w.append(b"BTIN" + bytes([0, 5])
                    + _u(mid, 4) + ids[mid]
                    + _u(l0, 8) + _u(mid, 2)
                    + _u(l1, 8) + _u(len(ids) - mid - 1, 2)
                    + _u(0, 4))
    bthd_addr = w.append(
        b"BTHD" + bytes([0, 5]) + _u(4096, 4) + _u(rec_size, 2)
        + _u(1, 2) + bytes([100, 40]) + _u(root, 8) + _u(1, 2)
        + _u(len(ids), 8) + _u(0, 4))
    ohdr = w.append(_ohdr(
        [_msg(0x0002, bytes([0, 0]) + _u(frhp_addr, 8)
              + _u(bthd_addr, 8))]))
    w.buf[28:36] = _u(len(w.buf), 8)
    w.buf[36:44] = _u(ohdr, 8)
    return bytes(w.buf)


def test_depth1_btree_file_matches_depth0():
    """The SAME logical file through a depth-1 link-name B-tree parses
    identically to the single-leaf layout."""
    w = MiniH5Dense()
    lat = np.array([10.0, 10.5, 11.0])
    lon = np.array([20.0, 20.25])
    grid = np.arange(6, dtype=np.float64).reshape(3, 2) * 1.5
    w.add_dataset("lat", lat, DT_F8, attrs=_scale_attrs("lat"))
    w.add_dataset("lon", lon, DT_F8, attrs=_scale_attrs("lon"))
    w.add_dataset("uparea", grid, DT_F8)
    dims_d, vars_d, _ = parse_hdf5(_close_depth1(w))
    dims_s, vars_s, _ = parse_hdf5(_build_dense_raster())
    assert dims_d == dims_s == {"lat": 3, "lon": 2}
    assert set(vars_d) == set(vars_s)
    np.testing.assert_array_equal(vars_d["uparea"]["data"],
                                  vars_s["uparea"]["data"])
