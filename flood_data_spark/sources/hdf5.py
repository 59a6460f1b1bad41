"""Pure-Python minimal HDF5 / NetCDF-4 reader.

Modern GloFAS static rasters ship as NetCDF-4, whose container is HDF5 —
the reference opens them with ``engine='netcdf4'``
(/root/reference/flood/etl/utils.py:3-14).  Without the libhdf5 stack a
bare container previously hit NotImplementedError on day one of real-data
ingestion; this module closes that gap for the file shapes libnetcdf's
DEFAULT (earliest) format actually writes, straight from the public HDF5
File Format Specification:

- superblock v0 (and the trivial v2/v3), 8-byte offsets/lengths
- old-style groups: v1 B-tree + local heap + SNOD symbol tables, plus
  v2 compact groups via hard Link messages, plus (round 11) v2 DENSE
  groups — Link Info → link-name v2 B-tree (single BTLF leaf) →
  fractal heap (managed v0 IDs; round 12 added root-indirect
  multi-block heaps, round 13 NESTED indirect blocks and FILTERED
  (deflate/shuffle) heaps — the large-group/large-attribute layouts),
  the libver='latest' layout libnetcdf emits past the compact threshold
- v1 object headers (with continuation blocks)
- messages: Dataspace, Datatype, Fill Value, Data Layout v3
  (compact / contiguous / chunked), Filter Pipeline, Attribute (v1-v3),
  Link, Symbol Table, Object Header Continuation
- datatypes: fixed-point, IEEE float, fixed/variable strings, object
  references, variable-length sequences (via the global heap)
- filters: deflate (stdlib zlib), shuffle, fletcher32 (checksum skipped)
- NetCDF-4 semantics: dimension-scale datasets (CLASS="DIMENSION_SCALE")
  name the dims; data variables resolve their dim names through
  DIMENSION_LIST object references, falling back to unique size matching

Everything else (huge/tiny heap objects, v4 layouts, szip, ...) raises
NotImplementedError with a message naming the xarray/h5netcdf escape
hatch — `raster.netcdf_decoder` dispatches there when installed.

Output contract: ``parse_hdf5`` returns the same (dims, variables,
global_attrs) triple as ``netcdf3.parse_netcdf3`` and ``to_dataframe``
shares `netcdf3.flatten_grid`, so HDF5-backed rasters flow into the same
executor-side mapInPandas decode seam as every other format.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd

SIGNATURE = b"\x89HDF\r\n\x1a\n"

_UNDEF = 0xFFFFFFFFFFFFFFFF


def _u(b: bytes, off: int, n: int) -> int:
    return int.from_bytes(b[off:off + n], "little")


def _need(cond: bool, what: str) -> None:
    if not cond:
        raise NotImplementedError(
            f"hdf5: {what} not supported by the minimal reader "
            "(install xarray/h5netcdf for full coverage)")


# ------------------------------------------------------------- superblock

def _superblock(b: bytes) -> dict:
    """Root group location from a v0/v1 or v2/v3 superblock at offset 0."""
    if b[:8] != SIGNATURE:
        raise ValueError("hdf5: bad signature")
    if len(b) < 96:
        raise ValueError("hdf5: truncated file (no complete superblock)")
    version = b[8]
    if version in (0, 1):
        _need(b[13] == 8 and b[14] == 8, "non-8-byte offsets/lengths")
        # root group symbol table entry: after sig/versions/sizes/ks/
        # flags + the 4 address fields = offset 56 (v1 inserts 4 bytes of
        # indexed-storage k before the addresses)
        ste = 56 if version == 0 else 60
        return {"root_ohdr": _u(b, ste + 8, 8),
                "root_btree": _u(b, ste + 24, 8),
                "root_heap": _u(b, ste + 32, 8)}
    if version in (2, 3):
        _need(b[9] == 8 and b[10] == 8, "non-8-byte offsets/lengths")
        return {"root_ohdr": _u(b, 36, 8),
                "root_btree": _UNDEF, "root_heap": _UNDEF}
    raise NotImplementedError(f"hdf5: superblock version {version}")


# ---------------------------------------------------------- object header

def _messages_v1(b: bytes, addr: int) -> list[tuple[int, bytes]]:
    nmsgs = _u(b, addr + 2, 2)
    hdr_size = _u(b, addr + 8, 4)
    blocks = [(addr + 16, hdr_size)]
    msgs: list[tuple[int, bytes]] = []
    bi = 0
    while bi < len(blocks) and len(msgs) < nmsgs:
        pos, remaining = blocks[bi]
        while remaining >= 8 and len(msgs) < nmsgs:
            mtype = _u(b, pos, 2)
            msize = _u(b, pos + 2, 2)
            data = b[pos + 8:pos + 8 + msize]
            pos += 8 + msize
            remaining -= 8 + msize
            if mtype == 0x0010:             # continuation
                blocks.append((_u(data, 0, 8), _u(data, 8, 8)))
            else:
                msgs.append((mtype, data))
        bi += 1
    return msgs


def _messages_v2(b: bytes, addr: int) -> list[tuple[int, bytes]]:
    _need(b[addr:addr + 4] == b"OHDR", "unknown object header version")
    flags = b[addr + 5]
    pos = addr + 6
    if flags & 0x20:
        pos += 16                 # access/mod/change/birth times (4 x u32)
    if flags & 0x10:
        pos += 4                  # max compact / min dense attrs (2 x u16)
    size_bytes = 1 << (flags & 0x03)
    chunk0 = _u(b, pos, size_bytes)
    pos += size_bytes
    blocks = [(pos, chunk0)]
    tracked = bool(flags & 0x04)
    msgs: list[tuple[int, bytes]] = []
    bi = 0
    while bi < len(blocks):
        p, remaining = blocks[bi]
        while remaining > 4:                 # gap/checksum tail
            mtype = b[p]
            msize = _u(b, p + 1, 2)
            p += 4 + (2 if tracked else 0)
            remaining -= 4 + (2 if tracked else 0)
            data = b[p:p + msize]
            p += msize
            remaining -= msize
            if mtype == 0x10:
                cont, clen = _u(data, 0, 8), _u(data, 8, 8)
                blocks.append((cont + 4, clen - 8))   # skip OCHK + checksum
            else:
                msgs.append((mtype, data))
        bi += 1
    return msgs


def _object_header(b: bytes, addr: int) -> list[tuple[int, bytes]]:
    if b[addr] == 1:
        return _messages_v1(b, addr)
    return _messages_v2(b, addr)


# -------------------------------------------------------------- messages

def _dataspace(data: bytes) -> list[int]:
    version = data[0]
    rank = data[1]
    if version == 1:
        off = 8
    elif version == 2:
        off = 4
    else:
        raise NotImplementedError(f"hdf5: dataspace version {version}")
    return [_u(data, off + 8 * i, 8) for i in range(rank)]


def _datatype(data: bytes) -> dict:
    cls = data[0] & 0x0F
    bits = data[1:4]
    size = _u(data, 4, 4)
    order = ">" if bits[0] & 1 else "<"
    if cls == 0:                              # fixed-point
        signed = "i" if bits[0] & 0x08 else "u"
        return {"cls": 0, "size": size,
                "dtype": np.dtype(f"{order}{signed}{size}")}
    if cls == 1:                              # IEEE float
        _need(size in (4, 8), f"float size {size}")
        return {"cls": 1, "size": size,
                "dtype": np.dtype(f"{order}f{size}")}
    if cls == 3:                              # fixed-size string
        return {"cls": 3, "size": size}
    if cls == 7:                              # reference
        return {"cls": 7, "size": size}
    if cls == 9:                              # variable-length
        _need(bits[0] & 0x0F in (0, 1), "vlen flavor")
        return {"cls": 9, "size": size,
                "vstring": (bits[0] & 0x0F) == 1,
                "base": _datatype(data[8:])}
    raise NotImplementedError(f"hdf5: datatype class {cls}")


def _layout(data: bytes) -> dict:
    version = data[0]
    _need(version == 3, f"layout message version {version}")
    cls = data[1]
    if cls == 0:                              # compact
        size = _u(data, 2, 2)
        return {"cls": "compact", "raw": data[4:4 + size]}
    if cls == 1:                              # contiguous
        return {"cls": "contiguous", "addr": _u(data, 2, 8),
                "size": _u(data, 10, 8)}
    if cls == 2:                              # chunked (v1 B-tree)
        rank = data[2]                        # ndims + 1 (element size dim)
        addr = _u(data, 3, 8)
        dims = [_u(data, 11 + 4 * i, 4) for i in range(rank)]
        return {"cls": "chunked", "btree": addr,
                "chunk": dims[:-1], "elem": dims[-1]}
    raise NotImplementedError(f"hdf5: layout class {cls}")


def _fill_value(data: bytes) -> bytes | None:
    """Raw fill-value bytes from a Fill Value message (0x0005), or None
    when no fill is defined.  Versions 1-2 carry (alloc time, write time,
    defined flag); version 3 packs them into a flags byte."""
    version = data[0]
    if version in (1, 2):
        if version == 2 and data[3] == 0:
            return None
        size = _u(data, 4, 4)
        return data[8:8 + size] if size else None
    if version == 3:
        flags = data[1]
        if not flags & 0x20:                  # fill value not defined
            return None
        size = _u(data, 2, 4)
        return data[6:6 + size] if size else None
    raise NotImplementedError(f"hdf5: fill value message version {version}")


def _fill_scalar(fill_raw: bytes | None, dtype: np.dtype):
    """Decode the raw fill bytes as one element of `dtype` (0 when no
    fill is defined — HDF5's default)."""
    if fill_raw is None or len(fill_raw) < dtype.itemsize:
        return 0
    return np.frombuffer(fill_raw, dtype=dtype, count=1)[0]


def _filters(data: bytes) -> list[tuple[int, list[int]]]:
    version = data[0]
    nfilters = data[1]
    pos = 8 if version == 1 else 2
    out = []
    for _ in range(nfilters):
        fid = _u(data, pos, 2)
        if version == 1 or fid >= 256:
            namelen = _u(data, pos + 2, 2)
            pos += 4
        else:
            namelen = 0
            pos += 2
        pos += 4                              # flags + number of values
        nvals = _u(data, pos - 2, 2)
        if version == 1:
            namelen = (namelen + 7) & ~7
        pos += namelen
        vals = [_u(data, pos + 4 * i, 4) for i in range(nvals)]
        pos += 4 * nvals
        if version == 1 and nvals % 2:
            pos += 4
        out.append((fid, vals))
    return out


def _global_heap_object(b: bytes, addr: int, index: int) -> bytes:
    _need(b[addr:addr + 4] == b"GCOL", "missing global heap collection")
    size = _u(b, addr + 8, 8)
    pos = addr + 16
    end = addr + size
    while pos < end:
        idx = _u(b, pos, 2)
        osize = _u(b, pos + 8, 8)
        if idx == index:
            return b[pos + 16:pos + 16 + osize]
        if idx == 0:
            break
        pos += 16 + ((osize + 7) & ~7)
    raise ValueError(f"hdf5: global heap object {index} not found")


def _attr_value(b: bytes, dt: dict, dims: list[int], payload: bytes):
    n = int(np.prod(dims)) if dims else 1
    if dt["cls"] == 3:
        return payload[:dt["size"]].split(b"\x00")[0]
    if dt["cls"] == 9 and dt.get("vstring"):
        raw = _global_heap_object(b, _u(payload, 4, 8), _u(payload, 12, 4))
        return raw[:_u(payload, 0, 4)]
    if dt["cls"] == 9:                        # vlen sequence per element
        out = []
        for i in range(n):
            ep = payload[16 * i:16 * (i + 1)]
            cnt = _u(ep, 0, 4)
            raw = _global_heap_object(b, _u(ep, 4, 8), _u(ep, 12, 4))
            base = dt["base"]
            if base["cls"] == 7:
                out.append([_u(raw, 8 * j, 8) for j in range(cnt)])
            else:
                out.append(np.frombuffer(
                    raw, dtype=base["dtype"], count=cnt))
        return out
    if dt["cls"] == 7:
        return [_u(payload, 8 * j, 8) for j in range(n)]
    arr = np.frombuffer(payload, dtype=dt["dtype"], count=n)
    return arr[0] if (not dims or n == 1) else arr


def _attribute(b: bytes, data: bytes) -> tuple[str, object]:
    version = data[0]
    name_size = _u(data, 2, 2)
    dt_size = _u(data, 4, 2)
    ds_size = _u(data, 6, 2)
    pos = 8 + (1 if version == 3 else 0)
    pad = (lambda x: (x + 7) & ~7) if version == 1 else (lambda x: x)
    name = data[pos:pos + name_size].split(b"\x00")[0].decode()
    pos += pad(name_size)
    dt = _datatype(data[pos:pos + dt_size])
    pos += pad(dt_size)
    dims = _dataspace(data[pos:pos + ds_size]) if ds_size else []
    pos += pad(ds_size)
    return name, _attr_value(b, dt, dims, data[pos:])


# ----------------------------------------------------------------- groups

def _local_heap_name(b: bytes, heap_addr: int, offset: int) -> str:
    _need(b[heap_addr:heap_addr + 4] == b"HEAP", "missing local heap")
    seg = _u(b, heap_addr + 24, 8)
    end = b.index(b"\x00", seg + offset)
    return b[seg + offset:end].decode()


def _symbol_entries(b: bytes, btree_addr: int, heap_addr: int
                    ) -> list[tuple[str, int]]:
    """(name, object header address) pairs from a v1 group B-tree."""
    out: list[tuple[str, int]] = []

    def walk(addr: int) -> None:
        _need(b[addr:addr + 4] == b"TREE", "missing group B-tree node")
        level = b[addr + 5]
        entries = _u(b, addr + 6, 2)
        children = [_u(b, addr + 24 + 8 + 16 * i, 8) for i in range(entries)]
        for child in children:
            if level > 0:
                walk(child)
            else:
                _need(b[child:child + 4] == b"SNOD", "missing SNOD")
                nsyms = _u(b, child + 6, 2)
                for i in range(nsyms):
                    e = child + 8 + 40 * i
                    out.append((_local_heap_name(b, heap_addr, _u(b, e, 8)),
                                _u(b, e + 8, 8)))

    walk(btree_addr)
    return out


def _parse_link_message(data: bytes) -> tuple[str, int]:
    """Hard Link message body -> (name, object header address) — shared
    by compact (in-header) links and dense links stored as fractal-heap
    objects (the byte layout is identical, spec IV.A.2.g)."""
    _need(data[0] == 1, f"link message version {data[0]}")
    flags = data[1]
    pos = 2
    if flags & 0x08:
        _need(data[pos] == 0, "soft/external links")
        pos += 1
    if flags & 0x04:
        pos += 8                              # creation order
    if flags & 0x10:
        pos += 1                              # charset
    nlen = _u(data, pos, 1 << (flags & 0x03))
    pos += 1 << (flags & 0x03)
    name = data[pos:pos + nlen].decode()
    return name, _u(data, pos + nlen, 8)


def _v2_btree_heap_ids(b: bytes, addr: int) -> list[bytes]:
    """All heap IDs from a 'link name' v2 B-tree (spec III.A.2): BTHD
    header -> in-order walk of BTIN internal nodes and BTLF leaves.
    Round 13 closes the depth>=1 residual: child-pointer entry widths
    follow the library's size ladder — the number-of-records field is
    sized by the LEAF maximum (internal fan-out never exceeds it), the
    total-number field (present for children of depth >= 1) by the
    cumulative subtree maximum, both recomputed per level from
    node_size/record_size exactly as H5B2 does.  Internal-node records
    are link records too and are enumerated in order."""
    _need(b[addr:addr + 4] == b"BTHD", "missing v2 B-tree header")
    _need(b[addr + 4] == 0, f"v2 B-tree version {b[addr + 4]}")
    btype = b[addr + 5]
    _need(btype == 5, f"v2 B-tree record type {btype} (link-name only)")
    node_size = _u(b, addr + 6, 4)
    rec_size = _u(b, addr + 10, 2)
    depth = _u(b, addr + 12, 2)
    root = _u(b, addr + 16, 8)
    nrec_root = _u(b, addr + 24, 2)
    _need(node_size > 10 and rec_size > 4, "v2 B-tree geometry")

    def _enc(v: int) -> int:
        return (v.bit_length() - 1) // 8 + 1 if v else 1

    # per-depth size ladder (spec III.A.2 / H5B2 init): leaf max from
    # the node prefix (10 bytes incl. checksum); at depth u the child
    # pointer is {addr(8), nrec(max_nrec_size), [total(cum size u-1)]}
    leaf_max = (node_size - 10) // rec_size
    max_nrec_size = _enc(leaf_max)
    cum_max = leaf_max
    cum_size = [0]
    for u in range(1, depth + 1):
        ptr_sz = 8 + max_nrec_size + cum_size[u - 1]
        mx = (node_size - 10 - ptr_sz) // (rec_size + ptr_sz)
        _need(mx > 0, "v2 B-tree internal fan-out")
        cum_max = (mx + 1) * cum_max + mx
        cum_size.append(_enc(cum_max))

    out: list[bytes] = []

    def walk(naddr: int, nrec: int, d: int) -> None:
        if d == 0:
            _need(b[naddr:naddr + 4] == b"BTLF",
                  "missing v2 B-tree leaf")
            _need(b[naddr + 4] == 0 and b[naddr + 5] == btype,
                  "v2 leaf version/type")
            pos = naddr + 6
            for _ in range(nrec):
                out.append(b[pos + 4:pos + rec_size])  # skip name hash
                pos += rec_size
            return
        _need(b[naddr:naddr + 4] == b"BTIN",
              "missing v2 B-tree internal node")
        _need(b[naddr + 4] == 0 and b[naddr + 5] == btype,
              "v2 internal version/type")
        recs = naddr + 6
        ptrs = recs + nrec * rec_size
        ptr_sz = 8 + max_nrec_size + cum_size[d - 1]
        for i in range(nrec + 1):
            ppos = ptrs + i * ptr_sz
            walk(_u(b, ppos, 8), _u(b, ppos + 8, max_nrec_size), d - 1)
            if i < nrec:
                out.append(b[recs + i * rec_size + 4:
                             recs + (i + 1) * rec_size])

    walk(root, nrec_root, depth)
    return out


def _fractal_heap_object(b: bytes, frhp_addr: int,
                         heap_id: bytes) -> bytes:
    """Resolve a MANAGED fractal-heap ID to its object bytes (spec
    III.G).  Profile (round 13 closes the r12 residual): root direct
    block, root indirect block, NESTED indirect blocks (the recursive
    doubling-table walk the HDF5 library runs — each level re-looks-up
    the offset RELATIVE to the child block against the same global
    row-size table), and FILTERED (deflate/shuffle) heaps — root-direct
    via the header's filtered-root size/mask fields, indirect via the
    20-byte {addr, filtered size, filter mask} direct entries; the
    whole direct block decompresses before the offset slice.  Huge/tiny
    objects stay loud NotImplementedError.  The managed ID is
    version-0: offset sized by Maximum Heap Size bits, length sized per
    the min(direct-block-offset, max-object) rule."""
    _need(b[frhp_addr:frhp_addr + 4] == b"FRHP",
          "missing fractal heap header")
    _need(b[frhp_addr + 4] == 0,
          f"fractal heap version {b[frhp_addr + 4]}")
    # header field offsets per spec IV.A.2, relative to just past
    # signature+version: id len(2), filter len(2), flags(1), max
    # managed obj(4), next huge id(8), huge btree(8), free space(8),
    # free-space mgr(8), managed space(8), allocated(8), iterator(8),
    # n managed(8), huge size(8), n huge(8), tiny size(8), n tiny(8),
    # table width(2), start block(8), max direct(8), max heap bits(2),
    # start rows(2), root addr(8), current rows(2)
    p = frhp_addr + 5
    heap_id_len = _u(b, p, 2)
    filt_len = _u(b, p + 2, 2)
    max_obj = _u(b, p + 5, 4)
    max_dir_block = _u(b, p + 115, 8)
    n_huge = _u(b, p + 81, 8)
    n_tiny = _u(b, p + 97, 8)
    _need(n_huge == 0 and n_tiny == 0, "huge/tiny fractal-heap objects")
    max_heap_bits = _u(b, p + 123, 2)
    root_addr = _u(b, p + 127, 8)
    cur_rows = _u(b, p + 135, 2)
    width = _u(b, p + 105, 2)
    start_block = _u(b, p + 107, 8)
    off_w = (max_heap_bits + 7) // 8
    # spec: length field width = min(bytes to hold the max DIRECT block
    # offset, bytes to hold Maximum Size of Managed Objects); the
    # heap_id_len cross-check below stays as the loud backstop
    len_w = max(min(((max_dir_block - 1).bit_length() + 7) // 8,
                    (max_obj.bit_length() + 7) // 8), 1)
    _need(len(heap_id) >= 1 + off_w + len_w
          and heap_id_len == 1 + off_w + len_w,
          f"fractal heap ID length {heap_id_len}")
    idv = heap_id[0]
    _need(idv >> 4 == 0 and idv & 0x30 == 0,
          f"fractal heap ID type 0x{idv:02x} (managed v0 only)")
    off = int.from_bytes(heap_id[1:1 + off_w], "little")
    ln = int.from_bytes(heap_id[1 + off_w:1 + off_w + len_w], "little")
    # filtered heaps (spec IV.A.2): when the encoded filter length is
    # nonzero the header carries {filtered-root size (lengths width),
    # filter mask (4), encoded filter pipeline (filt_len)} right after
    # Current # of Rows; whole direct blocks are filtered as units
    heap_filters: list = []
    filt_root_size = 0
    if filt_len:
        filt_root_size = _u(b, p + 137, 8)
        heap_filters = _filters(b[p + 149:p + 149 + filt_len])
    if cur_rows == 0:
        # root is a single direct block: heap offsets address the
        # managed space, which INCLUDES the direct block header; the
        # root block's own offset is 0, so file position is simply
        # block address + heap offset (checksum presence rides header
        # flags bit 1 but sits inside the header region either way)
        if heap_filters:
            blk = _defilter(bytes(b[root_addr:root_addr
                                    + filt_root_size]), heap_filters, 1)
            _need(blk[:4] == b"FHDB",
                  "missing fractal heap direct block")
            return blk[off:off + ln]
        _need(b[root_addr:root_addr + 4] == b"FHDB",
              "missing fractal heap direct block")
        return b[root_addr + off:root_addr + off + ln]
    # INDIRECT walk (spec III.G doubling table, the recursive form the
    # HDF5 library runs): within any indirect block, the offset
    # RELATIVE to that block's base looks up against the global row
    # sizes — row r holds `width` blocks of size S (rows 0-1) or
    # S·2^(r-1) (r >= 2), so row r covers [W·S·2^(r-1), W·S·2^r) for
    # r >= 1.  Rows past the max-direct-block row are CHILD INDIRECT
    # blocks of log2(size_r) - log2(W·S) + 1 rows; their 8-byte
    # address entries sit after the direct entries (which are 20 bytes
    # when the heap is filtered: addr + filtered size + filter mask).
    _need(start_block > 0 and width > 0, "fractal heap doubling table")
    max_direct_rows = (max_dir_block.bit_length()
                       - start_block.bit_length() + 2)
    ws = width * start_block
    dirent = 20 if heap_filters else 8
    iaddr, ibase, irows = root_addr, 0, cur_rows
    for _depth in range(64):                 # heap offsets are < 2^64
        _need(b[iaddr:iaddr + 4] == b"FHIB",
              "missing fractal heap indirect block")
        _need(b[iaddr + 4] == 0,
              f"fractal heap indirect block version {b[iaddr + 4]}")
        ents = iaddr + 5 + 8 + off_w  # past sig/version/heap-addr/offset
        rel = off - ibase
        if rel < ws:
            r = 0
        elif rel < 2 * ws:
            r = 1
        else:
            r = (rel // ws).bit_length()   # floor(log2(rel/ws)) + 1
        _need(r < irows,
              f"fractal heap offset {off} beyond row {irows}")
        size_r = start_block if r < 2 else start_block << (r - 1)
        row_start = 0 if r == 0 else ws << (r - 1)
        col = (rel - row_start) // size_r
        bstart = ibase + row_start + col * size_r
        if r < max_direct_rows:
            epos = ents + dirent * (r * width + col)
            addr = _u(b, epos, 8)
            _need(addr != _UNDEF, "unallocated fractal-heap direct block")
            _need(off + ln <= bstart + size_r,
                  "fractal-heap object crossing a direct-block boundary")
            if heap_filters:
                stored = _u(b, epos + 8, 8)
                blk = _defilter(bytes(b[addr:addr + stored]),
                                heap_filters, 1)
                _need(blk[:4] == b"FHDB",
                      "missing fractal heap direct block")
                return blk[off - bstart:off - bstart + ln]
            _need(b[addr:addr + 4] == b"FHDB",
                  "missing fractal heap direct block")
            return b[addr + (off - bstart):addr + (off - bstart) + ln]
        # nested indirect entry: address-only, after the direct region
        n_dir = min(irows, max_direct_rows) * width
        epos = ents + dirent * n_dir \
            + 8 * ((r - max_direct_rows) * width + col)
        addr = _u(b, epos, 8)
        _need(addr != _UNDEF, "unallocated fractal-heap indirect block")
        iaddr, ibase = addr, bstart
        irows = size_r.bit_length() - ws.bit_length() + 1
    raise AssertionError("hdf5: fractal-heap walk did not terminate")


def _group_children(b: bytes, ohdr_addr: int,
                    btree_addr: int = _UNDEF,
                    heap_addr: int = _UNDEF) -> list[tuple[str, int]]:
    """Children of a group: old-style symbol table (possibly cached in
    the superblock entry), v2 compact Link messages, or v2 DENSE link
    storage (Link Info -> fractal heap + link-name v2 B-tree — the
    libver='latest' layout libnetcdf emits past the compact
    threshold)."""
    children: list[tuple[str, int]] = []
    msgs = _object_header(b, ohdr_addr)
    for mtype, data in msgs:
        if mtype == 0x0011:                   # symbol table message
            btree_addr, heap_addr = _u(data, 0, 8), _u(data, 8, 8)
        elif mtype == 0x0006:                 # link message (v2 compact)
            children.append(_parse_link_message(data))
        elif mtype == 0x0002:                 # link info (dense storage)
            pos = 2 + (8 if data[1] & 1 else 0)
            fheap = _u(data, pos, 8)
            name_bt = _u(data, pos + 8, 8)
            if fheap != _UNDEF:
                for hid in _v2_btree_heap_ids(b, name_bt):
                    obj = _fractal_heap_object(b, fheap, hid)
                    children.append(_parse_link_message(obj))
    if btree_addr != _UNDEF:
        children.extend(_symbol_entries(b, btree_addr, heap_addr))
    return children


# --------------------------------------------------------------- datasets

def _defilter(raw: bytes, filters, elem_size: int) -> bytes:
    for fid, vals in reversed(filters):
        if fid == 1:
            raw = zlib.decompress(raw)
        elif fid == 2:
            size = vals[0] if vals else elem_size
            n = len(raw) // size
            raw = (np.frombuffer(raw, dtype=np.uint8)
                   .reshape(size, n).T.tobytes())
        elif fid == 3:
            raw = raw[:-4]                    # fletcher32 checksum
        else:
            _need(False, f"filter id {fid}")
    return raw


def _read_chunked(b: bytes, layout: dict, filters, shape: list[int],
                  dtype: np.dtype, fill) -> np.ndarray:
    # unallocated chunks read as the dataset's fill value, not 0
    rank = len(layout["chunk"])
    arr = np.full(shape, fill, dtype=dtype)

    def walk(addr: int) -> None:
        _need(b[addr:addr + 4] == b"TREE", "missing chunk B-tree node")
        _need(b[addr + 4] == 1, "non-chunk B-tree in layout")
        level = b[addr + 5]
        entries = _u(b, addr + 6, 2)
        key_size = 8 + 8 * (rank + 1)
        pos = addr + 24
        for _ in range(entries):
            csize = _u(b, pos, 4)
            offsets = [_u(b, pos + 8 + 8 * i, 8) for i in range(rank)]
            child = _u(b, pos + key_size, 8)
            pos += key_size + 8
            if level > 0:
                walk(child)
                continue
            raw = _defilter(b[child:child + csize], filters, dtype.itemsize)
            chunk = np.frombuffer(raw, dtype=dtype).reshape(layout["chunk"])
            sl, cl = [], []
            for d in range(rank):
                lo = offsets[d]
                hi = min(lo + layout["chunk"][d], shape[d])
                sl.append(slice(lo, hi))
                cl.append(slice(0, hi - lo))
            arr[tuple(sl)] = chunk[tuple(cl)]

    walk(layout["btree"])
    return arr


def _dataset(b: bytes, ohdr_addr: int) -> dict:
    dims: list[int] = []
    dt: dict | None = None
    layout: dict | None = None
    filters: list = []
    attrs: dict = {}
    fill_raw: bytes | None = None
    for mtype, data in _object_header(b, ohdr_addr):
        if mtype == 0x0001:
            dims = _dataspace(data)
        elif mtype == 0x0003:
            dt = _datatype(data)
        elif mtype == 0x0005:
            fill_raw = _fill_value(data)
        elif mtype == 0x0008:
            layout = _layout(data)
        elif mtype == 0x000B:
            filters = _filters(data)
        elif mtype == 0x000C:
            name, value = _attribute(b, data)
            attrs[name] = value
        elif mtype == 0x0015:
            _need(False, "dense attribute storage")
    if dt is None or layout is None:
        raise ValueError("hdf5: dataset missing datatype/layout")
    _need("dtype" in dt, f"dataset datatype class {dt['cls']}")
    dtype = dt["dtype"]
    fill = _fill_scalar(fill_raw, dtype)
    n = int(np.prod(dims)) if dims else 1
    if layout["cls"] == "compact":
        data_arr = np.frombuffer(layout["raw"], dtype=dtype, count=n)
    elif layout["cls"] == "contiguous":
        if layout["addr"] == _UNDEF:          # never written: fill value
            data_arr = np.full(n, fill, dtype=dtype)
        else:
            data_arr = np.frombuffer(
                b[layout["addr"]:layout["addr"] + n * dtype.itemsize],
                dtype=dtype, count=n)
    else:
        data_arr = _read_chunked(b, layout, filters, dims, dtype, fill)
    return {"dims_sizes": dims, "attrs": attrs,
            "data": np.asarray(data_arr).reshape(dims)}


# ------------------------------------------------------------ NetCDF-4 API

def parse_hdf5(content: bytes) -> tuple[dict, dict, dict]:
    """HDF5/NetCDF-4 bytes → (dims, variables, global_attrs), the same
    triple as `netcdf3.parse_netcdf3`: dims maps name -> size, variables
    maps name -> dict(dims=[names], attrs={...}, data=ndarray)."""
    b = bytes(content)
    sb = _superblock(b)
    root_attrs: dict = {}
    for mtype, data in _object_header(b, sb["root_ohdr"]):
        if mtype == 0x000C:
            name, value = _attribute(b, data)
            root_attrs[name] = value
    children = _group_children(b, sb["root_ohdr"],
                               sb["root_btree"], sb["root_heap"])
    datasets: dict[str, dict] = {}
    addr_to_name: dict[int, str] = {}
    for name, addr in children:
        ds = _dataset(b, addr)
        datasets[name] = ds
        addr_to_name[addr] = name

    # netCDF-4 dimension scales name the dims
    scales = {n: ds for n, ds in datasets.items()
              if ds["attrs"].get("CLASS") == b"DIMENSION_SCALE"}
    dims = {n: ds["dims_sizes"][0] for n, ds in scales.items()}

    def dim_names(name: str, ds: dict) -> list[str]:
        if name in scales:
            return [name]
        dl = ds["attrs"].get("DIMENSION_LIST")
        if dl is not None:
            return [addr_to_name[refs[0]] for refs in dl]
        # fallback: unique size match against the scales, else phony dims
        out = []
        for i, size in enumerate(ds["dims_sizes"]):
            matches = [n for n, s in dims.items() if s == size]
            if len(matches) == 1:
                out.append(matches[0])
            else:
                phony = f"phony_dim_{i}"
                dims.setdefault(phony, size)
                out.append(phony)
        return out

    hidden = ("CLASS", "NAME", "DIMENSION_LIST", "REFERENCE_LIST",
              "_Netcdf4Dimid", "_Netcdf4Coordinates")
    variables = {}
    for name, ds in datasets.items():
        attrs = {k: (v.decode() if isinstance(v, bytes) else v)
                 for k, v in ds["attrs"].items() if k not in hidden}
        variables[name] = {"dims": dim_names(name, ds), "attrs": attrs,
                           "data": ds["data"]}
    return dims, variables, root_attrs


def to_dataframe(content: bytes) -> pd.DataFrame:
    """NetCDF-4/HDF5 bytes → long-form pandas frame, sharing the classic
    reader's CF-unpack + cartesian flatten (`netcdf3.flatten_grid`)."""
    from flood_data_spark.sources.netcdf3 import flatten_grid

    dims, variables, _g = parse_hdf5(content)
    return flatten_grid(dims, variables, "hdf5")
