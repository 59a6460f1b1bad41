"""Pure-Python WARC (Web ARChive, ISO 28500) reader — the container
CommonCrawl ships, i.e. the raw input of every web-scale training-data
pipeline this engine's dedup/quality/text families exist to process.

From-spec implementation of the public WARC 1.0/1.1 format: records are

    WARC/1.x CRLF
    <name: value CRLF>*          (named fields, case-insensitive names)
    CRLF
    <Content-Length octets of block>
    CRLF CRLF

concatenated; ``.warc.gz`` files are per-record gzip MEMBERS
concatenated (the CommonCrawl layout — each record its own member so
byte-range fetches decompress independently), which stdlib zlib
inflates member-by-member.  For ``response`` records the block is an
HTTP/1.x message; the reader splits its status line + headers from the
body and surfaces (url, date, record_type, http_status, content_type,
payload).

Spark integration (`read_warc`): `binaryFile` scan + ONE mapInPandas
decode per file — identical distribution shape to `raster.read_rasters`
(the executor-side decode seam; files are the parallelism unit, the
driver never touches bytes).  Malformed records raise loudly with
offsets — a crawl pipeline must know it dropped data, never silently
skip.

No reference analog (the reference ingests GRIB/NetCDF only);
beyond-reference inventory (SURVEY.md §2.11) — the ingestion front of
the documents-table families (html_to_text, quality, dedup, LM scoring).
"""

from __future__ import annotations

import zlib

import pandas as pd

_CRLF = b"\r\n"


def _inflate_members(content: bytes) -> bytes:
    """Concatenated gzip members -> concatenated plain bytes (the
    CommonCrawl one-member-per-record layout; also handles single-member
    files and passes plain WARC bytes through untouched)."""
    if not content.startswith(b"\x1f\x8b"):
        return content
    out = []
    pos = 0
    while pos < len(content):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out.append(d.decompress(content[pos:]))
        tail = d.unused_data
        if not tail:
            break
        pos = len(content) - len(tail)
        if not tail.startswith(b"\x1f\x8b"):
            raise ValueError(
                f"warc: trailing garbage after gzip member at {pos}")
    return b"".join(out)


def _parse_headers(block: bytes, what: str) -> dict:
    """CRLF-separated 'Name: value' lines -> lower-cased dict.

    WARC/HTTP grammar permits FOLDED continuation lines (leading SP or
    HT continue the previous header's value, RFC 7230 obs-fold / WARC
    ISO 28500 §4); those are unfolded into a single space-joined value
    before the ':' split, so one spec-legal folded header no longer
    aborts ingest of the whole file."""
    unfolded: list[bytes] = []
    for line in block.split(_CRLF):
        if not line:
            continue
        if line[:1] in (b" ", b"\t"):
            if not unfolded:
                raise ValueError(f"warc: {what} header starts with a "
                                 f"continuation line {line[:60]!r}")
            unfolded[-1] += b" " + line.strip()
            continue
        unfolded.append(line)
    headers = {}
    for line in unfolded:
        if b":" not in line:
            raise ValueError(f"warc: malformed {what} header line "
                             f"{line[:60]!r}")
        name, value = line.split(b":", 1)
        headers[name.strip().lower().decode("latin-1")] = \
            value.strip().decode("latin-1")
    return headers


def parse_warc(content: bytes) -> list[dict]:
    """WARC bytes (plain or .gz) -> one dict per record:
    (record_type, url, date, warc_content_type, http_status,
    content_type, payload:bytes).  HTTP response/request blocks are
    split into status/headers/body; other blocks surface verbatim."""
    data = _inflate_members(content)
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record padding CRLFs
        while pos < n and data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        eol = data.find(_CRLF, pos)
        version = data[pos:eol if eol != -1 else pos + 16]
        if not version.startswith(b"WARC/"):
            raise ValueError(f"warc: bad version line at offset {pos}: "
                             f"{version[:20]!r}")
        if version not in (b"WARC/1.0", b"WARC/1.1"):
            raise NotImplementedError(
                f"warc: version {version.decode('latin-1')} unsupported "
                "(1.0/1.1 only)")
        hdr_end = data.find(_CRLF + _CRLF, eol)
        if hdr_end == -1:
            raise ValueError(f"warc: unterminated header at {pos}")
        headers = _parse_headers(data[eol + 2:hdr_end], "record")
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError(f"warc: missing/bad Content-Length at {pos}")
        block_start = hdr_end + 4
        block = data[block_start:block_start + length]
        if len(block) != length:
            raise ValueError(f"warc: truncated block at {block_start} "
                             f"(want {length}, have {len(block)})")
        rec = {
            "record_type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri", ""),
            "date": headers.get("warc-date", ""),
            "warc_content_type": headers.get("content-type", ""),
            "http_status": None,
            "content_type": "",
            "payload": block,
        }
        if rec["warc_content_type"].startswith("application/http"):
            split = block.find(_CRLF + _CRLF)
            head = block[:split] if split != -1 else block
            body = block[split + 4:] if split != -1 else b""
            lines = head.split(_CRLF)
            status_line = lines[0].decode("latin-1", "replace")
            parts = status_line.split(None, 2)
            if parts and parts[0].startswith("HTTP/") and len(parts) > 1:
                try:
                    rec["http_status"] = int(parts[1])
                except ValueError:
                    pass
            http_headers = _parse_headers(_CRLF.join(lines[1:]), "http")
            rec["content_type"] = http_headers.get("content-type", "")
            rec["payload"] = body
        records.append(rec)
        pos = block_start + length
        if data[pos:pos + 4] != _CRLF + _CRLF:
            raise ValueError(
                f"warc: missing record terminator at {pos} (spec: two "
                "CRLFs after every block)")
        pos += 4
    return records


def warc_to_dataframe(content: bytes) -> pd.DataFrame:
    """WARC bytes -> long-form record rows with the payload decoded as
    latin-1-tolerant text (binary payloads survive byte-exact through
    latin-1; the html/text family re-encodes as needed)."""
    rows = [{
        "record_type": r["record_type"],
        "url": r["url"],
        "date": r["date"],
        "http_status": r["http_status"],
        "content_type": r["content_type"],
        "payload": r["payload"].decode("latin-1"),
    } for r in parse_warc(content)]
    cols = ["record_type", "url", "date", "http_status",
            "content_type", "payload"]
    return pd.DataFrame(rows, columns=cols) if rows else \
        pd.DataFrame({c: [] for c in cols})


def read_warc(spark, path_glob: str, record_types=("response",)):
    """Distributed WARC ingest: binaryFile scan (files are the
    parallelism unit) + one mapInPandas decode per file — the
    raster-reader distribution shape.  Returns (warc_file, record_type,
    url, date, http_status, content_type, payload) rows filtered to
    `record_types` (responses by default — the training-data records)."""
    from pyspark.sql import functions as F

    types = list(record_types)
    binary = (spark.read.format("binaryFile").load(path_glob)
              .select("path", "content"))

    def run(batches):
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                rows = warc_to_dataframe(bytes(content))
                rows.insert(0, "warc_file", path)
                out.append(rows)
            if out:
                yield pd.concat(out, ignore_index=True)

    df = binary.mapInPandas(
        run, schema="warc_file string, record_type string, url string,"
                    " date string, http_status int,"
                    " content_type string, payload string")
    return df.filter(F.col("record_type").isin(types)) if types else df


def build_warc(records, gzip_members: bool = False) -> bytes:
    """Test/fixture encoder: records as (record_type, url, date,
    payload_bytes[, http]) dicts -> WARC 1.0 bytes, optionally with the
    CommonCrawl one-gzip-member-per-record layout.  `http` wraps the
    payload as an HTTP 200 response with the given content type."""
    import gzip as _gz

    out = []
    for r in records:
        payload = r["payload"]
        ctype = "application/octet-stream"
        if r.get("http"):
            payload = (b"HTTP/1.1 200 OK\r\nContent-Type: "
                       + r["http"].encode() + _CRLF + _CRLF + payload)
            ctype = "application/http; msgtype=response"
        head = (b"WARC/1.0" + _CRLF
                + b"WARC-Type: " + r["record_type"].encode() + _CRLF
                + b"WARC-Target-URI: " + r.get("url", "").encode()
                + _CRLF
                + b"WARC-Date: " + r.get("date", "").encode() + _CRLF
                + b"Content-Type: " + ctype.encode() + _CRLF
                + b"Content-Length: " + str(len(payload)).encode()
                + _CRLF + _CRLF)
        rec = head + payload + _CRLF + _CRLF
        out.append(_gz.compress(rec) if gzip_members else rec)
    return b"".join(out)
