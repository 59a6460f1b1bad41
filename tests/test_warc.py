"""WARC reader (sources/warc.py) + html_to_text extraction: plain and
gzip-member round trips, HTTP payload split, loud malformed-record
guards, the distributed binaryFile path, and the extraction chain."""

import gzip

import pytest

from flood_data_spark.sources.warc import (build_warc, parse_warc,
                                           read_warc, warc_to_dataframe)

RECS = [
    {"record_type": "response", "url": "https://a.example/x",
     "date": "2024-02-03T04:05:06Z",
     "payload": b"<p>hello</p>", "http": "text/html"},
    {"record_type": "request", "url": "https://a.example/x",
     "date": "2024-02-03T04:05:06Z", "payload": b"GET /x"},
    {"record_type": "warcinfo", "url": "", "date": "2024-02-03T04:05:06Z",
     "payload": b"software: test"},
]


@pytest.mark.parametrize("gz", [False, True])
def test_warc_round_trip(gz):
    out = parse_warc(build_warc(RECS, gzip_members=gz))
    assert [r["record_type"] for r in out] == ["response", "request",
                                               "warcinfo"]
    resp = out[0]
    assert resp["url"] == "https://a.example/x"
    assert resp["http_status"] == 200
    assert resp["content_type"] == "text/html"
    assert resp["payload"] == b"<p>hello</p>"
    # non-HTTP records keep the raw block
    assert out[1]["payload"] == b"GET /x"
    assert out[1]["http_status"] is None


def test_warc_dataframe_shape():
    pdf = warc_to_dataframe(build_warc(RECS))
    assert list(pdf.columns) == ["record_type", "url", "date",
                                 "http_status", "content_type",
                                 "payload"]
    assert pdf["payload"].tolist()[0] == "<p>hello</p>"
    empty = warc_to_dataframe(b"")
    assert len(empty) == 0 and list(empty.columns) == list(pdf.columns)


def test_warc_malformed_guards():
    good = build_warc(RECS[:1])
    with pytest.raises(ValueError, match="bad version line"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(NotImplementedError, match="unsupported"):
        parse_warc(good.replace(b"WARC/1.0", b"WARC/0.9"))
    with pytest.raises(ValueError, match="truncated block"):
        parse_warc(good[:-10])
    # record terminator (two CRLFs after the block) is mandatory
    with pytest.raises(ValueError, match="terminator"):
        parse_warc(good[:-4] + b"XXXX")
    # gzip member followed by garbage
    with pytest.raises(ValueError, match="trailing garbage"):
        parse_warc(gzip.compress(good) + b"junk")


def test_warc_folded_header_unfolds():
    """RFC 7230 obs-fold / ISO 28500: a continuation line (leading
    SP/HT) extends the previous header's value with a single space —
    one spec-legal folded header must not abort the whole file."""
    from flood_data_spark.sources.warc import _parse_headers

    assert _parse_headers(
        b"A: one\r\n two\r\n\tthree\r\nB: x", "record") == \
        {"a": "one two three", "b": "x"}
    # a continuation line with nothing to continue is malformed
    with pytest.raises(ValueError, match="continuation"):
        _parse_headers(b" orphan: 1\r\nB: x", "record")

    # end-to-end: fold an extra record header, the record still parses
    good = build_warc(RECS[:1])
    folded = good.replace(
        b"\r\nContent-Length:",
        b"\r\nX-Folded: part1\r\n\t part2\r\nContent-Length:")
    out = parse_warc(folded)
    assert len(out) == 1 and out[0]["url"] == "https://a.example/x"


def test_warc_binaryfile_path(spark, tmp_path):
    p1 = tmp_path / "a.warc"
    p1.write_bytes(build_warc(RECS))
    p2 = tmp_path / "b.warc.gz"
    p2.write_bytes(build_warc(
        [{"record_type": "response", "url": "https://b.example/y",
          "date": "2024-02-03T04:05:06Z",
          "payload": b"plain body", "http": "text/plain"}],
        gzip_members=True))
    df = read_warc(spark, str(tmp_path / "*.warc*"))
    rows = sorted(df.collect(), key=lambda r: r.url)
    assert [r.url for r in rows] == ["https://a.example/x",
                                     "https://b.example/y"]
    assert all(r.record_type == "response" for r in rows)
    assert rows[1].payload == "plain body"
    # the default filter keeps responses only
    all_rows = read_warc(spark, str(p1), record_types=()).collect()
    assert len(all_rows) == 3


def test_html_to_text_goldens(spark):
    from pyspark.sql import functions as F

    from flood_data_spark.datapipe.text import html_to_text

    cases = [
        ("<script>var a='<p>ignore</p>';</script><p>Kept &amp; well</p>",
         "Kept & well"),
        ("<h1>T</h1><p>a</p><p>b</p>", "T\na\nb"),
        ("&amp;lt; decodes to &lt; literally", "&lt; decodes to < literally"),
        ("plain", "plain"),
        ("<div>A&nbsp;&nbsp;B</div>", "A B"),
    ]
    df = spark.createDataFrame([(i, h) for i, (h, _) in enumerate(cases)],
                               "i int, h string")
    got = {r.i: r.t for r in
           df.select("i", html_to_text(F.col("h")).alias("t")).collect()}
    for i, (_, expect) in enumerate(cases):
        assert got[i] == expect, (i, got[i], expect)
