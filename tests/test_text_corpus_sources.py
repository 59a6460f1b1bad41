"""JSONL/CSV corpus sources (sources/text_corpus.py): explicit-schema
reads, corrupt-line quarantine, round-trip."""

import json
import os

from pyspark.sql import functions as F

from flood_data_spark.sources.text_corpus import (
    read_csv_docs, read_jsonl, write_jsonl)


def _write_jsonl(path, rows, corrupt_lines=()):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        for line in corrupt_lines:
            f.write(line + "\n")


def test_read_jsonl_explicit_schema_and_pruning(spark, tmp_path):
    p = str(tmp_path / "docs.jsonl")
    _write_jsonl(p, [
        {"doc_id": i, "text": f"doc {i}", "lang": "en",
         "source": "web", "n_chars": 5, "extra_field": "ignored"}
        for i in range(10)])
    df = read_jsonl(spark, p)
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert df.count() == 10
    assert df.schema["doc_id"].dataType.typeName() == "long"
    # no inference pass: plan must not contain a second scan
    assert df.filter(F.col("doc_id") == 3).first().text == "doc 3"


def test_read_jsonl_quarantines_corrupt_lines(spark, tmp_path):
    p = str(tmp_path / "bad.jsonl")
    _write_jsonl(p, [{"doc_id": 1, "text": "ok", "lang": "en",
                      "source": "web", "n_chars": 2}],
                 corrupt_lines=['{"doc_id": 2, "text": TRUNC',
                                "not json at all"])
    clean = read_jsonl(spark, p)
    assert [r.doc_id for r in clean.collect()] == [1]
    audited = read_jsonl(spark, p, keep_corrupt=True)
    bad = audited.filter(F.col("_corrupt_record").isNotNull())
    assert bad.count() == 2
    assert audited.count() == 3


def test_jsonl_roundtrip_preserves_rows(spark, tmp_path):
    src = spark.createDataFrame(
        [(i, f"text with\nnewline {i}", "en", "web", 20) for i in range(25)],
        "doc_id long, text string, lang string, source string, n_chars long")
    out = str(tmp_path / "out")
    write_jsonl(src, out)
    back = read_jsonl(spark, out)
    assert back.count() == 25
    assert ({(r.doc_id, r.text) for r in back.collect()}
            == {(r.doc_id, r.text) for r in src.collect()})


def test_read_csv_docs_multiline_text(spark, tmp_path):
    p = str(tmp_path / "docs.csv")
    with open(p, "w") as f:
        f.write("doc_id,text,lang,source,n_chars\n")
        f.write('1,"line one\nline two",en,web,17\n')
        f.write('2,plain,en,web,5\n')
    df = read_csv_docs(spark, p)
    rows = {r.doc_id: r.text for r in df.collect()}
    assert rows[1] == "line one\nline two"
    assert rows[2] == "plain"
