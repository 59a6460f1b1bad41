"""Typed JSON field extraction (functions/semistructured)."""

import pytest

from flood_data_spark.functions.semistructured import with_json_fields


def test_typed_fields_and_malformed_null_semantics(spark):
    df = spark.createDataFrame([
        (1, '{"k": 7, "tag": "a"}'),
        (2, '{"k": null, "tag": "b"}'),
        (3, 'not json at all'),
        (4, None),
        (5, '{"tag": "e"}'),              # field absent
    ], "id long, props string")
    rows = {r.id: r for r in
            with_json_fields(df, "props",
                             {"k": "long", "tag": "string"}).collect()}
    assert (rows[1].k, rows[1].tag) == (7, "a")
    assert rows[2].k is None and rows[2].tag == "b"
    # malformed / null JSON degrades to nulls, never fails the job
    assert rows[3].k is None and rows[3].tag is None
    assert rows[4].k is None
    assert rows[5].k is None and rows[5].tag == "e"


def test_single_parse_per_row(spark):
    """N extracted fields must cost ONE from_json, not N re-parses."""
    df = spark.createDataFrame([(1, '{"a":1,"b":2,"c":3}')],
                               "id long, props string")
    out = with_json_fields(df, "props",
                           {"a": "long", "b": "long", "c": "string"})
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("from_json") == 1, plan


def test_rejects_empty_fields(spark):
    df = spark.createDataFrame([(1, "{}")], "id long, props string")
    with pytest.raises(ValueError, match="at least one"):
        with_json_fields(df, "props", {})


def test_collision_and_reserved_name_guards(spark):
    df = spark.createDataFrame([(1, '{"k": 2}', 9)],
                               "id long, props string, k long")
    with pytest.raises(ValueError, match="already exist"):
        with_json_fields(df, "props", {"k": "long"})
    # prefix disambiguates; a pre-existing _json column survives untouched
    df2 = spark.createDataFrame([(1, '{"k": 2}', "keepme")],
                                "id long, props string, _json string")
    out = with_json_fields(df2, "props", {"k": "long"}, prefix="j_").collect()
    assert out[0].j_k == 2 and out[0]._json == "keepme"
