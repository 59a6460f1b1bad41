"""Semi-structured (JSON string) column handling.

Event streams routinely carry a free-form JSON properties column next to
the typed columns (the reference engine never parses one — this is part of
the beyond-reference event-analytics surface, SURVEY §2.11).  The rule at
scale: parse each row's JSON ONCE with a declared schema (`from_json` is a
single codegen'd expression producing a struct), then project typed fields
from the struct — N `get_json_object` calls would re-parse the string N
times per row, which at 100 TB is N scans' worth of CPU hidden inside one.

Malformed JSON follows Spark's PERMISSIVE semantics: the struct (and so
every extracted field) is NULL — corrupt rows degrade to nulls instead of
failing the job, and a `coalesce`/filter downstream makes the policy
explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_json_fields(df: DataFrame, json_col: str,
                     fields: dict[str, str],
                     prefix: str = "") -> DataFrame:
    """Extract typed top-level fields from a JSON string column.

    `fields` maps field name -> Spark SQL type string (e.g. {"k": "long",
    "tag": "string"}); each becomes a column `prefix + name`.  One
    `from_json` parse per row regardless of how many fields are pulled.

    Raises if an output column name collides with an existing column —
    silent withColumn overwrite would destroy caller data.
    """
    if not fields:
        raise ValueError("fields must name at least one JSON field")
    collisions = [prefix + n for n in fields
                  if prefix + n in df.columns]
    if collisions:
        raise ValueError(
            f"output column(s) {collisions} already exist in the input; "
            "pass a prefix to disambiguate")
    tmp = "_json"
    while tmp in df.columns:
        tmp += "_"
    schema = ", ".join(f"`{name}` {dtype}" for name, dtype in fields.items())
    parsed = df.withColumn(tmp, F.from_json(F.col(json_col), schema))
    for name in fields:
        parsed = parsed.withColumn(prefix + name, F.col(f"`{tmp}`.`{name}`"))
    return parsed.drop(tmp)
