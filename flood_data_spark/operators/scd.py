"""Slowly-changing-dimension (type 2) maintenance: apply an update
batch to a versioned dimension table.

The reference pipeline republishes static dimension snapshots wholesale
(flood/etl/raster_converter.py writes full parquet overwrites); a
warehouse at 100 TB instead keeps validity intervals and touches only
changed keys.  `scd2_apply` is that merge expressed relationally: ONE
key-equi-join of the (batch-sized) update set against the current rows,
a null-safe attribute comparison to split unchanged/changed/new, and a
union of the four row classes.  Shuffle volume is update-sized plus the
current-row side of the join; closed history passes through untouched
(at the storage layer, pair this with partition-by-key-range so the
rewrite prunes to touched partitions).

Deterministic and engine-portable: no timestamps are generated — the
caller supplies the effective instant — and every comparison is
null-safe equality, so the driver gate value-hashes the full output.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(dim: DataFrame, updates: DataFrame, key_cols,
               attr_cols, effective_col: str = "effective_ts",
               valid_from: str = "valid_from",
               valid_to: str = "valid_to",
               current_col: str = "is_current") -> DataFrame:
    """New SCD2 state after applying `updates` to `dim`.

    `dim` rows: key_cols + attr_cols + (valid_from, valid_to,
    current_col); `updates`: key_cols + attr_cols + effective_col with
    a NON-NULL effective instant (it doubles as the side-presence probe
    after the full outer join), at most ONE row per key (raise upstream
    or pre-dedupe with `cap_per_key`-style latest-wins — this operator
    asserts nothing about duplicate update keys and would fan out on
    them).

    Row classes in the output:
    - history (current_col = false): passes through verbatim;
    - current + no update, or update with IDENTICAL attrs (null-safe
      comparison, so NULL == NULL holds): passes through;
    - current + changed attrs: CLOSED (valid_to = effective instant,
      current_col = false) and a NEW version row opens (valid_from =
      effective instant, valid_to = NULL, current_col = true);
    - update for an unseen key: a new current row opens.

    An update whose effective instant is not strictly after the current
    row's valid_from would create a zero/negative-length interval; the
    plan is lazy so this cannot raise eagerly — such rows are emitted
    with `scd_conflict = true` for the caller to quarantine
    (count-assert with plans/checks at publish time).  Output schema:
    key_cols + attr_cols + valid_from + valid_to + current_col +
    scd_conflict.

    Plan: the current partition of the dimension shuffles ONCE on the
    business key against the update batch (full outer — broadcast is
    structurally unavailable for full-outer builds, and the current
    rows must flow through anyway); history never enters the join.
    """
    key_cols = list(key_cols)
    attr_cols = list(attr_cols)
    if not key_cols:
        raise ValueError("scd2_apply: key_cols must be non-empty")
    if not attr_cols:
        raise ValueError("scd2_apply: attr_cols must be non-empty")
    out_cols = (key_cols + attr_cols
                + [valid_from, valid_to, current_col, "scd_conflict"])

    up = updates.select(
        *[F.col(c).alias(f"_u_{c}") for c in key_cols],
        *[F.col(c).alias(f"_ua_{c}") for c in attr_cols],
        F.col(effective_col).alias("_eff"))
    # a NULL current flag reads as NOT current: the row passes through
    # with history (plain filter + ~filter would drop it from BOTH
    # partitions — silent row loss in a merge operator)
    is_cur = F.coalesce(F.col(current_col), F.lit(False))
    cur = dim.filter(is_cur)
    hist = dim.filter(~is_cur).withColumn(
        "scd_conflict", F.lit(False)).select(*out_cols)

    # null-safe: a NULL business-key value must still meet its update —
    # plain equality would leave the old version open AND insert a
    # duplicate current row for the same key
    key_match = reduce(lambda a, b: a & b,
                       [F.col(c).eqNullSafe(F.col(f"_u_{c}"))
                        for c in key_cols])
    joined = cur.join(up, key_match, "full_outer")
    same_attrs = reduce(
        lambda a, b: a & b,
        [F.col(c).eqNullSafe(F.col(f"_ua_{c}")) for c in attr_cols])
    # side-presence probes: every cur row carries current_col = true and
    # every update row a non-null effective instant, so these are
    # definitive after the full outer join
    has_cur = F.col(current_col).isNotNull()
    has_upd = F.col("_eff").isNotNull()

    # every row class emits through ONE conditional explode over a
    # single instantiation of the full-outer join (r16, guide §2.4):
    # the previous union of four filtered views instantiated the join
    # — a shuffle pair of the current partition AND the update batch —
    # four times in one plan.
    conflict = F.col("_eff") <= F.col(valid_from)
    null_to = F.lit(None).cast(dim.schema[valid_to].dataType)

    def _row(keys, attrs, vf, vt, cur_flag, confl):
        fields = ([k.alias(c) for k, c in zip(keys, key_cols)]
                  + [a.alias(c) for a, c in zip(attrs, attr_cols)]
                  + [vf.alias(valid_from), vt.alias(valid_to),
                     cur_flag.alias(current_col),
                     confl.alias("scd_conflict")])
        return F.struct(*fields)

    unchanged_s = _row([F.col(c) for c in key_cols],
                       [F.col(c) for c in attr_cols],
                       F.col(valid_from), F.col(valid_to),
                       F.col(current_col), F.lit(False))
    closed_s = _row([F.col(c) for c in key_cols],
                    [F.col(c) for c in attr_cols],
                    F.col(valid_from), F.col("_eff"),
                    F.lit(False), conflict)
    opened_s = _row([F.col(c) for c in key_cols],
                    [F.col(f"_ua_{c}") for c in attr_cols],
                    F.col("_eff"), null_to, F.lit(True), conflict)
    inserted_s = _row([F.col(f"_u_{c}") for c in key_cols],
                      [F.col(f"_ua_{c}") for c in attr_cols],
                      F.col("_eff"), null_to, F.lit(True),
                      F.lit(False))
    emitted = (F.when(has_cur & (~has_upd | same_attrs),
                      F.array(unchanged_s))
               .when(has_cur & has_upd & ~same_attrs,
                     F.array(closed_s, opened_s))
               .when(has_upd & ~has_cur, F.array(inserted_s)))
    merged = (joined.select(F.explode(emitted).alias("_r"))
              .select("_r.*"))
    return hist.unionByName(merged)


def scd2_as_of(dim: DataFrame, instant, valid_from: str = "valid_from",
               valid_to: str = "valid_to") -> DataFrame:
    """The dimension as it was at `instant`: rows whose half-open
    validity interval [valid_from, valid_to) covers it — the temporal
    point lookup every fact-table join at a historical date needs.
    Pure filter: pushes down to the scan, no shuffle."""
    inst = F.lit(instant)
    return dim.filter((F.col(valid_from) <= inst)
                      & (F.col(valid_to).isNull()
                         | (F.col(valid_to) > inst)))
