"""SCD2 merge (operators/scd.scd2_apply, scd2_as_of)."""

import datetime

import pytest

from flood_data_spark.operators.scd import scd2_apply, scd2_as_of

D = datetime.date
DIM_SCHEMA = ("k long, name string, tier string, valid_from date, "
              "valid_to date, is_current boolean")
UPD_SCHEMA = "k long, name string, tier string, effective_ts date"


def _dim(spark):
    rows = [
        # key 1: one closed + one current version
        (1, "alice", "gold", D(2020, 1, 1), D(2022, 1, 1), False),
        (1, "alice", "plat", D(2022, 1, 1), None, True),
        # key 2: current only, will change
        (2, "bob", "silver", D(2021, 1, 1), None, True),
        # key 3: current only, update is identical -> no-op
        (3, "carol", None, D(2021, 6, 1), None, True),
        # key 4: current only, no update
        (4, "dan", "gold", D(2021, 1, 1), None, True),
    ]
    return spark.createDataFrame(rows, DIM_SCHEMA)


def _updates(spark):
    rows = [
        (2, "bob", "gold", D(2024, 1, 1)),       # changed
        (3, "carol", None, D(2024, 1, 1)),       # identical (NULL-safe)
        (5, "eve", "silver", D(2024, 1, 1)),     # new key
    ]
    return spark.createDataFrame(rows, UPD_SCHEMA)


def _apply(spark):
    return scd2_apply(_dim(spark), _updates(spark), ["k"],
                      ["name", "tier"]).collect()


def test_scd2_row_classes(spark):
    out = _apply(spark)
    by_key = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    assert not any(r.scd_conflict for r in out)
    # history + untouched current pass through
    assert len(by_key[1]) == 2
    assert sorted((r.is_current, r.valid_to) for r in by_key[1]) == \
        [(False, D(2022, 1, 1)), (True, None)]
    # changed: closed at effective + new current version
    k2 = sorted(by_key[2], key=lambda r: r.is_current)
    assert len(k2) == 2
    closed, opened = k2
    assert (closed.is_current, closed.valid_to, closed.tier) == \
        (False, D(2024, 1, 1), "silver")
    assert (opened.is_current, opened.valid_from, opened.valid_to,
            opened.tier) == (True, D(2024, 1, 1), None, "gold")
    # identical update (NULL == NULL): single untouched current row
    assert len(by_key[3]) == 1 and by_key[3][0].is_current
    assert by_key[3][0].valid_from == D(2021, 6, 1)
    # no update: untouched
    assert len(by_key[4]) == 1 and by_key[4][0].is_current
    # insert
    assert len(by_key[5]) == 1
    assert (by_key[5][0].valid_from, by_key[5][0].is_current) == \
        (D(2024, 1, 1), True)


def test_scd2_conflict_flag(spark):
    dim = _dim(spark)
    upd = spark.createDataFrame(
        [(2, "bob", "gold", D(2020, 6, 1))], UPD_SCHEMA)  # before valid_from
    out = scd2_apply(dim, upd, ["k"], ["name", "tier"]).collect()
    flagged = [r for r in out if r.scd_conflict]
    assert len(flagged) == 2                   # both the close and the open
    assert {r.is_current for r in flagged} == {False, True}


def test_scd2_as_of(spark):
    dim = _dim(spark)
    snap_2021 = {(r.k, r.tier)
                 for r in scd2_as_of(dim, D(2021, 7, 1)).collect()}
    assert snap_2021 == {(1, "gold"), (2, "silver"), (3, None), (4, "gold")}
    snap_2023 = {(r.k, r.tier)
                 for r in scd2_as_of(dim, D(2023, 1, 1)).collect()}
    assert snap_2023 == {(1, "plat"), (2, "silver"), (3, None), (4, "gold")}
    # boundary: valid_from inclusive, valid_to exclusive
    at_switch = {(r.k, r.tier)
                 for r in scd2_as_of(dim, D(2022, 1, 1)).collect()
                 if r.k == 1}
    assert at_switch == {(1, "plat")}


def test_scd2_idempotent_on_identical_batch(spark):
    """Applying the same update batch twice changes nothing the second
    time: every update now matches the current attrs."""
    once = scd2_apply(_dim(spark), _updates(spark), ["k"],
                      ["name", "tier"])
    twice = scd2_apply(once, _updates(spark), ["k"], ["name", "tier"])
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b


def test_scd2_null_key_and_null_current_flag(spark):
    """NULL business keys match their updates (null-safe join) and a
    NULL is_current flag reads as history, not silent row loss."""
    dim = spark.createDataFrame(
        [(None, "ghost", "gold", D(2020, 1, 1), None, True),
         (9, "flagless", "tin", D(2020, 1, 1), None, None)],
        DIM_SCHEMA)
    upd = spark.createDataFrame(
        [(None, "ghost", "plat", D(2024, 1, 1))], UPD_SCHEMA)
    out = scd2_apply(dim, upd, ["k"], ["name", "tier"]).collect()
    nul = sorted([r for r in out if r.k is None],
                 key=lambda r: bool(r.is_current))
    assert len(nul) == 2                       # closed + reopened once
    assert (nul[0].is_current, nul[0].valid_to) == (False, D(2024, 1, 1))
    assert (nul[1].is_current, nul[1].tier) == (True, "plat")
    flagless = [r for r in out if r.k == 9]
    assert len(flagless) == 1                  # passes through as history
    with pytest.raises(ValueError, match="key_cols"):
        scd2_apply(dim, upd, [], ["name"])
    with pytest.raises(ValueError, match="attr_cols"):
        scd2_apply(dim, upd, ["k"], [])
