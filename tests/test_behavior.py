"""Funnel and cohort-retention operators (operators/behavior.py):
hand-computed truths on small event logs."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from flood_data_spark.operators.behavior import cohort_retention, funnel


def _ts(day, sec=0):
    return dt.datetime(2024, 1, day) + dt.timedelta(seconds=sec)


@pytest.fixture()
def log(spark):
    rows = [
        # user 1 completes view -> click -> purchase in order
        (1, _ts(1, 0), "view"), (1, _ts(1, 10), "click"),
        (1, _ts(1, 20), "purchase"),
        # user 2 clicks BEFORE viewing: click must not count
        (2, _ts(1, 0), "click"), (2, _ts(1, 10), "view"),
        # user 3 views only
        (3, _ts(1, 0), "view"),
        # user 4 never views
        (4, _ts(1, 0), "purchase"),
        # user 5: completes but the second transition is slow
        (5, _ts(1, 0), "view"), (5, _ts(1, 5), "click"),
        (5, _ts(2, 0), "purchase"),
    ]
    return spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_type string")


def test_funnel_ordered_semantics(spark, log):
    got = {r.user_id: (r.depth, r.step_1_ts, r.step_2_ts, r.step_3_ts)
           for r in funnel(log, ["view", "click", "purchase"]).collect()}
    assert got[1] == (3, _ts(1, 0), _ts(1, 10), _ts(1, 20))
    assert got[2][0] == 1 and got[2][2] is None   # pre-view click ignored
    assert got[3][0] == 1
    assert 4 not in got                           # never entered the funnel
    assert got[5][0] == 3


def test_funnel_transition_window(spark, log):
    got = {r.user_id: r.depth
           for r in funnel(log, ["view", "click", "purchase"],
                           within_seconds=3600).collect()}
    # user 5's click->purchase transition takes ~1 day: depth stops at 2
    assert got[5] == 2
    assert got[1] == 3
    with pytest.raises(ValueError, match="within_seconds"):
        funnel(log, ["view"], within_seconds=0)
    with pytest.raises(ValueError, match="step"):
        funnel(log, [])


def test_funnel_greedy_earliest_admits_later_matches(spark):
    # first A at t0; B exists only BEFORE the second A but AFTER t0
    rows = [(1, _ts(1, 0), "A"), (1, _ts(1, 5), "B"), (1, _ts(1, 9), "A")]
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_type string")
    r = funnel(df, ["A", "B"]).collect()[0]
    assert (r.depth, r.step_2_ts) == (2, _ts(1, 5))


def test_cohort_retention_weekly(spark):
    # cohort W0: users 1,2 (first seen Jan 1 week); user 1 returns next
    # week, user 2 does not; cohort W1: user 3
    rows = [(1, _ts(1)), (2, _ts(2)), (1, _ts(10)),
            (3, _ts(8)), (3, _ts(9))]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    got = {(r.cohort.date().isoformat(), r.offset):
           (r.n_active, r.retention)
           for r in cohort_retention(df, period="week").collect()}
    assert got[("2024-01-01", 0)] == (2, 1.0)
    assert got[("2024-01-01", 1)] == (1, 0.5)
    assert got[("2024-01-08", 0)] == (1, 1.0)
    assert ("2024-01-08", 1) not in got
    with pytest.raises(ValueError, match="period"):
        cohort_retention(df, period="fortnight")


def test_funnel_plan_is_user_keyed_joins(spark, log):
    plan = funnel(log, ["view", "click", "purchase"])._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_transition_matrix_session_bounded(spark):
    from flood_data_spark.operators.behavior import transition_matrix

    rows = [
        # session 1 of user 1: A -> B -> A
        (1, _ts(1, 0), "A"), (1, _ts(1, 10), "B"), (1, _ts(1, 20), "A"),
        # a 2-day gap: new session, so A -/-> C across the boundary
        (1, _ts(3, 0), "C"),
        # user 2: A -> B
        (2, _ts(1, 0), "A"), (2, _ts(1, 5), "B"),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_type string")
    got = {(r.event_type, r.next_event_type): (r.n, r.p)
           for r in transition_matrix(df, gap_seconds=3600).collect()}
    assert got[("A", "B")] == (2, 1.0)     # both A->B; never A->C
    # user 2's B is session-final (no pair), so B's only transition is
    # user 1's B->A: count 1, row-probability 1.0
    assert got[("B", "A")] == (1, 1.0)
    assert ("A", "C") not in got           # session boundary respected
    assert set(got) == {("A", "B"), ("B", "A")}


def test_windowed_funnel_reanchors_on_later_entries(spark):
    from flood_data_spark.operators.behavior import funnel

    # greedy-earliest would anchor on view@0 and miss the conversion;
    # re-anchoring chains off view@100
    rows = [(1, _ts(1, 0), "view"), (1, _ts(1, 100), "view"),
            (1, _ts(1, 105), "click")]
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_type string")
    r = funnel(df, ["view", "click"], within_seconds=10).collect()[0]
    assert (r.depth, r.step_1_ts, r.step_2_ts) == (2, _ts(1, 0),
                                                   _ts(1, 105))


def test_windowed_funnel_strict_and_bounded(spark):
    from flood_data_spark.operators.behavior import funnel

    rows = [
        (1, _ts(1, 0), "A"), (1, _ts(1, 0), "B"),    # same instant: no chain
        (2, _ts(1, 0), "A"), (2, _ts(1, 10), "B"),   # exactly at the bound
        (3, _ts(1, 0), "A"), (3, _ts(1, 11), "B"),   # just past the bound
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_type string")
    got = {r.user_id: r.depth
           for r in funnel(df, ["A", "B"], within_seconds=10).collect()}
    assert got == {1: 1, 2: 2, 3: 1}


def test_attribution_models_hand_golden(spark):
    """One user, two journeys: [view, click] -> purchase,
    [view] -> purchase, plus an orphan trailing click (no later
    conversion -> no credit)."""
    from flood_data_spark.operators.behavior import attribution_credit

    rows = [(1, 10, 1, "view"), (2, 20, 1, "click"),
            (3, 30, 1, "purchase"),
            (4, 40, 1, "view"), (5, 50, 1, "purchase"),
            (6, 60, 1, "click")]
    df = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string")
    last = {r.channel: r for r in
            attribution_credit(df, model="last_touch").collect()}
    # journey 1 last touch = click; journey 2 last = view; orphan
    # click excluded entirely
    assert last["click"].n_touches == 1          # orphan dropped
    assert last["click"].n_credited == 1 and last["click"].credit == 1.0
    assert last["view"].n_touches == 2
    assert last["view"].n_credited == 1 and last["view"].credit == 1.0
    first = {r.channel: r for r in
             attribution_credit(df, model="first_touch").collect()}
    assert first["view"].credit == 2.0 and first["click"].credit == 0.0
    lin = {r.channel: r for r in
           attribution_credit(df, model="linear").collect()}
    assert lin["view"].credit == pytest.approx(1.5, abs=1e-6)
    assert lin["click"].credit == pytest.approx(0.5, abs=1e-6)
    import pytest as _pt
    with _pt.raises(ValueError, match="model"):
        attribution_credit(df, model="u_shaped")


def test_attribution_partition_invariant(spark):
    from flood_data_spark.operators.behavior import attribution_credit

    rows = [(i, i * 3 % 97, i % 7,
             ["view", "click", "purchase", "signup"][i % 4])
            for i in range(200)]
    df = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string")
    a = sorted(map(tuple, attribution_credit(
        df.coalesce(1), model="linear").collect()))
    b = sorted(map(tuple, attribution_credit(
        df.repartition(9), model="linear").collect()))
    assert a == b
