"""Custom stateful streaming operator: per-cell flood-alert tracking
(beyond-reference; the Spark-native answer to "what does the daily batch
look like when lead-time files arrive continuously?").

The batch pipeline recomputes every cell's summary from scratch each day.
With `applyInPandasWithState` the same signal becomes incremental: per grid
cell we keep the running maximum exceedance probability and current alert
level across micro-batches, and emit a row ONLY when the cell's alert level
escalates (gray→yellow→red).  The tracker is deliberately monotone — the
running max never decreases, so levels never clear; de-escalation belongs
to a windowed restatement (re-run the tracker per forecast issue date), not
to this state machine.  At 100 TB this
turns the daily 644k-cell full rewrite into a delta stream proportional to
the number of state changes.

State is a single (max_p2, level) pair per cell — bounded by the grid size,
not by history length — and survives restarts via the checkpoint.  The enum
ladder reuses the reference's intensity thresholds
(databricks/config.json:36-41 semantics).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
    TimestampType,
)

ALERT_OUTPUT_SCHEMA = StructType([
    StructField("latitude", DoubleType()),
    StructField("longitude", DoubleType()),
    StructField("max_p_above_2y", DoubleType()),
    StructField("prev_level", StringType()),
    StructField("level", StringType()),
])

ALERT_STATE_SCHEMA = StructType([
    StructField("max_p2", DoubleType()),
    StructField("level", StringType()),
])


def _level(p2: float, yellow: float = 0.3, red: float = 0.6) -> str:
    if p2 >= red:
        return "R"
    if p2 >= yellow:
        return "Y"
    return "G"


def track_alert_levels(exceedance_stream: DataFrame,
                       yellow: float = 0.3, red: float = 0.6) -> DataFrame:
    """Stateful escalation tracker over a stream of per-cell exceedance rows
    (latitude, longitude, p_above_2y).

    Emits (cell, max_p_above_2y, prev_level, level) whenever the running max
    crosses an alert boundary; silent otherwise.
    """

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        lat, lon = key
        if state.exists:
            max_p2, level = state.get
        else:
            max_p2, level = 0.0, "G"
        batch_max = max_p2
        for pdf in pdfs:
            if len(pdf):
                batch_max = max(batch_max, float(pdf["p_above_2y"].max()))
        new_level = _level(batch_max, yellow, red)
        state.update((batch_max, new_level))
        if new_level != level:
            yield pd.DataFrame([{
                "latitude": lat, "longitude": lon,
                "max_p_above_2y": batch_max,
                "prev_level": level, "level": new_level,
            }])

    return (exceedance_stream
            .groupBy("latitude", "longitude")
            .applyInPandasWithState(
                update,
                outputStructType=ALERT_OUTPUT_SCHEMA,
                stateStructType=ALERT_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


EWMA_OUTPUT_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("user_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("value", DoubleType()),
    StructField("ewma", DoubleType()),
])

EWMA_STATE_SCHEMA = StructType([
    StructField("ewma", DoubleType()),
])


def ewma_stream(events: DataFrame, alpha: float = 0.25) -> DataFrame:
    """FULL-history EWMA per user as a stateful stream — the recursion a
    distributed BATCH plan cannot express scalably (operators/
    timeseries.with_ewma truncates to a bounded window for exactly that
    reason; an unbounded batch collect_list holds O(history) per row).
    Streaming inverts the trade: state is ONE double per key however
    long the stream runs, each micro-batch folds only its own rows, and
    the recursion continues seamlessly across batches.

    Emits every input row with its running EWMA (append mode).  Arrival
    -order contract: rows must reach the operator in non-decreasing
    (ts, event_id) order per key ACROSS micro-batches (true for
    availableNow over a static log and for in-order replay); rows
    within a micro-batch are sorted here.  The fold is sequential
    float64 arithmetic — bit-identical to any engine running the same
    recursion in the same order, so q_ewma_stream carries a RAW value
    oracle (DuckDB list_reduce over the full per-key history).

    `ts` must already be a real TimestampType — normalize ns-epoch
    longs (the nanosAsLong legacy surface) BEFORE this operator, the
    same caller contract as `file_stream.session_stream`.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"ewma_stream: alpha must be in (0, 1], got "
                         f"{alpha}")
    ts_type = dict(events.dtypes).get("ts")
    if ts_type not in ("timestamp", "timestamp_ntz"):
        raise TypeError(
            f"ewma_stream: ts must be a timestamp column, got {ts_type} "
            "— normalize ns-epoch longs upstream "
            "(timestamp_micros(ts div 1000))")

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        have_state = state.exists
        y = state.get[0] if have_state else None
        batch = pd.concat(list(pdfs), ignore_index=True)
        if not len(batch):
            return
        batch = batch.sort_values(["ts", "event_id"],
                                  ignore_index=True)
        out = []
        for v in batch["value"].astype(float):
            y = v if y is None else alpha * v + (1.0 - alpha) * y
            out.append(y)
        state.update((float(y),))
        batch["ewma"] = out
        batch["user_id"] = user_id
        # ns-unit pandas timestamps (the parquet default) round-trip
        # through the µs-based TimestampType as year-55969 garbage —
        # down-convert explicitly
        batch["ts"] = batch["ts"].astype("datetime64[us]")
        yield batch[["event_id", "user_id", "ts", "value", "ewma"]]

    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                update,
                outputStructType=EWMA_OUTPUT_SCHEMA,
                stateStructType=EWMA_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


CUSUM_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("value", DoubleType()),
    StructField("cusum", DoubleType()),
])

CUSUM_STATE_SCHEMA = StructType([
    StructField("stat", DoubleType()),
    StructField("alarmed", DoubleType()),   # 0.0 / 1.0 (state is typed)
])


def cusum_alarm_stream(events: DataFrame, target: float, slack: float,
                       threshold: float) -> DataFrame:
    """FULL-history one-sided CUSUM with EDGE-triggered alarms as a
    stateful stream: per key, S = max(0, S + x - target - slack) runs
    over the complete history (the batch operator truncates — same
    argument as `ewma_stream`), and a row is emitted ONLY when S crosses
    `threshold` upward (the page-the-operator moment).  Re-arming
    happens when S falls back below the threshold — the statistic is
    NOT reset on alarm, so a sustained drift alarms once, not every
    event (document-matched by q_cusum_stream's oracle, which restates
    the crossing with a lag over the per-prefix folds).

    State: two doubles per key.  Arrival-order contract as
    `ewma_stream` (non-decreasing (ts, event_id) per key across
    micro-batches; rows sorted within each batch).
    """
    ts_type = dict(events.dtypes).get("ts")
    if ts_type not in ("timestamp", "timestamp_ntz"):
        raise TypeError(
            f"cusum_alarm_stream: ts must be a timestamp column, got "
            f"{ts_type} — normalize ns-epoch longs upstream "
            "(timestamp_micros(ts div 1000))")
    tgt, slk = float(target), float(slack)

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        s_val, alarmed = state.get if state.exists else (0.0, 0.0)
        batch = pd.concat(list(pdfs), ignore_index=True)
        if not len(batch):
            return
        batch = batch.sort_values(["ts", "event_id"], ignore_index=True)
        out_rows = []
        # float op ORDER matters for the raw oracle: the element pre-map
        # is (v - target) - slack, THEN s + dev — the same order as
        # with_cusum's array elements and the oracle's
        # list(value - 55.0 - 5.0); s + v - base diverges at the ULP
        for ts, v in zip(batch["ts"], batch["value"].astype(float)):
            s_val = max(0.0, s_val + (v - tgt - slk))
            if s_val >= threshold and alarmed == 0.0:
                alarmed = 1.0
                out_rows.append((user_id, ts, v, s_val))
            elif s_val < threshold:
                alarmed = 0.0
        state.update((float(s_val), float(alarmed)))
        if out_rows:
            pdf = pd.DataFrame(out_rows,
                               columns=["user_id", "ts", "value", "cusum"])
            pdf["ts"] = pdf["ts"].astype("datetime64[us]")
            yield pdf

    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                update,
                outputStructType=CUSUM_OUTPUT_SCHEMA,
                stateStructType=CUSUM_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
