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
    DoubleType, StringType, StructField, StructType,
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
