"""Stateful-streaming tests: the per-cell alert tracker emits only on level
transitions and carries state across successive availableNow runs through
the checkpoint."""

import os

import pandas as pd

from flood_data_spark.streaming.stateful import track_alert_levels


def _write_batch(dirpath, seq, rows):
    os.makedirs(dirpath, exist_ok=True)
    pd.DataFrame(rows, columns=["latitude", "longitude", "p_above_2y"]) \
        .to_parquet(os.path.join(dirpath, f"batch-{seq}.parquet"), index=False)


def _run_once(spark, data_dir, out_dir, ckpt):
    stream = (spark.readStream
              .schema("latitude double, longitude double, p_above_2y double")
              .parquet(data_dir))
    q = (track_alert_levels(stream).writeStream
         .format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)


def test_alert_transitions_across_batches(spark, tmp_path):
    data = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: cell A crosses into yellow, cell B stays gray
    _write_batch(data, 0, [(0.025, 0.025, 0.35), (0.075, 0.025, 0.10)])
    _run_once(spark, data, out, ckpt)
    first = spark.read.parquet(out).collect()
    assert len(first) == 1
    r = first[0]
    assert (r.latitude, r.prev_level, r.level) == (0.025, "G", "Y")

    # batch 2: cell A escalates to red, cell B unchanged → exactly one new
    # emission, proving state survived the restart via the checkpoint
    _write_batch(data, 1, [(0.025, 0.025, 0.70), (0.075, 0.025, 0.12)])
    _run_once(spark, data, out, ckpt)
    rows = {(r.latitude, r.prev_level, r.level): r
            for r in spark.read.parquet(out).collect()}
    assert len(rows) == 2
    assert (0.025, "Y", "R") in rows
    assert rows[(0.025, "Y", "R")].max_p_above_2y == 0.70

    # batch 3: lower values — running max is monotone, no de-escalation,
    # no emission
    _write_batch(data, 2, [(0.025, 0.025, 0.05)])
    _run_once(spark, data, out, ckpt)
    assert spark.read.parquet(out).count() == 2
