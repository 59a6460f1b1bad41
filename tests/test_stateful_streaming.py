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


def test_ewma_stream_state_carries_across_micro_batches(spark, tmp_path):
    """Two files → two availableNow... actually one availableNow run
    processes both files; the cross-batch claim is exercised by TWO
    sequential stream runs over a SHARED checkpoint: the second run's
    folds must continue from the first run's persisted state, matching
    one global sequential recursion over the concatenated log."""
    import os

    import pandas as pd
    from flood_data_spark.streaming.stateful import ewma_stream

    src = str(tmp_path / "ev")
    os.makedirs(src)
    t0 = pd.Timestamp("2024-01-01")

    def _write(name, rows):
        pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"]) \
            .to_parquet(os.path.join(src, name))

    _write("f0.parquet", [(0, 1, t0, 10.0), (1, 1, t0 + pd.Timedelta("1s"),
                                             20.0)])
    schema = spark.read.parquet(src).schema
    ckpt = str(tmp_path / "ck")

    out_dir = str(tmp_path / "out")

    def _run(qname):
        from pyspark.sql import functions as F
        stream = spark.readStream.schema(schema).parquet(src)
        # pandas wrote ns-precision parquet; the session surfaces it as
        # ns-epoch longs — normalize like the batch loaders do
        if dict(stream.dtypes).get("ts") == "bigint":
            stream = stream.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")))
        # durable sink: a memory sink cannot RECOVER from a checkpoint,
        # and cross-run state continuation is exactly what's under test
        q = (ewma_stream(stream, alpha=0.5)
             .writeStream.format("parquet")
             .option("path", out_dir)
             .outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return {r.event_id: r.ewma
                for r in spark.read.parquet(out_dir).collect()}

    first = _run("ewma_s1")
    assert first == {0: 10.0, 1: 15.0}
    # second batch arrives later; recursion must continue from y=15
    _write("f1.parquet", [(2, 1, t0 + pd.Timedelta("2s"), 30.0),
                          (3, 2, t0 + pd.Timedelta("2s"), 7.0)])
    second = _run("ewma_s2")
    # sink accumulates; the NEW rows prove continuation: 22.5 is
    # 0.5*30 + 0.5*15 — seeded from run 1's persisted state, and the
    # unseen key 2 seeds fresh from its first value
    assert second == {0: 10.0, 1: 15.0, 2: 22.5, 3: 7.0}


def test_cusum_alarm_stream_edges_and_rearm(spark, tmp_path):
    """Alarms fire on upward crossings only, stay silent while above
    threshold, and re-arm after dipping below — across TWO runs over a
    shared checkpoint (state carries S and the armed flag)."""
    import os

    import pandas as pd
    from pyspark.sql import functions as F
    from flood_data_spark.streaming.stateful import cusum_alarm_stream

    src = str(tmp_path / "ev")
    os.makedirs(src)
    t0 = pd.Timestamp("2024-01-01")

    def _write(name, rows):
        pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"]) \
            .to_parquet(os.path.join(src, name))

    # target+slack=10, threshold=15: S path 12 -> 24(alarm) -> 26
    # (silent: still above) -> 16 (silent) -> 6 (re-arm) in batch 1
    _write("f0.parquet", [
        (0, 1, t0, 22.0), (1, 1, t0 + pd.Timedelta("1s"), 22.0),
        (2, 1, t0 + pd.Timedelta("2s"), 12.0),
        (3, 1, t0 + pd.Timedelta("3s"), 0.0),
        (4, 1, t0 + pd.Timedelta("4s"), 0.0)])
    schema = spark.read.parquet(src).schema
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")

    def _run():
        stream = spark.readStream.schema(schema).parquet(src)
        if dict(stream.dtypes).get("ts") == "bigint":
            stream = stream.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")))
        q = (cusum_alarm_stream(stream, target=10.0, slack=0.0,
                                threshold=15.0)
             .writeStream.format("parquet").option("path", out)
             .outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return sorted((r.cusum for r in spark.read.parquet(out).collect()))

    assert _run() == [24.0]
    # batch 2 continues from S=6, armed=0: 6+14-10=10 (silent),
    # 10+16-10=16 (second alarm — re-armed)
    _write("f1.parquet", [
        (5, 1, t0 + pd.Timedelta("5s"), 14.0),
        (6, 1, t0 + pd.Timedelta("6s"), 16.0)])
    assert _run() == [16.0, 24.0]
