"""Structured-Streaming wrapper tests: availableNow over the date-folder
convention reproduces batch semantics."""

import datetime
import os

import pandas as pd
import pytest

from flood_data_spark.streaming.file_stream import (
    daily_windowed_aggregate,
    read_forecast_stream,
    run_available_now,
)


def _write_day(dirpath, day_offset, cells=2, members=3):
    os.makedirs(dirpath, exist_ok=True)
    t0 = int((datetime.datetime(2024, 1, 1)
              + datetime.timedelta(days=day_offset)).timestamp() * 1e9)
    rows = []
    for c in range(cells):
        for m in range(members):
            rows.append((m, 0.025 + 0.05 * c, 0.025, t0,
                         86400 * 10**9, t0 + 86400 * 10**9,
                         float(100 + 10 * m + c)))
    pd.DataFrame(rows, columns=["number", "latitude", "longitude", "time",
                                "step", "valid_time", "dis24"]) \
        .astype({"dis24": "float32"}) \
        .to_parquet(os.path.join(dirpath, f"filtered-{day_offset}.parquet"),
                    index=False)


def test_available_now_matches_batch(spark, tmp_path):
    data_dir = str(tmp_path / "in")
    _write_day(data_dir, 0)
    _write_day(data_dir, 1)

    stream = read_forecast_stream(spark, data_dir)
    assert stream.isStreaming
    agg = daily_windowed_aggregate(stream)
    q = run_available_now(agg, str(tmp_path / "ckpt"),
                          query_name="t_flood_daily")
    q.awaitTermination(60)

    out = spark.sql("SELECT * FROM t_flood_daily")
    rows = {(r.issued_on, r.latitude): r for r in out.collect()}
    # 2 days x 2 cells
    assert len(rows) == 4
    r = rows[(datetime.date(2024, 1, 1), 0.025)]
    assert r.n_members == 3
    assert r.mean_dis == pytest.approx(110.0)
    assert r.min_dis == 100.0 and r.max_dis == 120.0


def test_incremental_catchup_append_mode(spark, tmp_path):
    """Successive availableNow runs over one checkpoint process only new
    files, and append mode emits exactly the windows the watermark has
    closed: a day-D window [D, D+1) finalizes only once an event beyond
    D+1 + delay has been seen."""
    data_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = read_forecast_stream(spark, data_dir)
        q = run_available_now(
            daily_windowed_aggregate(stream, watermark_delay="1 second"),
            ckpt, output_path=out_dir)
        q.awaitTermination(60)

    # days 0..2 present: watermark lands just below day 2, so only the
    # day-0 window (ends day 1) is closed → 1 day x 2 cells
    for d in range(3):
        _write_day(data_dir, d)
    run_once()
    first = spark.read.parquet(out_dir)
    assert first.count() == 2
    assert {r.issued_on for r in first.collect()} == {
        datetime.date(2024, 1, 1)}

    # day 3 arrives: watermark passes day 2 → day-1 window finalizes too;
    # day-0 output is NOT re-emitted (exactly-once increments)
    _write_day(data_dir, 3)
    run_once()
    total = spark.read.parquet(out_dir)
    assert total.count() == 4
    assert total.select("issued_on").distinct().count() == 2


def test_streaming_threshold_summary_matches_batch(spark, tmp_path):
    """Stream-static broadcast join + windowed exceedance agg produces the
    same probabilities as the batch operator on the same files."""
    from pyspark.sql import functions as F

    from flood_data_spark.operators.threshold import ensemble_threshold_summary
    from flood_data_spark.sources.parquet import read_forecast
    from flood_data_spark.streaming.file_stream import (
        read_forecast_stream,
        run_available_now,
        streaming_threshold_summary,
    )

    data_dir = str(tmp_path / "in")
    _write_day(data_dir, 0, cells=3, members=4)

    # only 2 of 3 cells have threshold rows: the unmatched cell must score
    # 0.0 (not NULL) in BOTH engines — the when/otherwise(0) parity case
    thresholds = spark.createDataFrame(
        [(round(0.025 + 0.05 * c, 3), 0.025, 105.0, 115.0, 130.0)
         for c in range(2)],
        "latitude double, longitude double, threshold_2y double,"
        " threshold_5y double, threshold_20y double")

    stream = read_forecast_stream(spark, data_dir)
    agg = streaming_threshold_summary(stream, thresholds)
    q = run_available_now(agg, str(tmp_path / "ck"),
                          query_name="t_stream_thresh")
    q.awaitTermination(60)
    got = {(r.latitude, r.step): r
           for r in spark.sql("SELECT * FROM t_stream_thresh").collect()}

    batch = ensemble_threshold_summary(
        read_forecast(spark, data_dir + "/*.parquet"), thresholds,
        accuracy_mode="exact")
    want = {(r.latitude, r.step): r for r in batch.collect()}

    assert set(got) == set(want) and len(got) == 3
    for key, g in got.items():
        w = want[key]
        for col in ("p_above_2y", "p_above_5y", "p_above_20y",
                    "min_dis", "max_dis"):
            assert abs(getattr(g, col) - getattr(w, col)) < 1e-9, (key, col)
        assert g.n_members == 4
        assert g.issued_on == w.issued_on


def test_dedup_stream_drops_redelivered_rows(spark, tmp_path):
    """Re-delivered rows (same cell/member/step re-uploaded in a later
    file) are dropped while the key is within the watermark; state stays
    bounded by the delay."""
    from flood_data_spark.streaming.file_stream import dedup_stream

    data_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = read_forecast_stream(spark, data_dir)
        deduped = dedup_stream(
            stream, ["latitude", "longitude", "number", "step", "issued_on"])
        q = (deduped.drop("issued_ts").writeStream
             .format("parquet").option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(60)

    _write_day(data_dir, 0, cells=2, members=3)
    run_once()
    assert spark.read.parquet(out_dir).count() == 6

    # identical content re-delivered under a new file name → all dupes
    import shutil
    shutil.copy(os.path.join(data_dir, "filtered-0.parquet"),
                os.path.join(data_dir, "filtered-0-redelivery.parquet"))
    _write_day(data_dir, 1, cells=2, members=3)
    run_once()
    out = spark.read.parquet(out_dir)
    # 6 original + 6 new day-1 rows; the 6 re-delivered day-0 rows dropped
    assert out.count() == 12
    assert out.groupBy("latitude", "longitude", "number", "step",
                       "issued_on").count().filter("count > 1").count() == 0


def test_datapipe_cleaning_composes_with_streams(spark, tmp_path):
    """The stateless curation operators (clean_lines, quality/token
    signals, split assignment) are pure Column expressions, so the SAME
    functions apply unchanged to a readStream relation — stream output
    must equal the batch run over the same files."""
    import pandas as pd
    from flood_data_spark.datapipe.curation import assign_split, clean_lines
    from flood_data_spark.datapipe.text import with_token_count

    data_dir = str(tmp_path / "docs")
    os.makedirs(data_dir, exist_ok=True)
    rows = [(i, "good long line number one.\nshort\n"
                f"unique content for doc {i} here.") for i in range(20)]
    pd.DataFrame(rows, columns=["doc_id", "text"]) \
        .to_parquet(os.path.join(data_dir, "batch-0.parquet"), index=False)

    def pipeline(df):
        cleaned = clean_lines(df, min_words=4)
        toks = with_token_count(cleaned, text_col="clean_text")
        return (assign_split(toks, {"train": 0.8, "val": 0.2})
                .select("doc_id", "n_lines_kept", "n_tokens", "split"))

    schema = "doc_id long, text string"
    stream = spark.readStream.schema(schema).parquet(data_dir)
    assert stream.isStreaming
    q = (pipeline(stream).writeStream
         .format("memory").queryName("t_clean_stream")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(60)

    got = {r.doc_id: (r.n_lines_kept, r.n_tokens, r.split)
           for r in spark.sql("SELECT * FROM t_clean_stream").collect()}
    want = {r.doc_id: (r.n_lines_kept, r.n_tokens, r.split)
            for r in pipeline(spark.read.schema(schema).parquet(data_dir))
            .collect()}
    assert got == want and len(got) == 20


def test_exceedance_summary_stream_batch_parity(spark, tmp_path):
    """The generic (schema-agnostic) streaming exceedance operator produces
    byte-identical results to the batch ensemble_threshold_summary on the
    same input (minus the quantile block, which has no mergeable streaming
    state)."""
    import numpy as np
    from flood_data_spark.operators.threshold import ensemble_threshold_summary
    from flood_data_spark.streaming.file_stream import exceedance_summary_stream

    rng = np.random.default_rng(3)
    src = str(tmp_path / "src")
    os.makedirs(src)
    pd.DataFrame({
        "partkey": np.repeat(np.arange(50), 20),
        "dis24": rng.uniform(50, 150, 1000),
    }).to_parquet(os.path.join(src, "batch-0.parquet"), index=False)

    thresholds = spark.createDataFrame(
        [(int(k), 80.0, 100.0, 120.0) for k in range(40)],  # 10 keys missing
        "partkey int, threshold_2y double, threshold_5y double, threshold_20y double")

    batch_df = spark.read.parquet(src)
    batch = ensemble_threshold_summary(
        batch_df, thresholds, accuracy_mode="exact",
        join_keys=("partkey",), group_keys=("partkey",)) \
        .drop("Q1_dis", "median_dis", "Q3_dis")

    stream = (spark.readStream.schema(batch_df.schema).parquet(src))
    agg = exceedance_summary_stream(stream, thresholds,
                                    join_keys=("partkey",),
                                    group_keys=("partkey",))
    q = run_available_now(agg, str(tmp_path / "ckpt2"),
                          query_name="t_exceed_parity")
    q.awaitTermination(60)
    got = spark.sql("SELECT * FROM t_exceed_parity")

    b = {r.partkey: r for r in batch.collect()}
    s = {r.partkey: r for r in got.collect()}
    assert set(b) == set(s)
    for k in b:
        assert abs(b[k].p_above_2y - s[k].p_above_2y) < 1e-12
        assert abs(b[k].p_above_20y - s[k].p_above_20y) < 1e-12
        assert b[k].min_dis == s[k].min_dis and b[k].max_dis == s[k].max_dis
    # missing-threshold keys (40..49) score 0.0, never NULL
    assert all(s[k].p_above_2y == 0.0 for k in range(40, 50))


def test_session_stream_batch_parity(spark, tmp_path):
    """availableNow session_stream == the batch session_window plan on the
    same files — streaming sessionization parity."""
    import os

    import pandas as pd
    from flood_data_spark.streaming.file_stream import (
        run_available_now, session_stream)
    from pyspark.sql import functions as F

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "events")
    os.makedirs(src)
    base = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2, 2],
        "ts": [base, base + pd.Timedelta(minutes=10),
               base + pd.Timedelta(hours=3),
               base + pd.Timedelta(hours=3, minutes=20),
               base, base + pd.Timedelta(hours=5)],
    })
    # µs timestamps: pandas' default ns parquet would surface as BIGINT
    # under the session's nanosAsLong conf
    table = pa.Table.from_pandas(pdf, preserve_index=False).cast(
        pa.schema([("user_id", pa.int64()), ("ts", pa.timestamp("us"))]))
    pq.write_table(table, os.path.join(src, "b0.parquet"))

    batch_df = spark.read.parquet(src)
    if dict(batch_df.dtypes)["ts"] == "timestamp_ntz":
        batch_df = batch_df.withColumn("ts", F.col("ts").cast("timestamp"))
    batch = (batch_df
             .groupBy("user_id", F.session_window("ts", "1 hour").alias("w"))
             .agg(F.count("*").alias("n_events"))
             .select("user_id", F.col("w.start").alias("session_start"),
                     F.col("w.end").alias("session_end"), "n_events"))

    stream = (spark.readStream.schema(batch_df.schema).parquet(src))
    if dict(stream.dtypes)["ts"] == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    q = run_available_now(session_stream(stream, gap="1 hour"),
                          str(tmp_path / "ckpt_sess"),
                          query_name="t_sessions")
    q.awaitTermination(60)
    got = spark.sql("SELECT * FROM t_sessions")

    from conftest import rows_set
    b = rows_set(batch)
    s = rows_set(got)
    assert b == s and len(b) == 4  # u1: 2 sessions, u2: 2 sessions


def test_heavy_hitters_stream_batch_parity(spark, tmp_path):
    """availableNow heavy_hitters_stream (complete mode, no watermark —
    vocabulary-bounded state) == the batch GROUP BY + HAVING on the same
    files, including counts ACROSS file boundaries (the stream must merge
    per-batch state, not emit per-file counts)."""
    import os

    import pandas as pd
    from flood_data_spark.streaming.file_stream import (
        heavy_hitters_stream, run_available_now)

    src = str(tmp_path / "docs")
    os.makedirs(src)
    pd.DataFrame({"doc_id": [0, 1], "text": ["a a b c", "a b b d"]}) \
        .to_parquet(os.path.join(src, "f0.parquet"))
    pd.DataFrame({"doc_id": [2], "text": ["a c c e"]}) \
        .to_parquet(os.path.join(src, "f1.parquet"))

    batch_df = spark.read.parquet(src)
    stream = spark.readStream.schema(batch_df.schema).parquet(src)
    agg = heavy_hitters_stream(stream, min_count=3)
    q = run_available_now(agg, str(tmp_path / "ckpt"),
                          query_name="hh_stream_test",
                          output_mode="complete")
    q.awaitTermination()
    got = {(r.term, r.n) for r in spark.table("hh_stream_test").collect()}
    # a: 2+1+1=4, b: 1+2=3, c: 1+2=3; d/e below threshold
    assert got == {("a", 4), ("b", 3), ("c", 3)}


def test_full_summary_stream_batch_parity_with_quantiles(spark, tmp_path):
    """The streamed FULL summary (approx quantile block included) matches
    the batch approx-mode ensemble_threshold_summary exactly on
    sketch-exact-size input (n per group << sketch accuracy, so both
    sketches resolve to true order statistics)."""
    import numpy as np
    from flood_data_spark.operators.threshold import ensemble_threshold_summary
    from flood_data_spark.streaming.file_stream import (
        full_summary_stream, run_available_now)

    rng = np.random.default_rng(11)
    src = str(tmp_path / "src_full")
    os.makedirs(src)
    pd.DataFrame({
        "partkey": np.repeat(np.arange(30), 25),
        "dis24": rng.uniform(50, 150, 750),
    }).to_parquet(os.path.join(src, "batch-0.parquet"), index=False)

    thresholds = spark.createDataFrame(
        [(int(k), 80.0, 100.0, 120.0) for k in range(25)],
        "partkey int, threshold_2y double, threshold_5y double,"
        " threshold_20y double")

    batch_df = spark.read.parquet(src)
    batch = ensemble_threshold_summary(
        batch_df, thresholds, accuracy_mode="approx",
        join_keys=("partkey",), group_keys=("partkey",))

    stream = spark.readStream.schema(batch_df.schema).parquet(src)
    agg = full_summary_stream(stream, thresholds,
                              join_keys=("partkey",),
                              group_keys=("partkey",))
    q = run_available_now(agg, str(tmp_path / "ckpt_full"),
                          query_name="t_full_parity")
    q.awaitTermination(60)
    s = {r.partkey: r for r in
         spark.sql("SELECT * FROM t_full_parity").collect()}
    b = {r.partkey: r for r in batch.collect()}
    assert set(b) == set(s)
    for k in b:
        # (batch summary carries no n_members; the stream twin adds it)
        for col in ("Q1_dis", "median_dis", "Q3_dis",
                    "min_dis", "max_dis"):
            assert getattr(b[k], col) == getattr(s[k], col), (k, col)
        assert s[k].n_members == 25
        assert abs(b[k].p_above_5y - s[k].p_above_5y) < 1e-12
        # ordering invariant of the quantile block
        assert (s[k].min_dis <= s[k].Q1_dis <= s[k].median_dis
                <= s[k].Q3_dis <= s[k].max_dis)


def test_cms_stream_batch_parity(spark, tmp_path):
    """availableNow cms_stream (complete mode — the state IS the sketch,
    hard-bounded at depth*width cells) == batch cms_build over the same
    files, cell for cell, including merges across file boundaries."""
    import os

    import pandas as pd
    from pyspark.sql import functions as F
    from flood_data_spark.datapipe.sketches import cms_build
    from flood_data_spark.streaming.file_stream import (
        cms_stream, run_available_now)

    src = str(tmp_path / "docs")
    os.makedirs(src)
    pd.DataFrame({"doc_id": [0, 1], "text": ["a a b c", "a b b d"]}) \
        .to_parquet(os.path.join(src, "f0.parquet"))
    pd.DataFrame({"doc_id": [2], "text": ["a c c e"]}) \
        .to_parquet(os.path.join(src, "f1.parquet"))

    batch_df = spark.read.parquet(src)
    stream = spark.readStream.schema(batch_df.schema).parquet(src)
    agg = cms_stream(stream, width=32, depth=2)
    q = run_available_now(agg, str(tmp_path / "ckpt_cms"),
                          query_name="cms_stream_test",
                          output_mode="complete")
    q.awaitTermination()
    got = {(r.row, r.col): r.cnt
           for r in spark.table("cms_stream_test").collect()}
    toks = (batch_df.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token"))
        .filter(F.col("token") != ""))
    want = {(r.row, r.col): r.cnt
            for r in cms_build(toks, width=32, depth=2).collect()}
    assert got == want
    assert len(got) <= 32 * 2


def test_interval_join_stream_matches_batch(spark, tmp_path):
    """Stream-stream interval join emits exactly the batch interval
    join: planted click/purchase pairs inside and outside the window,
    cross-user decoys, and boundary hits (>= inclusive, < exclusive)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from flood_data_spark.streaming.file_stream import (
        interval_join_stream, run_available_now)

    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)
    S = lambda sec: t0 + datetime.timedelta(seconds=sec)
    rows = [
        (1, 1, "click", S(0)),
        (2, 1, "purchase", S(10)),      # in window
        (3, 1, "purchase", S(1800)),    # AT delay -> excluded (half-open)
        (4, 1, "purchase", S(-5)),      # before click -> excluded
        (5, 2, "click", S(100)),
        (6, 2, "purchase", S(100)),     # boundary: r_ts == l_ts included
        (7, 3, "purchase", S(50)),      # no click for user 3
        (8, 2, "click", S(90)),         # second click also pairs with 6
    ]
    data_dir = str(tmp_path / "ev")
    os.makedirs(data_dir)
    pd.DataFrame(rows, columns=["event_id", "user_id", "event_type",
                                "ts"]) \
        .astype({"ts": "datetime64[us]"}) \
        .to_parquet(os.path.join(data_dir, "events.parquet"), index=False)

    schema = spark.read.parquet(data_dir).schema

    def sides(df):
        clicks = (df.filter(F.col("event_type") == "click")
                  .select("user_id",
                          F.col("ts").cast("timestamp").alias("l_ts"),
                          F.col("event_id").alias("click_id")))
        buys = (df.filter(F.col("event_type") == "purchase")
                .select(F.col("user_id").alias("user_id_r"),
                        F.col("ts").cast("timestamp").alias("r_ts"),
                        F.col("event_id").alias("purchase_id")))
        return clicks, buys

    stream = spark.readStream.schema(schema).parquet(data_dir)
    joined = interval_join_stream(*sides(stream),
                                  max_delay_seconds=1800)
    q = run_available_now(joined, str(tmp_path / "ckpt"),
                          query_name="t_ij_stream",
                          output_mode="append")
    q.awaitTermination(120)
    got = {(r.click_id, r.purchase_id)
           for r in spark.sql("SELECT * FROM t_ij_stream").collect()}
    assert got == {(1, 2), (5, 6), (8, 6)}


def test_brier_stream_batch_parity(spark, tmp_path):
    """availableNow brier_cell_stream (complete mode — state <= n_bins
    DECIMAL cells) + the shared brier_from_cells finisher == batch
    brier_decomposition over the same files, all four scores exactly
    (integer-space rounding on both paths)."""
    import os

    import pandas as pd
    from flood_data_spark.operators.verification import (
        brier_decomposition, brier_from_cells)
    from flood_data_spark.streaming.file_stream import (
        brier_cell_stream, run_available_now)

    rng = __import__("numpy").random.default_rng(8)
    src = str(tmp_path / "preds")
    os.makedirs(src)
    for i in range(2):
        ps = rng.random(size=120)
        os_ = (rng.random(size=120) < ps).astype(int)
        pd.DataFrame({"p": ps, "o": os_}) \
            .to_parquet(os.path.join(src, f"f{i}.parquet"))

    batch_df = spark.read.parquet(src)
    stream = spark.readStream.schema(batch_df.schema).parquet(src)
    agg = brier_cell_stream(stream, "p", "o", n_bins=10)
    q = run_available_now(agg, str(tmp_path / "ckpt_brier"),
                          query_name="brier_stream_test",
                          output_mode="complete")
    q.awaitTermination()
    streamed = brier_from_cells(spark.table("brier_stream_test")) \
        .collect()[0]
    batch = brier_decomposition(batch_df, "p", "o", n_bins=10) \
        .collect()[0]
    assert tuple(streamed) == tuple(batch)
