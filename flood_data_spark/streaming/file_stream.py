"""Structured-Streaming wrapper over the daily-batch convention
(SURVEY.md §2.9).

The reference has no streaming: new data arrives as a dated folder of
parquet files and a daily job processes it
(databricks/glofas-forecast-computation.py:110-113).  That convention maps
1:1 onto a file-source Structured Stream:

- `readStream.schema(S).parquet(root)` watches the folder tree; each new
  file is an increment;
- every reference aggregation is keyed by (cell, issued_on), so late data
  handling is a watermark on `issued_on` with 1-day tumbling windows;
- `Trigger.AvailableNow` reproduces batch semantics exactly (process all
  pending input, then stop) — the daily job becomes "run the stream once",
  and the same code scales down to micro-batch latency if the cadence ever
  tightens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flood_data_spark.functions.keys import round_keys
from flood_data_spark.functions.temporal import normalize_forecast_times
from flood_data_spark.schemas import RAW_FORECAST_SCHEMA


def read_forecast_stream(spark: SparkSession, root_path: str,
                         precision: int | None = None,
                         max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream of raw forecast parquet with the same key/time
    normalization as the batch reader."""
    reader = (spark.readStream
              .schema(RAW_FORECAST_SCHEMA))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(root_path)
    return normalize_forecast_times(round_keys(df, precision))


def daily_windowed_aggregate(stream_df: DataFrame,
                             watermark_delay: str = "2 days") -> DataFrame:
    """Per (cell, 1-day window of issued_on): ensemble mean/min/max.

    Watermark bounds state: members arriving later than the delay are
    dropped, everything else lands in its day's window.  The full
    threshold-percentage aggregation composes the same way (exceedance
    indicators before the groupBy).
    """
    return (stream_df
            .withColumn("issued_ts", F.col("issued_on").cast("timestamp"))
            .withWatermark("issued_ts", watermark_delay)
            .groupBy(F.window("issued_ts", "1 day").alias("w"),
                     "latitude", "longitude", "step")
            .agg(F.avg("dis24").alias("mean_dis"),
                 F.min("dis24").alias("min_dis"),
                 F.max("dis24").alias("max_dis"),
                 F.count("*").alias("n_members"))
            .select(F.col("w.start").cast("date").alias("issued_on"),
                    "latitude", "longitude", "step",
                    "mean_dis", "min_dis", "max_dis", "n_members"))


def _exceedance_aggs(value_col: str, threshold_years) -> list:
    """The NULL-threshold-safe exceedance fraction aggregates + min/max/
    count — ONE definition shared by every streaming summary variant
    (when/otherwise(0) like the batch operator: a cell missing from the
    threshold table is NOT exceeded, not NULL — avg over a NULL
    comparison would skip rows and feed NaN state downstream)."""
    aggs = [
        F.avg(F.when(F.col(value_col) >= F.col(f"threshold_{int(y)}y"),
                     F.lit(1)).otherwise(F.lit(0)))
         .alias(f"p_above_{int(y)}y")
        for y in threshold_years
    ]
    aggs += [F.min(value_col).alias("min_dis"),
             F.max(value_col).alias("max_dis"),
             F.count(F.lit(1)).alias("n_members")]
    return aggs


def streaming_threshold_summary(stream_df: DataFrame,
                                threshold_df: DataFrame,
                                watermark_delay: str = "2 days",
                                threshold_years=(2, 5, 20)) -> DataFrame:
    """The flagship exceedance aggregation in streaming form: stream-static
    broadcast join against the (small, static) threshold table, exceedance
    indicators, then a watermarked 1-day-window groupBy.

    EXACT streaming quantiles aren't supported by Spark's windowed
    aggregation, so this variant carries the exceedance probabilities and
    min/max — the alerting signal; the full 5-number summary streams in
    approx mode via `full_summary_stream` (percentile_approx's sketch
    buffer is mergeable streaming state).
    """
    joined = stream_df.join(F.broadcast(threshold_df),
                            on=["latitude", "longitude"], how="left")
    aggs = _exceedance_aggs("dis24", threshold_years)
    return (joined
            .withColumn("issued_ts", F.col("issued_on").cast("timestamp"))
            .withWatermark("issued_ts", watermark_delay)
            .groupBy(F.window("issued_ts", "1 day").alias("w"),
                     "latitude", "longitude", "step")
            .agg(*aggs)
            .select(F.col("w.start").cast("date").alias("issued_on"),
                    "latitude", "longitude", "step",
                    *[f"p_above_{int(y)}y" for y in threshold_years],
                    "min_dis", "max_dis", "n_members"))


def exceedance_summary_stream(stream_df: DataFrame, threshold_df: DataFrame,
                              join_keys, group_keys,
                              threshold_years=(2, 5, 20),
                              value_col: str = "dis24") -> DataFrame:
    """Schema-agnostic streaming twin of
    `operators.threshold.ensemble_threshold_summary` minus the quantile
    block (EXACT percentile buffers aren't a mergeable streaming state —
    `full_summary_stream` carries Q1/median/Q3 via the mergeable
    percentile_approx sketch): stream × static broadcast join,
    NULL-threshold-safe exceedance fractions,
    min/max/count.  No watermark/window — callers running continuous
    pipelines add `withWatermark` + a time window on top; `availableNow` +
    complete-mode batch-parity runs (the driver-contract q_stream_threshold)
    use it as is."""
    joined = stream_df.join(F.broadcast(threshold_df),
                            on=list(join_keys), how="left")
    return joined.groupBy(*group_keys).agg(
        *_exceedance_aggs(value_col, threshold_years))


def full_summary_stream(stream_df: DataFrame, threshold_df: DataFrame,
                        join_keys, group_keys,
                        threshold_years=(2, 5, 20),
                        value_col: str = "dis24",
                        accuracy: int = 10000) -> DataFrame:
    """The COMPLETE streamed detailed-forecast summary — exceedance
    fractions, min/max/count AND the Q1/median/Q3 block — closing the
    stream/batch parity gap `exceedance_summary_stream` documents: exact
    percentiles need a sort and are not a mergeable streaming state, but
    `percentile_approx` IS — its buffer (a KLL-style quantile sketch)
    merges associatively, so Structured Streaming accepts it in a
    streaming groupBy exactly like sum/min/max.  This is the streamed twin
    of `operators.threshold.ensemble_threshold_summary(accuracy_mode=
    'approx')` — the same sketch the batch 100 TB path runs.

    One percentile buffer serves all three quantiles (the
    q_threshold_summary one-buffer trick).  Same NULL-threshold-safe
    exceedance semantics as `exceedance_summary_stream`; same caller
    contract (add watermark + time window for continuous runs;
    `availableNow` + complete mode for daily-batch parity).
    """
    joined = stream_df.join(F.broadcast(threshold_df),
                            on=list(join_keys), how="left")
    aggs = _exceedance_aggs(value_col, threshold_years) + [
        F.percentile_approx(
            value_col,
            F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)),
            F.lit(accuracy)).alias("_q"),
    ]
    return (joined.groupBy(*group_keys).agg(*aggs)
            .withColumn("Q1_dis", F.col("_q")[0])
            .withColumn("median_dis", F.col("_q")[1])
            .withColumn("Q3_dis", F.col("_q")[2])
            .drop("_q"))


def interval_join_stream(left: DataFrame, right: DataFrame,
                         left_key: str = "user_id",
                         right_key: str = "user_id_r",
                         left_ts: str = "l_ts", right_ts: str = "r_ts",
                         max_delay_seconds: int = 1800,
                         watermark_delay: str = "1 day") -> DataFrame:
    """Watermarked stream-STREAM inner join: each left event pairs with
    the right events of the same key whose timestamp falls in the
    half-open [l_ts, l_ts + max_delay) — the click→conversion
    attribution shape, and the one streaming join where BOTH sides are
    unbounded (the flagship summaries join stream × static broadcast).

    The time-range predicate plus the two watermarks is what makes the
    state PRUNABLE: Spark retains left rows only until the right
    watermark passes l_ts + max_delay (and vice versa), so state is
    bounded by delay × arrival rate, not by stream length.  Without the
    range condition a stream-stream join must keep every row forever.
    Column names must be disjoint across the sides (rename upstream —
    the right key is dropped from the output); inner join only, the
    variant whose results need no watermark-close to emit.
    """
    if max_delay_seconds < 1:
        raise ValueError(
            f"max_delay_seconds must be >= 1, got {max_delay_seconds}")
    l = left.withWatermark(left_ts, watermark_delay)
    r = right.withWatermark(right_ts, watermark_delay)
    cond = ((F.col(left_key) == F.col(right_key))
            & (F.col(right_ts) >= F.col(left_ts))
            & (F.col(right_ts) < F.col(left_ts)
               + F.expr(f"INTERVAL {int(max_delay_seconds)} SECONDS")))
    return l.join(r, cond, "inner").drop(right_key)


def dedup_stream(stream_df: DataFrame, key_cols,
                 ts_col: str = "issued_ts",
                 watermark_delay: str = "2 days") -> DataFrame:
    """Streaming exact dedup with bounded state:
    `dropDuplicatesWithinWatermark` keeps each key's state only until the
    watermark passes, so re-delivered raster rows (file re-uploads, replayed
    batches) are dropped without unbounded key memory — the streaming
    counterpart of datapipe.dedup.exact_dedup.
    """
    cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    out = stream_df
    if ts_col not in out.columns:
        out = out.withColumn(ts_col, F.col("issued_on").cast("timestamp"))
    return (out.withWatermark(ts_col, watermark_delay)
            .dropDuplicatesWithinWatermark(cols))


def session_stream(stream_df: DataFrame, key_col: str = "user_id",
                   ts_col: str = "ts", gap: str = "1 hour",
                   watermark_delay: str = "2 hours") -> DataFrame:
    """Streaming sessionization via the native session-window state
    machine: per key, events within `gap` of the session's last event
    merge; the watermark closes (and emits, in append mode) sessions whose
    end has passed, bounding state to the open sessions plus the
    watermark horizon — the continuous counterpart of the batch
    `q_session_window` plan, which is this same aggregation minus the
    watermark.

    Output: (key, session_start, session_end = last event + gap,
    n_events).  In `availableNow` + complete-mode runs this reproduces
    the batch result exactly (parity-tested); in continuous append-mode
    runs sessions emit once closed.
    """
    return (stream_df
            .withWatermark(ts_col, watermark_delay)
            .groupBy(F.col(key_col),
                     F.session_window(ts_col, gap).alias("w"))
            .agg(F.count("*").alias("n_events"))
            .select(key_col,
                    F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events"))


def run_available_now(agg_df: DataFrame, checkpoint_dir: str,
                      output_path: str | None = None,
                      query_name: str = "flood_daily",
                      output_mode: str | None = None) -> "object":
    """Execute the streaming plan in catch-up-then-stop mode.

    output_path=None → in-memory sink (tests / interactive); otherwise a
    parquet sink with exactly-once file commit via the checkpoint.
    Returns the StreamingQuery (caller awaits termination).

    output_mode defaults per sink: 'complete' for memory (right for
    aggregate plans), 'append' for parquet.  Non-aggregated plans
    (e.g. dedup_stream) must pass output_mode='append' explicitly when
    using the memory sink — Spark rejects 'complete' without a streaming
    aggregation.
    """
    writer = (agg_df.writeStream
              .option("checkpointLocation", checkpoint_dir)
              .trigger(availableNow=True))
    if output_path is None:
        q = (writer.format("memory")
             .queryName(query_name)
             .outputMode(output_mode or "complete")
             .start())
    else:
        q = (writer.format("parquet")
             .option("path", output_path)
             .outputMode(output_mode or "append")
             .start())
    return q


def heavy_hitters_stream(stream_df: DataFrame, text_col: str = "text",
                         min_count: int = 100) -> DataFrame:
    """Streaming heavy hitters: global token-frequency aggregation over a
    document stream (complete output mode), emitting terms whose running
    count has reached `min_count` — the streaming twin of the batch
    token-frequency heavy hitters.

    No watermark, deliberately: the aggregation state is one counter per
    DISTINCT term — vocabulary-bounded (the same bound build_vocab
    documents), not stream-length-bounded — so state stays small however
    long the stream runs.  Complete mode re-emits the full passing set
    each trigger; under `availableNow` the final table is exactly the
    batch aggregation (q_stream_topk proves rows+schema+hash parity).
    """
    toks = (stream_df
            .select(F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
                .alias("term"))
            .filter(F.col("term") != ""))
    return (toks.groupBy("term")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") >= min_count))


def cms_stream(stream_df: DataFrame, text_col: str = "text",
               width: int = 512, depth: int = 3) -> DataFrame:
    """Streaming count-min sketch over a document stream: tokenize and run
    `sketches.cms_build`'s aggregation as a complete-mode stream.

    The aggregation state IS the sketch — at most depth*width cells
    however long the stream runs (the same bounded-state argument as
    `heavy_hitters_stream`, but with a HARD bound independent of
    vocabulary size: an adversarial unbounded-vocabulary stream grows
    heavy-hitter state without limit, while the CMS state cannot exceed
    depth*width rows).  Count-min cells are mergeable by construction
    (cell-wise sums), which is exactly the property Structured Streaming
    needs from partial aggregates.  Under `availableNow` the final table
    equals the batch `cms_build` bit-for-bit — q_cms_stream carries the
    full value oracle.
    """
    from flood_data_spark.datapipe.sketches import cms_build

    toks = (stream_df
            .select(F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
                .alias("token"))
            .filter(F.col("token") != ""))
    return cms_build(toks, key_col="token", width=width, depth=depth)


def brier_cell_stream(stream_df: DataFrame, prob_col: str,
                      outcome_col: str, n_bins: int = 10) -> DataFrame:
    """Streaming half of the forecast-calibration monitor: run
    `verification.brier_cells`' bin-keyed exact-integer aggregation as
    a complete-mode stream.  State is <= n_bins cells of DECIMAL sums
    however long the stream runs (the bucket_count_stream bounded-state
    argument), mergeable across micro-batches because integer sums are.
    The Murphy finisher (`verification.brier_from_cells`) runs on the
    materialized cells — shared verbatim with batch
    `brier_decomposition`, so the streaming gate checks stream/batch
    parity of the WHOLE score (BS/REL/RES/UNC), not just the counts."""
    from flood_data_spark.operators.verification import brier_cells

    return brier_cells(stream_df, prob_col, outcome_col, n_bins)


def crps_cell_stream(stream_df: DataFrame, value_col: str,
                     obs_col: str, group_keys) -> DataFrame:
    """Streaming half of the CRPS monitor: run
    `verification.crps_member_cells`' per-cell member-collection as a
    complete-mode stream.  State per cell is the m quantized members
    plus the constant observation (m ~ 11..51 — never corpus-wide per
    cell), mergeable across micro-batches because list-union and min
    are.  The rank-identity finisher
    (`verification.crps_from_member_cells` → the shared `_crps_finish`)
    runs on the materialized cells, so the streaming gate checks
    stream/batch parity of the WHOLE score against the batch
    `crps_ensemble` oracle.  At cluster scale the same relation runs
    watermarked per (cell, issued_on) so closed forecast days evict —
    the complete-mode form here is the gate's availableNow profile."""
    from flood_data_spark.operators.verification import crps_member_cells

    return crps_member_cells(stream_df, value_col, obs_col, group_keys)


def contingency_count_stream(stream_df: DataFrame, prob_col: str,
                             outcome_col: str,
                             threshold: float = 0.5) -> DataFrame:
    """Streaming half of the categorical-verification monitor: run
    `verification.contingency_counts`' 2x2 table as a complete-mode
    global aggregate (state = 4 DECIMAL cells however long the stream
    runs, mergeable because integer sums are).  The skill-ladder
    finisher (`verification.contingency_from_counts`) runs on the
    materialized counts — shared verbatim with batch
    `contingency_scores`, so the streaming gate checks stream/batch
    parity of every score, not just the counts."""
    from flood_data_spark.operators.verification import contingency_counts

    return contingency_counts(stream_df, prob_col, outcome_col,
                              threshold)


def roc_cell_stream(stream_df: DataFrame, prob_col: str,
                    outcome_col: str, keys=(),
                    n_bins: int | None = None) -> DataFrame:
    """Streaming half of the ROC monitor: run `verification.roc_cells`
    as a complete-mode aggregate — state = one (keys…, threshold) row
    per distinct forecast probability (n_bins+1 when binned, the
    long-running-stream profile), mergeable because integer sums are.
    The cumulative window + curve/AUC finishers
    (`roc_counts_from_cells` → `roc_curve_from_counts` /
    `roc_auc_from_counts`) run on the materialized cells — shared
    verbatim with the batch path, so the streaming gate checks
    stream/batch parity of every curve point."""
    from flood_data_spark.operators.verification import roc_cells

    return roc_cells(stream_df, prob_col, outcome_col, keys, n_bins)


def bucket_count_stream(stream_df: DataFrame, value_col: str,
                        bounds: list) -> DataFrame:
    """Streaming half of the drift monitor: bucket incoming values
    against a REFERENCE-derived literal boundary ladder
    (`stats.bucket_expr` — static, so no stream-static join) and count
    per bucket.  Complete-output aggregation whose entire state is B
    cells (the heavy_hitters_stream bounded-state argument), mergeable
    across micro-batches by construction.  The PSI finisher
    (`stats.psi_from_counts`) runs on the materialized counts — shared
    verbatim with the batch `psi_report`, so the streaming gate checks
    stream/batch parity of the WHOLE monitor, not just the counts."""
    from flood_data_spark.operators.stats import bucket_expr

    return (stream_df.filter(F.col(value_col).isNotNull())
            .select(bucket_expr(value_col, list(bounds)).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_cur")))


def msprt_count_stream(stream_df: DataFrame, time_col: str = "peek",
                       variant_col: str = "variant",
                       success_col: str = "success",
                       variant_a: str = "A", variant_b: str = "B",
                       group_cols=()) -> DataFrame:
    """Streaming half of the always-valid experiment monitor: run
    `experiment.msprt_counts`' (keys, peek, variant) exact-count state
    as a complete-mode stream — the LIVE form of the daily-peeking
    dashboard the mSPRT exists for (each micro-batch of new exposures
    folds into integer sums; state is peeks x 2 x experiments cells
    however long the stream runs, never corpus-sized, mergeable because
    integer sums are).  The sequential finisher
    (`experiment.msprt_from_counts`) runs on the materialized state —
    shared verbatim with batch `msprt_readout`, so the streaming gate
    checks stream/batch parity of the WHOLE readout (logLambda ladder,
    sticky decision, always-valid p), not just the counts."""
    from flood_data_spark.operators.experiment import msprt_counts

    return msprt_counts(stream_df, time_col, variant_col, success_col,
                        variant_a, variant_b, group_cols)


def nse_sum_stream(stream_df: DataFrame, sim_col: str, obs_col: str,
                   group_keys) -> DataFrame:
    """Streaming half of the hydrological-efficiency monitor: run
    `verification.nse_sums`' four order-free integer sums as a
    complete-mode stream (state = one DECIMAL cell per group however
    long the stream runs, mergeable because integer sums are).  The
    n-cleared finisher (`verification.nse_from_sums`) runs on the
    materialized cells — shared verbatim with batch `nse_score`, so
    the streaming gate checks stream/batch parity of the WHOLE score,
    not just the sums."""
    from flood_data_spark.operators.verification import nse_sums

    return nse_sums(stream_df, sim_col, obs_col, group_keys)


def kge_sum_stream(stream_df: DataFrame, sim_col: str, obs_col: str,
                   group_keys) -> DataFrame:
    """Streaming half of the KGE monitor: `verification.kge_sums`' six
    order-free integer sums as a complete-mode stream (state = one
    DECIMAL cell per group, mergeable because integer sums are); the
    five-seam finisher (`verification.kge_from_sums`) runs on the
    materialized cells — shared verbatim with batch `kge_score`, so
    the gate checks stream/batch parity of the WHOLE decomposition
    (r, alpha, beta, KGE)."""
    from flood_data_spark.operators.verification import kge_sums

    return kge_sums(stream_df, sim_col, obs_col, group_keys)


def rps_cell_stream(stream_df: DataFrame, value_col: str,
                    obs_col: str, group_keys, instance_keys,
                    thresholds) -> DataFrame:
    """Streaming half of the RPS monitor: `verification.rps_cells`'
    per-instance conditional sums as a complete-mode stream (state =
    one K-bounded cell per forecast instance — count/sum/min are all
    mergeable, so members of the same instance may arrive across any
    number of micro-batches).  The finisher
    (`verification.rps_from_cells`) runs on the materialized cells —
    shared verbatim with batch `rps_score`, so the gate checks
    stream/batch parity of the WHOLE score."""
    from flood_data_spark.operators.verification import rps_cells

    return rps_cells(stream_df, value_col, obs_col, group_keys,
                     instance_keys, thresholds)
