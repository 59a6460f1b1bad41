"""The flagship end-to-end query: daily flood-forecast computation.

Re-expresses reference entry point E1 (databricks/glofas-forecast-computation.py,
SURVEY.md §3) as one composable pipeline over DataFrames:

  forecast ─ round keys / normalize times
      │
      ├─⋈ thresholds (broadcast) ─ exceedance + 5-number agg → detailed  [cache]
      │                                                         │
      │               ┌─ control (step-1 median | external) ←───┤
      │               ├─ tendency  (per-cell agg + ladder) ←────┤
      │               ├─ intensity (per-cell agg + ladder) ←────┤
      │               └─ peak timing (windows, shared shuffle) ←┘
      │                      │
      └────── left_semi ◄─ summary = tendency ⋈ intensity ⋈ peak
                               │ (drop gray, add WKT geometry)
                          detailed' + summary  → parquet sinks

Plan-shape notes vs the reference (SURVEY §4):
- no manual repartition(100, lat, lon): AQE + broadcast thresholds leave a
  single (lat,lon,...)-keyed exchange feeding the detailed agg, and the three
  per-cell summary aggregates reuse that partitioning;
- `.cache()` of the detailed product is kept (feeds 4 consumers, reference
  :169);
- exact/approx percentile switch surfaced (exact for oracle parity).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from flood_data_spark.config import DEFAULT_CONFIG, EngineConfig
from flood_data_spark.functions.geometry import add_geometry
from flood_data_spark.operators.intensity import flood_intensity
from flood_data_spark.operators.peak_timing import flood_peak_timing
from flood_data_spark.operators.summary import (
    assemble_summary,
    control_from_detailed,
    restrict_detailed_to_summary,
)
from flood_data_spark.operators.tendency import flood_tendency
from flood_data_spark.operators.threshold import ensemble_threshold_summary


@dataclass
class DailyProducts:
    detailed: DataFrame
    summary: DataFrame


class DailyForecastPipeline:
    def __init__(self, config: EngineConfig | None = None,
                 accuracy_mode: str = "approx"):
        self.config = config or DEFAULT_CONFIG
        self.accuracy_mode = accuracy_mode

    def run(self, forecast_df: DataFrame, threshold_df: DataFrame,
            control_df: DataFrame | None = None,
            cache_detailed: bool = True,
            run_checks: bool = False) -> DailyProducts:
        """forecast + thresholds (+ optional external control) → the two
        published products.  Inputs must already be key-rounded (see
        sources.parquet.read_forecast / read_thresholds).

        run_checks=True adds the reference's runtime QA invariants
        (threshold-data-joining.py:84-100 pattern): non-null keys in, the
        §1.4 empty-join tripwire, and the 1-row-per-cell summary grain.
        Costs extra actions — use on the daily increment, not backfills.
        """
        cfg = self.config
        if run_checks:
            from flood_data_spark.plans.checks import (
                assert_no_nulls,
                assert_join_not_empty,
                assert_unique_key,
            )
            assert_no_nulls(forecast_df, ["latitude", "longitude"],
                            label="forecast input")
            assert_no_nulls(threshold_df, ["latitude", "longitude"],
                            label="threshold input")

        detailed = ensemble_threshold_summary(
            forecast_df, threshold_df,
            threshold_years=cfg.threshold_years,
            accuracy_mode=self.accuracy_mode)
        if cache_detailed:
            detailed = detailed.cache()

        if control_df is None:
            if not cfg.use_first_as_control:
                raise ValueError(
                    "config.use_first_as_control is False but no external "
                    "control DataFrame was provided")
            control = control_from_detailed(detailed)
        else:
            control = control_df

        detailed_with_control = detailed.join(
            control, on=["latitude", "longitude"], how="left")

        tendency = flood_tendency(detailed_with_control, cfg.tendencies,
                                  cfg.tendency_up_factor, cfg.tendency_down_factor)
        intensity = flood_intensity(detailed, cfg.intensities,
                                    cfg.intensity_prob_threshold)
        peak = flood_peak_timing(detailed, cfg.peak_timings,
                                 cfg.intensity_prob_threshold,
                                 cfg.peak_early_window,
                                 cfg.peak_black_border_window)

        summary = assemble_summary(tendency, intensity, peak,
                                   drop_gray=True, intensities=cfg.intensities)
        summary = add_geometry(summary, cfg.half_grid_size, cfg.precision)

        detailed_out = add_geometry(detailed, cfg.half_grid_size, cfg.precision)
        detailed_out = restrict_detailed_to_summary(detailed_out, summary)

        if run_checks:
            # J1 is a LEFT join and unmatched cells legitimately score
            # p_above = 0, so key drift is invisible in the output — the
            # §1.4 tripwire therefore probes key overlap directly.  Guard
            # on a non-empty forecast: an empty day partition is routine,
            # not a rounding bug.
            if forecast_df.limit(1).count() > 0:
                assert_join_not_empty(
                    forecast_df.join(
                        threshold_df,
                        on=["latitude", "longitude"], how="left_semi"),
                    label="forecast ⋈ thresholds (key overlap)")
            assert_unique_key(summary, ("latitude", "longitude"),
                              label="summary product")

        return DailyProducts(detailed=detailed_out, summary=summary)
