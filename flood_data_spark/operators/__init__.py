from flood_data_spark.operators.threshold import ensemble_threshold_summary
from flood_data_spark.operators.tendency import flood_tendency
from flood_data_spark.operators.intensity import flood_intensity
from flood_data_spark.operators.peak_timing import flood_peak_timing
from flood_data_spark.operators.summary import (
    control_from_detailed,
    normalize_control,
    assemble_summary,
    restrict_detailed_to_summary,
)
from flood_data_spark.operators.grid import (
    upstream_mask,
    nearest_grid_join,
)
from flood_data_spark.operators.serving import (
    grid_cell_bounds,
    point_lookup,
    neighborhood_lookup,
    radius_lookup,
)
from flood_data_spark.operators.timeseries import (
    asof_join,
    seasonal_decompose,
    sessionize,
    with_holt,
    with_rolling_median,
)
from flood_data_spark.operators.scd import scd2_apply, scd2_as_of
from flood_data_spark.operators.behavior import attribution_credit
from flood_data_spark.operators.stats import (
    js_divergence,
    acf,
    benford_profile,
    fd_report,
    gini_concentration,
    equidepth_histogram,
    profile_table,
    psi_report,
    bucket_counts,
    psi_from_counts,
    trend_stats,
    with_robust_outliers,
)
from flood_data_spark.operators.experiment import (
    bootstrap_ci,
    cuped_adjust,
    conformal_interval,
    km_survival,
    msprt_readout,
    ratio_metric_ci,
    srm_check,
    wilson_interval,
    winsorized_mean,
    two_proportion_ztest,
)
from flood_data_spark.operators.extremes import (
    doy_climatology,
    drought_runs,
    frequency_qq,
    gpd_moment_fit,
    gumbel_return_levels,
    gumbel_variate,
    low_flow_mam,
    plotting_positions,
    pot_decluster,
    standardized_anomaly,
)
from flood_data_spark.operators.routing import (
    baseflow_separate,
    flashiness_index,
    muskingum_coefficients,
    muskingum_route,
)
from flood_data_spark.operators.verification import (
    anomaly_correlation,
    brier_decomposition,
    contingency_counts,
    contingency_from_counts,
    contingency_scores,
    cost_loss_value,
    crps_ensemble,
    crps_from_member_cells,
    crps_hersbach,
    crps_member_cells,
    dm_test,
    ece_from_cells,
    energy_score,
    error_summary,
    isotonic_calibration,
    kge_from_sums,
    kge_score,
    kge_sums,
    nse_from_sums,
    nse_score,
    persistence_skill,
    nse_sums,
    quantile_score,
    quantile_score_from_member_cells,
    rank_histogram,
    seeps_score,
    reliability_diagram,
    spiegelhalter_z,
    spread_skill,
)

__all__ = [
    "ensemble_threshold_summary",
    "flood_tendency", "flood_intensity", "flood_peak_timing",
    "control_from_detailed", "normalize_control", "assemble_summary",
    "restrict_detailed_to_summary",
    "upstream_mask", "nearest_grid_join",
    "grid_cell_bounds", "point_lookup", "neighborhood_lookup",
    "asof_join", "sessionize", "seasonal_decompose",
    "radius_lookup", "scd2_apply", "scd2_as_of",
    "km_survival", "two_proportion_ztest", "bootstrap_ci",
    "conformal_interval",
    "acf", "benford_profile", "fd_report", "equidepth_histogram", "js_divergence", "attribution_credit",
    "gini_concentration", "profile_table", "psi_report", "bucket_counts",
    "psi_from_counts", "trend_stats", "with_holt", "with_rolling_median",
    "with_robust_outliers",
    "cuped_adjust", "msprt_readout", "ratio_metric_ci", "wilson_interval",
    "srm_check", "winsorized_mean",
    "crps_ensemble", "rank_histogram", "brier_decomposition",
    "spread_skill", "reliability_diagram", "crps_hersbach",
    "crps_member_cells", "crps_from_member_cells", "ece_from_cells",
    "contingency_scores", "quantile_score", "isotonic_calibration",
    "energy_score", "anomaly_correlation", "cost_loss_value", "spiegelhalter_z", "seeps_score",
    "contingency_counts", "contingency_from_counts",
    "quantile_score_from_member_cells", "dm_test",
    "nse_score", "kge_score", "error_summary",
    "nse_sums", "nse_from_sums", "kge_sums", "kge_from_sums",
    "persistence_skill",
    "gumbel_return_levels", "gumbel_variate", "pot_decluster",
    "muskingum_route", "muskingum_coefficients", "doy_climatology",
    "baseflow_separate", "drought_runs", "plotting_positions",
    "flashiness_index", "low_flow_mam", "standardized_anomaly",
    "frequency_qq",
    "gpd_moment_fit",
]
