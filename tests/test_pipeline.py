"""End-to-end daily pipeline test (reference E1,
glofas-forecast-computation.py) on a small synthetic day."""

import datetime

from flood_data_spark.plans.daily_pipeline import DailyForecastPipeline
from flood_data_spark.schemas import SUMMARY_FORECAST_COLUMNS

D = datetime.date


def _day(spark):
    issued = D(2024, 1, 1)
    rows = []
    # hot cell: all members well above every threshold at step 2
    # cold cell: never above anything (gray → dropped from both outputs)
    for step in range(1, 11):
        valid = issued + datetime.timedelta(days=step - 1)
        for m in range(10):
            hot = 200.0 + 10 * m + (500.0 if step == 2 else 0.0)
            rows.append((m, 0.025, 0.025, issued, step, valid, hot))
            rows.append((m, 0.075, 0.025, issued, step, valid, 1.0 + 0.1 * m))
    forecast = spark.createDataFrame(
        rows, ["number", "latitude", "longitude", "issued_on", "step",
               "valid_for", "dis24"])
    thresholds = spark.createDataFrame(
        [(0.025, 0.025, 100.0, 150.0, 200.0),
         (0.075, 0.025, 100.0, 150.0, 200.0)],
        ["latitude", "longitude", "threshold_2y", "threshold_5y",
         "threshold_20y"])
    return forecast, thresholds


def test_daily_pipeline_products(spark):
    forecast, thresholds = _day(spark)
    products = DailyForecastPipeline(accuracy_mode="exact").run(
        forecast, thresholds)

    summary = products.summary.collect()
    # only the hot cell survives the gray filter
    assert len(summary) == 1
    s = summary[0]
    assert (s.latitude, s.longitude) == (0.025, 0.025)
    assert s.intensity == "P"
    assert s.peak_step == 2 and s.peak_timing == "BB"
    assert s.peak_day == D(2024, 1, 2)
    assert s.tendency == "U"  # step-2 median blows past 1.1x step-1 control
    assert s.wkt.startswith("POLYGON ((")
    for col in SUMMARY_FORECAST_COLUMNS:
        assert col in products.summary.columns, col

    detailed = products.detailed
    # restricted to summary cells: 1 cell x 10 steps
    assert detailed.count() == 10
    assert {r.latitude for r in detailed.collect()} == {0.025}
    assert "wkt" in detailed.columns


def test_pipeline_with_external_control(spark):
    forecast, thresholds = _day(spark)
    control = spark.createDataFrame(
        [(0.025, 0.025, 10_000.0), (0.075, 0.025, 10_000.0)],
        ["latitude", "longitude", "control_dis"])
    products = DailyForecastPipeline(accuracy_mode="exact").run(
        forecast, thresholds, control_df=control)
    s = products.summary.collect()[0]
    # vs a huge control, medians can only look decreasing
    assert s.tendency == "D"
