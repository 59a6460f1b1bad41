from flood_data_spark.streaming.file_stream import (
    read_forecast_stream,
    daily_windowed_aggregate,
    dedup_stream,
    interval_join_stream,
    streaming_threshold_summary,
    run_available_now,
)
from flood_data_spark.streaming.stateful import track_alert_levels

__all__ = ["read_forecast_stream", "daily_windowed_aggregate", "dedup_stream",
           "interval_join_stream",
           "streaming_threshold_summary", "run_available_now",
           "track_alert_levels"]
