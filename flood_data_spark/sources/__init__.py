from flood_data_spark.sources.parquet import (
    read_forecast,
    read_thresholds,
    read_control,
    write_parquet,
)

__all__ = ["read_forecast", "read_thresholds", "read_control", "write_parquet"]
