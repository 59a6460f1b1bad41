from flood_data_spark.sources.parquet import (
    read_forecast,
    read_thresholds,
    read_control,
    write_parquet,
)
from flood_data_spark.sources.raster import (
    read_rasters,
    merge_control_and_ensemble,
    synthetic_grib_decoder,
)
from flood_data_spark.sources.external import CDSRequest, CDSFetcher, write_jdbc
from flood_data_spark.sources.warc import (
    parse_warc,
    read_warc,
    warc_to_dataframe,
)
from flood_data_spark.sources.text_corpus import (
    read_csv_docs,
    read_jsonl,
    write_jsonl,
)

__all__ = [
    "read_forecast", "read_thresholds", "read_control", "write_parquet",
    "read_rasters", "merge_control_and_ensemble", "synthetic_grib_decoder",
    "CDSRequest", "CDSFetcher", "write_jdbc",
    "read_jsonl", "read_csv_docs", "write_jsonl",
    "parse_warc", "read_warc", "warc_to_dataframe",
]
