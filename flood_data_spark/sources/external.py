"""External-boundary connectors (SURVEY.md §2.1 S1, S11).

- CDS fetch (reference flood/api/glofas_fetcher.py:10-23, flood/api/config.py):
  ingestion-side HTTP retrieval of GRIB files from the Copernicus Climate
  Data Store.  Network + cdsapi are unavailable here, so the client is a thin
  contract with the request-template builder kept testable.
- JDBC publish (reference glofas-forecast-computation.py:331-347, dormant
  there too): standard Spark JDBC sink.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class CDSRequest:
    """Request template for a GloFAS ensemble forecast retrieval — field
    names mirror the public CDS 'cems-glofas-forecast' API."""
    year: str
    month: str
    day: str
    leadtime_hour: list = field(default_factory=lambda: ["24"])
    variable: str = "river_discharge_in_the_last_24_hours"
    product_type: list = field(default_factory=lambda: [
        "control_forecast", "ensemble_perturbed_forecasts"])
    system_version: str = "operational"
    hydrological_model: str = "lisflood"
    data_format: str = "grib"
    area: list | None = None  # [lat_max, lon_min, lat_min, lon_max]

    def to_dict(self) -> dict:
        d = {
            "variable": self.variable,
            "product_type": self.product_type,
            "system_version": self.system_version,
            "hydrological_model": self.hydrological_model,
            "data_format": self.data_format,
            "year": self.year,
            "month": self.month,
            "day": self.day,
            "leadtime_hour": self.leadtime_hour,
        }
        if self.area is not None:
            d["area"] = self.area
        return d


class CDSFetcher:
    """Driver-side fetch loop (one retrieval per lead time).  Requires the
    public `cdsapi` package + credentials; raises NotImplementedError here."""

    def __init__(self, dataset: str = "cems-glofas-forecast"):
        self.dataset = dataset
        try:
            import cdsapi
            self._client = cdsapi.Client()
        except ImportError:
            self._client = None

    def fetch(self, request: CDSRequest, target_path: str) -> str:
        if self._client is None:
            raise NotImplementedError(
                "cdsapi is not installed in this environment")
        self._client.retrieve(self.dataset, request.to_dict(), target_path)
        return target_path


def write_jdbc(df: DataFrame, url: str, table: str,
               mode: str = "overwrite",
               properties: dict | None = None,
               num_partitions: int | None = None) -> None:
    """Publish a product table to an RDBMS.  num_partitions caps concurrent
    connections (repartition before write) — at cluster scale an unbounded
    parallel JDBC write is a database DoS."""
    out = df.repartition(num_partitions) if num_partitions else df
    out.write.jdbc(url=url, table=table, mode=mode,
                   properties=properties or {})
