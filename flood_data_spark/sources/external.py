"""External-boundary connectors (SURVEY.md §2.1 S1, S11).

- CDS fetch (reference flood/api/glofas_fetcher.py:10-23, flood/api/config.py):
  ingestion-side HTTP retrieval of GRIB files from the Copernicus Climate
  Data Store.  `HttpCDSClient` is a real stdlib-urllib implementation of
  the public CDS retrieve protocol (submit → poll → download, the same
  loop the `cdsapi` package runs); `CDSFetcher` prefers the official
  client when installed and falls back to it when credentials are
  configured.  HTTP-server-tested locally; no network in this container.
- JDBC publish (reference glofas-forecast-computation.py:331-347, dormant
  there too): standard Spark JDBC sink, round-trip-tested against the
  embedded Derby that ships with Spark.
"""

from __future__ import annotations

import base64
import json
import os
import shutil
import time
import urllib.request
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


class HttpCDSClient:
    """Stdlib implementation of the public CDS retrieve protocol — the
    same submit/poll/download loop the `cdsapi` package performs:

      POST {url}/resources/{dataset}   body = request JSON
        -> {"state": "queued"|..., "request_id": id}
      GET  {url}/tasks/{id}            until state in {completed, failed}
        -> {"state": "completed", "location": download_url}
      GET  location                    -> bytes streamed to target_path

    Auth is the CDS convention: key "UID:SECRET" sent as HTTP Basic.
    url/key default to $CDSAPI_URL / $CDSAPI_KEY (the cdsapi env names).
    """

    def __init__(self, url: str | None = None, key: str | None = None,
                 poll_interval: float = 1.0, timeout_s: float = 3600.0):
        self.url = (url or os.environ.get("CDSAPI_URL", "")).rstrip("/")
        self.key = key or os.environ.get("CDSAPI_KEY", "")
        if not self.url or not self.key:
            raise ValueError("HttpCDSClient needs url+key (or CDSAPI_URL/"
                             "CDSAPI_KEY in the environment)")
        self.poll_interval = poll_interval
        self.timeout_s = timeout_s

    def _call(self, url: str, deadline: float,
              body: dict | None = None) -> dict:
        req = urllib.request.Request(
            url, data=json.dumps(body).encode() if body is not None else None,
            headers={
                "Authorization": "Basic " + base64.b64encode(
                    self.key.encode()).decode(),
                "Content-Type": "application/json",
            },
            method="POST" if body is not None else "GET")
        # per-call socket timeout from the remaining deadline: without it a
        # stalled connection blocks forever and timeout_s can never fire
        with urllib.request.urlopen(
                req, timeout=self._remaining(deadline)) as resp:
            return json.loads(resp.read().decode())

    def _remaining(self, deadline: float) -> float:
        left = deadline - time.monotonic()
        if left <= 0:
            raise TimeoutError(f"CDS request exceeded {self.timeout_s}s")
        return left

    def retrieve(self, dataset: str, request: dict, target: str) -> str:
        deadline = time.monotonic() + self.timeout_s
        job = self._call(f"{self.url}/resources/{dataset}", deadline,
                         body=request)
        while job.get("state") not in ("completed", "failed"):
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"CDS request {job.get('request_id')} still "
                    f"{job.get('state')!r} after {self.timeout_s}s")
            time.sleep(self.poll_interval)
            job = self._call(f"{self.url}/tasks/{job['request_id']}",
                             deadline)
        if job["state"] == "failed":
            raise RuntimeError(f"CDS request failed: {job.get('error')}")
        location = job["location"]
        if not location.startswith(("http://", "https://")):
            location = f"{self.url}/{location.lstrip('/')}"
        with urllib.request.urlopen(
                location, timeout=self._remaining(deadline)) as resp, \
                open(target, "wb") as out:
            shutil.copyfileobj(resp, out)
        return target


class CDSFetcher:
    """Driver-side fetch loop (one retrieval per lead time).  Prefers the
    official `cdsapi` client when installed; falls back to the stdlib
    HttpCDSClient when CDS credentials are configured; raises
    NotImplementedError only when neither is available."""

    def __init__(self, dataset: str = "cems-glofas-forecast",
                 url: str | None = None, key: str | None = None):
        self.dataset = dataset
        try:
            import cdsapi
            self._client = cdsapi.Client()
        # cdsapi.Client() raises a plain Exception when installed but
        # unconfigured (no ~/.cdsapirc): explicit url/key args must still
        # reach the stdlib fallback in that case, not crash __init__
        except Exception:
            try:
                self._client = HttpCDSClient(url=url, key=key)
            except ValueError:
                self._client = None

    def fetch(self, request: CDSRequest, target_path: str) -> str:
        if self._client is None:
            raise NotImplementedError(
                "cdsapi is not installed and no CDS credentials are "
                "configured (CDSAPI_URL/CDSAPI_KEY)")
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
