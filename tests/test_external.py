"""External-connector contract tests (SURVEY S1/S11): the CDS request
template matches the reference's field-for-field, and the fetcher degrades
explicitly without the cdsapi package."""

import pytest

from flood_data_spark.sources.external import CDSFetcher, CDSRequest


def test_cds_request_template_fields():
    # field parity with the reference template
    # (flood/api/config.py:23-34): same keys, same defaults
    req = CDSRequest(year="2024", month="01", day="15",
                     leadtime_hour=["24", "48"],
                     area=[17.0, -18.0, -6.0, 52.0])
    d = req.to_dict()
    assert d["variable"] == "river_discharge_in_the_last_24_hours"
    assert d["product_type"] == ["control_forecast",
                                 "ensemble_perturbed_forecasts"]
    assert d["system_version"] == "operational"
    assert d["hydrological_model"] == "lisflood"
    assert (d["year"], d["month"], d["day"]) == ("2024", "01", "15")
    assert d["leadtime_hour"] == ["24", "48"]
    assert d["area"] == [17.0, -18.0, -6.0, 52.0]


def test_cds_request_area_omitted_when_none():
    d = CDSRequest(year="2024", month="01", day="15").to_dict()
    assert "area" not in d


def test_fetcher_raises_without_client():
    f = CDSFetcher()
    assert f.dataset == "cems-glofas-forecast"
    f._client = None  # environment-independent: force the no-cdsapi state
    with pytest.raises(NotImplementedError):
        f.fetch(CDSRequest(year="2024", month="01", day="15"), "/tmp/x.grib")


def test_fetch_loop_shape_with_fake_client():
    """The per-leadtime fetch loop (reference glofas-API-query.py:131-150)
    works against any client exposing retrieve()."""
    calls = []

    class FakeClient:
        def retrieve(self, dataset, request, target):
            calls.append((dataset, request["leadtime_hour"], target))

    f = CDSFetcher()
    f._client = FakeClient()
    for lt in ("24", "48", "72"):
        req = CDSRequest(year="2024", month="01", day="15",
                         leadtime_hour=[lt])
        out = f.fetch(req, f"/tmp/fc-{lt}.grib")
        assert out == f"/tmp/fc-{lt}.grib"
    assert [c[1] for c in calls] == [["24"], ["48"], ["72"]]
    assert all(c[0] == "cems-glofas-forecast" for c in calls)


def test_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    """REAL JDBC round-trip: write_jdbc publishes through Spark's JDBC sink
    into an embedded Derby database (the Derby jars ship inside the Spark
    distribution — no external service), then spark.read.jdbc reads the
    rows back.  Pins the writer options end-to-end, not just their shape
    (reference publish sink: glofas-forecast-computation.py:331-347)."""
    from flood_data_spark.sources.external import write_jdbc

    url = f"jdbc:derby:{tmp_path}/publishdb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    df = spark.createDataFrame(
        [(1, 0.25, "2024-01-01"), (2, 0.75, "2024-01-01"),
         (3, 0.5, "2024-01-02")],
        "cell_id long, p_above double, issued_on string")

    write_jdbc(df, url, "forecast_publish", mode="overwrite",
               properties=props, num_partitions=1)
    back = spark.read.jdbc(url, "forecast_publish", properties=props)
    got = {(r.cell_id, r.p_above, r.issued_on) for r in back.collect()}
    assert got == {(1, 0.25, "2024-01-01"), (2, 0.75, "2024-01-01"),
                   (3, 0.5, "2024-01-02")}

    # overwrite mode replaces, never appends
    write_jdbc(df.limit(1), url, "forecast_publish", mode="overwrite",
               properties=props, num_partitions=1)
    assert spark.read.jdbc(url, "forecast_publish",
                           properties=props).count() == 1


def test_http_cds_client_full_protocol(tmp_path):
    """REAL HTTP exercise of the CDS retrieve loop against a local server:
    submit (auth + request JSON verified) -> poll through queued/running ->
    download.  No cdsapi, no network — the protocol itself is the test."""
    import base64
    import http.server
    import json
    import threading

    from flood_data_spark.sources.external import CDSFetcher, HttpCDSClient

    seen = {"polls": 0}
    PAYLOAD = b"GRIB-bytes-here"

    class Handler(http.server.BaseHTTPRequestHandler):
        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            assert self.path == "/resources/cems-glofas-forecast"
            seen["auth"] = self.headers["Authorization"]
            n = int(self.headers["Content-Length"])
            seen["request"] = json.loads(self.rfile.read(n))
            self._json({"state": "queued", "request_id": "r42"})

        def do_GET(self):
            if self.path == "/tasks/r42":
                seen["polls"] += 1
                if seen["polls"] < 2:
                    self._json({"state": "running", "request_id": "r42"})
                else:
                    self._json({"state": "completed", "request_id": "r42",
                                "location": "/download/fc.grib"})
            elif self.path == "/download/fc.grib":
                self.send_response(200)
                self.send_header("Content-Type",
                                 "application/octet-stream")
                self.end_headers()
                self.wfile.write(PAYLOAD)
            else:
                self.send_error(404)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}"
        client = HttpCDSClient(url=url, key="1234:secret",
                               poll_interval=0.01)
        f = CDSFetcher()
        f._client = client  # cdsapi absent; inject the HTTP client
        req = CDSRequest(year="2024", month="01", day="15",
                         leadtime_hour=["24", "48"])
        out = f.fetch(req, str(tmp_path / "fc.grib"))
        assert (tmp_path / "fc.grib").read_bytes() == PAYLOAD
        assert out == str(tmp_path / "fc.grib")
        assert seen["polls"] == 2
        assert seen["request"]["leadtime_hour"] == ["24", "48"]
        assert seen["request"]["variable"] == \
            "river_discharge_in_the_last_24_hours"
        expect_auth = "Basic " + base64.b64encode(b"1234:secret").decode()
        assert seen["auth"] == expect_auth
    finally:
        srv.shutdown()


def test_http_cds_client_failed_state(tmp_path):
    import http.server
    import json
    import threading

    from flood_data_spark.sources.external import HttpCDSClient

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = json.dumps({"state": "failed", "request_id": "r1",
                               "error": "quota exceeded"}).encode()
            self.send_response(200)
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        client = HttpCDSClient(
            url=f"http://127.0.0.1:{srv.server_port}", key="u:k")
        with pytest.raises(RuntimeError, match="quota exceeded"):
            client.retrieve("ds", {}, str(tmp_path / "x"))
    finally:
        srv.shutdown()
