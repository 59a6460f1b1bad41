"""Contract tests for the REAL grib/netcdf decoder branches
(sources/raster.py) with cfgrib/h5netcdf absent from the environment.

The real branch of `grib_decoder` had never executed here (the import guard
always fired).  These tests inject fake `cfgrib`/`xarray` modules so the
branch runs for real and its non-negotiable mechanics are pinned:

- the executor-local bytes are spooled to a real filesystem path (ecCodes
  cannot read streams — it builds .idx sidecars next to the file);
- `filter_by_keys {'dataType': cf|pf}` is dispatched iff a member filter is
  requested (reference databricks/glofas-transform.py:104-109);
- the temp file AND every ecCodes .idx sidecar are removed afterwards, even
  though the sidecar name contains an unpredictable hash;
- extra decoder columns are dropped: output is exactly DECODED_COLUMNS;
- the dataset handle is closed.
"""

from __future__ import annotations

import os
import sys
import types

import pandas as pd
import pytest

from flood_data_spark.sources.raster import (
    DECODED_COLUMNS,
    grib_decoder,
    netcdf_decoder,
)


class _FakeDataset:
    def __init__(self, pdf, log):
        self._pdf = pdf
        self._log = log

    def to_dataframe(self):
        return self

    def reset_index(self):
        return self._pdf

    def close(self):
        self._log["closed"] = True


def _decoded_pdf(extra_cols=()):
    data = {c: [1] for c in DECODED_COLUMNS}
    data.update({c: [9] for c in extra_cols})
    pdf = pd.DataFrame(data)
    pdf["latitude"] = pdf["latitude"].astype("float64")
    return pdf


@pytest.fixture
def fake_xarray(monkeypatch):
    """Install fake cfgrib + xarray; returns the call log."""
    log = {}

    def open_dataset(path, engine=None, **kwargs):
        log["path"] = path
        log["engine"] = engine
        log["kwargs"] = kwargs
        with open(path, "rb") as f:
            log["content"] = f.read()
        # ecCodes sidecar with an unpredictable short hash in the name
        sidecar = path + ".4cd9a.idx"
        with open(sidecar, "w") as f:
            f.write("idx")
        log["sidecar"] = sidecar
        return _FakeDataset(_decoded_pdf(extra_cols=("surface", "wgs_1984")),
                            log)

    xr = types.ModuleType("xarray")
    xr.open_dataset = open_dataset
    monkeypatch.setitem(sys.modules, "cfgrib", types.ModuleType("cfgrib"))
    monkeypatch.setitem(sys.modules, "xarray", xr)
    return log


def test_grib_decoder_spools_bytes_and_cleans_up(fake_xarray):
    out = grib_decoder(b"GRIB-bytes-here")
    # decoded through a real temp path holding exactly the input bytes
    assert fake_xarray["content"] == b"GRIB-bytes-here"
    assert fake_xarray["engine"] == "cfgrib"
    assert fake_xarray["path"].endswith(".grib")
    # temp file and the hash-named .idx sidecar are both gone
    assert not os.path.exists(fake_xarray["path"])
    assert not os.path.exists(fake_xarray["sidecar"])
    assert fake_xarray.get("closed") is True
    # extra decoder columns dropped, contract schema only
    assert list(out.columns) == DECODED_COLUMNS


def test_grib_decoder_member_filter_dispatch(fake_xarray):
    grib_decoder(b"x", member_filter="cf")
    assert fake_xarray["kwargs"] == {
        "backend_kwargs": {"filter_by_keys": {"dataType": "cf"}}}
    grib_decoder(b"x", member_filter="pf")
    assert fake_xarray["kwargs"]["backend_kwargs"]["filter_by_keys"] == {
        "dataType": "pf"}


def test_grib_decoder_no_filter_means_no_backend_kwargs(fake_xarray):
    grib_decoder(b"x")
    assert fake_xarray["kwargs"] == {}


def test_grib_decoder_cleans_up_on_decode_failure(monkeypatch):
    """A corrupt file must not leak the temp file or sidecars."""
    seen = {}

    def open_dataset(path, engine=None, **kwargs):
        seen["path"] = path
        with open(path + ".dead.idx", "w") as f:
            f.write("idx")
        raise RuntimeError("corrupt GRIB")

    xr = types.ModuleType("xarray")
    xr.open_dataset = open_dataset
    monkeypatch.setitem(sys.modules, "cfgrib", types.ModuleType("cfgrib"))
    monkeypatch.setitem(sys.modules, "xarray", xr)
    with pytest.raises(RuntimeError, match="corrupt"):
        grib_decoder(b"junk")
    assert not os.path.exists(seen["path"])
    assert not os.path.exists(seen["path"] + ".dead.idx")


def test_netcdf_decoder_contract(monkeypatch):
    log = {}

    def open_dataset(buf, engine=None, **kwargs):
        log["engine"] = engine
        log["content"] = buf.read()
        return _FakeDataset(_decoded_pdf(), log)

    xr = types.ModuleType("xarray")
    xr.open_dataset = open_dataset
    monkeypatch.setitem(sys.modules, "xarray", xr)
    # unrecognized container (neither CDF nor HDF5 magic): engine-less
    # xarray dispatch
    out = netcdf_decoder(b"NC-bytes")
    assert log["engine"] is None
    assert log["content"] == b"NC-bytes"
    assert list(out.columns) == DECODED_COLUMNS
    # HDF5 magic outside the minimal reader's scope: h5netcdf dispatch
    out2 = netcdf_decoder(b"\x89HDF\r\n\x1a\n" + b"\x07" + b"\x00" * 88)
    assert log["engine"] == "h5netcdf"
    assert list(out2.columns) == DECODED_COLUMNS


# A syntactically real (minimal) GRIB2 envelope: 'GRIB' magic, edition 2,
# '7777' terminator — the golden byte fixture the decoders receive.
GOLDEN_GRIB_BYTES = (
    b"GRIB" + b"\x00\x00\x02\x02" + b"\x00" * 8 + b"\x00" * 16 + b"7777")


def test_grib_decoder_not_implemented_without_cfgrib(monkeypatch):
    """With cfgrib genuinely absent the decoder must raise the documented
    NotImplementedError (pointing at the injectable synthetic twin), chained
    from the ImportError — never a bare ImportError or a silent empty frame."""
    monkeypatch.setitem(sys.modules, "cfgrib", None)  # import -> ImportError
    with pytest.raises(NotImplementedError,
                       match="synthetic_grib_decoder") as exc:
        grib_decoder(GOLDEN_GRIB_BYTES)
    assert isinstance(exc.value.__cause__, ImportError)


def test_netcdf_decoder_not_implemented_without_xarray(monkeypatch):
    monkeypatch.setitem(sys.modules, "xarray", None)
    # unknown container: ImportError chained into the NotImplementedError
    with pytest.raises(NotImplementedError) as exc:
        netcdf_decoder(b"NC-bytes")
    assert isinstance(exc.value.__cause__, ImportError)
    # HDF5 magic outside the minimal reader's scope (bogus superblock
    # version): the reader's own NotImplementedError must surface, naming
    # the feature + escape hatch, NOT a bare ImportError
    with pytest.raises(NotImplementedError, match="superblock version"):
        netcdf_decoder(b"\x89HDF\r\n\x1a\n" + b"\x07" + b"\x00" * 88)
