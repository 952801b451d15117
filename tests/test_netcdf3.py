"""NetCDF-3 classic reader tests (S1 byte level): round-trip through
write_netcdf3, CF decoding (_FillValue/scale/time-units), and the
DISTRIBUTED binaryFile+mapInPandas conversion running with the
dependency-free decoder — the path the reference's driver-bound
``xr.open_dataset`` (``backend/app/utils.py:63-77``) cannot take."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from mini_project_204721_data_engineering_spark.sources.netcdf import netcdf_files_to_long
from mini_project_204721_data_engineering_spark.sources.netcdf3 import (
    netcdf3_grid_to_long,
    read_netcdf3,
    write_netcdf3,
)

LATS = np.array([18.25, 18.75, 19.25], dtype=np.float32)
LONS = np.array([99.25, 99.75, 100.25, 100.75], dtype=np.float32)


def _grid_file(path: str, with_fill: bool = True) -> np.ndarray:
    rng = np.random.RandomState(3)
    precip = rng.uniform(0, 30, size=(2, 3, 4)).astype(np.float32)
    if with_fill:
        precip[0, 0, 0] = -9999.0  # fill → NaN after CF decode
    write_netcdf3(
        path,
        dims={"time": 2, "latitude": 3, "longitude": 4},
        variables={
            "time": (["time"], np.array([0.0, 1.0]), {"units": "days since 2023-06-01"}),
            "latitude": (["latitude"], LATS, {"units": "degrees_north"}),
            "longitude": (["longitude"], LONS, {"units": "degrees_east"}),
            "precip": (
                ["time", "latitude", "longitude"],
                precip,
                {"_FillValue": -9999.0, "units": "mm/day"},
            ),
        },
        record_dim="time",
        attrs={"title": "unit-test CHIRPS-style grid"},
    )
    return precip


def test_roundtrip_header_and_data(tmp_path):
    p = str(tmp_path / "grid.nc")
    precip = _grid_file(p, with_fill=False)
    ds = read_netcdf3(p)
    assert ds["dims"] == {"time": 2, "latitude": 3, "longitude": 4}
    assert ds["record_dim"] == "time"
    assert ds["attrs"]["title"] == "unit-test CHIRPS-style grid"
    v = ds["vars"]["precip"]
    assert v["dims"] == ["time", "latitude", "longitude"]
    np.testing.assert_array_equal(v["data"], precip)  # record stitching exact
    np.testing.assert_array_equal(ds["vars"]["latitude"]["data"], LATS)


def test_bad_magic_rejected():
    with pytest.raises(ValueError, match="classic NetCDF"):
        read_netcdf3(b"HDF\x89" + b"\x00" * 60)


def test_grid_to_long_cf_decode(tmp_path):
    p = str(tmp_path / "grid.nc")
    precip = _grid_file(p)
    with open(p, "rb") as f:
        content = f.read()
    pdf = netcdf3_grid_to_long(content)
    assert list(pdf.columns) == ["time", "lat", "lon", "precip"]
    assert len(pdf) == 2 * 3 * 4
    assert pdf["time"].iloc[0] == pd.Timestamp("2023-06-01")
    assert pdf["time"].iloc[-1] == pd.Timestamp("2023-06-02")
    # fill value became NaN; everything else matches exactly
    assert np.isnan(pdf["precip"].iloc[0])
    assert pdf["precip"].iloc[1] == pytest.approx(float(precip[0, 0, 1]))
    # meshgrid order: lon varies fastest
    assert pdf["lon"].iloc[:4].tolist() == [float(x) for x in LONS]
    assert pdf["lat"].iloc[4] == pytest.approx(18.75)


def test_distributed_conversion_with_classic_decoder(spark, tmp_path):
    """S1 at scale, now with the dependency-free decoder: two .nc files
    convert executor-side; bytes never visit the driver."""
    _grid_file(str(tmp_path / "a.nc"))
    _grid_file(str(tmp_path / "b.nc"))
    out = netcdf_files_to_long(
        spark, str(tmp_path), decoder=netcdf3_grid_to_long
    )
    rows = out.collect()
    assert len(rows) == 2 * 24
    days = {str(r["time"])[:10] for r in rows}
    assert days == {"2023-06-01", "2023-06-02"}


def test_default_decoder_falls_back_to_classic(spark, tmp_path):
    """No injected decoder + no xarray in this env: the default decoder
    must recognize classic CDF bytes and decode them itself."""
    _grid_file(str(tmp_path / "a.nc"))
    out = netcdf_files_to_long(spark, str(tmp_path))
    assert out.count() == 24


def test_netcdf_to_long_reads_classic_without_xarray(spark, tmp_path):
    from mini_project_204721_data_engineering_spark.sources.netcdf import netcdf_to_long

    p = str(tmp_path / "a.nc")
    _grid_file(p)
    df = netcdf_to_long(spark, p)
    assert df.columns == ["time", "lat", "lon", "precip"]
    assert df.count() == 24


def test_single_short_record_var_unpadded_stride(tmp_path):
    """CDF spec special case (ADVICE r2): exactly one record variable of
    byte/char/short packs record slabs with NO padding (vsize stays
    rounded up) — a padded-stride reader would silently shift every
    record after the first."""
    from mini_project_204721_data_engineering_spark.sources.netcdf3 import write_netcdf3

    p = str(tmp_path / "short.nc")
    vals = np.arange(12, dtype=np.int16).reshape(4, 3)  # 6 B/record: not %4
    write_netcdf3(
        p,
        dims={"time": 4, "x": 3},
        variables={"t": (["time", "x"], vals.astype(">i2"), {})},
        record_dim="time",
    )
    raw = open(p, "rb").read()
    ds = read_netcdf3(p)
    np.testing.assert_array_equal(ds["vars"]["t"]["data"], vals)
    # the record block really is packed: 4 records x 6 bytes, no padding
    begin = len(raw) - 4 * 6
    assert raw[begin:] == vals.astype(">i2").tobytes()

    # byte var too (1 B/record x 3 = 3 B, not %4)
    p2 = str(tmp_path / "byte.nc")
    bvals = np.arange(9, dtype=np.int8).reshape(3, 3)
    write_netcdf3(
        p2,
        dims={"time": 3, "x": 3},
        variables={"b": (["time", "x"], bvals.astype(">i1"), {})},
        record_dim="time",
    )
    np.testing.assert_array_equal(read_netcdf3(p2)["vars"]["b"]["data"], bvals)


def test_streaming_numrecs_sentinel(tmp_path):
    """numrecs = 0xFFFFFFFF (STREAMING): record count derives from file
    size, not from the (-1) header value."""
    import struct

    p = str(tmp_path / "s.nc")
    precip = _grid_file(p, with_fill=False)
    with open(p, "r+b") as f:
        f.seek(4)
        f.write(struct.pack(">i", -1))
    ds = read_netcdf3(p)
    assert ds["dims"]["time"] == 2
    np.testing.assert_array_equal(ds["vars"]["precip"]["data"], precip)
