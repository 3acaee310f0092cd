"""Round-trip tests for the dependency-free classic-NetCDF reader and
the two converters it unlocks (LUT + OWI scene), replacing the old
netCDF4 import-gate tests with real ingestion coverage."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from xsarsea_spark.sources.netcdf3 import (read_netcdf3, write_netcdf3)


def _sample_ds():
    rng = np.random.default_rng(7)
    dims = {"y": 3, "x": 4, "z": 2}
    variables = {
        "t_f64": (("y", "x"), {"units": "K"},
                  rng.normal(size=(3, 4))),
        "t_f32": (("y", "x"), {}, rng.normal(size=(3, 4))
                  .astype(np.float32)),
        "c_i16": (("x",), {}, np.array([-5, 0, 7, 32000], np.int16)),
        "c_i32": (("z",), {}, np.array([123456, -7], np.int32)),
        "b_i8": (("z",), {}, np.array([-128, 127], np.int8)),
        "cube": (("z", "y", "x"), {"k": 3},
                 rng.normal(size=(2, 3, 4))),
    }
    attrs = {"title": "synthetic", "version": 2, "scale": 0.25,
             "rng": [1.0, 2.0, 3.0]}
    return dims, variables, attrs


@pytest.mark.parametrize("version", [1, 2])
def test_roundtrip_all_types(version):
    dims, variables, attrs = _sample_ds()
    buf = write_netcdf3(dims, variables, attrs, version=version)
    ds = read_netcdf3(buf)
    assert ds.dims == dims
    assert ds.attrs["title"] == "synthetic"
    assert ds.attrs["version"] == 2
    assert ds.attrs["scale"] == 0.25
    assert ds.attrs["rng"] == [1.0, 2.0, 3.0]
    for name, (vdims, vattrs, data) in variables.items():
        v = ds.variables[name]
        assert v.dims == vdims
        assert v.attrs == vattrs
        np.testing.assert_array_equal(v.data, np.asarray(data))
        assert v.data.dtype == np.asarray(data).dtype


def test_record_variables_single_and_multiple():
    # Hand-crafted CDF-1 with a record dim: the single-record-var
    # case skips per-record padding; with two record vars each
    # record block pads to 4 bytes.
    def build(two_vars: bool) -> bytes:
        nrec = 3
        out = [b"CDF\x01", struct.pack(">i", nrec)]
        out.append(struct.pack(">ii", 0x0A, 2))
        for nm, sz in (("t", 0), ("x", 2)):
            b = nm.encode()
            out.append(struct.pack(">i", len(b)) + b
                       + b"\x00" * ((4 - len(b) % 4) % 4))
            out.append(struct.pack(">i", sz))
        out.append(struct.pack(">ii", 0, 0))          # no gattrs
        nvars = 2 if two_vars else 1
        out.append(struct.pack(">ii", 0x0B, nvars))
        heads = []
        specs = [("r", 3, 2 * 2)]                     # i16 x 2 / rec
        if two_vars:
            specs.append(("s", 3, 2 * 2))
        for nm, nc_type, per in specs:
            h = [struct.pack(">i", len(nm)) + nm.encode()
                 + b"\x00" * ((4 - len(nm) % 4) % 4)]
            h.append(struct.pack(">i", 2))            # ndims
            h.append(struct.pack(">ii", 0, 1))        # dims t, x
            h.append(struct.pack(">ii", 0, 0))        # no vattrs
            h.append(struct.pack(">ii", nc_type, per))
            heads.append(b"".join(h))
        header_len = sum(len(b) for b in out) + sum(
            len(h) + 4 for h in heads)
        step = 4 if not two_vars else 8               # padded pair
        data = b""
        for rec in range(nrec):
            data += struct.pack(">hh", 10 * rec, 10 * rec + 1)
            if two_vars:
                data += struct.pack(">hh", -rec, rec)
        begins = [header_len, header_len + 4] if two_vars else [
            header_len]
        for h, bg in zip(heads, begins):
            out.append(h)
            out.append(struct.pack(">i", bg))
        out.append(data)
        buf = b"".join(out)
        return buf, step

    buf, _ = build(False)
    ds = read_netcdf3(buf)
    assert ds.record_dim == "t" and ds.dims == {"t": 3, "x": 2}
    np.testing.assert_array_equal(
        ds.variables["r"].data,
        [[0, 1], [10, 11], [20, 21]])

    buf, _ = build(True)
    ds = read_netcdf3(buf)
    np.testing.assert_array_equal(
        ds.variables["r"].data, [[0, 1], [10, 11], [20, 21]])
    np.testing.assert_array_equal(
        ds.variables["s"].data, [[0, 0], [-1, 1], [-2, 2]])


def test_non_classic_raises():
    with pytest.raises(NotImplementedError):
        read_netcdf3(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)


def test_nc_lut_roundtrip(spark, tmp_path):
    from xsarsea_spark.sources.luts import (nc_lut_to_parquet,
                                            read_lut_parquet)

    inc = np.arange(17.0, 50.0, 1.0)
    wspd = np.arange(3.0, 25.0, 0.5)
    sig = np.add.outer(inc * 0.1, -wspd * 0.05)
    buf = write_netcdf3(
        {"incidence": len(inc), "wspd": len(wspd)},
        {"sigma0_model": (("incidence", "wspd"), {}, sig),
         "incidence": (("incidence",), {}, inc),
         "wspd": (("wspd",), {}, wspd)},
        {"units": "dB", "model": "nc_test", "resolution": "high",
         "pol": "VV"})
    nc = tmp_path / "lut.nc"
    nc.write_bytes(buf)
    meta = nc_lut_to_parquet(spark, str(nc), str(tmp_path / "lut_pq"))
    assert meta["model"] == "nc_test" and meta["units"] == "dB"
    assert meta["resolution"] == "high" and meta["pol"] == "VV"
    assert meta["axes"]["wspd"]["step"] == 0.5
    df, meta2 = read_lut_parquet(spark, str(tmp_path / "lut_pq"))
    assert meta2["dims"] == ["incidence", "wspd"]
    got = {(r["incidence_idx"], r["wspd_idx"]): r["sigma0"]
           for r in df.collect()}
    assert len(got) == sig.size
    for (i, j), v in got.items():
        assert v == sig[i, j]


def test_owi_nc_roundtrip(spark, tmp_path):
    from xsarsea_spark.sources.owi import (owi_nc_to_parquet,
                                           read_owi_scene)

    rng = np.random.default_rng(11)
    ny, nx = 4, 5
    sig = rng.normal(size=(ny, nx))
    inc = rng.uniform(17, 45, size=(ny, nx))
    cal = np.full((ny, nx), 9.0)
    root = write_netcdf3(
        {"owiAzSize": ny, "owiRaSize": nx},
        {"owiNrcs": (("owiAzSize", "owiRaSize"), {}, sig),
         "owiIncidenceAngle": (("owiAzSize", "owiRaSize"), {}, inc),
         "owiCalConstObsi": (("owiAzSize", "owiRaSize"), {}, cal)})
    uv = write_netcdf3(
        {"owiAzSize": ny, "owiRaSize": nx},
        {"owiWindSpeed_Tab": (("owiAzSize", "owiRaSize"), {},
                              rng.uniform(0, 20, size=(ny, nx)))})
    (tmp_path / "root.nc").write_bytes(root)
    (tmp_path / "uv.nc").write_bytes(uv)
    paths = owi_nc_to_parquet(spark, str(tmp_path / "root.nc"),
                              str(tmp_path / "scene"),
                              uv_nc_path=str(tmp_path / "uv.nc"))
    scene = read_owi_scene(spark, paths["root"], paths["uv"])
    assert "owiCalConstObsi" not in scene.columns     # dropped
    assert {"line", "sample"} <= set(scene.columns)   # renamed
    rows = {(r["line"], r["sample"]): r for r in scene.collect()}
    assert len(rows) == ny * nx
    for (i, j), r in rows.items():
        assert r["owiNrcs"] == sig[i, j]
        assert r["owiIncidenceAngle"] == inc[i, j]


# ----------------------------------------------------------------------
# Property fuzz: arbitrary dim shapes / dtypes / values must round-trip
# the binary format exactly (bit-for-bit arrays, names, attrs).
# ----------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays


_DTYPES = [np.int8, np.int16, np.int32, np.float32, np.float64]


@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_roundtrip_property(data):
    ndims = data.draw(st.integers(1, 3))
    shape = tuple(data.draw(st.integers(1, 5)) for _ in range(ndims))
    dims = {f"d{i}": s for i, s in enumerate(shape)}
    nvars = data.draw(st.integers(1, 3))
    variables = {}
    for v in range(nvars):
        dt = data.draw(st.sampled_from(_DTYPES))
        arr = data.draw(arrays(
            dtype=dt, shape=shape,
            elements=st.floats(-1e6, 1e6, width=32).map(float)
            if np.issubdtype(dt, np.floating)
            else st.integers(-100, 100)))
        variables[f"v{v}"] = (tuple(dims), {"n": v}, arr)
    attrs = {"title": "fuzz", "level": data.draw(st.integers(0, 9))}
    version = data.draw(st.sampled_from([1, 2]))

    buf = write_netcdf3(dims, variables, attrs, version=version)
    ds = read_netcdf3(buf)
    assert ds.dims == dims
    assert ds.attrs["title"] == "fuzz"
    for name, (vdims, vattrs, arr) in variables.items():
        got = ds.variables[name]
        assert got.dims == vdims
        assert got.attrs["n"] == vattrs["n"]
        np.testing.assert_array_equal(
            np.asarray(got.data), arr.astype(got.data.dtype))
        assert np.asarray(got.data).dtype == np.dtype(arr.dtype)
