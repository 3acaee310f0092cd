"""File-backed LUT sources: one-time converters to Parquet LUT tables.

Parity targets:

- ``Cmod7Model._raw_lut`` (cmod7.py:19-75): Fortran binary
  ``.dat_little_endian`` — float32 stream, head/tail stripped, reshaped
  (250 wspd, 73 phi, 51 inc) order='F', coords from fixed ranges;
- ``PickleLutModel._raw_lut`` (pickle_luts.py:20-73): ``sigma.npy`` +
  pickled coordinate vectors, steps/ranges inferred from diffs;
- ``NcLutModel._raw_lut`` (models.py:361-410): NetCDF LUT — classic
  NetCDF (CDF-1/2) parses dependency-free via ``sources/netcdf3.py``;
  NetCDF-4/HDF5 containers raise with a pointer to
  ``nccopy -k classic``;
- ``Model.to_netcdf`` sink (models.py:232-262): our sink is Parquet
  with the same range/step metadata, written once and read lazily.

Design: files are read ONCE on the driver (LUTs are bounded — the
largest, cmod7, is 930,750 cells), converted to a long-form Parquet
table ``(incidence_idx, wspd_idx[, phi_idx], incidence, wspd[, phi],
sigma0)`` plus a tiny JSON-ish metadata row, then every downstream use
is a lazy ``spark.read.parquet`` — the deferred-scan analog of the
reference's attrs-only registration.
"""

from __future__ import annotations

import json
import os
import pickle

import numpy as np
from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "cmod7_to_parquet",
    "npy_lut_to_parquet",
    "nc_lut_to_parquet",
    "read_lut_parquet",
    "infer_axis",
    "lut_arrays_to_parquet",
]


def infer_axis(coord: np.ndarray) -> dict:
    """Step/range inference from a coordinate vector
    (pickle_luts.py:42-45): step = round(unique(diff), 2)[0]."""
    step = float(np.round(np.unique(np.diff(coord)), decimals=2)[0])
    return {
        "x0": float(np.round(np.min(coord), decimals=2)),
        "hi": float(np.round(np.max(coord), decimals=2)),
        "step": step,
        "n": int(len(coord)),
    }


def lut_arrays_to_parquet(
    spark: SparkSession,
    path: str,
    sigma0: np.ndarray,
    coords: dict[str, np.ndarray],
    units: str,
    model: str,
) -> dict:
    """Write a long-form Parquet LUT from dense arrays; returns the
    metadata dict (also persisted alongside as _lut_meta.json)."""
    dims = list(coords)
    assert sigma0.shape == tuple(len(coords[d]) for d in dims)
    idx = np.meshgrid(*[np.arange(len(coords[d])) for d in dims],
                      indexing="ij")
    import pandas as pd

    data = {}
    for j, d in enumerate(dims):
        data[f"{d}_idx"] = idx[j].ravel().astype(np.int64)
        data[d] = coords[d][idx[j].ravel()]
    data["sigma0"] = sigma0.ravel().astype(np.float64)
    pdf = pd.DataFrame(data)
    spark.createDataFrame(pdf).repartition(1).write.mode(
        "overwrite").parquet(path)
    meta = {
        "model": model,
        "units": units,
        "dims": dims,
        "axes": {d: infer_axis(coords[d]) for d in dims},
    }
    with open(os.path.join(path, "_lut_meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def cmod7_to_parquet(spark: SparkSession, binary_path: str,
                     out_path: str) -> dict:
    """Convert the cmod7 Fortran binary LUT (cmod7.py:19-75)."""
    sigma0 = np.fromfile(binary_path, dtype=np.float32)
    m, n, p = 250, 73, 51          # wspd, phi, incidence
    sigma0 = sigma0[1:-1].reshape((m, n, p), order="F")
    coords = {
        "incidence": np.arange(16.0, 66.0 + 1.0, 1.0),
        "wspd": np.arange(0.2, 50.0 + 0.2, 0.2),
        "phi": np.arange(0.0, 180.0 + 2.5, 2.5),
    }
    # (wspd, phi, inc) -> (incidence, wspd, phi)
    sig = np.ascontiguousarray(sigma0.transpose(2, 0, 1))
    return lut_arrays_to_parquet(
        spark, out_path, sig, coords, units="linear", model="cmod7")


def npy_lut_to_parquet(spark: SparkSession, lut_dir: str,
                       out_path: str, model: str) -> dict:
    """Convert a sarwing-style pickle/npy LUT dir
    (pickle_luts.py:20-73): sigma.npy (transposed) + pickled coords;
    3-D if wind_speed_and_direction.pkl exists else 2-D."""
    sigma0 = np.ascontiguousarray(
        np.transpose(np.load(os.path.join(lut_dir, "sigma.npy"))))
    with open(os.path.join(lut_dir, "incidence_angle.pkl"), "rb") as f:
        inc = pickle.load(f, encoding="iso-8859-1")
    wsd_path = os.path.join(lut_dir, "wind_speed_and_direction.pkl")
    if os.path.exists(wsd_path):
        with open(wsd_path, "rb") as f:
            phi, wspd = pickle.load(f, encoding="iso-8859-1")
        coords = {"incidence": np.asarray(inc), "wspd": np.asarray(wspd),
                  "phi": np.asarray(phi)}
        # stored (wspd, phi, incidence) -> (incidence, wspd, phi)
        sig = np.ascontiguousarray(sigma0.transpose(2, 0, 1))
    else:
        with open(os.path.join(lut_dir, "wind_speed.pkl"), "rb") as f:
            wspd = pickle.load(f, encoding="iso-8859-1")
        coords = {"incidence": np.asarray(inc), "wspd": np.asarray(wspd)}
        sig = np.ascontiguousarray(sigma0.transpose(1, 0))
    return lut_arrays_to_parquet(
        spark, out_path, sig, coords, units="dB", model=model)


def nc_lut_to_parquet(spark: SparkSession, nc_path: str,
                      out_path: str) -> dict:
    """NetCDF LUT converter (``NcLutModel._raw_lut``,
    models.py:361-410): read ``sigma0_model`` plus its coordinate
    variables and the units/model/resolution global attrs from a
    classic NetCDF file (dependency-free ``sources/netcdf3.py``
    parser — NetCDF-4/HDF5 containers raise there with a pointer to
    ``nccopy -k classic``)."""
    from xsarsea_spark.sources.netcdf3 import read_netcdf3

    ds = read_netcdf3(nc_path)
    var = ds.variables.get("sigma0_model") or ds.variables.get("sigma0")
    if var is None:
        raise ValueError(
            f"{nc_path}: no sigma0_model/sigma0 variable "
            f"(found {sorted(ds.variables)})")
    missing = [d for d in var.dims if d not in ds.variables]
    if missing:
        raise ValueError(f"{nc_path}: missing coordinate vars {missing}")
    coords = {d: np.asarray(ds.variables[d].data, dtype=np.float64)
              for d in var.dims}
    model = str(ds.attrs.get(
        "model", os.path.splitext(os.path.basename(nc_path))[0]))
    meta = lut_arrays_to_parquet(
        spark, out_path, np.asarray(var.data, dtype=np.float64),
        coords, units=str(ds.attrs.get("units", "dB")), model=model)
    extra = {k: ds.attrs[k] for k in ("resolution", "pol")
             if k in ds.attrs}
    if extra:
        meta.update(extra)
        with open(os.path.join(out_path, "_lut_meta.json"), "w") as f:
            json.dump(meta, f)
    return meta


def read_lut_parquet(spark: SparkSession, path: str) -> tuple[DataFrame,
                                                              dict]:
    """Lazy LUT scan + metadata (the deferred-load analog)."""
    with open(os.path.join(path, "_lut_meta.json")) as f:
        meta = json.load(f)
    return spark.read.parquet(path), meta
