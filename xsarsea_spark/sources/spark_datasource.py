"""Spark 4 Python DataSource exposing classic NetCDF as a first-class
read format: ``spark.read.format("netcdf3").load(path)``.

This lifts the dependency-free CDF-1/2 parser (sources/netcdf3.py)
from one-shot converter functions into the engine's own source API,
so NetCDF ingestion gets what every other format gets for free —
schema negotiation, parallel partitioned reads, and composition with
the full DataFrame surface. Parity: the reference reads NetCDF
eagerly into xarray on one node (detrend.py:71-93, models.py:361-410);
here the file is split on its outermost dimension and each Spark task
decodes only its slice.

Row model (the long/tidy layout every LUT query in this repo uses):
one row per index tuple of the shared dimension grid, with

- one INT index column per dimension (``<dim>_idx``),
- one DOUBLE coordinate column per dimension that has a same-named
  1-D coordinate variable (CF convention),
- one DOUBLE column per selected data variable.

Options:

- ``variables`` (optional): comma-separated data variables to read;
  default = every non-coordinate variable sharing the dims of the
  first data variable. All selected variables must share one dim
  tuple (the reader validates).
- ``partitions`` (optional, default 4): target number of input
  partitions; the outermost dimension is range-split into at most
  this many slices (never more than its size).

Scale notes: tasks re-parse the (shared-storage) file header and
slice fixed-size variables by absolute offset ranges — each task
materializes only ``rows/partitions`` points. The format targets
LUT/scene-scale files (MBs); a 100 TB corpus arrives as MANY files,
which Spark parallelizes across load() paths as usual.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition)
from pyspark.sql.types import (DoubleType, IntegerType, StructField,
                               StructType)

__all__ = ["Netcdf3DataSource", "register_netcdf3"]


def _plan(path: str, variables_opt: str | None):
    """Shared driver/executor planning: parse the dataset, pick the
    selected variables, validate a shared dim tuple, order coords."""
    from xsarsea_spark.sources.netcdf3 import read_netcdf3

    ds = read_netcdf3(path)
    coord_names = {n for n, v in ds.variables.items()
                   if v.dims == (n,)}
    data_vars = [n for n, v in ds.variables.items()
                 if n not in coord_names]
    if variables_opt:
        want = [s.strip() for s in variables_opt.split(",") if s.strip()]
        missing = [w for w in want if w not in ds.variables]
        if missing:
            raise ValueError(f"netcdf3: unknown variables {missing}; "
                             f"file has {sorted(ds.variables)}")
        data_vars = want
    if not data_vars:
        raise ValueError("netcdf3: no data variables to read")
    dims = ds.variables[data_vars[0]].dims
    for n in data_vars:
        if ds.variables[n].dims != dims:
            raise ValueError(
                f"netcdf3: variable {n!r} has dims "
                f"{ds.variables[n].dims}, expected {dims} — select a "
                "dim-consistent subset with .option('variables', ...)")
    coords = [d for d in dims if d in coord_names]
    return ds, data_vars, dims, coords


class _Slice(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi


class _NC3Reader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("netcdf3: .load(path) is required")
        self.variables = options.get("variables")
        self.n_parts = int(options.get("partitions", "4"))

    def partitions(self):
        _, _, dims, _ = _plan(self.path, self.variables)
        from xsarsea_spark.sources.netcdf3 import read_netcdf3

        n0 = read_netcdf3(self.path).dims[dims[0]] if dims else 1
        k = max(1, min(self.n_parts, n0))
        bounds = np.linspace(0, n0, k + 1).astype(int)
        return [_Slice(int(lo), int(hi))
                for lo, hi in zip(bounds[:-1], bounds[1:]) if hi > lo]

    def read(self, partition: _Slice):
        ds, data_vars, dims, coords = _plan(self.path, self.variables)
        sizes = [ds.dims[d] for d in dims]
        lo, hi = partition.lo, partition.hi
        if not dims:                      # scalar variables: one row
            if lo == 0:
                yield tuple(float(ds.variables[n].data)
                            for n in data_vars)
            return
        # index grid for this outer-dim slice
        grids = np.meshgrid(np.arange(lo, hi),
                            *[np.arange(s) for s in sizes[1:]],
                            indexing="ij")
        idx = [g.ravel() for g in grids]
        cols: list[np.ndarray] = [g.astype(np.int32) for g in idx]
        for d, g in zip(dims, idx):
            if d in coords:
                cols.append(
                    np.asarray(ds.variables[d].data,
                               dtype=np.float64)[g])
        for n in data_vars:
            arr = np.asarray(ds.variables[n].data, dtype=np.float64)
            cols.append(arr[lo:hi].ravel())
        for row in zip(*cols):
            yield tuple(c.item() for c in row)


class Netcdf3DataSource(DataSource):
    """``spark.read.format("netcdf3")`` — classic NetCDF (CDF-1/2)."""

    @classmethod
    def name(cls) -> str:
        return "netcdf3"

    def schema(self):
        _, data_vars, dims, coords = _plan(
            self.options.get("path"), self.options.get("variables"))
        fields = [StructField(f"{d}_idx", IntegerType(), False)
                  for d in dims]
        fields += [StructField(d, DoubleType(), False) for d in coords]
        fields += [StructField(n, DoubleType(), False)
                   for n in data_vars]
        return StructType(fields)

    def reader(self, schema) -> DataSourceReader:
        return _NC3Reader(self.options)


def register_netcdf3(spark) -> None:
    """Idempotent format registration for a session."""
    spark.dataSource.register(Netcdf3DataSource)
