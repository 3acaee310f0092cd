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
                                    DataSourceWriter, InputPartition,
                                    WriterCommitMessage)
from pyspark.sql.types import (DoubleType, FloatType, IntegerType,
                               LongType, ShortType, StructField,
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


def _resolve_paths(path: str) -> list[str]:
    """A file is itself; a directory is its sorted ``*.nc`` part
    files (the layout the writer produces)."""
    import glob
    import os

    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.nc")))
        if not files:
            raise FileNotFoundError(f"netcdf3: no .nc files in {path}")
        return files
    return [path]


class _Slice(InputPartition):
    def __init__(self, path: str, lo: int, hi: int):
        self.path, self.lo, self.hi = path, lo, hi


class _NC3Reader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("netcdf3: .load(path) is required")
        self.variables = options.get("variables")
        self.n_parts = int(options.get("partitions", "4"))

    def partitions(self):
        from xsarsea_spark.sources.netcdf3 import read_netcdf3

        paths = _resolve_paths(self.path)
        if len(paths) > 1:
            # multi-file dataset: the file is the parallel unit
            return [_Slice(p, 0, -1) for p in paths]
        _, _, dims, _ = _plan(paths[0], self.variables)
        n0 = read_netcdf3(paths[0]).dims[dims[0]] if dims else 1
        k = max(1, min(self.n_parts, n0))
        bounds = np.linspace(0, n0, k + 1).astype(int)
        return [_Slice(paths[0], int(lo), int(hi))
                for lo, hi in zip(bounds[:-1], bounds[1:]) if hi > lo]

    def read(self, partition: _Slice):
        ds, data_vars, dims, coords = _plan(partition.path,
                                            self.variables)
        if partition.hi < 0:            # whole-file partition
            partition = _Slice(partition.path, 0,
                               ds.dims[dims[0]] if dims else 1)
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


class _Done(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path, self.rows = path, rows


# Spark type -> numpy dtype for the classic-NetCDF external types.
# BIGINT intentionally maps to float64: NC3 has no 64-bit integer, and
# a silent truncating NC_INT write would corrupt ids — the lossy-but-
# explicit double is the documented trade (exact below 2^53).
_W_TYPES = {
    ShortType: "int16", IntegerType: "int32", LongType: "float64",
    FloatType: "float32", DoubleType: "float64",
}


class _NC3Writer(DataSourceWriter):
    """Tabular writer: each task encodes its partition as ONE classic
    NetCDF part file (columns become 1-D variables over a ``row``
    dimension — the layout the reader maps straight back to rows).
    Tasks write independently to ``part-<uuid>.nc``; commit is
    rename-free because names are unique, matching the
    one-file-per-task contract every distributed sink uses. A classic
    single-.nc sink is impossible to write in parallel (one
    contiguous header + fixed offsets), so the directory IS the
    dataset — read it back per part file.
    """

    def __init__(self, options, schema: StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("netcdf3: .save(path) is required")
        self.schema = schema
        for f in schema.fields:
            if type(f.dataType) not in _W_TYPES:
                raise ValueError(
                    f"netcdf3: column {f.name!r} has unwritable type "
                    f"{f.dataType.simpleString()} (numeric columns "
                    "only — classic NetCDF has no string/array/i64 "
                    "external type)")

    def write(self, rows):
        import os
        import uuid

        import numpy as np

        from xsarsea_spark.sources.netcdf3 import write_netcdf3

        names = [f.name for f in self.schema.fields]
        dtypes = [_W_TYPES[type(f.dataType)]
                  for f in self.schema.fields]
        cols: list[list] = [[] for _ in names]
        n = 0
        for row in rows:
            for c, v in zip(cols, row):
                c.append(v)
            n += 1
        variables = {
            nm: (("row",), {}, np.asarray(c, dtype=dt))
            for nm, dt, c in zip(names, dtypes, cols)
        }
        os.makedirs(self.path, exist_ok=True)
        dest = os.path.join(self.path, f"part-{uuid.uuid4().hex}.nc")
        buf = write_netcdf3({"row": n}, variables if n else {
            nm: (("row",), {}, np.zeros(0, dtype=dt))
            for nm, dt in zip(names, dtypes)})
        with open(dest, "wb") as f:
            f.write(buf)
        return _Done(dest, n)

    def commit(self, messages):
        pass

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class Netcdf3DataSource(DataSource):
    """``spark.read.format("netcdf3")`` — classic NetCDF (CDF-1/2)."""

    @classmethod
    def name(cls) -> str:
        return "netcdf3"

    def schema(self):
        _, data_vars, dims, coords = _plan(
            _resolve_paths(self.options.get("path"))[0],
            self.options.get("variables"))
        fields = [StructField(f"{d}_idx", IntegerType(), False)
                  for d in dims]
        fields += [StructField(d, DoubleType(), False) for d in coords]
        fields += [StructField(n, DoubleType(), False)
                   for n in data_vars]
        return StructType(fields)

    def reader(self, schema) -> DataSourceReader:
        return _NC3Reader(self.options)

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        if overwrite:
            # driver-side, before any task writes: clear prior parts
            import glob
            import os

            path = self.options.get("path")
            if path and os.path.isdir(path):
                for p in glob.glob(os.path.join(path, "*.nc")):
                    os.remove(p)
        return _NC3Writer(self.options, schema)


def register_netcdf3(spark) -> None:
    """Idempotent format registration for a session."""
    spark.dataSource.register(Netcdf3DataSource)
