"""SAR scene (sarwing OWI) reader analog.

Parity target: xsarsea ``detrend.py:71-93`` (``read_sarwing_owi``):
open the root group and the ``owiInversionTables_UV`` group, merge on
the spatial dims, rename ``owiAzSize``/``owiRaSize`` to
``line``/``sample``, drop calibration variables, assign integer
coordinates.

Spark mapping: a scene is one or two Parquet (or any Spark-readable)
tables keyed by the raster dims. Classic NetCDF converts
dependency-free via ``owi_nc_to_parquet`` (sources/netcdf3.py
parser); the reader below implements the exact
merge/rename/drop/coords semantics over converted tables and is the
path every scene-level operator consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_owi_scene", "assign_integer_coords", "owi_nc_to_parquet"]

# variables the reference drops on load (calibration tables)
DROP_VARS = ("owiCalConstObsi", "owiCalConstInci")

DIM_RENAMES = {"owiAzSize": "line", "owiRaSize": "sample"}


def read_owi_scene(
    spark: SparkSession,
    root_path: str,
    uv_path: str | None = None,
    drop_vars: tuple = DROP_VARS,
    renames: dict | None = None,
) -> DataFrame:
    """Read a converted OWI scene: root table (+ optional inversion-UV
    group table) merged on the raster dims, dims renamed, calibration
    vars dropped (detrend.py:71-93 semantics)."""
    renames = dict(DIM_RENAMES if renames is None else renames)
    root = spark.read.parquet(root_path)
    for old, new in renames.items():
        if old in root.columns:
            root = root.withColumnRenamed(old, new)
    for v in drop_vars:
        if v in root.columns:
            root = root.drop(v)
    if uv_path is not None:
        uv = spark.read.parquet(uv_path)
        for old, new in renames.items():
            if old in uv.columns:
                uv = uv.withColumnRenamed(old, new)
        dup = [c for c in uv.columns
               if c in root.columns and c not in ("line", "sample")]
        root = root.join(uv.drop(*dup), on=["line", "sample"], how="inner")
    return root


def assign_integer_coords(px: DataFrame, line_col: str = "line",
                          sample_col: str = "sample") -> DataFrame:
    """Rebase raster coords to dense 0..n-1 integers (the
    ``assign_coords(line=arange, sample=arange)`` analog,
    detrend.py:89-91) — a rank join per dim over the DISTINCT
    coordinate values, ranked by the distributed two-pass
    ``global_rank`` (axis lengths are small today, but nothing in the
    repo should own a single-partition sort)."""
    from xsarsea_spark.operators.rank import global_rank

    out = px
    for c in (line_col, sample_col):
        vals = px.select(c).distinct()
        ranked = global_rank(vals, [F.col(c)], rank_col=f"__new_{c}") \
            .withColumn(f"__new_{c}",
                        (F.col(f"__new_{c}") - 1).cast("int"))
        out = (
            out.join(F.broadcast(ranked), on=c, how="inner")
            .drop(c)
            .withColumnRenamed(f"__new_{c}", c)
        )
    return out


def owi_nc_to_parquet(spark: SparkSession, nc_path: str, out_root: str,
                      uv_nc_path: str | None = None) -> dict:
    """NetCDF-to-Parquet scene converter (detrend.py:71-93 input
    path), dependency-free for classic NetCDF via
    ``sources/netcdf3.py``. Classic files have no groups, so the
    reference's root + ``owiInversionTables_UV`` group arrive as two
    files (the standard ``nccopy -k classic`` split); each becomes a
    wide pixel table keyed by its raster dims, which
    ``read_owi_scene`` then merges/renames/drops exactly like the
    reference. Returns {"root": path[, "uv": path]}.
    """
    paths = {"root": f"{out_root}/root"}
    _nc_scene_table(spark, nc_path).write.mode("overwrite").parquet(
        paths["root"])
    if uv_nc_path is not None:
        paths["uv"] = f"{out_root}/uv"
        _nc_scene_table(spark, uv_nc_path).write.mode(
            "overwrite").parquet(paths["uv"])
    return paths


def _nc_scene_table(spark: SparkSession, nc_path: str) -> DataFrame:
    """One classic-NetCDF scene file -> a wide (dim0, dim1, vars...)
    DataFrame: every 2-D variable over the raster dim pair becomes a
    column; the dim columns are dense 0..n-1 integers (the
    reference's assign_coords(arange) applied at conversion time)."""
    import numpy as np
    import pandas as pd

    from xsarsea_spark.sources.netcdf3 import read_netcdf3

    ds = read_netcdf3(nc_path)
    two_d = {n: v for n, v in ds.variables.items() if len(v.dims) == 2}
    if not two_d:
        raise ValueError(f"{nc_path}: no 2-D raster variables")
    dim_pair = next(iter(two_d.values())).dims
    ny, nx = (ds.dims[d] for d in dim_pair)
    ii, jj = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    data = {dim_pair[0]: ii.ravel().astype(np.int64),
            dim_pair[1]: jj.ravel().astype(np.int64)}
    for n, v in two_d.items():
        if v.dims != dim_pair:
            continue                     # different raster grid
        data[n] = np.asarray(v.data, dtype=np.float64).ravel()
    return spark.createDataFrame(pd.DataFrame(data))
