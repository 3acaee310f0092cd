"""SAR scene (sarwing OWI) reader analog.

Parity target: xsarsea ``detrend.py:71-93`` (``read_sarwing_owi``):
open the root group and the ``owiInversionTables_UV`` group, merge on
the spatial dims, rename ``owiAzSize``/``owiRaSize`` to
``line``/``sample``, drop calibration variables, assign integer
coordinates.

Spark mapping: a scene is one or two Parquet (or any Spark-readable)
tables keyed by the raster dims. NetCDF itself needs a converter
(gated, like the LUT sources); the reader below implements the exact
merge/rename/drop/coords semantics over converted tables and is the
path every scene-level operator consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

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
    coordinate values (small), never a global sort of the pixels."""
    out = px
    for c in (line_col, sample_col):
        vals = px.select(c).distinct()
        ranked = vals.withColumn(
            f"__new_{c}",
            F.row_number().over(Window.orderBy(F.col(c))) - 1,
        )
        out = (
            out.join(F.broadcast(ranked), on=c, how="inner")
            .drop(c)
            .withColumnRenamed(f"__new_{c}", c)
        )
    return out


def owi_nc_to_parquet(nc_path: str, out_root: str) -> None:
    """NetCDF-to-Parquet scene converter — gated on a NetCDF reader
    (not shipped in this environment)."""
    try:
        import netCDF4  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "OWI NetCDF conversion needs the netCDF4 package; run the "
            "converter where it is installed, then read_owi_scene the "
            "resulting parquet tables"
        ) from e
    raise NotImplementedError("netCDF4 present but converter body TBD")
