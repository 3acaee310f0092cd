"""Regular-grid interpolation joins (the engine's LUT-lookup primitive).

Parity target: xsarsea ``models.py:331-335`` (``lut.interp(incidence=...,
wspd=..., phi=...)``) — N-D linear interpolation of scattered points
into a gridded LUT — and ``models.py:154-167`` (grid-to-grid regrid).

Spark-first physical pattern (SURVEY.md §4): for each grid dimension,
compute the bracketing integer index ``i = floor((x - x0)/step)``
(clamped to the grid interior) plus the fractional offset; then one
broadcast equi-join per grid corner (2^d joins for d dims) and a
fixed-order multilinear blend expression. No shuffle of the point
table — LUTs are bounded (≤ ~10^6 rows) so every corner join is a
broadcast hash join that AQE keeps JVM-side in whole-stage codegen.

The LUT DataFrame must carry integer index columns (``<dim>_idx``),
which :func:`xsarsea_spark.operators.lut.gmf_to_lut` generates for
free from ``spark.range``.
"""

from __future__ import annotations

from typing import Mapping, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["GridAxis", "interp_join"]


class GridAxis:
    """One regular grid axis: x = x0 + i*step, i in [0, n)."""

    def __init__(self, name: str, x0: float, step: float, n: int):
        self.name, self.x0, self.step, self.n = name, float(x0), float(step), int(n)


def interp_join(
    points: DataFrame,
    lut: DataFrame,
    axes: Sequence[GridAxis],
    value_col: str = "sigma0_model",
    point_cols: Mapping[str, str] | None = None,
    out_col: str = "value_interp",
) -> DataFrame:
    """Multilinear interpolation of ``points`` into ``lut``.

    ``axes`` describe the LUT's regular grid; ``point_cols`` maps axis
    name -> column in ``points`` (defaults to the axis name). The LUT
    must have ``<axis>_idx`` integer columns and ``value_col``.
    """
    point_cols = dict(point_cols or {})
    d = len(axes)
    if d == 0 or d > 3:
        raise ValueError("interp_join supports 1-3 dimensions")

    pt = points
    for ax in axes:
        src = point_cols.get(ax.name, ax.name)
        t = (F.col(src) - F.lit(ax.x0)) / F.lit(ax.step)
        # clamp to grid interior so edge points extrapolate flat like
        # np.interp / bounds clamping rather than producing nulls
        i0 = F.least(
            F.greatest(F.floor(t), F.lit(0)), F.lit(ax.n - 2)
        ).cast("long")
        pt = pt.withColumn(f"__i_{ax.name}", i0).withColumn(
            f"__f_{ax.name}",
            F.least(F.greatest(t - i0, F.lit(0.0)), F.lit(1.0)),
        )

    # one broadcast join per corner; fixed corner order => fixed blend
    # expression order => bit-deterministic result
    n_corners = 1 << d
    out = pt
    for corner in range(n_corners):
        lsel = lut.select(
            *[F.col(f"{ax.name}_idx").alias(f"__k_{j}") for j, ax in
              enumerate(axes)],
            F.col(value_col).alias(f"__v_{corner}"),
        )
        cond = None
        for j, ax in enumerate(axes):
            bit = (corner >> j) & 1
            c = F.col(f"__i_{ax.name}") + F.lit(bit) == F.col(f"__k_{j}")
            cond = c if cond is None else (cond & c)
        out = out.join(F.broadcast(lsel), cond, "left").drop(
            *[f"__k_{j}" for j in range(d)]
        )

    blend = None
    for corner in range(n_corners):
        w = None
        for j, ax in enumerate(axes):
            bit = (corner >> j) & 1
            f = F.col(f"__f_{ax.name}")
            term = f if bit else (F.lit(1.0) - f)
            w = term if w is None else (w * term)
        term = F.col(f"__v_{corner}") * w
        blend = term if blend is None else (blend + term)

    out = out.withColumn(out_col, blend)
    drop = [f"__v_{c}" for c in range(n_corners)]
    drop += [f"__i_{ax.name}" for ax in axes] + [f"__f_{ax.name}" for ax in axes]
    return out.drop(*drop)
