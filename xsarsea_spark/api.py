"""Reference-shaped public API.

A user of xsarsea maps their calls 1:1 onto this module:

==========================  ============================================
xsarsea                     xsarsea_spark.api
==========================  ============================================
``sigma0_detrend``          :func:`sigma0_detrend`
``nesz_flattening``         :func:`nesz_flattening`
``invert_from_model``       :func:`invert_from_model`
``get_dsig``                :func:`get_dsig` (SQL/Expr/NumPy verbs)
``available_models``        :func:`available_models`
``get_model`` / ``Model``   :func:`get_model` -> :class:`Model`
``read_sarwing_owi``        :func:`read_sarwing_owi`
``Gradients(...).histogram``:func:`gradients_histogram`
``local_gradients``         :func:`local_gradients`
``circ_smooth``             :func:`circ_smooth`
``dir_meteo_to_sample`` etc :mod:`xsarsea_spark.functions.angles`
==========================  ============================================

``Model.__call__`` keeps the reference's polymorphic dispatch
(gmfs.py:266-348): scalars -> scalar, 1-D vectors -> outer-product
grid, N-D arrays -> elementwise (all NumPy, driver-side, for bounded
inputs), and DataFrame + column names -> a JVM-side expression column
(the distributed verb).
"""

from __future__ import annotations

import numpy as np

from xsarsea_spark.functions.dsig import (get_dsig_expr, get_dsig_numpy,
                                          get_dsig_sql)
from xsarsea_spark.functions.gmfs import GMF_REGISTRY, gmf_numpy, gmf_sql
from xsarsea_spark.operators.detrend import sigma0_detrend  # noqa: F401
from xsarsea_spark.operators.gradients import (circ_smooth,  # noqa: F401
                                               gradient_histogram,
                                               local_gradients,
                                               streak_direction)
from xsarsea_spark.operators.inversion import \
    invert_from_model  # noqa: F401
from xsarsea_spark.operators.nesz import nesz_flattening  # noqa: F401
from xsarsea_spark.sources.owi import read_owi_scene as read_sarwing_owi
from xsarsea_spark.sources.registry import ModelCatalog, default_catalog

__all__ = [
    "Model", "get_model", "available_models", "register_luts",
    "sigma0_detrend", "nesz_flattening", "invert_from_model",
    "get_dsig", "read_sarwing_owi", "gradients_histogram",
    "local_gradients", "circ_smooth", "streak_direction",
]

_CATALOG: ModelCatalog = default_catalog()


class Model:
    """Polymorphic model handle (GmfModel/LutModel analog)."""

    def __init__(self, name: str):
        self.entry = _CATALOG.get(name)
        self.name = self.entry.name

    # -- polymorphic evaluation (gmfs.py:266-348) ---------------------
    def __call__(self, inc, wspd, phi=None, df=None):
        """NumPy verbs: scalar/1-D(outer grid)/N-D elementwise.
        DataFrame verb: pass ``df`` and column-name strings to get a
        new column expression evaluated JVM-side."""
        if df is not None:
            from pyspark.sql import functions as F

            return df.withColumn(
                f"sigma0_{self.name}",
                F.expr(gmf_sql(self.name, inc=inc, wspd=wspd,
                               phi=phi or "phi")),
            )
        inc = np.asarray(inc, dtype=np.float64)
        wspd = np.asarray(wspd, dtype=np.float64)
        g = GMF_REGISTRY[self.name]
        if g.needs_phi and phi is None:
            raise ValueError(f"{self.name} requires phi")
        if inc.ndim <= 1 and wspd.ndim <= 1 and (
                inc.shape != wspd.shape or inc.ndim != wspd.ndim
                or (g.needs_phi
                    and np.asarray(phi).shape != inc.shape)):
            # outer-product grid over the 1-D axes
            axes = [np.atleast_1d(inc), np.atleast_1d(wspd)]
            if g.needs_phi:
                axes.append(np.atleast_1d(np.asarray(phi, np.float64)))
            mesh = np.meshgrid(*axes, indexing="ij")
            out = gmf_numpy(self.name, mesh[0], mesh[1],
                            mesh[2] if g.needs_phi else None)
            if all(a.size == 1 for a in axes):
                return float(out.ravel()[0])
            return out
        # elementwise on broadcasted arrays
        phi_a = np.asarray(phi, np.float64) if g.needs_phi else None
        return gmf_numpy(self.name, inc, wspd, phi_a)

    def to_lut(self, spark, res: str = "low"):
        from xsarsea_spark.operators.lut import gmf_to_lut

        return gmf_to_lut(spark, self.name, res=res)

    def __repr__(self):
        e = self.entry
        return f"<Model {e.name} kind={e.kind} pol={e.pol} units={e.units}>"


def get_model(name: str) -> Model:
    return Model(name)


def available_models(spark, pol: str | None = None):
    return _CATALOG.available(spark, pol=pol)


def register_luts(parquet_luts: dict | None = None,
                  cmod7_path: str | None = None) -> None:
    """register_luts analog (models.py:541-568): analytic GMFs are
    always present; file-backed Parquet LUTs and cmod7 are added by
    path."""
    for name, (path, pol) in (parquet_luts or {}).items():
        _CATALOG.register_parquet_lut(name, path, pol=pol)
    if cmod7_path:
        _CATALOG.register_cmod7(cmod7_path)


def get_dsig(name: str, inc, sigma0_cr, nesz_cr, mode: str = "sql"):
    """dsig verb: 'sql' -> expression string, 'expr' -> symbolic tree,
    'numpy' -> evaluated array (windspeed/utils.py:47-91)."""
    if mode == "sql":
        return get_dsig_sql(name, inc, sigma0_cr, nesz_cr)
    if mode == "expr":
        return get_dsig_expr(name, inc, sigma0_cr, nesz_cr)
    if mode == "numpy":
        return get_dsig_numpy(name, inc, sigma0_cr, nesz_cr)
    raise ValueError(mode)


def gradients_histogram(px, n_lines: int, n_samples: int,
                        window: int = 40, step: int | None = None,
                        value_col: str = "sigma0"):
    """Gradients2D.histogram analog: fused stencil pyramid then the
    windowed weighted direction histogram (gradients.py:88-125)."""
    lg = local_gradients(px, n_lines, n_samples, value_col=value_col)
    return gradient_histogram(lg, window=window, step=step)
