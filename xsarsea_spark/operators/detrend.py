"""sigma0 detrending (roughness normalization).

Parity target: xsarsea ``detrend.py:9-68`` (``sigma0_detrend``):
normalize sigma0 by the GMF-modeled incidence-angle trend of the first
image line, yielding a "roughness" image.

Spark-first plan (SURVEY.md §7.1):

    profile = px.filter(line == first).groupBy(sample)
                .agg(avg(gmf(incidence, wspd0, phi0)))
    mean    = exact scalar mean of the profile
    out     = px LEFT JOIN broadcast(profile) ON sample
                 .withColumn(sigma0_detrend, sigma0 / (profile/mean))

The profile is tiny (one row per sample column) so the join is always
a broadcast hash join — no shuffle of the big pixel table. The profile
mean uses an exact DECIMAL sum so results are partition-order
independent (and hash-match the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xsarsea_spark.functions.gmfs import GMF_REGISTRY, gmf_sql
from xsarsea_spark.suite.base import DAVG, QTRUNC

__all__ = ["sigma0_detrend", "detrend_profile"]


def detrend_profile(
    px: DataFrame,
    model: str = "gmf_cmod5n",
    wind_speed_gmf: float = 10.0,
    wind_dir_gmf: float = 45.0,
    first_line: int = 0,
    inc_col: str = "incidence",
    line_col: str = "line",
    sample_col: str = "sample",
    quantize: int | None = None,
) -> DataFrame:
    """Per-sample GMF trend profile from the first image line.

    Returns columns (sample, gmf_ratio): modeled sigma0 divided by its
    scene mean, ready to broadcast-join onto the full pixel table.

    ``quantize``: reproducible mode — truncate the GMF (libm) output to
    a 1e-k decimal grid so the result is bit-identical across engines
    and partitionings (see :func:`xsarsea_spark.suite.base.QTRUNC`).
    """
    if model not in GMF_REGISTRY:
        raise KeyError(f"unknown model {model!r}")
    wspd_lit = _dlit(wind_speed_gmf)
    phi_lit = _dlit(wind_dir_gmf)
    sig_sql = gmf_sql(model, inc=inc_col, wspd=wspd_lit, phi=phi_lit)

    # project the (large) GMF expression ONCE into a column, then
    # quantize/aggregate the column reference — keeps whole-stage
    # codegen small (QTRUNC + DAVG would otherwise inline the full
    # Fourier expansion 4x)
    first = (
        px.filter(F.col(line_col) == first_line)
        .select(sample_col, F.expr(sig_sql).alias("__gmf"))
    )
    g = QTRUNC("__gmf", quantize) if quantize is not None else "__gmf"
    profile = first.groupBy(sample_col).agg(
        F.expr(DAVG(g, scale=18)).alias("sigma0_gmf_sample")
    )
    # window-over-() on the tiny profile: computes the exact scalar mean
    # without a driver round-trip and keeps the plan fully lazy.
    return profile.select(
        sample_col,
        (
            F.col("sigma0_gmf_sample")
            / F.expr(
                "CAST(SUM(CAST(sigma0_gmf_sample AS DECIMAL(38,18))) "
                "OVER () AS DOUBLE) / COUNT(sigma0_gmf_sample) OVER ()"
            )
        ).alias("gmf_ratio"),
    )


def sigma0_detrend(
    px: DataFrame,
    model: str = "gmf_cmod5n",
    wind_speed_gmf: float = 10.0,
    wind_dir_gmf: float = 45.0,
    first_line: int = 0,
    sigma0_col: str = "sigma0",
    inc_col: str = "incidence",
    line_col: str = "line",
    sample_col: str = "sample",
    out_col: str = "sigma0_detrend",
    quantize: int | None = None,
) -> DataFrame:
    """Detrended (roughness) sigma0: ``sigma0 / broadcast(profile_ratio)``."""
    profile = detrend_profile(
        px,
        model=model,
        wind_speed_gmf=wind_speed_gmf,
        wind_dir_gmf=wind_dir_gmf,
        first_line=first_line,
        inc_col=inc_col,
        line_col=line_col,
        sample_col=sample_col,
        quantize=quantize,
    )
    return (
        px.join(F.broadcast(profile), on=sample_col, how="left")
        .withColumn(out_col, F.col(sigma0_col) / F.col("gmf_ratio"))
        .drop("gmf_ratio")
    )


def _dlit(v: float) -> str:
    """Double literal, exponent form so Spark/DuckDB parse as DOUBLE."""
    r = repr(float(v))
    return r if ("e" in r or "E" in r) else r + "e0"
