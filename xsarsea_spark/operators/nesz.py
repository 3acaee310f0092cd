"""NESZ (noise-equivalent sigma zero) flattening.

Parity target: xsarsea ``windspeed/utils.py:94-163``
(``nesz_flattening``): per image line, fit ``noise_db ~ a*incidence + b``
(1st-order polyfit) and rebuild a flattened linear noise floor
``10**((inc*a + b - 1)/10)``, after NaN-filling noise from per-sample
column means.

Spark-first plan: the per-line polyfit is exactly the built-in
``regr_slope`` / ``regr_intercept`` aggregates — a single hash
aggregation over (line), then a broadcast join back. No UDF at all
(the reference needed ``np.apply_along_axis`` + ``np.polyfit``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["nesz_flattening"]


def nesz_flattening(
    px: DataFrame,
    noise_col: str = "nesz",
    inc_col: str = "incidence",
    line_col: str = "line",
    sample_col: str = "sample",
    out_col: str = "nesz_flat",
) -> DataFrame:
    """Returns ``px`` with NaN-filled noise and flattened noise columns."""
    # 0) NaN -> NULL so every aggregate below skips NaN exactly like the
    # reference's isfinite-filtered nanmean/polyfit (avg/regr_* skip
    # NULL but propagate NaN)
    nan_safe = F.when(
        F.col(noise_col).isNull() | F.isnan(noise_col), F.lit(None)
    ).otherwise(F.col(noise_col))
    px = px.withColumn("__noise_nn", nan_safe)
    # 1) NaN-fill from per-sample column means (utils.py:140-143)
    col_means = px.groupBy(sample_col).agg(
        F.avg("__noise_nn").alias("__noise_colmean")
    )
    filled = px.join(F.broadcast(col_means), on=sample_col, how="left").withColumn(
        "__noise_filled", F.coalesce(F.col("__noise_nn"), F.col("__noise_colmean"))
    )
    # 2) to dB (epsilon-free here: reference uses 10*log10(noise))
    filled = filled.withColumn(
        "__noise_db", F.expr("10e0 * log10(__noise_filled)")
    )
    # 3) per-line 1st-order fit via built-in regression aggregates
    fits = filled.groupBy(line_col).agg(
        F.expr(f"regr_slope(__noise_db, {inc_col})").alias("__a"),
        F.expr(f"regr_intercept(__noise_db, {inc_col})").alias("__b"),
    )
    # 4) rebuild flattened linear noise (utils.py:155-161)
    return (
        filled.join(F.broadcast(fits), on=line_col, how="left")
        .withColumn(
            out_col,
            F.expr(f"power(10e0, (({inc_col} * __a + __b) - 1e0) / 10e0)"),
        )
        .drop("__noise_nn", "__noise_colmean", "__noise_filled",
              "__noise_db", "__a", "__b")
    )
