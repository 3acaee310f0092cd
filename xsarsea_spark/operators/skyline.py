"""2-D skyline (Pareto frontier): zero-exchange local prefilter plus
one exact global window pass.

A row survives the skyline over (minimize ``x``, maximize ``y``) iff
no other row has (x <=, y >=) with at least one strict inequality.
The naive formulation is a quadratic NOT EXISTS self-join; the sorted
formulation is linear: in an ``x``-sorted stream a row is dominated
iff the running max of ``y`` over STRICTLY smaller ``x`` reaches its
``y``, or an equal-``x`` row strictly exceeds its ``y``.

Scale design: the exact sorted pass is a GLOBAL (unpartitioned)
window — a single-reducer sort. So phase 1 prunes first, with zero
exchange: an Arrow ``mapInPandas`` kernel computes each batch's local
skyline in vectorized NumPy (sort by (x asc, y desc), group-max +
running-max masks). This is valid because dominance is transitive —
skyline(S) = skyline(union of per-batch skylines): any globally
dominated row is dominated by some row that survives its own batch.
Phase 2 then runs the exact built-in window pass over survivors only,
which for real distributions is O(frontier), not O(n). The result
set is invariant to the (nondeterministic) batching.

The Python kernel is a prefilter, not the semantics: correctness
never depends on it keeping the minimal set, and the final pass is
pure JVM-side window/join logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["skyline2d"]


def _exact_pass(df: DataFrame, x: str, y: str) -> DataFrame:
    """Exact skyline via one ordered window over distinct ``x``
    groups: keep rows that (a) hold their own x-group's max y and
    (b) strictly exceed every strictly-smaller-x group's max y.
    Equal (x, y) duplicates do not dominate each other, so all
    survive."""
    grp = (
        df.groupBy(x)
        .agg(F.max(y).alias("__gmax"))
        .withColumn(
            "__pmax",
            F.max("__gmax").over(
                Window.orderBy(x)
                .rowsBetween(Window.unboundedPreceding, -1)),
        )
    )
    return (
        df.join(grp, on=x)
        .filter(
            (F.col("__pmax").isNull() | (F.col("__pmax") < F.col(y)))
            & (F.col(y) == F.col("__gmax"))
        )
        .drop("__gmax", "__pmax")
    )


def skyline2d(df: DataFrame, minimize: str, maximize: str) -> DataFrame:
    """Pareto frontier minimizing ``minimize`` and maximizing
    ``maximize``; all other columns pass through. Inputs must be
    non-NULL in both skyline columns."""
    import numpy as np

    x, y = minimize, maximize

    def _local(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf
                continue
            xs = pdf[x].to_numpy()
            ys = pdf[y].to_numpy()
            order = np.lexsort((-ys, xs))       # x asc, y desc
            xo, yo = xs[order], ys[order]
            start = np.r_[True, xo[1:] != xo[:-1]]
            gidx = np.cumsum(start) - 1
            gmax = yo[start][gidx]              # x-group max (y desc)
            prev = np.maximum.accumulate(
                np.r_[-np.inf, yo[start][:-1]])[gidx]
            keep = (yo == gmax) & (yo > prev)
            yield pdf.iloc[order[keep]]

    local = df.mapInPandas(_local, schema=df.schema)
    return _exact_pass(local, x, y)
