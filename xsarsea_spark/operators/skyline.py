"""2-D skyline (Pareto frontier): zero-exchange local prefilter plus
one exact global window pass.

A row survives the skyline over (minimize ``x``, maximize ``y``) iff
no other row has (x <=, y >=) with at least one strict inequality.
The naive formulation is a quadratic NOT EXISTS self-join; the sorted
formulation is linear: in an ``x``-sorted stream a row is dominated
iff the running max of ``y`` over STRICTLY smaller ``x`` reaches its
``y``, or an equal-``x`` row strictly exceeds its ``y``.

Scale design: phase 1 prunes with zero exchange — an Arrow
``mapInPandas`` kernel computes each batch's local skyline in
vectorized NumPy (sort by (x asc, y desc), group-max + running-max
masks). This is valid because dominance is transitive — skyline(S) =
skyline(union of per-batch skylines): any globally dominated row is
dominated by some row that survives its own batch. Phase 2 runs the
exact sorted pass over survivors only, and its ordered prefix-max
rides the distributed two-pass ``operators.rank.prefix_max`` (range
partition + cluster-sized offsets window + local window) — no
single-reducer sort anywhere, even when |distinct x| approaches row
count on a continuous key. The result set is invariant to the
(nondeterministic) batching.

The Python kernel is a prefilter, not the semantics: correctness
never depends on it keeping the minimal set, and the final pass is
pure JVM-side window/join logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xsarsea_spark.operators.rank import prefix_max

__all__ = ["skyline2d"]


def _exact_pass(df: DataFrame, x: str, y: str) -> DataFrame:
    """Exact skyline via an ordered prefix-max over distinct ``x``
    groups: keep rows that (a) hold their own x-group's max y and
    (b) strictly exceed every strictly-smaller-x group's max y.
    Equal (x, y) duplicates do not dominate each other, so all
    survive. The prefix-max is the distributed two-pass
    :func:`prefix_max` (keys are distinct by the groupBy, as it
    requires) — |distinct x| can approach row count on a continuous
    key, so no single-partition window is safe here."""
    grp = prefix_max(
        df.groupBy(x).agg(F.max(y).alias("__gmax")),
        [F.col(x)], "__gmax", "__pmax")
    return (
        df.join(grp, on=x)
        .filter(
            (F.col("__pmax").isNull() | (F.col("__pmax") < F.col(y)))
            & (F.col(y) == F.col("__gmax"))
        )
        .drop("__gmax", "__pmax")
    )


def _local_prefilter(df: DataFrame, x: str, y: str) -> DataFrame:
    """Phase 1: each Arrow batch's local skyline, zero exchange."""
    import numpy as np

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

    return df.mapInPandas(_local, schema=df.schema)


def skyline2d(df: DataFrame, minimize: str, maximize: str) -> DataFrame:
    """Pareto frontier minimizing ``minimize`` and maximizing
    ``maximize``; all other columns pass through. Inputs must be
    non-NULL in both skyline columns."""
    return _exact_pass(_local_prefilter(df, minimize, maximize),
                       minimize, maximize)
