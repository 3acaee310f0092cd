"""Slowly-changing-dimension (type 2) history from a change stream.

The warehouse-side companion to the streaming surface: given rows that
record attribute observations over time, emit one validity interval
per actual change — ``valid_from`` / ``valid_to`` half-open intervals
with a current-row flag, the layout every star-schema dimension merge
(Delta/Iceberg MERGE INTO ... WHEN MATCHED) maintains.

Scale design: everything is two window passes over ONE exchange on
the business key (drop-no-change lag, then interval lead) — no join
against the existing dimension, no global sort. Determinism: ordering
within a key is (ts, seq) with an explicit integer tie-break column,
so equal-timestamp observations resolve identically in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["scd2_history"]


def scd2_history(changes: DataFrame, key_cols: list[str],
                 ts_col: str, attr_cols: list[str],
                 seq_col: str) -> DataFrame:
    """Collapse an observation stream into SCD2 validity intervals.

    Consecutive observations with identical attribute values merge
    into one interval (null-safe comparison); each surviving change
    opens an interval [valid_from, valid_to) closed by the next
    change, with valid_to NULL + is_current = true on the last.
    """
    order = [F.col(ts_col).asc(), F.col(seq_col).asc()]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    same = None
    for a in attr_cols:
        eq = F.col(a).eqNullSafe(F.lag(a).over(w))
        same = eq if same is None else (same & eq)
    changed = (
        changes.withColumn("__same", F.coalesce(same, F.lit(False)))
        .filter(~F.col("__same"))
        .drop("__same")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        changed.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(*key_cols, *attr_cols, "valid_from", "valid_to",
                "is_current")
    )


def snapshot_diff(old: DataFrame, new: DataFrame, keys: list[str],
                  cols: list[str]) -> DataFrame:
    """Change-data-capture between two snapshots: one full-outer join
    on the business key emitting ('I'nsert, 'U'pdate, 'D'elete) rows
    with old_*/new_* value columns; unchanged rows are dropped.

    This is the read side of every incremental MERGE pipeline — at
    scale it is a single co-partitioned join (bucket both snapshots
    on the key and it degenerates to a zipper merge, no shuffle).
    Comparison is null-safe so NULL -> value and value -> NULL count
    as updates.
    """
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"old_{c}") for c in cols],
        F.lit(1).alias("__in_old"))
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"new_{c}") for c in cols],
        F.lit(1).alias("__in_new"))
    cond = None
    for k in keys:
        eq = F.col(f"__ok_{k}") == F.col(f"__nk_{k}")
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, cond, "full_outer")
    changed = None
    for c in cols:
        ne = ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        changed = ne if changed is None else (changed | ne)
    op = (
        F.when(F.col("__in_old").isNull(), F.lit("I"))
        .when(F.col("__in_new").isNull(), F.lit("D"))
        .when(changed, F.lit("U"))
    )
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            *[F.coalesce(F.col(f"__ok_{k}"), F.col(f"__nk_{k}"))
              .alias(k) for k in keys],
            "op",
            *[F.col(f"old_{c}") for c in cols],
            *[F.col(f"new_{c}") for c in cols])
    )
