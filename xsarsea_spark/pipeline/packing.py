"""Sequence packing and mixture sampling for pretraining pipelines.

``pack_sequences`` implements concat-then-chunk packing: documents are
laid out end to end in a deterministic order and cut into fixed-length
context windows, so a document may span a sequence boundary. The
layout is pure integer arithmetic over one window cumsum — exact in
any engine, and the industry-standard way to reach ~100% token
utilization (vs per-sequence greedy packing's padding waste).

``mixture_sample`` draws a deterministic hash-thresholded subset per
source at per-source rates — the "data mixture" step of a training
run, reproducible across runs and engines (no RNG state).

Scale: the global token cumsum IS the classic two-level scan —
per-range-partition cumsums plus a broadcast partition-offset prefix
sum (``operators/rank.py:global_rank`` with ``running_sums``), so no
corpus-wide single-task window exists at any size; integer sums make
the distributed result bit-identical to the one-window form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xsarsea_spark.pipeline.text import HASH40_SQL

__all__ = ["pack_sequences", "pack_sequences_from_lengths",
           "mixture_sample", "pack_best_fit"]


def pack_sequences(docs: DataFrame, seq_len: int,
                   text_col: str = "text",
                   id_col: str = "doc_id",
                   max_span: int = 8) -> DataFrame:
    """Concat-then-chunk packing: returns one row per (document,
    sequence) intersection with the exact token spans —
    (doc_id, seq_id, doc_offset, seq_offset, span_len).

    ``max_span`` bounds how many sequences one document may cross
    (validate ``seq_len`` against the longest document upstream).
    """
    toks = docs.select(
        id_col,
        F.expr(f"size(split({text_col}, ' '))").cast("long")
        .alias("__n"),
    )
    return pack_sequences_from_lengths(toks, seq_len, id_col=id_col,
                                       len_col="__n",
                                       max_span=max_span)


def pack_sequences_from_lengths(lengths: DataFrame, seq_len: int,
                                id_col: str = "doc_id",
                                len_col: str = "n_tokens",
                                max_span: int = 8) -> DataFrame:
    """:func:`pack_sequences` over PRECOMPUTED lengths — the core
    layout arithmetic, reusable with tokenizer-derived token counts
    (e.g. BPE-encoded lengths) instead of whitespace words."""
    from xsarsea_spark.operators.rank import global_rank

    docs = lengths
    toks = docs.select(
        id_col, F.col(len_col).cast("long").alias("__n"))
    # inclusive running token total via the distributed two-level
    # scan — exact (integer sums), no corpus-wide window
    laid = global_rank(
        toks, [F.asc(id_col)], rank_col="__rk",
        running_sums={"__cum_end": "__n"},
    ).drop("__rk").withColumn(
        "__cum_before", F.col("__cum_end") - F.col("__n"))
    spans = docs.sparkSession.range(max_span).select(
        F.col("id").cast("long").alias("__k"))
    out = (
        laid.crossJoin(F.broadcast(spans))
        .withColumn("seq_id",
                    F.expr(f"__cum_before DIV {seq_len} + __k"))
        .filter(F.expr(f"seq_id * {seq_len} < __cum_before + __n"))
        .withColumn("__begin",
                    F.expr(f"GREATEST(__cum_before, seq_id * {seq_len})"))
        .withColumn(
            "__end",
            F.expr(f"LEAST(__cum_before + __n,"
                   f" (seq_id + 1) * {seq_len})"))
        .select(
            id_col,
            "seq_id",
            (F.col("__begin") - F.col("__cum_before"))
            .alias("doc_offset"),
            F.expr(f"__begin - seq_id * {seq_len}").alias("seq_offset"),
            (F.col("__end") - F.col("__begin")).alias("span_len"),
        )
    )
    return out


def mixture_sample(docs: DataFrame, rate_sql: str,
                   id_col: str = "doc_id",
                   source_col: str = "source") -> DataFrame:
    """Deterministic per-source mixture: keep a row when its md5-hash
    unit uniform falls under the source's rate. ``rate_sql`` is a SQL
    expression over the row (typically the source column) yielding a
    rate in [0, 1]. Same corpus + rates -> same sample, any engine."""
    h = HASH40_SQL.format(
        x=f"CAST({id_col} AS STRING) || '#' || {source_col}")
    return docs.filter(
        F.expr(f"({h}) / 1099511627776e0 < ({rate_sql})"))


def pack_best_fit(lengths: DataFrame, seq_len: int, n_buckets: int,
                  id_col: str = "doc_id",
                  len_col: str = "n_tokens") -> DataFrame:
    """Best-fit-decreasing (BFD) sequence packing with document-
    boundary segments — the packing every pretraining data loader
    runs when padding waste matters more than strict concat order
    (Krell et al. 2022 study the family; BFD is the classic
    bin-packing 11/9-OPT greedy).

    Documents longer than ``seq_len`` are first ceil-split into
    chunks of at most ``seq_len`` tokens; chunks are then packed
    within deterministic hash buckets (``doc_id % n_buckets``): sort
    by (len DESC, doc_id, chunk_id), place each chunk into the open
    sequence with the SMALLEST remaining capacity that still fits
    (ties: earliest-opened sequence), else open a new sequence.

    Returns one row per placed segment: (bucket, seq_id, slot,
    doc_id, chunk_id, seg_len, seq_offset) — ``seq_offset`` is the
    segment's start position inside its sequence, so consecutive
    (seq_offset, seg_len) spans ARE the block-diagonal
    document-boundary attention mask of the packed sequence.

    Scale: packing is bucket-local — ONE shuffle on the hash bucket,
    then an Arrow-batched greedy kernel per bucket (applyInPandas;
    the greedy is inherently sequential, so the bucket is the
    parallelism unit). Size ``n_buckets`` so a bucket holds ~10^4
    docs: packing quality only needs a few thousand candidates per
    bin pool, and no corpus-wide state exists at any size.
    """
    from pyspark.sql import types as T

    chunks = (
        lengths.selectExpr(f"{id_col} AS doc_id",
                           f"CAST({len_col} AS BIGINT) AS __n")
        .filter("__n >= 1")
        .selectExpr(
            "doc_id", "__n",
            f"explode(sequence(0, CAST((__n - 1) DIV {seq_len}"
            f" AS INT))) AS __k")
        .selectExpr(
            "doc_id",
            "CAST(__k AS BIGINT) AS chunk_id",
            f"LEAST(CAST({seq_len} AS BIGINT),"
            f" __n - __k * {seq_len}) AS seg_len",
            f"doc_id % {n_buckets} AS bucket"))

    schema = T.StructType([
        T.StructField("bucket", T.LongType()),
        T.StructField("seq_id", T.LongType()),
        T.StructField("slot", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("chunk_id", T.LongType()),
        T.StructField("seg_len", T.LongType()),
        T.StructField("seq_offset", T.LongType()),
    ])

    def kernel(pdf):
        import bisect

        import pandas as pd

        pdf = pdf.sort_values(["seg_len", "doc_id", "chunk_id"],
                              ascending=[False, True, True])
        bucket = int(pdf["bucket"].iloc[0])
        # Open bins as a SORTED list of (rem, bin_id): bisect_left
        # on (seg, -1) lands on the smallest remaining capacity that
        # fits, and among equal capacities the earliest-opened bin —
        # the same (smallest rem, earliest bin) tie-break as the
        # linear scan, at O(n log n) comparisons per bucket instead
        # of O(n^2) (the scan dominated at the documented ~1e4
        # docs-per-bucket sizing).
        open_bins: list[tuple[int, int]] = []
        fills: list[int] = []    # tokens already placed per seq
        out = []
        slot = 0
        for doc_id, chunk_id, seg in zip(
                pdf["doc_id"], pdf["chunk_id"], pdf["seg_len"]):
            seg = int(seg)
            i = bisect.bisect_left(open_bins, (seg, -1))
            if i < len(open_bins):
                rem, best = open_bins.pop(i)
                new_rem = rem - seg
            else:
                fills.append(0)
                best = len(fills) - 1
                new_rem = seq_len - seg
            slot += 1
            out.append((bucket, best + 1, slot, int(doc_id),
                        int(chunk_id), seg, fills[best]))
            fills[best] += seg
            if new_rem > 0:   # a full bin can never fit seg >= 1
                bisect.insort(open_bins, (new_rem, best))
        return pd.DataFrame(
            out, columns=[f.name for f in schema.fields])

    return chunks.groupBy("bucket").applyInPandas(kernel, schema)
