"""Exactly-once curated-table ingest: the per-batch kernel behind
``stream_curated_ingest`` (suite/pipeline_suite.py), factored out so
the crash-window semantics are unit-testable.

Design (the production two-tier dedup shape for a 100-TB ingest):

- within-batch exact dedup on a content digest (md5 of text);
- cross-batch dedup split by a PERSISTED bloom sidecar (KB-sized
  ``(word, bits)`` parquet): bloom-NEGATIVE rows are definitely new
  and skip the table scan; bloom-POSITIVE rows pay an exact digest
  anti-join against the materialized table;
- z-clustered parquet append (file-skip friendly on both z-dims).

Crash-window soundness: trusting bloom-negatives is only valid when
the sidecar provably covers every digest ever appended. A crash
between the table append and the sidecar write would break that, so
the sidecar carries a sync marker recording the table's parquet file
inventory at write time; on the next batch a mismatch (crash window,
external compaction, manual writes) demotes the WHOLE batch to the
unconditional exact anti-join — slower, still exactly-once. The
marker is written last, so every failure point leaves the pair
(table, sidecar) either in sync or detectably out of sync.

Reference parity note: the reference engine (umr-lops/xsarsea) has no
ingest surface; this module is part of the LLM-data-pipeline
extension mandated by the build brief.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xsarsea_spark.engine import materialize
from xsarsea_spark.operators.sketch import bloom_build, bloom_mark
from xsarsea_spark.sources.sinks import write_zordered

__all__ = ["ingest_curated_batch"]


def _table_files(table_dir: str) -> list[str]:
    if not os.path.isdir(table_dir):
        return []
    return sorted(f for f in os.listdir(table_dir)
                  if f.endswith(".parquet"))


def ingest_curated_batch(
    spark: SparkSession,
    df: DataFrame,
    table_dir: str,
    bloom_path: str,
    marker_path: str,
    *,
    min_chars: int,
    zcols: list[str],
    zbits: int,
    m_bits: int,
    k: int,
    n_files: int = 4,
) -> None:
    """Curate one micro-batch of ``documents`` rows and append the
    new digests to the z-ordered table at ``table_dir``, exactly
    once, updating the bloom sidecar + sync marker."""
    from pyspark.sql.window import Window

    wmd5 = Window.partitionBy("digest").orderBy("doc_id")
    batch = (
        df.filter(F.expr(f"text IS NOT NULL AND n_chars >= {min_chars}"))
        .withColumn("digest", F.expr("md5(text)"))
        .withColumn("__rn", F.row_number().over(wmd5))
        .filter("__rn = 1")
        .select("doc_id", "lang", "n_chars", "digest")
    )

    has_table = bool(_table_files(table_dir))
    bloom_in_sync = False
    if os.path.exists(bloom_path) and os.path.exists(marker_path):
        with open(marker_path) as fh:
            bloom_in_sync = fh.read() == "\n".join(_table_files(table_dir))

    if has_table and bloom_in_sync:
        bloom = spark.read.parquet(bloom_path)
        marked = bloom_mark(batch, bloom, "digest", m_bits=m_bits, k=k)
        fresh = marked.filter("NOT __maybe").drop("__maybe")
        maybe = marked.filter("__maybe").drop("__maybe")
        existing = spark.read.parquet(table_dir).select("digest")
        checked = maybe.join(existing, on="digest", how="left_anti")
        batch = fresh.unionByName(checked)
    elif has_table:
        existing = spark.read.parquet(table_dir).select("digest")
        batch = batch.join(existing, on="digest", how="left_anti")

    # materialize so the delta-bloom build and the table append see
    # the identical row set (and the bloom/table reads in the lineage
    # aren't replayed against post-append state)
    batch = materialize(batch)
    delta = bloom_build(batch.select("digest"), "digest",
                        m_bits=m_bits, k=k).collect()
    write_zordered(batch, table_dir, zcols, bits=zbits,
                   n_files=n_files, mode="append")
    # incremental sidecar update: OR the APPENDED digests' words into
    # the persisted filter — O(batch) work, never a table rescan.
    # Merged driver-side (O(m_bits/63) rows, ~2k) because parquet
    # can't overwrite a path its own lineage reads.
    words: dict[int, int] = {}
    if os.path.exists(bloom_path):
        for r in spark.read.parquet(bloom_path).collect():
            words[int(r["word"])] = int(r["bits"])
    for r in delta:
        w = int(r["word"])
        words[w] = words.get(w, 0) | int(r["bits"])
    spark.createDataFrame(sorted(words.items()), "word int, bits bigint") \
        .coalesce(1).write.mode("overwrite").parquet(bloom_path)
    with open(marker_path, "w") as fh:
        fh.write("\n".join(_table_files(table_dir)))
