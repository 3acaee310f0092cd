"""Crash-window soundness of the two-tier (bloom + exact anti-join)
curated-table ingest (`xsarsea_spark.pipeline.ingest`).

The bloom fast path trusts bloom-NEGATIVE digests as definitely new.
That is only sound while the sidecar covers every appended digest; a
crash between the table append and the sidecar write breaks it. The
fix under test: the sidecar's sync marker records the table file
inventory, and a mismatch demotes the whole batch to the exact
anti-join. These tests simulate the crash by appending to the table
WITHOUT updating the sidecar, then replaying — duplicates must not
appear."""

from __future__ import annotations

import os

import pytest

from .conftest import SF_DIR_SMALL

_KW = dict(min_chars=50, zcols=["n_chars", "doc_id"], zbits=13,
           m_bits=1 << 17, k=5)


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")


def _paths(tmp_path):
    base = str(tmp_path)
    return (os.path.join(base, "table"),
            os.path.join(base, "bloom.parquet"),
            os.path.join(base, "bloom_sync.txt"))


def _digest_counts(spark, table_dir):
    rows = (spark.read.parquet(table_dir)
            .groupBy("digest").count().collect())
    return {r["digest"]: r["count"] for r in rows}


def test_replay_after_crash_window_adds_no_duplicates(spark, tmp_path):
    """Simulated crash: batch B is appended to the table but the
    sidecar write never happens. Replaying B must not duplicate —
    the stale sync marker forces the exact anti-join."""
    from xsarsea_spark.pipeline.ingest import ingest_curated_batch

    table_dir, bloom_path, marker_path = _paths(tmp_path)
    docs = _docs(spark)
    batch_a = docs.filter("doc_id % 3 = 0")
    batch_b = docs.filter("doc_id % 3 = 1")

    ingest_curated_batch(spark, batch_a, table_dir, bloom_path,
                         marker_path, **_KW)
    # crash window: append batch B's rows, then roll the sidecar +
    # marker back to their pre-B state (as if the process died
    # between the append and the sidecar write)
    import shutil
    shutil.copytree(bloom_path, bloom_path + ".bak")
    marker_bak = open(marker_path).read()
    ingest_curated_batch(spark, batch_b, table_dir, bloom_path,
                         marker_path, **_KW)
    shutil.rmtree(bloom_path)
    shutil.copytree(bloom_path + ".bak", bloom_path)
    with open(marker_path, "w") as fh:
        fh.write(marker_bak)

    before = _digest_counts(spark, table_dir)
    assert before and max(before.values()) == 1

    # replay batch B (the foreachBatch retry after the crash)
    ingest_curated_batch(spark, batch_b, table_dir, bloom_path,
                         marker_path, **_KW)
    after = _digest_counts(spark, table_dir)
    assert after == before, "replay after crash window duplicated rows"

    # and the recovered sidecar is usable again: a genuinely new
    # batch still ingests exactly its new digests
    batch_c = docs.filter("doc_id % 3 = 2")
    ingest_curated_batch(spark, batch_c, table_dir, bloom_path,
                         marker_path, **_KW)
    final = _digest_counts(spark, table_dir)
    assert max(final.values()) == 1
    full = _digest_counts(spark, table_dir)
    # every curated digest of the full corpus present exactly once
    from pyspark.sql import functions as F
    expect = (docs.filter(f"text IS NOT NULL AND n_chars >= 50")
              .select(F.expr("md5(text)").alias("d")).distinct().count())
    assert len(full) == expect


def test_happy_path_uses_bloom_and_stays_exact(spark, tmp_path):
    """No crash: second ingest of the same batch is a no-op and the
    sync marker matches the table inventory after every ingest."""
    from xsarsea_spark.pipeline.ingest import ingest_curated_batch

    table_dir, bloom_path, marker_path = _paths(tmp_path)
    docs = _docs(spark)
    ingest_curated_batch(spark, docs, table_dir, bloom_path,
                         marker_path, **_KW)
    before = _digest_counts(spark, table_dir)
    inventory = sorted(f for f in os.listdir(table_dir)
                       if f.endswith(".parquet"))
    assert open(marker_path).read() == "\n".join(inventory)
    ingest_curated_batch(spark, docs, table_dir, bloom_path,
                         marker_path, **_KW)
    assert _digest_counts(spark, table_dir) == before
