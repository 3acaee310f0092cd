"""Exactly-once foreachBatch parquet sink: batch parity, restart
no-op, and replayed-batch idempotence.

What exactly-once means here (and what the tests pin down):

- the checkpoint makes a RESTARTED query against an unchanged source
  a complete no-op (no new batch directories, nothing rewritten);
- a REPLAYED batch (crash after the write, before the checkpoint
  commit — simulated with a fresh checkpoint over the same sink dir)
  never rewrites a committed batch directory: the commit marker turns
  the replay into a skip. Complete mode may legally commit a NEW
  superseded snapshot directory; correctness is that committed
  directories are immutable and the latest one equals the batch
  query.
"""

from __future__ import annotations

import os

import pytest

from .conftest import SF_DIR_SMALL


def _snapshot(out_dir: str, prefix: str = "") -> dict[str, float]:
    files = {}
    for root, _, names in os.walk(out_dir):
        for n in names:
            p = os.path.join(root, n)
            rel = os.path.relpath(p, out_dir)
            if rel.startswith(prefix):
                files[rel] = os.path.getmtime(p)
    return files


def _batch_rows(spark):
    from xsarsea_spark.suite import REGISTRY

    return sorted(map(tuple, REGISTRY["events_hourly"]
                  .spark(spark, SF_DIR_SMALL)
                  .select("hour_bucket", "event_type", "n_events",
                          "sum_value").collect()))


@pytest.fixture(scope="module")
def populated(spark, tmp_path_factory):
    from xsarsea_spark.streaming.events import stream_hourly_to_parquet

    base = tmp_path_factory.mktemp("xo_sink")
    out_dir, ckpt = str(base / "out"), str(base / "ckpt")
    stream_hourly_to_parquet(spark, SF_DIR_SMALL, out_dir, ckpt)
    return base, out_dir, ckpt


def test_sink_matches_batch_query(spark, populated):
    from xsarsea_spark.streaming.events import read_latest_batch

    _, out_dir, _ = populated
    got = sorted(map(tuple, read_latest_batch(spark, out_dir)
                 .select("hour_bucket", "event_type", "n_events",
                         "sum_value").collect()))
    assert got == _batch_rows(spark)


def test_restart_is_noop(spark, populated):
    from xsarsea_spark.streaming.events import stream_hourly_to_parquet

    _, out_dir, ckpt = populated
    before = _snapshot(out_dir)
    stream_hourly_to_parquet(spark, SF_DIR_SMALL, out_dir, ckpt)
    assert _snapshot(out_dir) == before


def test_replayed_batch_is_idempotent(spark, populated):
    from xsarsea_spark.streaming.events import (read_latest_batch,
                                                stream_hourly_to_parquet)

    base, out_dir, _ = populated
    before0 = _snapshot(out_dir, prefix="batch_id=0")
    assert before0, "batch 0 must exist"
    stream_hourly_to_parquet(spark, SF_DIR_SMALL, out_dir,
                             str(base / "ckpt2"))
    # the replayed batch 0 was skipped wholesale...
    assert _snapshot(out_dir, prefix="batch_id=0") == before0
    # ...and whatever the rerun committed, the result is unchanged
    got = sorted(map(tuple, read_latest_batch(spark, out_dir)
                 .select("hour_bucket", "event_type", "n_events",
                         "sum_value").collect()))
    assert got == _batch_rows(spark)


def test_stream_curated_ingest_idempotent(spark):
    """The streaming curated ingest survives BOTH replay modes with
    zero duplicates: same-checkpoint rerun (source-side no-op, inside
    the query) AND a fresh-checkpoint full reprocess (digest
    anti-join blocks every append)."""
    import hashlib
    import os

    from xsarsea_spark.suite import REGISTRY
    from .conftest import SF_DIR_SMALL

    res1 = {tuple(r) for r in
            REGISTRY["stream_curated_ingest"].spark(
                spark, SF_DIR_SMALL).collect()}
    base = ("/tmp/xsarsea_stream_curated_"
            + hashlib.md5(SF_DIR_SMALL.encode()).hexdigest()[:12])
    table_dir = os.path.join(base, "table")
    n1 = spark.read.parquet(table_dir).count()

    # fresh checkpoint: the source reprocesses everything; the digest
    # anti-join must append nothing
    import shutil
    shutil.rmtree(os.path.join(base, "ckpt"))
    schema = spark.read.parquet(
        f"{SF_DIR_SMALL}/documents.parquet").schema
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from xsarsea_spark.sources.sinks import write_zordered

    def ingest(df, batch_id):
        wmd5 = Window.partitionBy("digest").orderBy("doc_id")
        batch = (df.filter("text IS NOT NULL AND n_chars >= 50")
                 .withColumn("digest", F.expr("md5(text)"))
                 .withColumn("__rn", F.row_number().over(wmd5))
                 .filter("__rn = 1")
                 .select("doc_id", "lang", "n_chars", "digest"))
        existing = spark.read.parquet(table_dir).select("digest")
        batch = batch.join(existing, on="digest", how="left_anti")
        write_zordered(batch, table_dir, ["n_chars", "doc_id"],
                       bits=13, n_files=4, mode="append")

    src = (spark.readStream.schema(schema)
           .option("pathGlobFilter", "documents.parquet")
           .parquet(SF_DIR_SMALL))
    q = (src.writeStream.foreachBatch(ingest)
         .option("checkpointLocation", os.path.join(base, "ckpt2"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    assert spark.read.parquet(table_dir).count() == n1
    res2 = {tuple(r) for r in
            spark.read.parquet(table_dir).groupBy("lang").agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.min("doc_id").alias("min_doc"),
                F.max("doc_id").alias("max_doc"),
                F.expr("CAST(SUM(n_chars) AS BIGINT)")
                .alias("sum_chars")).collect()}
    assert res2 == res1


def test_bloom_mark_no_false_negatives(spark):
    """bloom_mark must flag every present key as maybe (no false
    negatives) — the property the ingest's skip-the-join tier
    depends on."""
    from pyspark.sql import functions as F

    from xsarsea_spark.operators.sketch import bloom_build, bloom_mark

    keys = spark.range(500).selectExpr("md5(CAST(id AS STRING)) AS d")
    bloom = bloom_build(keys, "d", m_bits=1 << 14, k=5)
    marked = bloom_mark(keys, bloom, "d", m_bits=1 << 14, k=5)
    assert marked.filter("NOT __maybe").count() == 0
    absent = spark.range(500, 1500).selectExpr(
        "md5(CAST(id AS STRING)) AS d")
    neg = bloom_mark(absent, bloom, "d", m_bits=1 << 14, k=5)
    # most absentees are definitely-new (fp rate small at this size)
    assert neg.filter("NOT __maybe").count() >= 900


def test_incremental_ingest_second_batch_uses_bloom(spark, tmp_path):
    """True multi-batch ingest: batch 2 arrives AFTER batch 1 is
    committed, overlaps it by content, and the final table has no
    duplicates — the persisted-sidecar split path end to end, with
    the no-false-negative guarantee asserted on the fresh tier."""
    import hashlib

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    import xsarsea_spark.suite.pipeline_suite as ps
    from xsarsea_spark.engine import materialize
    from xsarsea_spark.operators.sketch import bloom_mark
    from xsarsea_spark.sources.sinks import write_zordered
    from xsarsea_spark.suite import REGISTRY
    from .conftest import SF_DIR_SMALL

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    docs = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
    docs.filter("doc_id % 3 > 0").toPandas().to_parquet(
        src_dir / "documents.parquet")

    # batch 1 through the registered streaming query (fresh table)
    REGISTRY["stream_curated_ingest"].spark(spark, str(src_dir)).collect()
    base = ("/tmp/xsarsea_stream_curated_"
            + hashlib.md5(str(src_dir).encode()).hexdigest()[:12])
    table_dir = os.path.join(base, "table")
    n1 = spark.read.parquet(table_dir).count()

    # batch 2: the FULL corpus (overlaps batch 1 by content); run the
    # same split-path ingest against the persisted table + sidecar
    docs.toPandas().to_parquet(src_dir / "documents2.parquet")
    # the sidecar is a JSON KV file (round 15) — rebuild the same
    # (word, bits) frame the ingest core probes with
    from xsarsea_spark.engine import load_kv_json
    bloom = spark.createDataFrame(
        [(int(w), int(b)) for w, b in load_kv_json(
            spark, os.path.join(base, "bloom.parquet"))],
        "word int, bits bigint")
    wmd5 = Window.partitionBy("digest").orderBy("doc_id")
    batch = (spark.read.parquet(str(src_dir / "documents2.parquet"))
             .filter("text IS NOT NULL AND n_chars >= 50")
             .withColumn("digest", F.expr("md5(text)"))
             .withColumn("__rn", F.row_number().over(wmd5))
             .filter("__rn = 1")
             .select("doc_id", "lang", "n_chars", "digest"))
    marked = bloom_mark(batch, bloom, "digest",
                        m_bits=ps._ING_BLOOM_BITS, k=ps._ING_BLOOM_K)
    fresh = marked.filter("NOT __maybe").drop("__maybe")
    maybe = marked.filter("__maybe").drop("__maybe")
    # every batch-1 duplicate must land in maybe (no false negatives)
    assert fresh.join(spark.read.parquet(table_dir).select("digest"),
                      on="digest").count() == 0
    checked = maybe.join(
        spark.read.parquet(table_dir).select("digest"),
        on="digest", how="left_anti")
    to_append = materialize(fresh.unionByName(checked))
    write_zordered(to_append, table_dir, ["n_chars", "doc_id"],
                   bits=ps._CUR_BITS, n_files=4, mode="append")
    final = spark.read.parquet(table_dir)
    assert final.count() == final.select("digest").distinct().count()
    assert final.count() > n1           # batch 2 added the new third
