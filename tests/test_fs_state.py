"""Hadoop-FS state helpers: DFS-capable paths (URI form), exact
round-trips, and the ingest core running against a ``file://`` URI
root — the conf-switched proof that the exactly-once state machinery
no longer needs ``os``/``shutil`` local paths."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from xsarsea_spark.engine import (fs_exists, fs_list_names,
                                  fs_read_text, fs_write_text,
                                  load_kv_json, save_kv_json)
from xsarsea_spark.pipeline.ingest import ingest_curated_batch


def test_kv_json_roundtrip_exact_under_uri(spark, tmp_path):
    base = f"file://{tmp_path}/state"
    vals = [1 / 3, 2.0 ** -45, 1.7976931348623157e308, -0.0,
            5e-324, 0.1 + 0.2]
    save_kv_json(spark, vals, f"{base}/v0")
    back = load_kv_json(spark, f"{base}/v0")
    assert all(a == b and math.copysign(1, a) == math.copysign(1, b)
               for a, b in zip(vals, back))
    assert fs_list_names(spark, base) == ["v0"]
    assert fs_list_names(spark, f"{base}/nope") == []


def test_text_marker_roundtrip_uri(spark, tmp_path):
    p = f"file://{tmp_path}/marker.txt"
    fs_write_text(spark, p, "a\nb\nc")
    assert fs_exists(spark, p)
    assert fs_read_text(spark, p) == "a\nb\nc"
    # overwrite is atomic-by-rename: the new content fully replaces
    fs_write_text(spark, p, "x")
    assert fs_read_text(spark, p) == "x"


def test_ingest_curated_batch_under_uri_root(spark, tmp_path):
    base = f"file://{tmp_path}/ingest"
    table_dir = f"{base}/table"
    bloom_path = f"{base}/bloom.parquet"
    marker_path = f"{base}/bloom_sync.txt"
    kw = dict(min_chars=0, zcols=["n_chars", "doc_id"], zbits=8,
              m_bits=1 << 12, k=3, n_files=2)

    def batch(lo, hi):
        return spark.createDataFrame(
            [(i, "en", 5, f"text {i % 7}") for i in range(lo, hi)],
            "doc_id bigint, lang string, n_chars bigint, text string")

    ingest_curated_batch(spark, batch(0, 20), table_dir, bloom_path,
                         marker_path, **kw)
    ingest_curated_batch(spark, batch(20, 40), table_dir, bloom_path,
                         marker_path, **kw)
    got = spark.read.parquet(table_dir)
    # 7 distinct digests total; batch 2 adds nothing (same 7 texts)
    assert got.count() == 7
    assert (got.groupBy("digest").count()
            .agg(F.max("count")).first()[0] == 1)
    assert fs_exists(spark, marker_path)
