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
