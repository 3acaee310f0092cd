"""Engine materialization + conf-namespace tests.

The iterative operators (components, BPE, PageRank, SemDeDup) truncate
lineage via ``xsarsea_spark.engine.materialize``; these tests pin the
contract the 100x-scale story depends on:

- with no checkpoint dir configured, ``materialize`` localCheckpoints
  (no DFS I/O for single-node runs);
- with ``spark.xsarsea.checkpoint.dir`` set, it takes the reliable
  ``checkpoint()`` path — and the results are value-identical;
- an iterative operator (dup_components) produces the same labeling
  both ways;
- ``spark.xsarsea.*`` tunables default to the historical literals and
  are overridable at runtime without code edits.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from xsarsea_spark.engine import (
    CONF_CHECKPOINT_DIR,
    get_conf_int,
    materialize,
)


@pytest.fixture()
def ckpt_dir(spark):
    d = tempfile.mkdtemp(prefix="xsarsea-ckpt-")
    yield d
    spark.conf.unset(CONF_CHECKPOINT_DIR)
    # reset the context-level dir so later tests see the local path
    sc = spark.sparkContext
    getattr(sc._jsc.sc(), "checkpointDir_$eq")(
        sc._jvm.scala.Option.apply(None))
    shutil.rmtree(d, ignore_errors=True)


def test_materialize_local_by_default(spark):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    out = materialize(df)
    assert out.count() == 100
    # localCheckpoint leaves the context checkpoint dir unset
    assert spark.sparkContext.getCheckpointDir() is None


def test_materialize_reliable_when_dir_configured(spark, ckpt_dir):
    spark.conf.set(CONF_CHECKPOINT_DIR, ckpt_dir)
    df = spark.range(100).withColumn("v", F.col("id") * 3)
    out = materialize(df)
    assert out.count() == 100
    # the reliable path set the context dir and wrote RDD blocks there
    assert ckpt_dir in (spark.sparkContext.getCheckpointDir() or "")
    import os
    written = [
        f for root, _, files in os.walk(ckpt_dir) for f in files
    ]
    assert written, "reliable checkpoint wrote no block files"


def test_iterative_operator_identical_both_ways(spark, ckpt_dir):
    from xsarsea_spark.pipeline.sampling import dup_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)],
        "id_a int, id_b int",
    )
    # force the distributed label-propagation path so materialize is
    # actually in the loop (driver union-find would bypass it)
    spark.conf.set("spark.xsarsea.components.localThreshold", "0")
    try:
        local = sorted(
            tuple(r) for r in dup_components(pairs).collect())
        spark.conf.set(CONF_CHECKPOINT_DIR, ckpt_dir)
        reliable = sorted(
            tuple(r) for r in dup_components(pairs).collect())
    finally:
        spark.conf.unset("spark.xsarsea.components.localThreshold")
    assert local == reliable
    assert local == [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10),
                     (20, 20), (21, 20), (22, 20)]


def test_conf_defaults_match_literals(spark):
    # defaults must equal the historical literals so behavior is
    # unchanged on deployments that set nothing
    assert get_conf_int(
        spark, "spark.xsarsea.components.localThreshold", 2_000_000
    ) == 2_000_000
    assert get_conf_int(spark, "spark.xsarsea.gradients.tile", 512) == 512
    assert get_conf_int(spark, "spark.xsarsea.gradients.halo", 32) == 32
    spark.conf.set("spark.xsarsea.gradients.tile", "256")
    try:
        assert get_conf_int(
            spark, "spark.xsarsea.gradients.tile", 512) == 256
    finally:
        spark.conf.unset("spark.xsarsea.gradients.tile")


def test_gradients_tile_conf_round_trip(spark):
    """local_gradients with conf-set tile == explicit-kwarg tile."""
    import numpy as np

    from xsarsea_spark.operators.gradients import local_gradients

    rng = np.random.default_rng(7)
    n = 64
    vals = rng.uniform(0.01, 1.0, size=(n, n))
    rows = [(int(i), int(j), float(vals[i, j]))
            for i in range(n) for j in range(n)]
    px = spark.createDataFrame(rows, "line int, sample int, sigma0 double")

    want = local_gradients(px, n, n, tile=32, halo=20).orderBy(
        "line4", "sample4").collect()
    spark.conf.set("spark.xsarsea.gradients.tile", "32")
    spark.conf.set("spark.xsarsea.gradients.halo", "20")
    try:
        got = local_gradients(px, n, n).orderBy(
            "line4", "sample4").collect()
    finally:
        spark.conf.unset("spark.xsarsea.gradients.tile")
        spark.conf.unset("spark.xsarsea.gradients.halo")
    assert got == want


def test_scratch_path_respects_conf_and_isolates_keys(spark):
    from xsarsea_spark.engine import scratch_path

    default = scratch_path(spark, "idx", "/data/a")
    assert default.startswith("/tmp/xsarsea_idx_")
    assert default != scratch_path(spark, "idx", "/data/b")
    spark.conf.set("spark.xsarsea.scratch.dir", "/tmp/sessA/")
    try:
        moved = scratch_path(spark, "idx", "/data/a")
        assert moved.startswith("/tmp/sessA/xsarsea_idx_")
        assert moved.rsplit("_", 1)[1] == default.rsplit("_", 1)[1]
    finally:
        spark.conf.unset("spark.xsarsea.scratch.dir")
