"""File-backed LUT converters + registry + multimodal plumbing."""

from __future__ import annotations

import os
import pickle

import numpy as np
import pytest

from xsarsea_spark.sources.luts import (
    cmod7_to_parquet,
    infer_axis,
    npy_lut_to_parquet,
    read_lut_parquet,
)
from xsarsea_spark.sources.registry import default_catalog


def test_cmod7_binary_roundtrip(spark, tmp_path):
    # synthetic cmod7-shaped Fortran binary: head + 250*73*51 + tail
    m, n, p = 250, 73, 51
    rng = np.random.default_rng(3)
    body = rng.uniform(1e-4, 0.5, m * n * p).astype(np.float32)
    raw = np.concatenate([[np.float32(0)], body, [np.float32(0)]])
    path = tmp_path / "gmf_cmod7_vv.dat_little_endian"
    raw.tofile(path)

    out = str(tmp_path / "cmod7_lut")
    meta = cmod7_to_parquet(spark, str(path), out)
    assert meta["axes"]["wspd"] == {"x0": 0.2, "hi": 50.0, "step": 0.2,
                                    "n": 250}
    df, meta2 = read_lut_parquet(spark, out)
    assert meta2["dims"] == ["incidence", "wspd", "phi"]
    assert df.count() == m * n * p
    # spot-check one cell against the Fortran-order reshape
    cell = df.filter("incidence_idx = 5 AND wspd_idx = 7 AND phi_idx = 11") \
             .collect()[0]
    expect = body.reshape((m, n, p), order="F")[7, 11, 5]
    assert cell.sigma0 == pytest.approx(float(expect), rel=1e-7)
    assert cell.incidence == 21.0 and cell.phi == 27.5


def test_npy_lut_roundtrip(spark, tmp_path):
    inc = np.arange(17.0, 50.0 + 0.5, 0.5)
    wspd = np.arange(3.0, 80.0 + 0.2, 0.2)
    rng = np.random.default_rng(4)
    # stored as (incidence, wspd) then np.load + transpose in reader
    sig = rng.uniform(-40, -10, (len(inc), len(wspd)))
    d = tmp_path / "GMF_test"
    d.mkdir()
    np.save(d / "sigma.npy", sig)
    with open(d / "incidence_angle.pkl", "wb") as f:
        pickle.dump(inc, f)
    with open(d / "wind_speed.pkl", "wb") as f:
        pickle.dump(wspd, f)

    out = str(tmp_path / "npy_lut")
    meta = npy_lut_to_parquet(spark, str(d), out, model="test_lut")
    assert meta["axes"]["incidence"]["step"] == 0.5
    df, _ = read_lut_parquet(spark, out)
    got = df.filter("incidence_idx = 3 AND wspd_idx = 9").collect()[0]
    # reader: transpose(np.load) -> (wspd, inc); transpose back
    assert got.sigma0 == pytest.approx(sig[3, 9])


def test_infer_axis_rounding():
    ax = infer_axis(np.arange(0.0, 180.0 + 2.5, 2.5))
    assert ax == {"x0": 0.0, "hi": 180.0, "step": 2.5, "n": 73}


def test_registry_alias_and_get():
    cat = default_catalog()
    cat.register_parquet_lut("nc_lut_cmod5n", "/tmp/nc_cmod5n", pol="VV")
    # gmf (priority 3) beats file lut (priority 10) for the alias
    assert cat.get("cmod5n").name == "gmf_cmod5n"
    assert cat.get("nc_lut_cmod5n").kind == "parquet_lut"
    with pytest.raises(KeyError):
        cat.get("no_such_model")


def test_multimodal_batch_shape(spark, tmp_path):
    from xsarsea_spark.pipeline.multimodal import (attach_payload,
                                                   decode_image,
                                                   extract_features)
    import pandas as pd

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2], "text": ["hello world", "abc"],
        "source": ["s1", "s2"],
    }))
    feats = extract_features(attach_payload(docs)).collect()
    assert len(feats) == 2
    r = {f.doc_id: f for f in feats}
    assert r[1].n_bytes == 11
    assert len(r[1].byte_hist) == 16
    assert abs(sum(r[1].byte_hist) - 1.0) < 1e-12
    assert 32 <= r[1].fake_width < 512
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_partitioned_and_tiled_sinks(spark, tmp_path):
    import pandas as pd

    from xsarsea_spark.sources.sinks import (write_partitioned,
                                             write_scene_tiled)

    pdf = pd.DataFrame({
        "line": list(range(8)) * 2, "sample": [0] * 8 + [1] * 8,
        "pol": ["VV", "VH"] * 8, "sigma0": [0.01 * i for i in range(16)],
    })
    df = spark.createDataFrame(pdf)
    p1 = str(tmp_path / "part")
    write_partitioned(df, p1, ["pol"])
    back = spark.read.parquet(p1)
    # partition pruning: the pol filter reads only one directory
    plan = back.filter("pol = 'VV'")._jdf.queryExecution() \
        .executedPlan().toString()
    assert back.filter("pol = 'VV'").count() == 8

    p2 = str(tmp_path / "tiled")
    write_scene_tiled(df, p2, tile=4)
    tiled = spark.read.parquet(p2)
    assert "tile_line" in tiled.columns
    assert tiled.count() == 16
    assert tiled.filter("tile_line = 0").count() == 8


def test_bucketed_join_no_shuffle(spark, tmp_path):
    import pandas as pd

    from xsarsea_spark.sources.sinks import write_bucketed

    a = spark.createDataFrame(pd.DataFrame(
        {"k": range(100), "x": range(100)}))
    b = spark.createDataFrame(pd.DataFrame(
        {"k": range(100), "y": range(100)}))
    try:
        write_bucketed(a, "t_a", "k", n_buckets=4)
        write_bucketed(b, "t_b", "k", n_buckets=4)
        j = spark.table("t_a").join(spark.table("t_b"), on="k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert j.count() == 100
        # co-bucketed join: no exchange on either side
        assert "Exchange hashpartitioning" not in plan
    finally:
        # managed tables: DROP removes the data directories
        spark.sql("DROP TABLE IF EXISTS t_a")
        spark.sql("DROP TABLE IF EXISTS t_b")


def test_zorder_sql_matches_python(spark):
    """The SQL bit-interleave must equal a straightforward Python
    Morton encode, in Spark (DuckDB equality is covered by the
    q_zorder_profile oracle row)."""
    from xsarsea_spark.sources.sinks import zorder_sql

    rows = [(3, 5), (0, 0), (1023, 1), (7, 1024)]
    df = spark.createDataFrame(rows, "a LONG, b LONG")
    got = {(r.a, r.b): r.z for r in df.selectExpr(
        "a", "b", f"{zorder_sql(['a', 'b'], bits=11)} AS z").collect()}

    def morton(a, b, bits=11):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    for a, b in rows:
        assert got[(a, b)] == morton(a, b)


def test_write_zordered_roundtrip(spark, tmp_path):
    """Z-ordered write preserves the data and tightens per-file key
    spans vs the row count split naively."""
    from pyspark.sql import functions as F

    from xsarsea_spark.sources.sinks import write_zordered

    df = spark.range(4096).selectExpr(
        "id % 64 AS x", "id DIV 64 AS y", "id AS payload")
    out = str(tmp_path / "zorder")
    write_zordered(df, out, ["x", "y"], bits=6, n_files=16)
    back = spark.read.parquet(out)
    assert back.count() == 4096
    assert {r.payload for r in back.collect()} == set(range(4096))
    spans = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(((F.max("x") - F.min("x") + 1)
              * (F.max("y") - F.min("y") + 1)).alias("area"))
        .collect()
    )
    # each file covers a small rectangle of the 64x64 grid, far under
    # the full plane a value-ordered split would smear across
    assert max(r.area for r in spans) <= 1024


def test_write_zordered_append_batch(spark, tmp_path):
    """Append mode adds a z-clustered batch without touching existing
    files: content is the union, and the appended batch's files are
    tight key rectangles too (per-ingest OPTIMIZE shape)."""
    from pyspark.sql import functions as F

    from xsarsea_spark.sources.sinks import write_zordered

    df = spark.range(4096).selectExpr(
        "id % 64 AS x", "id DIV 64 AS y", "id AS payload")
    out = str(tmp_path / "zorder_append")
    write_zordered(df.filter("payload < 2048"), out, ["x", "y"],
                   bits=6, n_files=8)
    first_files = {r.f for r in spark.read.parquet(out).select(
        F.input_file_name().alias("f")).distinct().collect()}
    write_zordered(df.filter("payload >= 2048"), out, ["x", "y"],
                   bits=6, n_files=8, mode="append")
    back = spark.read.parquet(out)
    assert {r.payload for r in back.collect()} == set(range(4096))
    # existing files untouched by the append
    assert first_files < {r.f for r in back.select(
        F.input_file_name().alias("f")).distinct().collect()}
    spans = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(((F.max("x") - F.min("x") + 1)
              * (F.max("y") - F.min("y") + 1)).alias("area"))
        .collect()
    )
    assert max(r.area for r in spans) <= 1024


def test_zorder_layout_skips_files(spark, tmp_path):
    """The point of the z-layout: under a selective predicate on
    EITHER key dimension, the set of files containing matching rows
    is a small fraction of the table — whereas a single-column
    value-sorted layout only localizes its sort key. Checked by
    counting distinct input files per matched row set."""
    from pyspark.sql import functions as F

    from xsarsea_spark.sources.sinks import write_zordered

    df = spark.range(1 << 14).selectExpr(
        "CAST(id % 128 AS BIGINT) AS x",
        "CAST(id DIV 128 AS BIGINT) AS y",
        "id AS payload")
    zdir = str(tmp_path / "zed")
    vdir = str(tmp_path / "valsorted")
    write_zordered(df, zdir, ["x", "y"], bits=7, n_files=32)
    # contrast layout: sorted by x only, same file count
    (df.repartitionByRange(32, "x").sortWithinPartitions("x")
       .write.mode("overwrite").parquet(vdir))

    def files_touched(path: str, pred: str) -> int:
        return (spark.read.parquet(path).filter(pred)
                .select(F.input_file_name()).distinct().count())

    pred_x = "x BETWEEN 40 AND 47"     # 1/16 of the x range
    pred_y = "y BETWEEN 40 AND 47"     # 1/16 of the y range
    # x-selective: both layouts localize x
    assert files_touched(zdir, pred_x) <= 12
    assert files_touched(vdir, pred_x) <= 12
    # y-selective: ONLY the z-layout localizes y — the value-sorted
    # layout smears every y across all files
    z_y = files_touched(zdir, pred_y)
    v_y = files_touched(vdir, pred_y)
    assert z_y <= 12
    assert v_y == 32
    assert z_y * 2 < v_y
