"""spark.read.format("netcdf3"): the Python DataSource wrapping the
classic-NetCDF parser. Values are checked exactly against the arrays
the writer produced; the partitioned read must return the identical
row set as the single-partition read."""

from __future__ import annotations

import numpy as np
import pytest

from xsarsea_spark.sources.netcdf3 import write_netcdf3


@pytest.fixture(scope="module")
def nc_path(tmp_path_factory):
    rng = np.random.default_rng(7)
    inc = np.linspace(16.0, 50.0, 9)
    wspd = np.arange(3.0, 15.0, 1.5)
    sig = rng.normal(size=(9, 8)).astype(np.float64)
    nesz = (sig * 0.01 + 0.02).astype(np.float64)
    buf = write_netcdf3(
        {"incidence": 9, "wspd": 8},
        {
            "incidence": (("incidence",), {"units": "deg"}, inc),
            "wspd": (("wspd",), {"units": "m/s"}, wspd),
            "sigma0": (("incidence", "wspd"), {}, sig),
            "nesz": (("incidence", "wspd"), {}, nesz),
        },
        {"title": "synthetic"},
    )
    p = tmp_path_factory.mktemp("ncds") / "lut.nc"
    p.write_bytes(buf)
    return str(p), inc, wspd, sig, nesz


@pytest.fixture(scope="module")
def registered(spark):
    from xsarsea_spark.sources.spark_datasource import register_netcdf3

    register_netcdf3(spark)
    return spark


def test_reads_values_exactly(registered, nc_path):
    path, inc, wspd, sig, nesz = nc_path
    df = registered.read.format("netcdf3").load(path)
    assert df.columns == ["incidence_idx", "wspd_idx",
                          "incidence", "wspd", "sigma0", "nesz"]
    rows = df.collect()
    assert len(rows) == 9 * 8
    for r in rows:
        i, j = r["incidence_idx"], r["wspd_idx"]
        assert r["incidence"] == inc[i]
        assert r["wspd"] == wspd[j]
        assert r["sigma0"] == sig[i, j]
        assert r["nesz"] == nesz[i, j]


def test_partitioned_read_matches(registered, nc_path):
    path = nc_path[0]
    one = registered.read.format("netcdf3") \
        .option("partitions", "1").load(path)
    many = registered.read.format("netcdf3") \
        .option("partitions", "5").load(path)
    assert many.rdd.getNumPartitions() == 5
    a = sorted(map(tuple, one.collect()))
    b = sorted(map(tuple, many.collect()))
    assert a == b


def test_variable_selection_and_validation(registered, nc_path):
    path = nc_path[0]
    df = registered.read.format("netcdf3") \
        .option("variables", "nesz").load(path)
    assert df.columns[-1:] == ["nesz"]
    assert df.count() == 72
    with pytest.raises(Exception, match="unknown variables"):
        registered.read.format("netcdf3") \
            .option("variables", "nope").load(path).collect()
    with pytest.raises(Exception, match="dim-consistent"):
        registered.read.format("netcdf3") \
            .option("variables", "incidence,sigma0").load(path).collect()


def test_write_read_round_trip(registered, tmp_path):
    from pyspark.sql import functions as F

    src = registered.range(0, 1000, 1, 6).select(
        F.col("id").cast("double").alias("x"),
        (F.col("id") * 2).cast("int").alias("k"),
        F.expr("CAST(id AS DOUBLE) / 7").alias("v"),
    )
    out = str(tmp_path / "nc_out")
    src.write.format("netcdf3").mode("append").save(out)
    back = registered.read.format("netcdf3").load(out)
    import glob
    assert len(glob.glob(out + "/*.nc")) == 6     # one part per task
    got = sorted(map(tuple, back.select("x", "k", "v").collect()))
    want = sorted(map(tuple, src.collect()))
    assert got == want


def test_write_overwrite_replaces(registered, tmp_path):
    from pyspark.sql import functions as F

    out = str(tmp_path / "nc_ow")
    a = registered.range(5).select(
        F.col("id").cast("double").alias("x"))
    b = registered.range(100, 103).select(
        F.col("id").cast("double").alias("x"))
    a.write.format("netcdf3").mode("append").save(out)
    b.coalesce(1).write.format("netcdf3").mode("overwrite").save(out)
    got = sorted(r["x"] for r in
                 registered.read.format("netcdf3").load(out).collect())
    assert got == [100.0, 101.0, 102.0]


def test_write_rejects_strings(registered, tmp_path):
    df = registered.createDataFrame([("a", 1.0)], "s string, x double")
    with pytest.raises(Exception, match="unwritable type"):
        df.write.format("netcdf3").mode("append") \
            .save(str(tmp_path / "bad"))


def test_composes_with_sql(registered, nc_path):
    path, inc, wspd, sig, _ = nc_path
    from pyspark.sql import functions as F

    df = registered.read.format("netcdf3").load(path)
    got = (df.filter("incidence_idx = 3")
           .agg(F.sum("sigma0").alias("s")).collect()[0]["s"])
    assert got == pytest.approx(float(sig[3].sum()), rel=1e-12)
