"""Bucketized interval-overlap join: boundary cases the events corpus
can't reliably exercise (bucket-straddling pairs, multi-bucket
intervals, touching-but-not-overlapping endpoints, zero length)."""
from __future__ import annotations


def _run(spark, rows, B=100):
    from pyspark.sql import functions as F

    i = spark.createDataFrame(rows, "event_id long, s_us long,"
                                    " e_us long")
    a = i.selectExpr("event_id", "s_us", "e_us",
                     f"explode(sequence(s_us div {B},"
                     f" e_us div {B})) AS bkt")
    b = a.selectExpr("event_id AS eb", "s_us AS sb",
                     "e_us AS eb_us", "bkt")
    pairs = (a.join(b, on="bkt")
             .filter("event_id != eb AND s_us < eb_us AND sb < e_us"
                     f" AND bkt = greatest(s_us, sb) div {B}"))
    deg = pairs.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n"))
    out = {r["event_id"]: r["n"] for r in deg.collect()}
    return {r[0]: out.get(r[0], 0) for r in rows}


def test_overlap_degrees_match_brute_force(spark):
    rows = [
        (1, 0, 250),        # covers buckets 0,1,2
        (2, 240, 260),      # overlaps 1 across a bucket line
        (3, 250, 300),      # touches 1 at 250 -> NOT overlapping
        (4, 95, 105),       # straddles buckets 0/1, overlaps 1
        (5, 400, 400),      # zero length: a point event
        (6, 390, 410),      # strictly contains the point event 5
        (7, 1000, 1500),    # far away, alone
    ]
    got = _run(spark, rows)
    brute = {}
    for e1, s1, t1 in rows:
        brute[e1] = sum(
            1 for e2, s2, t2 in rows
            if e2 != e1 and s1 < t2 and s2 < t1)
    assert got == brute
    # 1 overlaps {2, 4}; 3 touches 1 at 250 (half-open: no) but does
    # overlap 2; a zero-length point STRICTLY INSIDE an interval
    # counts (s1 < e2 and s2 < e1 holds) — but two touching proper
    # intervals never do; the far-away interval sees nothing
    assert got[1] == 2 and got[3] == 1
    assert got[5] == 1 and got[7] == 0
