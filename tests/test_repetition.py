"""Gopher repetition battery: hand-computed character fractions."""
from __future__ import annotations

import math


def test_repetition_signals_hand_computed(spark):
    from xsarsea_spark.pipeline.text import repetition_signals

    rows = [
        (1, "a b a b"),                      # 7 chars, 4 tokens
        (2, "a b c d e a b c d e x"),        # 21 chars, 11 tokens
        (3, "solo"),                         # 4 chars, 1 token
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_signals(df).collect()}

    r1 = out[1]
    # 2-grams: "a b" x2 (len 3) -> 6/7; 3-grams tie ("a b a",
    # "b a b") -> lexicographic "a b a" (len 5) -> 5/7; the single
    # 4-gram covers everything -> 7/7; no 5-grams
    assert math.isclose(r1["top2_char_frac"], 6 / 7)
    assert math.isclose(r1["top3_char_frac"], 5 / 7)
    assert math.isclose(r1["top4_char_frac"], 7 / 7)
    assert r1["dup5_char_frac"] == 0.0
    assert r1["repetition_pass"] is False

    r2 = out[2]
    # duplicated 5-gram "a b c d e" at positions {1, 6}: gap 5 <= n
    # merges into one span over tokens 1..10 -> 10 token chars + 9
    # separators = 19 of 21 chars; 6-grams are all unique
    assert math.isclose(r2["dup5_char_frac"], 19 / 21)
    assert r2["dup6_char_frac"] == 0.0

    r3 = out[3]
    # single token: no grams at any n -> all-zero metrics, pass
    assert r3["top2_char_frac"] == 0.0
    assert r3["dup10_char_frac"] == 0.0
    assert r3["repetition_pass"] is True


def test_repetition_plan_windows_doc_bounded(spark):
    """Plan check: every Window partitions by doc_id (document-
    bounded state), no cartesian product."""
    from xsarsea_spark.suite import REGISTRY

    plan = (REGISTRY["doc_gopher_repetition"]
            .spark(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    for ln in plan.splitlines():
        if "Window" in ln and "WindowGroupLimit" not in ln:
            assert "doc_id" in ln, ln
