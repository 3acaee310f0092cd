"""UniMax water-filling semantics + DSIR weight sanity."""
from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def _waterfill_reference(avails: list[int], budget: int) -> int:
    """Brute-force max integer v with sum(min(a, v)) <= budget."""
    hi = max(avails + [budget])
    v = 0
    for cand in range(0, hi + 1):
        if sum(min(a, cand) for a in avails) <= budget:
            v = cand
    return v


@given(st.lists(st.integers(min_value=1, max_value=40),
                min_size=1, max_size=6),
       st.integers(min_value=0, max_value=200))
@settings(max_examples=100, deadline=None)
def test_waterfill_candidate_formula_matches_bruteforce(avails,
                                                        budget):
    """The candidate-level formula the operator and oracle share —
    v = max feasible c_k, c_k = (B - sum smaller) // (ranks >= k),
    negatives clamped — yields the same per-language ALLOCATION as
    the brute-force maximal level. (The levels themselves differ
    only when the budget saturates the corpus, where every level
    past max(avail) allocates identically.)"""
    s = sorted(avails)
    L = len(s)
    cands = []
    for k in range(1, L + 1):
        sk = sum(s[:k - 1])
        cands.append(max(budget - sk, 0) // (L - k + 1))
    feas = [c for c in cands
            if sum(min(a, c) for a in s) <= budget]
    assert feas, (avails, budget)
    v = max(feas)
    v_ref = _waterfill_reference(s, budget)
    assert [min(a, v) for a in s] == [min(a, v_ref) for a in s]


def test_unimax_operator_semantics(spark):
    from xsarsea_spark.pipeline.sampling import unimax_language_cap

    rows = [(i, lang, n) for i, (lang, n) in enumerate([
        ("en", 50), ("en", 60), ("en", 70),     # avail 180
        ("de", 20), ("de", 25),                 # avail 45
        ("fr", 5),                              # avail 5
    ])]
    pd = spark.createDataFrame(
        rows, "doc_id long, lang string, n_tokens long")
    # budget 100: v = max integer with min(5,v)+min(45,v)+min(180,v)
    # <= 100 -> v = 50 (5 + 45 + 50 = 100 exactly); caps: en 50,
    # de 45, fr 5
    out = unimax_language_cap(pd, budget=100).collect()
    caps = {r["lang"]: r["lang_cap"] for r in out}
    assert caps == {"en": 50, "de": 45, "fr": 5}
    kept = {r["doc_id"]: r["kept"] for r in out}
    # de and fr fit fully; en keeps exactly its first doc in hash
    # order (any two en docs already exceed the 50-token cap)
    assert all(kept[i] for i in (3, 4, 5))
    assert sum(1 for i in (0, 1, 2) if kept[i]) == 1
    # budget beyond total -> everything kept
    out2 = unimax_language_cap(pd, budget=10_000).collect()
    assert all(r["kept"] for r in out2)
    assert {r["lang"]: r["lang_cap"] for r in out2} == \
        {"en": 180, "de": 45, "fr": 5}


def test_unimax_equal_languages_exact_fit(spark):
    """Collision regression (code-review find): two languages with
    EQUAL avail produce the same candidate level; without dedup the
    feasibility sum counted each language's min() twice, rejected
    every level, and an exactly-fitting budget kept only first docs."""
    from xsarsea_spark.pipeline.sampling import unimax_language_cap

    rows = [(0, "en", 4), (1, "en", 6), (2, "de", 7), (3, "de", 3)]
    pd = spark.createDataFrame(
        rows, "doc_id long, lang string, n_tokens long")
    out = unimax_language_cap(pd, budget=20).collect()
    assert {r["lang"]: r["lang_cap"] for r in out} == \
        {"en": 10, "de": 10}
    assert all(r["kept"] for r in out)


def test_dsir_weights_prefer_target_like_docs(spark):
    """Docs sharing the target subset's n-grams must outscore docs
    made of raw-only n-grams."""
    from pyspark.sql import functions as F

    from xsarsea_spark.pipeline.dsir import dsir_logweights

    rows = (
        [(i, "alpha beta gamma delta", True) for i in range(8)]
        + [(100 + i, "alpha beta gamma delta", False)
           for i in range(2)]
        + [(200 + i, "zig zag zog zug", False) for i in range(8)]
    )
    d = spark.createDataFrame(
        rows, "doc_id long, text string, is_target boolean")
    got = {r["doc_id"]: float(r["logw"])
           for r in dsir_logweights(d).collect()}
    # target-like raw docs score higher than raw-only docs
    assert got[100] > got[200]
    # identical text -> identical weight regardless of membership
    assert got[0] == got[100]


def test_temperature_apportionment_sums_to_budget(spark):
    """Largest-remainder apportionment: per-language budgets sum to
    EXACTLY the total budget, and the allocation matches a
    brute-force Hamilton apportionment of the same quotas."""
    from xsarsea_spark.suite import REGISTRY
    from xsarsea_spark.suite.pipeline_suite import (_TMP_BUDGET,
                                                    _TMP_T)

    out = (REGISTRY["doc_lang_temperature_mix"]
           .spark(spark, "/root/testdata/sf0.001").collect())
    budgets = {r["lang"]: r["lang_budget"] for r in out}
    assert sum(budgets.values()) == _TMP_BUDGET
    # brute-force Hamilton from the reported avail tokens
    import math
    avail = {r["lang"]: r["tokens_total"] for r in out}
    w = {lg: round(a ** (1.0 / _TMP_T), 9) for lg, a in avail.items()}
    sw = sum(w.values())
    quota = {lg: _TMP_BUDGET * wv / sw for lg, wv in w.items()}
    base = {lg: math.floor(q) for lg, q in quota.items()}
    left = _TMP_BUDGET - sum(base.values())
    order = sorted(quota, key=lambda lg: (-(quota[lg] - base[lg]), lg))
    for lg in order[:left]:
        base[lg] += 1
    assert budgets == base, (budgets, base)


def test_dsir_threshold_empty_history_is_one_row_admit_all(spark):
    """The 1-row contract must hold for an EMPTY history: a 0-row
    threshold frame crossJoined into an ingest prep would silently
    drop every micro-batch forever. Empty history -> one row with a
    NULL threshold (= admit everything)."""
    from xsarsea_spark.pipeline.dsir import dsir_threshold

    empty = spark.createDataFrame([], "doc_id long, logw double")
    rows = dsir_threshold(empty).collect()
    assert len(rows) == 1
    assert rows[0]["__thr"] is None
