"""Text-pipeline edge cases the sf corpora can't reach (their minimum
document is ~10 tokens): docs with 0/1/2 tokens must neither crash the
Spark HOF expressions (sequence(1, 0) inverts and indexes element 0)
nor diverge from the DuckDB oracle's end-exclusive range() semantics.
"""

from __future__ import annotations

import math

import duckdb
import pytest

_SHORT_DOCS = [
    (1, "one"),
    (2, "two words"),
    (3, ""),
    (4, "a b c"),
    (5, "x x"),
    (6, " ".join(["tok"] * 60)),
]


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 12)
    return v


@pytest.fixture(scope="module")
def gopher_results(spark):
    from xsarsea_spark.pipeline.text import gopher_quality
    from xsarsea_spark.suite.pipeline_suite import _GOPHER_ORACLE

    docs = spark.createDataFrame(_SHORT_DOCS, "doc_id int, text string")
    cols = ["doc_id", "top_unigram_frac", "top_bigram_frac",
            "dup_trigram_frac", "mean_token_len", "gopher_keep"]
    sp = {r["doc_id"]: tuple(_norm(r[c]) for c in cols[1:])
          for r in gopher_quality(docs).select(*cols).collect()}

    con = duckdb.connect()
    values = ", ".join(f"({i}, '{t}')" for i, t in _SHORT_DOCS)
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM (VALUES {values}) AS t(doc_id, text)")
    du = {row[0]: tuple(_norm(v) for v in row[1:])
          for row in con.sql(_GOPHER_ORACLE).fetchall()}
    con.close()
    return sp, du


def test_gopher_short_docs_no_crash(gopher_results):
    sp, _ = gopher_results
    assert len(sp) == len(_SHORT_DOCS)
    # 1-token doc: no bigrams/trigrams -> NULL ratios, keep=False
    assert sp[1][1] is None and sp[1][2] is None and sp[1][4] is False
    # 2-token doc: one bigram, no trigrams
    assert sp[2][1] == 1.0 and sp[2][2] is None
    # long doc still evaluates normally
    assert sp[6][0] == 1.0 and sp[6][4] is False


def test_gopher_short_docs_match_oracle(gopher_results):
    sp, du = gopher_results
    assert set(sp) == set(du)
    for doc_id in sorted(sp):
        assert sp[doc_id] == du[doc_id], (
            f"doc {doc_id}: spark={sp[doc_id]} duckdb={du[doc_id]}")


# ----------------------------------------------------------------------
# duplicate_spans: planted-span boundary checks (the sf corpora only
# exercise whole-doc duplicates, so maximal-span merge logic needs
# synthetic overlap cases).
# ----------------------------------------------------------------------


def test_duplicate_spans_planted(spark):
    from xsarsea_spark.pipeline.text import duplicate_spans

    uniq_a = " ".join(f"a{i}" for i in range(10))
    uniq_b = " ".join(f"b{i}" for i in range(7))
    shared = " ".join(f"s{i}" for i in range(12))   # 12 shared tokens
    docs = spark.createDataFrame(
        [
            # doc 1: shared run at token offset 10
            (1, uniq_a + " " + shared + " " + uniq_b),
            # doc 2: same run at token offset 0
            (2, shared + " " + uniq_a.replace("a", "c")),
            # doc 3: nothing shared, > n tokens
            (3, " ".join(f"z{i}" for i in range(20))),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            duplicate_spans(docs, n=4).collect()}
    # doc 3 has no duplicated grams at all
    assert 3 not in rows and len(rows) == 2
    # 12 shared tokens -> 9 consecutive duplicated 4-gram positions
    # merging into ONE maximal span of 12 tokens
    assert rows[1]["span_start"] == 10 and rows[1]["span_end"] == 21
    assert rows[2]["span_start"] == 0 and rows[2]["span_end"] == 11
    for d in (1, 2):
        assert rows[d]["n_dup_grams"] == 9
        assert rows[d]["span_tokens"] == 12


def test_duplicate_spans_split_runs(spark):
    from xsarsea_spark.pipeline.text import duplicate_spans

    run1 = " ".join(f"p{i}" for i in range(5))
    run2 = " ".join(f"q{i}" for i in range(5))
    docs = spark.createDataFrame(
        [
            # two separated duplicated runs -> two island rows
            (1, run1 + " gap1 gap2 gap3 gap4 gap5 " + run2),
            (2, run1 + " other tokens entirely here now " + run2),
        ],
        "doc_id long, text string",
    )
    spans = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_spans(docs, n=5).collect())
    assert spans == [(1, 0, 4), (1, 10, 14), (2, 0, 4), (2, 10, 14)]


def test_duplicate_spans_maximal_within_doc_repeat(spark):
    """A passage repeated WITHIN one document is invisible to the
    cross-doc variant (distinct-doc count = 1) but is exactly what
    the Lee et al. total-occurrence path must cut."""
    from xsarsea_spark.pipeline.text import (duplicate_spans,
                                             duplicate_spans_maximal)

    rep = " ".join(f"r{i}" for i in range(6))       # 6-token passage
    filler = " ".join(f"f{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(1, rep + " " + filler + " " + rep),
         (2, " ".join(f"z{i}" for i in range(20)))],
        "doc_id long, text string",
    )
    assert duplicate_spans(docs, n=4).count() == 0
    rows = sorted((r["doc_id"], r["span_start"], r["span_end"],
                   r["n_dup_grams"])
                  for r in duplicate_spans_maximal(docs, n=4).collect())
    # both copies: 3 duplicated 4-gram starts each (offsets 0-2 and
    # 14-16), extents merge into the two 6-token passages
    assert rows == [(1, 0, 5, 3), (1, 14, 19, 3)]


def test_duplicate_spans_maximal_interval_union(spark):
    """Hits with a start gap <= n have touching extents and must fuse
    into ONE maximal span (the islands variant emits two overlapping
    spans here)."""
    from xsarsea_spark.pipeline.text import (duplicate_spans,
                                             duplicate_spans_maximal)

    g1 = " ".join(f"a{i}" for i in range(4))        # dup 4-gram #1
    g2 = " ".join(f"b{i}" for i in range(4))        # dup 4-gram #2
    # fillers are unique PER DOC so boundary-crossing grams are never
    # accidentally duplicated
    docs = spark.createDataFrame(
        [
            # hits at p=0 and p=7: gap 7 > n=4 -> two separate spans
            (1, g1 + " u1 u2 u3 " + g2),
            # adjacent g1 g2: hits at p=0 and p=4, gap 4 <= n=4 ->
            # extents [0,3] + [4,7] touch -> ONE maximal span
            (2, g1 + " " + g2),
        ],
        "doc_id long, text string",
    )
    got = sorted((r["doc_id"], r["span_start"], r["span_end"])
                 for r in duplicate_spans_maximal(docs, n=4).collect())
    assert got == [(1, 0, 3), (1, 7, 10), (2, 0, 7)]
    # the islands (cross-doc, consecutive-run) variant splits doc 2's
    # non-consecutive hits into two overlapping spans — the exact
    # behavior the maximal variant fixes
    old = sorted((r["doc_id"], r["span_start"], r["span_end"])
                 for r in duplicate_spans(docs, n=4).collect()
                 if r["doc_id"] == 2)
    assert old == [(2, 0, 3), (2, 4, 7)]


def test_winnowing_guarantee_and_density(spark):
    """The winnowing theorem: two docs sharing a token run of length
    >= w + k - 1 MUST share a fingerprint hash; and selection density
    is bounded (at most one fingerprint per window position)."""
    from xsarsea_spark.pipeline.text import winnow_fingerprints

    k, w = 5, 4
    shared = " ".join(f"s{i}" for i in range(w + k - 1))  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, "a1 a2 a3 a4 " + shared + " a5 a6 a7 a8"),
            (2, "b1 b2 " + shared + " b3 b4 b5 b6 b7 b8 b9"),
            (3, " ".join(f"c{i}" for i in range(20))),  # no overlap
        ],
        "doc_id long, text string",
    )
    fp = winnow_fingerprints(docs, k=k, w=w).collect()
    by_doc: dict[int, set] = {}
    for r in fp:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp_hash"])
    assert by_doc[1] & by_doc[2], "shared 8-token run must share a fp"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])
    # density: never more fingerprints than valid window positions
    n_tokens = 4 + (w + k - 1) + 4
    n_windows = (n_tokens - k + 1) - (w - 1)
    assert len([r for r in fp if r["doc_id"] == 1]) <= n_windows


def test_winnow_oversize_doc_raises_not_silently_dropped(spark):
    """A document past the 2^20-token position-encoding cap must
    RAISE in-plan — an unindexable doc that silently emits zero
    fingerprints could never match anything and the pipeline would
    read that as 'unique'."""
    import pytest

    from xsarsea_spark.pipeline.text import winnow_fingerprints

    big = " ".join(f"t{i % 7}" for i in range((1 << 20) + 4))
    docs = spark.createDataFrame(
        [(1, big)], "doc_id long, text string")
    with pytest.raises(Exception, match="position-encoding cap"):
        winnow_fingerprints(docs, k=5, w=4).collect()


def test_winnow_cap_is_free_for_normal_docs(spark):
    from xsarsea_spark.pipeline.text import winnow_fingerprints

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "a b c d e f g h i j")],
        "doc_id long, text string")
    fp = winnow_fingerprints(docs, k=3, w=3).collect()
    assert fp
    by_doc = {}
    for r in fp:
        by_doc.setdefault(r["doc_id"], set()).add(
            (r["pos"], r["fp_hash"]))
    assert by_doc[1] == by_doc[2]


def test_mixture_reweight_semantics(spark):
    """DoReMi-tilt invariants on the real suite query: weights form
    a distribution, and the tilt is monotone — a source with larger
    excess loss gets a strictly larger weight-to-baseline ratio
    (that ratio IS exp(eta * excess) up to the shared normalizer)."""
    from xsarsea_spark.suite import REGISTRY

    rows = REGISTRY["doc_mixture_reweight"].spark(
        spark, "/root/testdata/sf0.001").collect()
    assert len(rows) >= 2
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-9
    assert all(r["weight"] > 0 for r in rows)
    assert abs(sum(r["base_frac"] for r in rows) - 1.0) < 1e-9
    by_excess = sorted(rows, key=lambda r: r["excess"])
    ratios = [r["weight"] / r["base_frac"] for r in by_excess]
    assert all(a < b + 1e-12 for a, b in zip(ratios, ratios[1:])), \
        "tilt must be monotone in excess loss"


def test_kn_heldout_lm_matches_hand_formula(spark):
    """Interpolated KN on a tiny corpus == the formula computed by
    hand from train counts: discounted ML + backoff weight *
    continuation for seen histories, pure (floored) continuation for
    unseen ones."""
    import math

    from xsarsea_spark.suite import REGISTRY
    from xsarsea_spark.sources.tables import TABLES  # noqa: F401

    # train = even ids, heldout = odd ids
    rows = [
        (0, "a b a b a c"),          # train
        (2, "a b c a"),              # train
        (1, "a b zz c"),             # heldout: seen, OOV-history, ...
    ]
    import pandas as pd
    docs = spark.createDataFrame(
        [(i, t, "src0", "en") for i, t in rows],
        "doc_id long, text string, source string, lang string")

    # replicate the suite query on this frame via its machinery
    from xsarsea_spark.suite.pipeline_suite import _kn_term
    from xsarsea_spark.pipeline.text import bigrams
    from pyspark.sql import functions as F

    train = docs.filter("doc_id % 2 = 0")
    held = docs.filter("doc_id % 2 = 1")
    tbg = bigrams(train)
    c12 = tbg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = tbg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"),
                               F.countDistinct("w2").alias("n1w1"))
    nc2 = tbg.groupBy("w2").agg(F.countDistinct("w1").alias("nc2"))
    tots = (c12.groupBy().agg(F.count(F.lit(1)).alias("nctot"))
            .crossJoin(train.selectExpr("explode(split(text, ' '))"
                                        " AS x")
                       .agg(F.countDistinct("x").alias("vtrain"))))
    got = (bigrams(held)
           .join(c12, on=["w1", "w2"], how="left")
           .join(c1, on="w1", how="left")
           .join(nc2, on="w2", how="left")
           .crossJoin(F.broadcast(tots))
           .selectExpr("w1", "w2", f"{_kn_term()} AS term").collect())

    # hand model from train "a b a b a c" + "a b c a":
    # bigrams: (a,b)x3 (b,a)x2 (a,c)x1 (b,c)x1 (c,a)x1
    # -> c1: a=4, b=3, c=1; n1w1: a->{b,c}=2, b->{a,c}=2, c->{a}=1
    # nc2: b<-{a}=1, a<-{b,c}=2, c<-{a,b}=2; nctot=5, vtrain=3
    D, nctot, v = 0.75, 5, 3

    def pcont(nc):
        return (nc + 1) / (nctot + v)

    def full(c12_, c1_, n1, nc):
        return math.log(max(c12_ - D, 0) / c1_
                        + D * n1 / c1_ * pcont(nc))

    def q9(x):
        return math.floor(x * 1e9) / 1e9

    want = {
        ("a", "b"): q9(full(3, 4, 2, 1)),
        ("b", "zz"): q9(full(0, 3, 2, 0)),      # unseen pair, seen w1
        ("zz", "c"): q9(math.log(pcont(2))),    # unseen history
    }
    got_map = {(r["w1"], r["w2"]): r["term"] for r in got}
    assert set(got_map) == set(want)
    for k in want:
        assert abs(got_map[k] - want[k]) < 1e-12, (k, got_map[k],
                                                   want[k])


def test_token_budget_select_fill_rule(spark):
    """Budget-fill invariants on the real suite query: a
    non-exhausted source overshoots its budget by LESS than one
    document (the crossing doc is included, nothing after it), an
    exhausted source selected everything it had, and the whole
    report is deterministic across runs."""
    from pyspark.sql import functions as F

    from xsarsea_spark.suite import REGISTRY

    SF = "/root/testdata/sf0.001"
    out = {r["source"]: r
           for r in REGISTRY["doc_token_budget_select"]
           .spark(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .filter("text IS NOT NULL") \
        .selectExpr("source", "size(split(text, ' ')) AS n")
    stats = {r["source"]: (r["mx"], r["tot"])
             for r in docs.groupBy("source")
             .agg(F.max("n").alias("mx"), F.sum("n").alias("tot"))
             .collect()}
    assert set(out) == set(stats)
    for src, r in out.items():
        mx, tot = stats[src]
        if r["exhausted"]:
            assert r["tokens_selected"] == tot < r["budget_tokens"]
        elif r["n_selected"] > 0:
            over = r["tokens_selected"] - r["budget_tokens"]
            assert 0 <= over < mx, (src, over, mx)
        else:
            assert r["budget_tokens"] == 0
    again = {r["source"]: tuple(r)
             for r in REGISTRY["doc_token_budget_select"]
             .spark(spark, SF).collect()}
    assert again == {s: tuple(r) for s, r in out.items()}


def test_normalize_cross_engine_adversarial(spark, tmp_path):
    """The normalization pattern must behave byte-identically in
    Spark (Java regex, replace-all default) and DuckDB (RE2, 'g'
    flag) — pinned on unicode case, astral-plane emoji, tabs,
    doubled/leading/trailing spaces, empties and all-punctuation
    rows, since the synthetic corpus is clean single-space ASCII."""
    import duckdb

    from xsarsea_spark.pipeline.text import (NORM_DUCK_SQL,
                                             NORM_SPARK_SQL)

    rows = [
        (1, ""), (2, " "), (3, "   "),
        (4, "Hello,  World!! 42x"),
        (5, "HÉLLO WÖRLD Ünïcode"),
        (6, "tab\tand\nnewline"),
        (7, "!!! ??? ;;;"),
        (8, "emoji \U0001F600 astral"),
        (9, "  lead and trail  "),
        (10, "a-b_c.d/e\\f"),
        (11, "ｆｕｌｌｗｉｄｔｈ ＡＢＣ"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "norm_adv")
    df.repartition(1).write.parquet(path)
    got = {r["doc_id"]: (r["norm"], r["n"])
           for r in spark.read.parquet(path).selectExpr(
               "doc_id",
               f"{NORM_SPARK_SQL.format(x='text')} AS norm",
               f"length({NORM_SPARK_SQL.format(x='text')}) AS n")
           .collect()}
    con = duckdb.connect()
    want = {r[0]: (r[1], r[2]) for r in con.sql(
        f"SELECT doc_id, {NORM_DUCK_SQL.format(x='text')},"
        f" length({NORM_DUCK_SQL.format(x='text')})"
        f" FROM '{path}/*.parquet'").fetchall()}
    assert got == want
    assert got[4][0] == "hello world 42x"
    assert got[7][0] == ""
