"""Public Suffix List algorithm: spec semantics, cross-engine
parity, parser, data-file override."""
from __future__ import annotations

import duckdb

# (host, expected registrable domain) covering every rule class:
# exact 2/3-label rules, private-section suffixes, wildcard rules,
# exception rules, the implicit * default, host-IS-suffix -> NULL,
# and degenerate hosts.
CASES = [
    ("example.com", "example.com"),
    ("a.b.example.com", "example.com"),
    ("x.example.com.br", "example.com.br"),     # .com.br class
    ("foo.co.in", "foo.co.in"),
    ("x.blogspot.com", "x.blogspot.com"),       # private suffix
    ("blogspot.com", None),                     # host IS a suffix
    ("a.b.kawasaki.jp", "a.b.kawasaki.jp"),     # *.kawasaki.jp
    ("b.kawasaki.jp", None),                    # wildcard tail
    ("city.kawasaki.jp", "city.kawasaki.jp"),   # !city exception
    ("sub.city.kawasaki.jp", "city.kawasaki.jp"),
    ("www.ck", "www.ck"),                       # the famous !www.ck
    ("foo.ck", None),                           # *.ck
    ("bar.foo.ck", "bar.foo.ck"),
    ("com", None),                              # bare TLD
    ("unknown.xyzzy", "unknown.xyzzy"),         # implicit * rule
    ("x.y.compute.amazonaws.com", "x.y.compute.amazonaws.com"),
    ("y.compute.amazonaws.com", None),
    ("deep.sub.ex.co.uk", "ex.co.uk"),
    ("tokyo.jp", None),                         # prefecture suffix
    ("metro.tokyo.jp", "metro.tokyo.jp"),
    ("s3.amazonaws.com", None),                 # 3-label private
    ("b.s3.amazonaws.com", "b.s3.amazonaws.com"),
    ("", None),
    (None, None),
]


def test_parser_groups_rule_kinds():
    from xsarsea_spark.pipeline.psl import parse_psl_rules

    rows = parse_psl_rules([
        "// comment", "", "com", "*.ck", "!www.ck", "CO.UK",
        "co.uk   trailing junk ignored", "*", "!",
    ])
    d = {s: (labels, n, w, e) for s, labels, n, w, e in rows}
    assert d["com"] == (1, 1, 0, 0)
    assert d["ck"] == (1, 0, 1, 0)
    assert d["www.ck"] == (2, 0, 0, 1)
    assert d["co.uk"] == (2, 1, 0, 0)   # lowercased + deduped
    assert "*" not in d and "" not in d


def test_spark_psl_domain_matches_spec(spark):
    from xsarsea_spark.pipeline.psl import psl_rules, with_psl_domain

    rules_df, rows = psl_rules(spark)
    df = spark.createDataFrame([(h,) for h, _ in CASES],
                               "host string")
    got = {r["host"]: r["psl_domain"]
           for r in with_psl_domain(df, "host", rules_df,
                                    rows).collect()}
    for host, want in CASES:
        assert got.get(host) == want, (host, got.get(host), want)


def test_duckdb_replay_matches_spec():
    from xsarsea_spark.pipeline.psl import (PSL_SNAPSHOT,
                                            parse_psl_rules,
                                            psl_oracle_ctes)

    rows = parse_psl_rules(PSL_SNAPSHOT.splitlines())
    con = duckdb.connect()
    vals = ", ".join("(" + ("NULL" if h is None else f"'{h}'") + ")"
                     for h, _ in CASES)
    con.execute(f"CREATE TABLE hh AS SELECT * FROM (VALUES {vals})"
                f" t(host)")
    parts, last = psl_oracle_ctes("SELECT host FROM hh", rows)
    sql = ("WITH " + ",\n".join(parts)
           + f" SELECT host, psl_domain FROM {last}")
    got = dict(con.execute(sql).fetchall())
    for host, want in CASES:
        if host is None:
            continue    # NULL host key unaddressable in a dict
        assert got.get(host) == want, (host, got.get(host), want)


def test_conf_path_loads_external_dat(spark, tmp_path):
    """spark.xsarsea.psl.path points at a standard .dat file: the
    loader must prefer it over the embedded snapshot."""
    from xsarsea_spark.pipeline.psl import (CONF_PSL_PATH,
                                            load_psl_lines,
                                            parse_psl_rules)

    dat = tmp_path / "psl.dat"
    dat.write_text("// tiny\nzz\ncustom.zz\n")
    spark.conf.set(CONF_PSL_PATH, str(dat))
    try:
        rows = parse_psl_rules(load_psl_lines(spark))
    finally:
        spark.conf.unset(CONF_PSL_PATH)
    assert {s for s, *_ in rows} == {"zz", "custom.zz"}
    # and with the conf unset, the snapshot is back
    assert len(parse_psl_rules(load_psl_lines(spark))) > 400


def test_urls_two_level_set_derives_from_psl_data():
    from xsarsea_spark.pipeline.psl import exact_two_level_suffixes
    from xsarsea_spark.pipeline.urls import TWO_LEVEL_SUFFIXES

    assert TWO_LEVEL_SUFFIXES == exact_two_level_suffixes()
    # the .com.br-class fix the 4-entry tuple missed
    for s in ("com.br", "co.in", "ne.jp", "co.uk", "com.au",
              "blogspot.com"):
        assert s in TWO_LEVEL_SUFFIXES, s
    # wildcards and exceptions never enter the expression set
    assert "kawasaki.jp" not in TWO_LEVEL_SUFFIXES
    assert "www.ck" not in TWO_LEVEL_SUFFIXES


def test_psl_domain_plan_is_scale_safe(spark):
    """doc_psl_domain: every join is a broadcast hash join (rules
    side), no shuffle exchange before the final aggregation pair, no
    cartesian product."""
    from xsarsea_spark.suite import REGISTRY

    plan = (REGISTRY["doc_psl_domain"]
            .spark(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    # the only exchanges belong to the final aggregation: the
    # (domain, host) partial pair for COUNT(DISTINCT host) plus the
    # domain-keyed final — 2 hash exchanges, none from the PSL lookup
    n_ex = sum(1 for ln in plan.splitlines()
               if "Exchange" in ln and "Broadcast" not in ln)
    assert n_ex <= 2, plan


def test_psl_domain_is_a_fixpoint():
    """The defining property of a registrable domain: feeding a
    non-NULL psl_domain back through the algorithm returns itself
    (it has exactly public-suffix labels + 1, so the same winning
    rule fires and n = ps + 1 keeps the whole host). Checked in
    DuckDB with the same generated CTEs the suite oracle uses;
    hypothesis builds hosts from snapshot-relevant labels."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from xsarsea_spark.pipeline.psl import (PSL_SNAPSHOT,
                                            parse_psl_rules,
                                            psl_oracle_ctes)

    rows = parse_psl_rules(PSL_SNAPSHOT.splitlines())
    label = st.text(alphabet="abcxyz09-", min_size=1, max_size=5)
    tail = st.sampled_from([
        "com", "co.uk", "com.br", "kawasaki.jp", "city.kawasaki.jp",
        "ck", "www.ck", "blogspot.com", "compute.amazonaws.com",
        "xyzzy", "tokyo.jp"])

    @st.composite
    def hostish(draw):
        subs = draw(st.lists(label, min_size=0, max_size=3))
        return ".".join(subs + [draw(tail)])

    def domains(hosts):
        con = duckdb.connect()
        vals = ", ".join(f"('{h}')" for h in hosts)
        con.execute(f"CREATE TABLE hh AS SELECT * FROM"
                    f" (VALUES {vals}) t(host)")
        parts, last = psl_oracle_ctes("SELECT host FROM hh", rows)
        sql = ("WITH " + ",\n".join(parts)
               + f" SELECT host, psl_domain FROM {last}")
        return dict(con.execute(sql).fetchall())

    @given(st.lists(hostish(), min_size=1, max_size=8, unique=True))
    @settings(max_examples=25, deadline=None)
    def check(hosts):
        first = domains(hosts)
        doms = sorted({d for d in first.values() if d})
        if not doms:
            return
        second = domains(doms)
        for d in doms:
            assert second.get(d) == d, (d, second.get(d))

    check()
