"""RFC 9309 robots.txt: parser grouping rules, the public
precedence vectors (longest-match, Allow-on-tie, * and $), agent
group selection, and LIKE-metachar escaping."""

from __future__ import annotations

from xsarsea_spark.pipeline.robots import (parse_robots_txt,
                                           robots_like_pattern,
                                           robots_rules_df,
                                           rule_specificity,
                                           with_robots_verdict)


def test_parse_grouping_and_directives():
    body = """
# comment line
User-agent: GoodBot
User-agent: OtherBot
Disallow: /a   # trailing comment
Allow: /a/b

User-agent: *
Disallow:
Disallow: /c
Crawl-delay: 10
Sitemap: https://example.org/map.xml
Allow: /c/d
"""
    rows = parse_robots_txt(body)
    # consecutive user-agents share ONE group; empty Disallow and
    # unknown directives yield no rows
    assert rows == [
        ("goodbot", 0, "/a"), ("otherbot", 0, "/a"),
        ("goodbot", 1, "/a/b"), ("otherbot", 1, "/a/b"),
        ("*", 0, "/c"), ("*", 1, "/c/d"),
    ]
    # a rule before any user-agent line attaches to nothing
    assert parse_robots_txt("Disallow: /x") == []


def test_pattern_compile_and_specificity():
    assert robots_like_pattern("/fish") == "/fish%"
    assert robots_like_pattern("/*.php$") == "/%.php"
    assert robots_like_pattern("/a_b%c") == "/a\\_b\\%c%"
    assert rule_specificity("/*.php$") == 6
    assert rule_specificity("/fish") == 5


def _verdicts(spark, body: str, paths: list[str],
              agent: str = "bot") -> dict[str, bool]:
    rules = robots_rules_df(spark, [("d.example", body)])
    df = spark.createDataFrame(
        [("d.example", p) for p in paths], "domain string, path string")
    out = with_robots_verdict(df, rules, agent).collect()
    return {r.path: r.allowed for r in out}


def test_rfc_precedence_vectors(spark):
    """The public REP precedence examples (RFC 9309 §2.2.2 /
    Google's robots documentation): longest path pattern wins,
    Allow wins length ties, $ anchors, * matches any octet run."""
    v = _verdicts(spark, "User-agent: *\nAllow: /p\nDisallow: /",
                  ["/page", "/", "/x"])
    assert v == {"/page": True, "/": False, "/x": False}

    v = _verdicts(spark,
                  "User-agent: *\nAllow: /folder\nDisallow: /folder",
                  ["/folder/page"])
    assert v["/folder/page"] is True          # tie -> Allow

    v = _verdicts(spark,
                  "User-agent: *\nAllow: /page\nDisallow: /*.htm",
                  ["/page.htm32", "/page", "/pa.htm"])
    assert v == {"/page.htm32": False,        # 6 > 5
                 "/page": True, "/pa.htm": False}

    v = _verdicts(spark, "User-agent: *\nAllow: /$\nDisallow: /",
                  ["/", "/page.htm"])
    assert v == {"/": True, "/page.htm": False}

    v = _verdicts(spark, "User-agent: *\nDisallow: /*.php$",
                  ["/filename.php", "/filename.php5",
                   "/folder/filename.php", "/index.php?x=1"])
    assert v == {"/filename.php": False, "/filename.php5": True,
                 "/folder/filename.php": False,
                 "/index.php?x=1": True}


def test_agent_group_selection(spark):
    body = ("User-agent: mybot\nDisallow: /private/\n\n"
            "User-agent: *\nDisallow: /\n")
    rules = robots_rules_df(spark, [("d.example", body)])
    df = spark.createDataFrame(
        [("d.example", "/private/x"), ("d.example", "/public/x"),
         ("nobots.example", "/anything")],
        "domain string, path string")
    # exact group: ONLY mybot rules apply (the * group is ignored);
    # a domain with no rules at all allows everything
    got = {(r.domain, r.path): r.allowed
           for r in with_robots_verdict(df, rules, "MyBot").collect()}
    assert got == {("d.example", "/private/x"): False,
                   ("d.example", "/public/x"): True,
                   ("nobots.example", "/anything"): True}
    # an agent with no exact group falls back to *
    got = {r.path: r.allowed
           for r in with_robots_verdict(
               df.filter("domain = 'd.example'"), rules,
               "otherbot").collect()}
    assert got == {"/private/x": False, "/public/x": False}


def test_like_metachars_stay_literal(spark):
    v = _verdicts(spark, "User-agent: *\nDisallow: /a_b",
                  ["/a_b/c", "/axb/c"])
    assert v == {"/a_b/c": False, "/axb/c": True}
    v = _verdicts(spark, "User-agent: *\nDisallow: /100%",
                  ["/100%done", "/100done"])
    assert v == {"/100%done": False, "/100done": True}


def test_duplicate_rows_and_colliding_columns_survive(spark):
    body = "User-agent: *\nDisallow: /x\n"
    rules = robots_rules_df(spark, [("d.example", body)])
    # duplicate (domain, path) rows must NOT collapse, and an input
    # column named 'pattern' must not collide with the rules side
    df = spark.createDataFrame(
        [("d.example", "/x/1", "p0"), ("d.example", "/x/1", "p0"),
         ("d.example", "/y", "p1")],
        "domain string, path string, pattern string")
    out = with_robots_verdict(df, rules, "bot").collect()
    assert len(out) == 3
    got = sorted((r.path, r.pattern, r.allowed) for r in out)
    assert got == [("/x/1", "p0", False), ("/x/1", "p0", False),
                   ("/y", "p1", True)]
    import pytest as _pt

    with _pt.raises(ValueError, match="__rb_"):
        with_robots_verdict(
            df.withColumnRenamed("pattern", "__rb_pattern"),
            rules, "bot")


def test_parser_fuzz_never_crashes_and_rows_are_wellformed():
    """Property: parse_robots_txt accepts ANY text without raising,
    and every produced row has a lower-cased agent, a 0/1 allow flag
    and a non-empty rule; robots_like_pattern compiles every rule."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from xsarsea_spark.pipeline.robots import (parse_robots_txt,
                                               robots_like_pattern,
                                               rule_specificity)

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=400))
    def check(body):
        rows = parse_robots_txt(body)
        for agent, is_allow, rule in rows:
            assert agent == agent.lower()
            assert is_allow in (0, 1)
            assert rule
            pat = robots_like_pattern(rule)
            assert isinstance(pat, str)
            assert rule_specificity(rule) >= 0

    check()
