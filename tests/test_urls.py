"""URL canonicalization: cross-engine byte parity + semantics."""
from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

ADVERSARIAL = [
    "HTTPS://WWW.Example.CO.UK:443/a/b/?utm_source=x&b=2&a=1#frag",
    "https://example.co.uk/a/b?a=1&b=2",
    "http://example.co.uk:80/a/b/",
    "http://example.co.uk:8080/a/b",      # non-default port kept
    "https://sub.deep.example.com/",
    "http://EXAMPLE.com/?utm_a=1&utm_b=2",  # params all tracking
    "https://one-label/x",                  # single-label host
    "http://a.org.uk/p?z=1&y=1&z=0",        # dup param names sort
    "not a url at all",
    "ftp://odd.net:443/f",                  # :443 not ftp default
]

_COLS = ["url_norm", "dup_key", "domain"]


def _spark_rows(spark):
    from xsarsea_spark.pipeline.urls import url_norm_steps

    df = spark.createDataFrame([(i, u) for i, u in
                                enumerate(ADVERSARIAL)],
                               "i long, url string")
    for col, expr in url_norm_steps("spark"):
        df = df.withColumn(col, F.expr(expr))
    return {r["i"]: tuple(r[c] for c in _COLS)
            for r in df.select("i", *_COLS).collect()}


def _duck_rows():
    from xsarsea_spark.pipeline.urls import url_cte_chain

    vals = ", ".join(f"({i}, '{u}')"
                     for i, u in enumerate(ADVERSARIAL))
    parts, prev = url_cte_chain(
        f"SELECT * FROM (VALUES {vals}) t(i, url)")
    sql = ("WITH " + ", ".join(parts)
           + f" SELECT i, {', '.join(_COLS)} FROM {prev}")
    return {r[0]: tuple(r[1:]) for r in duckdb.sql(sql).fetchall()}


def test_cross_engine_byte_parity(spark):
    got_s = _spark_rows(spark)
    got_d = _duck_rows()
    for i, u in enumerate(ADVERSARIAL):
        assert got_s[i] == got_d[i], (u, got_s[i], got_d[i])


def test_canonicalization_semantics(spark):
    rows = _spark_rows(spark)
    by_url = {ADVERSARIAL[i]: r for i, r in rows.items()}
    # the noisy variant (scheme case + www + default port + utm +
    # trailing slash + fragment) and the already-clean form share one
    # scheme-insensitive dup key
    k0 = by_url[ADVERSARIAL[0]][1]
    assert by_url[ADVERSARIAL[1]][1] == k0
    # same path but NO query = a different resource; default :80 and
    # the trailing slash still canonicalize away
    assert by_url[ADVERSARIAL[2]][1] != k0
    assert by_url[ADVERSARIAL[2]][0] == "http://example.co.uk/a/b"
    # and their params are sorted with utm_* gone
    assert by_url[ADVERSARIAL[0]][0] == \
        "https://example.co.uk/a/b?a=1&b=2"
    # non-default port splits the group and survives in the display
    # form, but not in the registrable domain
    assert by_url[ADVERSARIAL[3]][1] != k0
    assert ":8080" in by_url[ADVERSARIAL[3]][0]
    assert by_url[ADVERSARIAL[3]][2] == "example.co.uk"
    # multi-label public suffix -> 3-label registrable domain;
    # deep subdomains still collapse to 2 labels on .com
    assert by_url[ADVERSARIAL[0]][2] == "example.co.uk"
    assert by_url[ADVERSARIAL[4]][2] == "example.com"
    # all-tracking query canonicalizes to no query at all
    assert by_url[ADVERSARIAL[5]][0] == "http://example.com"
    # single-label host is its own domain
    assert by_url[ADVERSARIAL[6]][2] == "one-label"
    # duplicate param names sort deterministically (z=0 before z=1)
    assert by_url[ADVERSARIAL[7]][0] == \
        "http://a.org.uk/p?y=1&z=0&z=1"
    assert by_url[ADVERSARIAL[7]][2] == "a.org.uk"
    # :443 is NOT stripped for a non-https scheme
    assert ":443" in by_url[ADVERSARIAL[9]][0]


def test_canonicalization_is_idempotent():
    """The defining property of a canonical form: re-canonicalizing
    url_norm is a fixpoint (checked in DuckDB — the same expressions
    the byte-parity test pins against Spark). Hypothesis builds
    URL-ish strings from canonicalization-relevant parts."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    label = st.text(alphabet="abcXYZ09-", min_size=1, max_size=6)
    param = st.text(alphabet="abz19=_", min_size=1, max_size=6)

    @st.composite
    def urlish(draw):
        scheme = draw(st.sampled_from(
            ["http", "HTTPS", "https", "ftp", ""]))
        host = ".".join(draw(st.lists(label, min_size=1, max_size=3)))
        www = draw(st.sampled_from(["", "www.", "WWW."]))
        port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
        path = "".join("/" + draw(label)
                       for _ in range(draw(st.integers(0, 2))))
        slash = draw(st.sampled_from(["", "/", "//"]))
        params = draw(st.lists(param, max_size=3))
        utm = draw(st.sampled_from(["", "utm_a=1"]))
        q = "&".join(x for x in params + [utm] if x)
        frag = draw(st.sampled_from(["", "#f", "#x?y=1"]))
        pre = f"{scheme}://" if scheme else ""
        return (f"{pre}{www}{host}{port}{path}{slash}"
                + (f"?{q}" if q else "") + frag)

    def norm_many(urls):
        import duckdb

        from xsarsea_spark.pipeline.urls import url_cte_chain
        vals = ", ".join(
            f"({i}, '{u}')" for i, u in enumerate(urls))
        parts, prev = url_cte_chain(
            f"SELECT * FROM (VALUES {vals}) t(i, url)")
        sql = ("WITH " + ", ".join(parts)
               + f" SELECT i, url_norm FROM {prev} ORDER BY i")
        return [r[1] for r in duckdb.sql(sql).fetchall()]

    @settings(max_examples=30, deadline=None)
    @given(st.lists(urlish(), min_size=1, max_size=8))
    def check(urls):
        once = norm_many(urls)
        twice = norm_many(once)
        assert twice == once, (urls, once, twice)

    check()
