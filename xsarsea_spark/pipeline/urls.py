"""URL canonicalization + registrable-domain extraction for
URL/domain-level dedup — the first dedup pass every web-scale corpus
pipeline runs (CCNet §3.1 and C4 both dedup by URL before any
content hashing; it is orders of magnitude cheaper than text
shingling and catches the recrawl-duplicate majority).

Canonical form (the common subset of the WARC/CDX and
crawler-frontier conventions):

- scheme and host lowercased; the DEFAULT port for the scheme
  (``:443`` for https, ``:80`` for http) stripped, non-default ports
  kept;
- a leading ``www.`` stripped from the host;
- the fragment dropped; trailing slashes stripped from the path;
- tracking parameters (``utm_*``) dropped, the surviving query
  parameters SORTED so parameter order cannot split a group;
- the dedup key is scheme-insensitive (http/https recrawls of one
  resource group together); the canonical display form keeps the
  scheme.

Registrable domain: last two host labels, or last three when the
two-label tail is a known multi-label public suffix. The suffix set
is DATA from :mod:`xsarsea_spark.pipeline.psl` — specifically the
exact 2-label rules of the EMBEDDED SNAPSHOT, frozen at import time
(this expression chain is built before any SparkSession exists, so
it cannot read ``spark.xsarsea.psl.path``). It handles the
exact-2-label majority in-plan with zero joins; deployments that
need the authoritative conf-loaded list — or the full algorithm
(3+-label rules, wildcards, exceptions) — use
``psl.with_psl_domain``, the broadcast-join operator, which does
honor the conf.

Everything is ONE in-plan expression chain per engine — regexes in
the RE2 ∩ java.util.regex common subset (the doc_normalize_profile
convention), list ops via sort/filter/join builtins — so Spark and
DuckDB produce byte-identical canonical forms (pytest-pinned on
adversarial URLs) and the suite row is value-hash exact. No UDFs,
no shuffle until the final group-bys.

Parity: reference repo has no web-corpus surface (engine-brief
extension — dedup family).
"""

from __future__ import annotations

__all__ = ["url_norm_steps", "url_cte_chain", "TWO_LEVEL_SUFFIXES"]

# Public-suffix tails that make the registrable domain three labels
# instead of two: the exact 2-label rules of the PSL data module
# (historically a 4-entry inline tuple; now the full snapshot set —
# .com.br / .co.in / .ne.jp-class hosts group correctly).
from xsarsea_spark.pipeline.psl import exact_two_level_suffixes

TWO_LEVEL_SUFFIXES = exact_two_level_suffixes()


def url_cte_chain(select0: str) -> tuple:
    """DuckDB chained-CTE form of the canonicalization: ``s0`` is
    ``select0`` (which must emit a ``url`` column), each later CTE
    adds one step's column. Returns ``(parts, last_name)`` for the
    caller's WITH clause — the single builder every oracle (and the
    parity tests) share, so the chain's shape can't drift between
    consumers."""
    parts = [f"s0 AS ({select0})"]
    prev = "s0"
    for i, (col, expr) in enumerate(url_norm_steps("duck"), 1):
        parts.append(f"s{i} AS (SELECT *, {expr} AS {col}"
                     f" FROM {prev})")
        prev = f"s{i}"
    return parts, prev


def url_norm_steps(dialect: str) -> list:
    """Ordered ``(column, sql_expr)`` pairs canonicalizing a ``url``
    column; each expression may reference earlier columns. Apply as
    chained ``withColumn``/``selectExpr`` (Spark) or chained CTE
    projections (DuckDB). ``dialect`` is ``"spark"`` or ``"duck"``."""
    if dialect == "spark":
        def split(x, sep):
            lit = "\\\\." if sep == "." else sep
            return f"split({x}, '{lit}')"

        def filt(a, lam):
            return f"filter({a}, {lam})"

        def sort(a):
            return f"sort_array({a})"

        def join(a, sep):
            return f"array_join({a}, '{sep}')"

        def el(a, i):
            return f"element_at({a}, {i})"

        def size(a):
            return f"size({a})"
    elif dialect == "duck":
        def split(x, sep):
            return f"string_split({x}, '{sep}')"

        def filt(a, lam):
            return f"list_filter({a}, {lam})"

        def sort(a):
            return f"list_sort({a})"

        def join(a, sep):
            return f"array_to_string({a}, '{sep}')"

        def el(a, i):
            return f"{a}[{i}]"

        def size(a):
            return f"len({a})"
    else:
        raise ValueError(f"unknown dialect {dialect!r}")

    # Spark SQL string literals consume one backslash level ('\\?'
    # reaches the regex engine as \?); DuckDB literals do not ('\?'
    # is already two chars). Same final regex, different spelling.
    qpat = "'\\\\?([^#]*)'" if dialect == "spark" \
        else "'\\?([^#]*)'"
    sufs = ", ".join(f"'{s}'" for s in TWO_LEVEL_SUFFIXES)
    return [
        ("u_scheme",
         "lower(regexp_extract(url, '^([A-Za-z]+)://', 1))"),
        ("u_hostport",
         "lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1))"),
        # default port for the scheme only; others are significant
        ("u_hostp",
         "CASE WHEN u_scheme = 'https'"
         " THEN regexp_replace(u_hostport, ':443$', '')"
         " WHEN u_scheme = 'http'"
         " THEN regexp_replace(u_hostport, ':80$', '')"
         " ELSE u_hostport END"),
        ("u_host",
         "CASE WHEN substr(u_hostp, 1, 4) = 'www.'"
         " THEN substr(u_hostp, 5) ELSE u_hostp END"),
        ("u_path",
         "regexp_replace(regexp_extract(url,"
         " '^[A-Za-z]+://[^/?#]+([^?#]*)', 1), '/+$', '')"),
        ("u_qs", f"regexp_extract(url, {qpat}, 1)"),
        # drop tracking params, sort the rest; coalesce: DuckDB's
        # join of an empty list is NULL where Spark's is ''
        ("u_params",
         "coalesce(" + join(sort(filt(split("u_qs", "&"),
                                      "x -> x <> '' AND"
                                      " substr(x, 1, 4) <> 'utm_'")),
                            "&") + ", '')"),
        ("url_norm",
         "concat(u_scheme, '://', u_host, u_path,"
         " CASE WHEN u_params = '' THEN ''"
         " ELSE concat('?', u_params) END)"),
        # scheme-insensitive group key: http/https recrawls collapse
        ("dup_key", "concat(u_host, u_path, '?', u_params)"),
        # registrable domain is a HOSTNAME concept: any surviving
        # (non-default) port stays in the dup key but not here
        ("u_hostd", "regexp_replace(u_host, ':[0-9]+$', '')"),
        ("u_labels", split("u_hostd", ".")),
        ("u_suf2",
         f"CASE WHEN {size('u_labels')} >= 2 THEN"
         f" concat({el('u_labels', -2)}, '.', {el('u_labels', -1)})"
         f" ELSE u_hostd END"),
        ("domain",
         f"CASE WHEN {size('u_labels')} >= 3"
         f" AND u_suf2 IN ({sufs})"
         f" THEN concat({el('u_labels', -3)}, '.', u_suf2)"
         f" ELSE u_suf2 END"),
    ]
