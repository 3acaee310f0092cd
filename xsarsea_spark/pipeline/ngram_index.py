"""Infini-gram style n-gram count / continuation lookup (Liu et al.
2024, "Infini-gram: Scaling Unbounded n-gram Language Models to a
Trillion Tokens") — the eval-side counterpart of the substring-dedup
family: given query n-grams of arbitrary length, report corpus
counts, document frequencies and next-token (continuation)
statistics; given query CONTEXTS, back off to the longest suffix
that occurs in the corpus (the "∞-gram" rule) and report ITS
continuation distribution.

Engine strategy: for a BOUNDED query set with bounded maximum n the
position-slice index is the right plan — ONE corpus scan produces
(doc, n, gram, next-token) occurrence rows for the n values present
in the queries (an all-JVM ``inline(flatten(transform(...)))``
projection, no UDF), a broadcast semi-join on the query grams prunes
the stream inside the same stage, and the statistics are plain hash
aggregations. Nothing is corpus-wide except hash-partitioned aggs,
so the plan survives any scale-up; the distributed suffix array
(``pipeline/suffix.py``) remains the right index when queries are
UNBOUNDED-length or interactive (build once, probe many).

Determinism: everything here is integer counts and string equality —
no float hazard at all; argmax continuation uses the struct-order
min of (-count, token), identical in Spark and DuckDB.

Reference parity: the reference engine (umr-lops/xsarsea) has no
text surface; this module is part of the LLM-data-pipeline extension
the engine brief mandates (tokenization / eval infrastructure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ngram_occurrences", "ngram_stats", "continuation_stats",
           "backoff_longest_suffix"]


def _ns_array(ns: tuple[int, ...]) -> str:
    return "array(" + ", ".join(str(n) for n in ns) + ")"


def ngram_occurrences(docs: DataFrame, ns: tuple[int, ...],
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """(id, n, gram, cont): one row per token position per n — the
    gram starting there and the token right after it (NULL when the
    gram ends the document). ONE scan, all-JVM: the position list is
    ``slice(sequence(1, L), 1, greatest(L - n + 1, 0))`` (empty for
    short docs — never a descending ``sequence``), and every n in
    ``ns`` unrolls inside a single ``inline(flatten(...))``."""
    return (
        docs.filter(F.col(text_col).isNotNull())
        .selectExpr(id_col, f"split({text_col}, ' ') AS __tk")
        .selectExpr(
            id_col,
            f"""inline(flatten(transform({_ns_array(ns)}, nn ->
              transform(
                slice(sequence(1, size(__tk)), 1,
                      greatest(size(__tk) - nn + 1, 0)),
                i -> struct(
                  CAST(nn AS BIGINT) AS n,
                  array_join(slice(__tk, i, nn), ' ') AS gram,
                  CASE WHEN i + nn <= size(__tk)
                       THEN element_at(__tk, i + nn) END
                    AS cont)))))"""))


def ngram_stats(occ: DataFrame,
                id_col: str = "doc_id") -> DataFrame:
    """(n, gram, cnt, doc_freq): total occurrences and distinct
    containing documents — one hash aggregation."""
    return (occ.groupBy("n", "gram")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.countDistinct(id_col).alias("doc_freq")))


def continuation_stats(occ: DataFrame,
                       query_grams: DataFrame) -> DataFrame:
    """(n, gram, cont_distinct, top_cont, top_cont_cnt) for the
    grams in ``query_grams`` (n, gram) — the broadcast semi-join
    prunes the occurrence stream before any shuffle; the top
    continuation is the struct-order argmax (highest count, ties to
    the lexicographically smallest token)."""
    hits = (occ.join(F.broadcast(query_grams.select("n", "gram")),
                     on=["n", "gram"])
            .filter(F.col("cont").isNotNull())
            .groupBy("n", "gram", "cont")
            .agg(F.count(F.lit(1)).alias("__c")))
    return (hits.groupBy("n", "gram")
            .agg(F.count(F.lit(1)).alias("cont_distinct"),
                 F.min(F.struct((-F.col("__c")).alias("k"),
                                F.col("cont").alias("v")))
                 .alias("__m"))
            .selectExpr("n", "gram", "cont_distinct",
                        "__m.v AS top_cont",
                        "CAST(-__m.k AS BIGINT) AS top_cont_cnt"))


def backoff_longest_suffix(contexts: DataFrame,
                           stats: DataFrame) -> DataFrame:
    """Infini-gram backoff: for each context (ctx_id, ctx — a
    space-joined token string), the LONGEST suffix that occurs in
    the corpus per ``stats`` (n, gram, cnt), with its length and
    count. The suffix explode is bounded by the context length, the
    probe is a broadcast join of the (contexts × lengths) frame
    against the gram-stats table, and the winner per context is a
    struct-order min over its <= len(ctx) candidate rows."""
    sfx = contexts.selectExpr(
        "ctx_id", "ctx",
        """inline(transform(
             sequence(1, size(split(ctx, ' '))),
             k -> struct(
               CAST(k AS BIGINT) AS n,
               array_join(slice(split(ctx, ' '),
                          size(split(ctx, ' ')) - k + 1, k), ' ')
                 AS gram)))""")
    hits = F.broadcast(sfx).join(stats, on=["n", "gram"])
    return (hits.groupBy("ctx_id", "ctx")
            .agg(F.min(F.struct((-F.col("n")).alias("k"),
                                F.col("gram").alias("g"),
                                F.col("cnt").alias("c")))
                 .alias("__m"))
            .selectExpr("ctx_id", "ctx",
                        "CAST(-__m.k AS BIGINT) AS matched_n",
                        "__m.g AS suffix",
                        "CAST(__m.c AS BIGINT) AS cnt"))
