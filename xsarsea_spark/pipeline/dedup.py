"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (100 TB): the LSH path NEVER does all-pairs — candidate
pairs come from a banded ``groupBy`` (same band hash -> same bucket,
self-equi-join within bucket), so cost is O(docs * K) for signatures
plus O(sum of bucket^2) for candidates, with bucket sizes bounded by
band selectivity. The Jaccard verification joins only candidate pairs
against their shingle sets.

Hashing: 40-bit md5-derived token hashes (cross-engine stable — see
pipeline.text.HASH40_SQL) permuted by ``(a_k * h + b_k) % P`` with
P = 2^40 - 87 (prime); all arithmetic stays inside BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xsarsea_spark.pipeline.text import HASH40_SQL

__all__ = [
    "shingle",
    "minhash_signatures",
    "lsh_candidates",
    "jaccard_verify",
    "minhash_lsh_dedup",
    "simhash",
    "MINHASH_P",
]

MINHASH_P = (1 << 40) - 87          # prime
_BAND_MULT = 1000003


def _perm_params(k: int) -> tuple[int, int]:
    return 97 + 31 * k, 911 + 131 * k


def shingle(docs: DataFrame, n: int = 3, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle)."""
    toks = f"split({text_col}, ' ')"
    parts = " || ' ' || ".join(
        f"element_at(__toks, i + {j + 1})" for j in range(n)
    )
    return (
        docs.selectExpr(id_col, f"{toks} AS __toks")
        .selectExpr(
            id_col,
            f"explode(transform(sequence(0, size(__toks) - {n}),"
            f" i -> {parts})) AS shingle",
        )
        .distinct()
    )


def minhash_signatures(sh: DataFrame, k: int = 16,
                       id_col: str = "doc_id") -> DataFrame:
    """MinHash signature rows (id, k, minh).

    All K permutation minima are computed as K aggregate expressions in
    ONE hash aggregation over the shingles (map-side partial combine),
    then unpivoted with ``stack`` — no K-fold row blowup: the naive
    crossJoin(perms) formulation multiplies the shuffle by K, which at
    100 TB is the difference between one pass and sixteen.
    """
    h40 = HASH40_SQL.format(x="shingle")
    work = sh.withColumn("__h", F.expr(h40))
    aggs = [
        F.expr(f"min(({a} * __h + {b}) % {MINHASH_P}) AS m{i}")
        for i, (a, b) in ((i, _perm_params(i)) for i in range(k))
    ]
    wide = work.groupBy(id_col).agg(*aggs)
    stack = ", ".join(f"{i}, m{i}" for i in range(k))
    return wide.selectExpr(
        id_col, f"stack({k}, {stack}) AS (k, minh)"
    )


def lsh_candidates(sig: DataFrame, bands: int = 8,
                   id_col: str = "doc_id") -> DataFrame:
    """Banded LSH candidate pairs (id_a < id_b): band hash combines the
    2 signature rows of each band; pairs come from a bucket self-join,
    never an all-pairs cross join."""
    rows_per_band = 2
    b = (
        sig.withColumn("band",
                       F.expr(f"CAST(FLOOR(k / {rows_per_band}) AS INT)"))
        .withColumn("slot", F.expr(f"k % {rows_per_band}"))
        .groupBy(id_col, "band")
        .agg(
            F.expr(
                f"(max(CASE WHEN slot = 0 THEN minh END) * {_BAND_MULT}"
                f" + max(CASE WHEN slot = 1 THEN minh END)) % {MINHASH_P}"
            ).alias("bandhash")
        )
    )
    l, r = b.alias("l"), b.alias("r")
    return (
        l.join(
            r,
            (F.col(f"l.band") == F.col(f"r.band"))
            & (F.col("l.bandhash") == F.col("r.bandhash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def jaccard_verify(cand: DataFrame, sh: DataFrame,
                   id_col: str = "doc_id") -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs only."""
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    inter = (
        cand.join(sh.withColumnRenamed(id_col, "id_a"), on="id_a")
        .join(
            sh.withColumnRenamed(id_col, "id_b")
            .withColumnRenamed("shingle", "shingle_b"),
            on="id_b",
        )
        .filter(F.col("shingle") == F.col("shingle_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        cand.join(inter, on=["id_a", "id_b"], how="left")
        .na.fill({"n_inter": 0})
        .join(sizes.withColumnRenamed(id_col, "id_a")
              .withColumnRenamed("n", "n_a"), on="id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b")
              .withColumnRenamed("n", "n_b"), on="id_b")
        .withColumn(
            "jaccard",
            F.expr("n_inter / CAST(n_a + n_b - n_inter AS DOUBLE)"),
        )
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_dedup(docs: DataFrame, n: int = 3, k: int = 16,
                      bands: int = 8, threshold: float = 0.5,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Full near-dup pipeline: shingle -> minhash -> banded LSH ->
    exact Jaccard >= threshold. Returns (id_a, id_b, jaccard)."""
    sh = shingle(docs, n=n, text_col=text_col, id_col=id_col)
    sig = minhash_signatures(sh, k=k, id_col=id_col)
    cand = lsh_candidates(sig, bands=bands, id_col=id_col)
    ver = jaccard_verify(cand, sh, id_col=id_col)
    return ver.filter(F.col("jaccard") >= threshold)


def simhash(docs: DataFrame, bits: int = 16, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """SimHash fingerprint: sign of per-bit weighted sums of token
    hashes (weight = token multiplicity). Pure built-ins: explode
    tokens x bit positions, two hash aggregations."""
    h40 = HASH40_SQL.format(x="tok")
    toks = docs.selectExpr(
        id_col, f"explode(split({text_col}, ' ')) AS tok"
    ).withColumn("__h", F.expr(h40))
    bitpos = docs.sparkSession.range(bits).select(
        F.col("id").cast("int").alias("bit"))
    per_bit = (
        toks.crossJoin(F.broadcast(bitpos))
        .withColumn(
            # FLOOR before the cast: Spark's double->BIGINT cast
            # truncates while DuckDB's rounds — FLOOR makes both exact
            "contrib",
            F.expr("CASE WHEN CAST(FLOOR(__h / POW(2, bit)) AS BIGINT)"
                   " % 2 = 1 THEN 1 ELSE -1 END"),
        )
        .groupBy(id_col, "bit")
        .agg(F.sum("contrib").alias("s"))
    )
    return per_bit.groupBy(id_col).agg(
        F.expr(
            "CAST(SUM(CASE WHEN s > 0 THEN CAST(POW(2, bit) AS BIGINT)"
            " ELSE 0L END) AS BIGINT)"
        ).alias("simhash")
    )


# ----------------------------------------------------------------------
# Embedding-cosine near-dup (the vector-space dedup family)
# ----------------------------------------------------------------------

def _plane_component_sql() -> str:
    """Deterministic pseudo-random hyperplane component for plane ``p``,
    vector coordinate ``i`` (no RNG state — identical in any engine)."""
    return "((((p * 9973 + i * 277) % 2003) - 1001) / 1001e0)"


def cosine_neardup(
    vecs: DataFrame,
    threshold: float = 0.98,
    n_planes: int = 16,
    bands: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded random-
    hyperplane LSH — never all-pairs.

    Each vector gets ``n_planes`` signed projections (sequential
    JVM-side fold per plane — deterministic accumulation order), cut
    into ``bands`` sign-pattern buckets. Candidate pairs share a
    (band, bucket); only candidates get the exact cosine, and pairs
    with cosine >= ``threshold`` survive. Returns (id_a, id_b, cosine).

    Scale: signatures are one projection pass over the vectors; the
    candidate stage shuffles on (band, bucket) — bucket sizes are
    bounded by band selectivity (2^(n_planes/bands) buckets/band), so
    cost is O(n * n_planes * dim) + O(sum bucket^2), not O(n^2).
    Parity: reference has no vector dedup; family required by the
    engine brief (embedding-cosine near-dup).
    """
    r = n_planes // bands
    if r * bands != n_planes:
        raise ValueError("bands must divide n_planes")
    pc = _plane_component_sql()
    projs = (
        f"transform(sequence(0, {n_planes - 1}), p ->"
        f" aggregate(zip_with({vec_col},"
        f" sequence(0, size({vec_col}) - 1),"
        f" (x, i) -> CAST(x AS DOUBLE) * {pc}),"
        f" CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
    )
    # band bucket = little-endian sign bits of the band's r projections
    buckets = (
        f"transform(sequence(0, {bands - 1}), b ->"
        f" aggregate(sequence(0, {r - 1}), 0L, (acc, j) ->"
        f" acc + CASE WHEN element_at(__projs, b * {r} + j + 1) > 0e0"
        f" THEN CAST(shiftleft(1, j) AS BIGINT) ELSE 0L END))"
    )
    sig = (
        vecs.select(id_col, vec_col)
        .withColumn("__projs", F.expr(projs))
        .withColumn("__buckets", F.expr(buckets))
        .select(id_col, F.posexplode("__buckets").alias("band", "bucket"))
    )
    a = sig.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = sig.select(F.col(id_col).alias("id_b"), "band", "bucket")
    cand = (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    nrm = (
        f"sqrt(aggregate(zip_with({{v}}, {{v}}, (x, y) ->"
        f" CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        f" CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
    )
    va = vecs.select(F.col(id_col).alias("id_a"),
                     F.col(vec_col).alias("__va"))
    vb = vecs.select(F.col(id_col).alias("id_b"),
                     F.col(vec_col).alias("__vb"))
    dot = ("aggregate(zip_with(__va, __vb, (x, y) ->"
           " CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
           " CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
    out = (
        cand.join(va, on="id_a").join(vb, on="id_b")
        .withColumn(
            "cosine",
            F.expr(f"({dot}) / ({nrm.format(v='__va')}"
                   f" * {nrm.format(v='__vb')})"),
        )
        .filter(F.col("cosine") >= F.lit(threshold))
        .select("id_a", "id_b", "cosine")
    )
    return out
