"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force cosine top-k — the correctness baseline.
  The dot product is a sequential JVM-side fold (``aggregate`` over
  ``zip_with``), no Python UDF. Queries x corpus is a broadcast join of
  the (small) query set against the corpus — at 100 TB the corpus side
  streams, only the query block is broadcast.
- ``lsh_ann``: the scale path — random-hyperplane LSH bucket join.
  Hyperplanes are deterministic arithmetic (no RNG state), signatures
  are built in one projection, candidates come from a bucket
  ``groupBy`` join, and only candidates get exact cosine. Never
  all-pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["with_norm", "cosine_topk", "icp_order",
           "nearest_in_reference",
           "lsh_ann", "lsh_ann_multiprobe", "binary_quantize",
           "hamming_topk"]

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) ->"
    " CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
    " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
)


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn(
        "__norm", F.expr(f"sqrt({_DOT.format(a=vec_col, b=vec_col)})")
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, rank, neighbor_id, cosine). Excludes self-match.
    """
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.col("__norm").alias("__qn"),
    )
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        F.col("__norm").alias("__cn"),
    )
    dot = _DOT.format(a="__qv", b="__cv")
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.expr(f"({dot}) / nullif(__qn * __cn, 0e0)"))
    )
    from pyspark.sql.window import Window

    win = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def nearest_in_reference(
    corpus: DataFrame,
    reference: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per corpus vector, THE single nearest reference vector by
    cosine — the embedding-level contamination probe (paraphrased
    benchmark leakage that n-gram overlap cannot see). The reference
    (benchmark) side is small and BROADCAST; the corpus side streams
    through one nested-loop pass and a map-side-combined max — no
    window, no shuffle of vector payloads, so a 100 TB corpus pays a
    single scan.

    Returns (vec_id, bench_id, cosine); ties break to the lowest
    reference id via the max-struct trick (cosine, -id). Zero-norm
    vectors score the -2.0 sentinel (below the valid cosine range)
    instead of NULL so the struct comparison stays total.
    """
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("__cv"),
        F.col("__norm").alias("__cn"),
    )
    r = with_norm(reference, vec_col).select(
        F.col(id_col).alias("__rid"),
        F.col(vec_col).alias("__rv"),
        F.col("__norm").alias("__rn"),
    )
    dot = _DOT.format(a="__cv", b="__rv")
    scored = c.crossJoin(F.broadcast(r)).withColumn(
        "__cos",
        F.expr(f"coalesce(({dot}) / nullif(__cn * __rn, 0e0), -2e0)"))
    return (
        scored.groupBy("vec_id")
        .agg(F.expr("max(named_struct('c', __cos, 'nid', -__rid))")
             .alias("__m"))
        .selectExpr("vec_id", "-__m.nid AS bench_id",
                    "__m.c AS cosine")
    )


# one 32-dim slab of the sign bitmap packed into a BIGINT word:
# bit b set iff component (off + b + 1) is strictly positive. Pure
# integer construction (a comparison and a shift per dim, no float
# arithmetic) -> bit-identical cross-engine.
_BQ_WORD = (
    "aggregate(transform(sequence(0, 31), b -> CASE WHEN"
    " element_at({v}, {off} + b + 1) > 0 THEN"
    " shiftleft(CAST(1 AS BIGINT), b) ELSE CAST(0 AS BIGINT) END),"
    " CAST(0 AS BIGINT), (a, x) -> a + x)"
)


def binary_quantize(df: DataFrame, dim: int = 64,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id") -> DataFrame:
    """1-bit (sign) quantization of an embedding column — the extreme
    compression point of the quantized-retrieval family (PQ keeps m
    bytes, this keeps dim bits): component d contributes bit d iff it
    is strictly positive, packed into ``dim/32`` BIGINT words. At
    100 TB the packed codes are a 32x smaller scan than float32
    vectors and Hamming ranking needs only xor + popcount per pair.

    Returns (id, w0..w{dim/32 - 1}). Deterministic and all-integer.
    """
    if dim % 32 != 0:
        raise ValueError("binary_quantize requires dim % 32 == 0")
    words = [
        F.expr(_BQ_WORD.format(v=vec_col, off=w * 32)).alias(f"w{w}")
        for w in range(dim // 32)
    ]
    return df.select(F.col(id_col), *words)


def hamming_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
                 dim: int = 64, vec_col: str = "embedding",
                 id_col: str = "vec_id") -> DataFrame:
    """Exact top-k by Hamming distance over sign-quantized codes:
    the query code block is broadcast, the corpus codes stream, each
    pair costs ``dim/32`` xor+popcount ops (all JVM built-ins, whole-
    stage codegen). Ties break on neighbor id ascending — fully
    deterministic. Returns (query_id, rank, neighbor_id, hamming).
    """
    from pyspark.sql.window import Window

    nw = dim // 32
    qc = binary_quantize(queries, dim, vec_col, id_col).select(
        F.col(id_col).alias("query_id"),
        *[F.col(f"w{w}").alias(f"q{w}") for w in range(nw)])
    cc = binary_quantize(corpus, dim, vec_col, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        *[F.col(f"w{w}") for w in range(nw)])
    ham = " + ".join(
        f"CAST(bit_count(q{w} ^ w{w}) AS BIGINT)" for w in range(nw))
    scored = (
        cc.join(F.broadcast(qc),
                F.col("query_id") != F.col("neighbor_id"))
        .withColumn("hamming", F.expr(ham))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "hamming")
    )


def _projection_matrix(dim: int, n_planes: int, seed: int):
    """(dim, n_planes) float64 hyperplane matrix — the same integer
    LCG constants as pipeline.dedup.hyperplanes, so SQL oracles can be
    generated from the identical planes."""
    from xsarsea_spark.pipeline.dedup import hyperplanes

    return np.array(hyperplanes(n_planes, dim, seed=seed),
                    dtype=np.float64).T / 1001.0


def _project(emb, K, dim: int, n_planes: int):
    """Projections with column-at-a-time (left-to-right over i)
    accumulation — bit-identical to the unrolled-SQL fold order."""
    V = np.asarray(list(emb.to_numpy()), dtype=np.float64)
    acc = np.zeros((V.shape[0], n_planes), dtype=np.float64)
    for i in range(dim):
        acc += V[:, i:i + 1] * K[i]
    return acc


def _sig_udf(dim: int, n_planes: int, seed: int):
    from pyspark.sql.functions import pandas_udf

    K = _projection_matrix(dim, n_planes, seed)
    w = np.array([1 << j for j in range(n_planes)], dtype=np.int64)

    def _sig(emb: pd.Series) -> pd.Series:
        acc = _project(emb, K, dim, n_planes)
        return pd.Series((acc > 0.0) @ w)

    return pandas_udf(_sig, "bigint")


def _probe_udf(dim: int, n_planes: int, n_probe: int, seed: int):
    """Multi-probe signatures: the exact bucket plus single-bit flips
    of the ``n_probe`` lowest-margin (|projection|) bits — the bits a
    near-duplicate on the other side of a hyperplane would differ in.
    Ties rank by bit index (stable argsort == SQL ORDER BY margin,
    bit)."""
    from pyspark.sql.functions import pandas_udf

    K = _projection_matrix(dim, n_planes, seed)
    w = np.array([1 << j for j in range(n_planes)], dtype=np.int64)

    def _probes(emb: pd.Series) -> pd.Series:
        acc = _project(emb, K, dim, n_planes)
        sig = (acc > 0.0) @ w
        order = np.argsort(np.abs(acc), axis=1, kind="stable")
        out = []
        for r in range(len(sig)):
            probes = [int(sig[r])]
            for t in range(n_probe):
                probes.append(int(sig[r]) ^ (1 << int(order[r, t])))
            out.append(probes)
        return pd.Series(out)

    return pandas_udf(_probes, "array<bigint>")


def _exact_topk(cand: DataFrame, queries: DataFrame, corpus: DataFrame,
                k: int, vec_col: str, id_col: str) -> DataFrame:
    """Exact cosine + per-query top-k over candidate pairs only."""
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"),
        F.col("__norm").alias("__qn"))
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"),
        F.col("__norm").alias("__cn"))
    dot = _DOT.format(a="__qv", b="__cv")
    scored = (
        cand.join(F.broadcast(q), on="query_id")
        .join(c, on="neighbor_id")
        .withColumn("cosine", F.expr(f"({dot}) / nullif(__qn * __cn, 0e0)"))
    )
    from pyspark.sql.window import Window

    win = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def lsh_ann(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 12,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    seed: int = 0xC0FFEE,
) -> DataFrame:
    """Approximate top-k: random-hyperplane signature bucket join, then
    exact cosine within buckets only.

    A vector's signature is the n_planes-bit sign pattern of its
    projections; candidates share the full signature. Recall can be
    raised by lowering n_planes or with ``lsh_ann_multiprobe`` — this
    is the bucketed scale path, not the exactness baseline.
    """
    if dim is None:
        dim = len(queries.select(vec_col).first()[0])
    sig = _sig_udf(dim, n_planes, seed)
    qs = queries.select(F.col(id_col).alias("query_id"),
                        sig(F.col(vec_col)).alias("sig"))
    cs = corpus.select(F.col(id_col).alias("neighbor_id"),
                       sig(F.col(vec_col)).alias("sig"))
    cand = (
        qs.join(cs, on="sig")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
    )
    return _exact_topk(cand, queries, corpus, k, vec_col, id_col)


def lsh_ann_multiprobe(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    seed: int = 0xC0FFEE,
) -> DataFrame:
    """Multi-probe LSH ANN: each query searches its own bucket plus
    the ``n_probe`` buckets one low-margin bit-flip away, recovering
    most of the recall lost to hyperplane quantization at ~(n_probe+1)
    x the candidate cost — still never all-pairs.

    Scale: the corpus is signed once and shuffled once on sig; the
    probe explosion multiplies only the (small) query side.
    """
    if dim is None:
        dim = len(queries.select(vec_col).first()[0])
    sig = _sig_udf(dim, n_planes, seed)
    probes = _probe_udf(dim, n_planes, n_probe, seed)
    qs = (
        queries.select(F.col(id_col).alias("query_id"),
                       probes(F.col(vec_col)).alias("__probes"))
        .select("query_id", F.explode("__probes").alias("sig"))
    )
    cs = corpus.select(F.col(id_col).alias("neighbor_id"),
                       sig(F.col(vec_col)).alias("sig"))
    cand = (
        qs.join(cs, on="sig")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    return _exact_topk(cand, queries, corpus, k, vec_col, id_col)


def icp_order(emb: DataFrame, n_buckets: int,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """In-context-pretraining document ordering (Shi et al. 2023,
    arXiv:2310.10638): lay related documents next to each other so
    packed training sequences hold coherent context, via the paper's
    greedy nearest-neighbor chain — start at the smallest id, hop to
    the nearest unvisited neighbor, repeat. Chains are built inside
    deterministic hash buckets (``id % n_buckets``): the greedy is
    sequential, so the bucket is the parallelism unit (same contract
    as ``packing.pack_best_fit``; size buckets ~10^4 docs).

    Distances are EXACT integer keys: each squared-difference term is
    a double, floor-truncated onto the 1e-9 grid and summed as int64
    (the DSUM/QTRUNC convention) — so the argmin, and therefore the
    whole chain, is bit-replicable in any engine regardless of fold
    order. Ties break on the smaller id.

    Returns (bucket, chain_pos, id, d2_prev) with d2_prev = -1 for
    each chain head. Downstream, packing along (bucket, chain_pos)
    order IS the ICP layout.
    """
    from pyspark.sql import types as T

    items = emb.selectExpr(
        f"{id_col} AS vec_id", f"{vec_col} AS embedding",
        f"{id_col} % {n_buckets} AS bucket")

    schema = T.StructType([
        T.StructField("bucket", T.LongType()),
        T.StructField("chain_pos", T.LongType()),
        T.StructField("vec_id", T.LongType()),
        T.StructField("d2_prev", T.LongType()),
    ])

    def kernel(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("vec_id")
        bucket = int(pdf["bucket"].iloc[0])
        ids = pdf["vec_id"].to_numpy()
        E = np.stack([np.asarray(e, dtype=np.float64)
                      for e in pdf["embedding"]])
        m = len(ids)
        visited = np.zeros(m, dtype=bool)
        cur = 0                      # smallest id after the sort
        visited[0] = True
        rows = [(bucket, 1, int(ids[0]), -1)]
        sentinel = np.iinfo(np.int64).max
        for pos in range(2, m + 1):
            diff = E - E[cur]
            # exact integer distance key: per-term double product,
            # floor onto the 1e-9 grid, int64 sum — fold-order-free
            q = np.floor(diff * diff * 1e9).astype(np.int64) \
                .sum(axis=1)
            q[visited] = sentinel
            nxt = int(np.argmin(q))  # first occurrence = smaller id
            rows.append((bucket, pos, int(ids[nxt]), int(q[nxt])))
            visited[nxt] = True
            cur = nxt
        return pd.DataFrame(
            rows, columns=[f.name for f in schema.fields])

    return items.groupBy("bucket").applyInPandas(kernel, schema)
