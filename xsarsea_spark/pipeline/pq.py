"""Product quantization (PQ) for embedding compression + ANN search.

The third similarity scale path next to LSH bucketing
(pipeline.similarity) and IVF cell probing (pipeline.ivf): vectors are
split into M subspaces, each subspace k-means-quantized to K
centroids, and every vector stored as M small codes (M bytes for
K<=256) — a 32x compression of a float64 corpus. Search is ADC
(asymmetric distance computation): per query ONE (M x K) table of
exact subspace distances, then every corpus distance is M table
lookups — no float math against the corpus at all.

Scale design (100 TB): training folds map-side partial sums through
one bounded (M*K*sub) reduction per Lloyd round (same shape as
pipeline.ivf.train_ivf); encoding is one mapInPandas pass; search
broadcasts only the per-query distance TABLES (n_q * M * K doubles —
independent of corpus size), streams the codes table once, and
reduces per-partition top-k candidates. Everything driver-side is
bounded by the codebook, never the corpus.

Determinism: centroid init is the first K vectors in id order, Lloyd
partial sums reduce through Spark's exact-enough double aggregation
identically each run on the same data; ties in code assignment and
top-k break on (distance, id) so repeated runs emit identical rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

__all__ = ["train_pq", "encode_pq", "pq_search"]


def _split(dim: int, m: int) -> list:
    """Subspace column slices; dim must divide evenly into m."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    return [slice(i * sub, (i + 1) * sub) for i in range(m)]


def train_pq(corpus: DataFrame, m: int = 8, k: int = 16, iters: int = 5,
             vec_col: str = "embedding",
             id_col: str = "vec_id") -> np.ndarray:
    """Deterministic per-subspace Lloyd training.

    Returns codebooks of shape (m, k, dim/m). All m subspaces train in
    the SAME pass over the corpus each round: the kernel emits
    per-(subspace, cell) partial sums, so one corpus scan + one
    bounded reduction per iteration regardless of m.
    """
    dim = len(corpus.select(vec_col).first()[0])
    slices = _split(dim, m)
    sub = dim // m
    init = corpus.orderBy(id_col).limit(k).select(vec_col).collect()
    first = np.stack([np.asarray(r[0], dtype=np.float64) for r in init])
    books = np.stack([first[:, sl] for sl in slices])     # (m, k, sub)

    part_schema = T.StructType([
        T.StructField("sub", T.IntegerType()),
        T.StructField("cell", T.IntegerType()),
        T.StructField("i", T.IntegerType()),
        T.StructField("s", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ])
    for _ in range(iters):
        b = np.ascontiguousarray(books)

        def partial_gen(batches, b=b):
            for pdf in batches:
                v = np.stack([np.asarray(x, dtype=np.float64)
                              for x in pdf[vec_col]])
                rows = []
                for s_i, sl in enumerate(slices):
                    vs = v[:, sl]                          # (n, sub)
                    # squared L2 to each of the k centroids
                    d = ((vs[:, None, :] - b[s_i][None, :, :]) ** 2
                         ).sum(axis=2)
                    cell = np.argmin(d, axis=1)
                    for cid in np.unique(cell):
                        msk = cell == cid
                        ssum = vs[msk].sum(axis=0)
                        n = int(msk.sum())
                        rows.extend(
                            (s_i, int(cid), i, float(ssum[i]), n)
                            for i in range(sub))
                yield pd.DataFrame(
                    rows, columns=["sub", "cell", "i", "s", "n"])

        sums = (
            corpus.select(vec_col)
            .mapInPandas(partial_gen, schema=part_schema)
            .groupBy("sub", "cell", "i")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        new = books.copy()
        for r in sums:
            new[r["sub"], r["cell"], r["i"]] = r["s"] / r["n"]
        books = new
    return books


def _encode_kernel(books: np.ndarray, id_col: str, vec_col: str):
    m, _, sub = books.shape
    slices = [slice(i * sub, (i + 1) * sub) for i in range(m)]

    def gen(batches):
        for pdf in batches:
            v = np.stack([np.asarray(x, dtype=np.float64)
                          for x in pdf[vec_col]])
            codes = np.empty((v.shape[0], m), dtype=np.int32)
            for s_i, sl in enumerate(slices):
                d = ((v[:, sl][:, None, :] - books[s_i][None, :, :])
                     ** 2).sum(axis=2)
                codes[:, s_i] = np.argmin(d, axis=1)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "codes": list(codes),
            })

    return gen


def encode_pq(corpus: DataFrame, books: np.ndarray,
              vec_col: str = "embedding",
              id_col: str = "vec_id") -> DataFrame:
    """Compress: (id, codes array<int> of length m)."""
    schema = T.StructType([
        corpus.schema[id_col],
        T.StructField("codes", T.ArrayType(T.IntegerType())),
    ])
    return corpus.select(id_col, vec_col).mapInPandas(
        _encode_kernel(books, id_col, vec_col), schema=schema)


def pq_search(queries: DataFrame, codes: DataFrame, books: np.ndarray,
              k: int = 5, vec_col: str = "embedding",
              id_col: str = "vec_id",
              corpus: DataFrame | None = None,
              shortlist: int | None = None) -> DataFrame:
    """ADC top-k: per query one exact (m x K) subspace distance table,
    corpus distances are m integer-indexed lookups into it.

    Returns (query_id, rank, neighbor_id, adc_dist) — approximate
    squared L2. The query table block is collected (bounded: the query
    set is the small side by contract, as in embedding_knn) and
    broadcast; per-partition top-k bounds the reduce input.

    With ``corpus`` given, runs the FAISS-style refine stage: ADC
    produces a ``shortlist`` (default 10*k) per query, the original
    vectors are joined back for ONLY those rows (n_q * shortlist — a
    sliver of the corpus), and exact squared L2 reranks. Quantization
    error then only costs recall where a true neighbor misses the
    whole shortlist, so recall@k climbs with shortlist size at
    constant scan cost; ``adc_dist`` in the output becomes the exact
    distance.
    """
    if corpus is not None:
        r = shortlist or 10 * k
        cand = pq_search(queries, codes, books, k=r, vec_col=vec_col,
                         id_col=id_col)
        qv = queries.select(F.col(id_col).alias("query_id"),
                            F.col(vec_col).alias("__qv"))
        cv = corpus.select(F.col(id_col).alias("neighbor_id"),
                           F.col(vec_col).alias("__cv"))
        exact = (
            cand.join(cv, on="neighbor_id")
            .join(F.broadcast(qv), on="query_id")
            .withColumn(
                "adc_dist",
                F.expr("aggregate(zip_with(__qv, __cv,"
                       " (a, b) -> CAST(a - b AS DOUBLE)"
                       " * CAST(a - b AS DOUBLE)),"
                       " 0d, (acc, x) -> acc + x)"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("adc_dist").asc(), F.col("neighbor_id").asc())
        return (
            exact.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "adc_dist")
        )
    spark = queries.sparkSession
    m, kk, sub = books.shape
    q_rows = queries.select(id_col, vec_col).orderBy(id_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    qv = np.stack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    # (n_q, m, K) distance tables — independent of corpus size
    tables = np.empty((len(q_ids), m, kk))
    for s_i in range(m):
        sl = slice(s_i * sub, (s_i + 1) * sub)
        tables[:, s_i, :] = (
            (qv[:, sl][:, None, :] - books[s_i][None, :, :]) ** 2
        ).sum(axis=2)
    bc = spark.sparkContext.broadcast((q_ids, tables))

    out_schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("adc_dist", T.DoubleType()),
    ])

    def gen(batches):
        ids, tabs = bc.value
        for pdf in batches:
            c = np.stack([np.asarray(x, dtype=np.int64)
                          for x in pdf["codes"]])       # (n, m)
            nid = pdf[id_col].to_numpy()
            # dist[q, x] = sum_s tabs[q, s, c[x, s]]
            dist = np.zeros((len(ids), c.shape[0]))
            for s_i in range(m):
                dist += tabs[:, s_i, c[:, s_i]]
            # per-partition top-k per query bounds shuffle volume
            take = min(k, c.shape[0])
            part = np.argpartition(dist, take - 1, axis=1)[:, :take]
            rows = []
            for qi in range(len(ids)):
                for xi in part[qi]:
                    rows.append((int(ids[qi]), int(nid[xi]),
                                 float(dist[qi, xi])))
            yield pd.DataFrame(
                rows, columns=["query_id", "neighbor_id", "adc_dist"])

    cand = codes.mapInPandas(gen, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "adc_dist")
    )
