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

Determinism and oracle parity: centroid init is the first K vectors
in id order; every subspace distance accumulates left-to-right over
the dimension index (``_seq_sqdist`` — bit-identical to a SQL fold,
unlike NumPy's pairwise ``.sum``); Lloyd sums go through the
scale-``PQ_SCALE`` integer grid so reduction order can't perturb
them; and all tie-breaks (code assignment, shortlist, top-k) resolve
on (distance, id). The full train → encode → ADC → refine chain is
value-replicable by the chained-CTE DuckDB oracle in
suite.pipeline_suite._pq_oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from xsarsea_spark.pipeline.ivf import _quantize

__all__ = ["train_pq", "encode_pq", "pq_search", "PQ_SCALE"]

# Codebook-sum quantization grid (matches the oracle's DECIMAL(38,9)).
PQ_SCALE = 9


def _seq_sqdist(vs: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Squared L2 from each row of ``vs`` (n, sub) to each row of
    ``b`` (k, sub), accumulated left-to-right over the sub-dimension —
    the SQL ``list_reduce`` fold order, one rounding per step."""
    acc = np.zeros((vs.shape[0], b.shape[0]))
    for d in range(vs.shape[1]):
        diff = vs[:, d, None] - b[None, :, d]
        acc += diff * diff
    return acc


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
        T.StructField("q", T.LongType()),
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
                    # squared L2 to each of the k centroids; ties ->
                    # lowest cell (oracle: ORDER BY d2, cell)
                    cell = np.argmin(_seq_sqdist(vs, b[s_i]), axis=1)
                    quanta = _quantize(
                        vs * 10.0 ** PQ_SCALE).astype(np.int64)
                    for cid in np.unique(cell):
                        msk = cell == cid
                        ssum = quanta[msk].sum(axis=0)
                        n = int(msk.sum())
                        rows.extend(
                            (s_i, int(cid), i, int(ssum[i]), n)
                            for i in range(sub))
                yield pd.DataFrame(
                    rows, columns=["sub", "cell", "i", "q", "n"])

        sums = (
            corpus.select(vec_col)
            .mapInPandas(partial_gen, schema=part_schema)
            .groupBy("sub", "cell", "i")
            .agg(F.sum("q").alias("q"), F.sum("n").alias("n"))
            .collect()
        )
        new = books.copy()
        for r in sums:
            new[r["sub"], r["cell"], r["i"]] = (
                float(r["q"]) / 10.0 ** PQ_SCALE) / r["n"]
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
                codes[:, s_i] = np.argmin(
                    _seq_sqdist(v[:, sl], books[s_i]), axis=1)
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
        tables[:, s_i, :] = _seq_sqdist(qv[:, sl], books[s_i])
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
            # per-partition top-k per query bounds shuffle volume.
            # Shared codes make exact ADC ties STRUCTURAL, so the
            # preselection must order ties by neighbor_id (lexsort)
            # or a boundary tie could evict the row the global
            # (adc_dist, neighbor_id) rank keeps.
            take = min(k, c.shape[0])
            rows = []
            for qi in range(len(ids)):
                part = np.lexsort((nid, dist[qi]))[:take]
                for xi in part:
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
