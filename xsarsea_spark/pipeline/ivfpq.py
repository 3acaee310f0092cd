"""IVF-PQ: coarse quantizer + product-quantized RESIDUALS + cell-
probed ADC search — the FAISS ``IndexIVFPQ`` shape, the index
production vector search actually ships (IVF alone re-reads full
vectors inside probed cells; PQ alone scans every code; IVF-PQ scans
only the probed cells' codes).

Composition over new machinery: the coarse quantizer IS
``pq.train_pq`` with m=1 (one subspace spanning the full dimension =
plain L2 Lloyd on the same deterministic integer-quantized-sum
machinery), residual encoding is an exact double subtraction
``v - centroid[cell]`` (SQL-replicable: ``e[i] - bc[i]``), and the
residual codebooks are ``pq.train_pq`` over the residual frame.

Scale design (100 TB): the index is two small columns on the corpus
(``cell`` int + ``codes`` m bytes); ``cell`` becomes the partition/
bucket key so a probe reads only its cells' files; search broadcasts
per-(query, probed-cell) ADC tables (n_q * n_probe * m * K doubles —
corpus-independent), streams the probed codes once, and reduces
per-partition top-k candidates. Training driver state is centroids +
codebooks only. The exact-refine stage joins original vectors back
for the shortlist only (n_q * shortlist rows).

Determinism and oracle parity: every float reduction is the
fold-ordered ``pq._seq_sqdist``; ADC accumulates ascending subspace
index (zero-init += — bit-equal to the SQL ``list_reduce`` over
``ORDER BY s``); all tie-breaks resolve on (distance, cell/id
ascending). The full coarse-train -> residual-train -> encode ->
probe -> ADC -> refine chain is value-replicated by the chained-CTE
DuckDB oracle in ``suite.pipeline_suite._ivfpq_oracle``.

Reference parity: the reference engine has no vector surface; this
completes the engine-brief ANN family (LSH, IVF, PQ, IVF-PQ).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from xsarsea_spark.engine import materialize
from xsarsea_spark.pipeline.pq import _seq_sqdist, encode_pq, train_pq

__all__ = ["train_ivfpq", "encode_ivfpq", "ivfpq_search"]


def _residuals(corpus: DataFrame, coarse: np.ndarray,
               vec_col: str, id_col: str) -> DataFrame:
    """(id, cell, resid): coarse assignment (argmin fold-ordered L2,
    ties -> lowest cell) + exact double residual ``v - centroid``."""
    spark = corpus.sparkSession
    cells = encode_pq(corpus, coarse[None], vec_col=vec_col,
                      id_col=id_col).selectExpr(id_col,
                                                "codes[0] AS cell")
    cents = spark.createDataFrame(
        [(i, [float(x) for x in coarse[i]])
         for i in range(coarse.shape[0])],
        "cell int, __cent array<double>")
    return (
        corpus.select(id_col, vec_col)
        .join(cells, on=id_col)
        .join(F.broadcast(cents), on="cell")
        .select(id_col, "cell",
                F.expr(f"zip_with({vec_col}, __cent,"
                       " (a, b) -> CAST(a AS DOUBLE) - b)")
                .alias("resid"))
    )


def train_ivfpq(corpus: DataFrame, n_cells: int = 8, m: int = 8,
                k: int = 16, iters: int = 3,
                vec_col: str = "embedding",
                id_col: str = "vec_id"
                ) -> tuple[np.ndarray, np.ndarray]:
    """Returns (coarse centroids (n_cells, dim), residual codebooks
    (m, k, dim/m)). Coarse training is ``train_pq(m=1)``; residual
    training runs on the materialized residual frame (one subtraction
    pass, then the standard one-scan-per-round PQ Lloyd)."""
    coarse = train_pq(corpus, m=1, k=n_cells, iters=iters,
                      vec_col=vec_col, id_col=id_col)[0]
    resid = materialize(
        _residuals(corpus, coarse, vec_col, id_col))
    books = train_pq(resid, m=m, k=k, iters=iters,
                     vec_col="resid", id_col=id_col)
    return coarse, books


def encode_ivfpq(corpus: DataFrame, coarse: np.ndarray,
                 books: np.ndarray, vec_col: str = "embedding",
                 id_col: str = "vec_id") -> DataFrame:
    """The index: (id, cell, codes array<int> of length m)."""
    resid = _residuals(corpus, coarse, vec_col, id_col)
    codes = encode_pq(resid, books, vec_col="resid", id_col=id_col)
    return resid.select(id_col, "cell").join(codes, on=id_col)


def ivfpq_search(queries: DataFrame, index: DataFrame,
                 coarse: np.ndarray, books: np.ndarray,
                 k: int = 5, n_probe: int = 3,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 corpus: DataFrame | None = None,
                 shortlist: int | None = None) -> DataFrame:
    """Cell-probed ADC top-k over the (cell, codes) index.

    Per query: the ``n_probe`` nearest coarse cells (fold-ordered L2,
    ties -> lowest cell), one (m x K) ADC table per probed cell built
    from the RESIDUAL query ``q - centroid[cell]``, then every code
    row in a probed cell costs m table lookups. With ``corpus``
    given, the FAISS-style refine reranks the ``shortlist`` (default
    10*k) by exact squared L2 on the original vectors. Returns
    (query_id, rank, neighbor_id, adc_dist).
    """
    if corpus is not None:
        r = shortlist or 10 * k
        cand = ivfpq_search(queries, index, coarse, books, k=r,
                            n_probe=n_probe, vec_col=vec_col,
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
    d2c = _seq_sqdist(qv, np.ascontiguousarray(coarse))
    # ascending stable argsort: a tie keeps the lowest cell, matching
    # the oracle's ORDER BY d2 ASC, cell ASC
    probed = np.argsort(d2c, axis=1, kind="stable")[:, :n_probe]
    tabs = np.empty((len(q_ids), n_probe, m, kk))
    for j in range(n_probe):
        r = qv - coarse[probed[:, j]]
        for s_i in range(m):
            sl = slice(s_i * sub, (s_i + 1) * sub)
            tabs[:, j, s_i, :] = _seq_sqdist(r[:, sl], books[s_i])
    bc = spark.sparkContext.broadcast((q_ids, probed, tabs))

    out_schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("adc_dist", T.DoubleType()),
    ])
    take = k

    def gen(batches):
        ids, prb, tb = bc.value
        # cell -> [(query row, probe slot)] — which queries probe it
        by_cell: dict[int, list] = {}
        for qi in range(len(ids)):
            for j in range(prb.shape[1]):
                by_cell.setdefault(int(prb[qi, j]), []).append((qi, j))
        for pdf in batches:
            rows = []
            cells = pdf["cell"].to_numpy()
            nid = pdf[id_col].to_numpy()
            codes = np.stack([np.asarray(x, dtype=np.int64)
                              for x in pdf["codes"]])
            for c in np.unique(cells):
                hits = by_cell.get(int(c))
                if not hits:
                    continue
                msk = cells == c
                cc, nn = codes[msk], nid[msk]
                for qi, j in hits:
                    # ascending-s zero-init accumulation — the SQL
                    # list_reduce(list(td ORDER BY s)) fold
                    dist = np.zeros(cc.shape[0])
                    for s_i in range(m):
                        dist += tb[qi, j, s_i, cc[:, s_i]]
                    # per-partition preselect; ties must order by
                    # neighbor_id (lexsort) like the global rank
                    part = np.lexsort((nn, dist))[:min(take, len(nn))]
                    rows.extend(
                        (int(ids[qi]), int(nn[xi]), float(dist[xi]))
                        for xi in part)
            yield pd.DataFrame(
                rows, columns=["query_id", "neighbor_id", "adc_dist"])

    cand = index.mapInPandas(gen, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "adc_dist")
    )
