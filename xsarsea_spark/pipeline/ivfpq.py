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
bucket key so a probe reads only its cells' files. Search builds the
per-(query, probed-cell) residual ADC tables (m * K doubles each —
corpus-independent) in one O(batch) Arrow pass over the DISTRIBUTED
query frame, equi-joins them on ``cell`` against the postings
(broadcast by default; a batch too big to broadcast shuffle-joins
co-partitioned with the cell-partitioned index), and evaluates the m
lookups as a JVM-side ``aggregate`` fold whose top-k rank filter
collapses to WindowGroupLimit. Training driver state is centroids +
codebooks only — neither the corpus nor the query batch ever lands
on the driver. The exact-refine stage joins original vectors back
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
from xsarsea_spark.pipeline.pq import _seq_sqdist, train_pq

__all__ = ["train_ivfpq", "encode_ivfpq", "ivfpq_search"]


def _residuals(corpus: DataFrame, coarse: np.ndarray,
               vec_col: str, id_col: str) -> DataFrame:
    """(id, cell, resid): coarse assignment (argmin fold-ordered L2,
    ties -> lowest cell) + exact double residual ``v - centroid`` —
    ONE narrow kernel pass. The assignment and the subtraction share
    the batch, so no corpus-wide join ever re-attaches the cell (the
    join shape shuffled the vectors by id on both sides)."""
    co = np.ascontiguousarray(coarse, dtype=np.float64)
    schema = T.StructType([
        corpus.schema[id_col],
        T.StructField("cell", T.IntegerType()),
        T.StructField("resid", T.ArrayType(T.DoubleType())),
    ])

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.stack([np.asarray(x, dtype=np.float64)
                          for x in pdf[vec_col]])
            # same argmin as encode_pq with m=1 (ties -> lowest cell);
            # float32 -> float64 is exact, and the elementwise double
            # subtraction is the zip_with CAST(a AS DOUBLE) - b op
            cell = np.argmin(_seq_sqdist(v, co), axis=1)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "cell": cell.astype(np.int32),
                "resid": list(v - co[cell]),
            })

    return corpus.select(id_col, vec_col).mapInPandas(
        gen, schema=schema)


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
    """The index: (id, cell, codes array<int> of length m), built in
    ONE kernel pass — coarse assign, residual subtraction and the
    residual-PQ code assignment share the batch (the staged shape
    re-joined two corpus-wide frames on id just to glue cell and
    codes back together)."""
    co = np.ascontiguousarray(coarse, dtype=np.float64)
    m, _, sub = books.shape
    slices = [slice(i * sub, (i + 1) * sub) for i in range(m)]
    schema = T.StructType([
        corpus.schema[id_col],
        T.StructField("cell", T.IntegerType()),
        T.StructField("codes", T.ArrayType(T.IntegerType())),
    ])

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.stack([np.asarray(x, dtype=np.float64)
                          for x in pdf[vec_col]])
            cell = np.argmin(_seq_sqdist(v, co), axis=1)
            r = v - co[cell]
            codes = np.empty((v.shape[0], m), dtype=np.int32)
            for s_i, sl in enumerate(slices):
                codes[:, s_i] = np.argmin(
                    _seq_sqdist(r[:, sl], books[s_i]), axis=1)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "cell": cell.astype(np.int32),
                "codes": list(codes),
            })

    return corpus.select(id_col, vec_col).mapInPandas(
        gen, schema=schema)


def ivfpq_search(queries: DataFrame, index: DataFrame,
                 coarse: np.ndarray, books: np.ndarray,
                 k: int = 5, n_probe: int = 3,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 corpus: DataFrame | None = None,
                 shortlist: int | None = None,
                 broadcast_queries: bool = True) -> DataFrame:
    """Cell-probed ADC top-k over the (cell, codes) index.

    Per query: the ``n_probe`` nearest coarse cells (fold-ordered L2,
    ties -> lowest cell), one (m x K) ADC table per probed cell built
    from the RESIDUAL query ``q - centroid[cell]``, then every code
    row in a probed cell costs m table lookups. The probe tables are
    built by a distributed O(batch) Arrow pass and equi-joined on
    ``cell`` — the query batch never lands on the driver (set
    ``broadcast_queries=False`` to shuffle-join a huge batch instead
    of broadcasting the tables). With ``corpus`` given, the
    FAISS-style refine reranks the ``shortlist`` (default 10*k) by
    exact squared L2 on the original vectors. Returns
    (query_id, rank, neighbor_id, adc_dist).
    """
    if corpus is not None:
        r = shortlist or 10 * k
        cand = ivfpq_search(queries, index, coarse, books, k=r,
                            n_probe=n_probe, vec_col=vec_col,
                            id_col=id_col,
                            broadcast_queries=broadcast_queries)
        qv = queries.select(F.col(id_col).alias("query_id"),
                            F.col(vec_col).alias("__qv"))
        cv = corpus.select(F.col(id_col).alias("neighbor_id"),
                           F.col(vec_col).alias("__cv"))
        # the shortlist is batch-bounded (n_q * shortlist rows):
        # broadcast it so the corpus vectors stream through the
        # refine join instead of being shuffled by neighbor_id
        cand = F.broadcast(cand) if broadcast_queries else cand
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

    m, kk, sub = books.shape
    co = np.ascontiguousarray(coarse)

    tab_schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("cell", T.IntegerType()),
        T.StructField("__tab", T.ArrayType(T.DoubleType())),
    ])

    def q_tables(batches):
        # per (query, probed cell) ONE flattened (m * K) RESIDUAL
        # distance table — O(batch * n_probe) work, corpus-
        # independent; the query batch never lands on the driver
        # (only the coarse centroids + codebooks are shipped, and
        # those are bounded by the index config, not the data)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qv = np.stack([np.asarray(x, dtype=np.float64)
                           for x in pdf[vec_col]])
            qid = pdf[id_col].to_numpy()
            d2c = _seq_sqdist(qv, co)
            # ascending stable argsort: a tie keeps the lowest cell,
            # matching the oracle's ORDER BY d2 ASC, cell ASC
            probed = np.argsort(d2c, axis=1, kind="stable")[:, :n_probe]
            out_q, out_c, out_t = [], [], []
            for j in range(n_probe):
                r = qv - co[probed[:, j]]
                tabs = np.empty((len(qid), m, kk))
                for s_i in range(m):
                    sl = slice(s_i * sub, (s_i + 1) * sub)
                    tabs[:, s_i, :] = _seq_sqdist(r[:, sl], books[s_i])
                out_q.append(qid)
                out_c.append(probed[:, j].astype(np.int32))
                out_t.extend(tabs.reshape(len(qid), m * kk))
            yield pd.DataFrame({
                "query_id": np.concatenate(out_q),
                "cell": np.concatenate(out_c),
                "__tab": out_t,
            })

    qtab = queries.select(id_col, vec_col).mapInPandas(
        q_tables, schema=tab_schema)
    qtab = F.broadcast(qtab) if broadcast_queries else qtab
    # equi-join on cell: a posting row meets exactly the queries that
    # probe its cell — the IVF pruning IS the join key, so with
    # cell-partitioned postings a probe reads only its cells' files.
    # JVM-side ADC: m lookups folded ascending-s with a 0d init (the
    # oracle's list_reduce order, bit-equal to the old Arrow kernel);
    # the codes never cross into Python.
    adc = F.expr(
        f"aggregate(sequence(0, {m - 1}), 0d, (acc, s) -> acc"
        f" + element_at(__tab, CAST(s * {kk}"
        " + element_at(codes, s + 1) + 1 AS INT)))")
    cand = (index.withColumn("cell", F.col("cell").cast("int"))
            .join(qtab, on="cell")
            .select("query_id",
                    F.col(id_col).alias("neighbor_id"),
                    adc.alias("adc_dist")))
    # rank <= k collapses to WindowGroupLimit: each probed partition
    # pre-selects its own top-k per query map-side (ties resolved by
    # neighbor_id), bounding the exchange like the old preselect
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "adc_dist")
    )
