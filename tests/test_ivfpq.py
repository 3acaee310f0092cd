"""IVF-PQ quality + determinism guards (`pipeline/ivfpq.py`). Value
correctness vs the chained-CTE oracle is covered by the registry test
(`ivfpq_ann`); these pin the properties an exact-value oracle cannot:
the index actually retrieves true neighbors, and re-runs are
bit-stable."""

from __future__ import annotations

import numpy as np

from .conftest import SF_DIR_SMALL

_KW = dict(n_cells=8, m=8, k=16, iters=2)


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR_SMALL}/embeddings.parquet")


def test_ivfpq_recall_floor_and_determinism(spark):
    from xsarsea_spark.pipeline.ivfpq import (encode_ivfpq,
                                              ivfpq_search, train_ivfpq)

    emb = _emb(spark)
    coarse, books = train_ivfpq(emb, **_KW)
    idx = encode_ivfpq(emb, coarse, books)
    q = emb.filter("vec_id < 20")
    got = ivfpq_search(q, idx, coarse, books, k=5, n_probe=3,
                       corpus=emb, shortlist=50)
    got_rows = got.collect()
    got_map: dict[int, set] = {}
    for r in got_rows:
        got_map.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert len(got_map) == 20
    assert all(len(v) == 5 for v in got_map.values())

    # brute-force L2 ground truth (ties -> lowest id, like the index)
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    v = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    order = np.argsort(ids)
    ids, v = ids[order], v[order]
    hits, total = 0, 0
    for qi in range(20):
        d = ((v - v[qi]) ** 2).sum(axis=1)
        top = set(ids[np.lexsort((ids, d))[:5]].tolist())
        hits += len(top & got_map[int(ids[qi])])
        total += 5
    recall = hits / total
    # probing 3 of 8 cells: a degenerate index (all-one-cell
    # centroids, residual codes collapsing) would crater this
    assert recall >= 0.5, f"recall@5 {recall} below floor"
    # the probed search is exact for the query itself (residual 0 ->
    # its own codes reproduce it closest in ADC after refine)
    assert all(qid in got_map[qid] for qid in got_map)

    # determinism: retrain + re-search is bit-identical
    coarse2, books2 = train_ivfpq(emb, **_KW)
    assert (coarse2 == coarse).all() and (books2 == books).all()
    got2 = ivfpq_search(q, encode_ivfpq(emb, coarse2, books2),
                        coarse2, books2, k=5, n_probe=3,
                        corpus=emb, shortlist=50).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(map(tuple, got2), key=lambda t: (t[0], t[1])) == \
        sorted(map(tuple, got_rows), key=lambda t: (t[0], t[1]))


def test_ivfpq_incremental_matches_oneshot_search(spark):
    """The persisted cell-partitioned postings + O(batch) append must
    be search-indistinguishable from a one-shot encode with the same
    frozen quantizers — catches dtype/partition drift through the
    parquet round trip (the `ivfpq_incremental` maintenance path)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from xsarsea_spark.pipeline.ivfpq import (encode_ivfpq,
                                              ivfpq_search, train_ivfpq)

    emb = _emb(spark)
    hist = emb.filter("vec_id < 80")
    batch = emb.filter("vec_id >= 80")
    coarse, books = train_ivfpq(hist, **_KW)

    base = tempfile.mkdtemp(prefix="ivfpq_inc_")
    try:
        encode_ivfpq(hist, coarse, books) \
            .write.mode("overwrite").partitionBy("cell").parquet(base)
        idx_hist = (spark.read.parquet(base)
                    .withColumn("cell", F.col("cell").cast("int"))
                    .select("vec_id", "cell", "codes"))
        idx_inc = idx_hist.unionByName(
            encode_ivfpq(batch, coarse, books)
            .select("vec_id", "cell", "codes"))
        idx_one = encode_ivfpq(emb, coarse, books) \
            .select("vec_id", "cell", "codes")

        q = emb.filter("vec_id < 10")
        key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
        got_inc = sorted(ivfpq_search(
            q, idx_inc, coarse, books, k=5, n_probe=3).collect(),
            key=key)
        got_one = sorted(ivfpq_search(
            q, idx_one, coarse, books, k=5, n_probe=3).collect(),
            key=key)
        assert [tuple(r) for r in got_inc] == [tuple(r) for r in got_one]
        assert len(got_inc) == 50
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_ivfpq_index_shape(spark):
    from xsarsea_spark.pipeline.ivfpq import encode_ivfpq, train_ivfpq

    emb = _emb(spark)
    coarse, books = train_ivfpq(emb, **_KW)
    assert coarse.shape == (8, 64) and books.shape == (8, 16, 8)
    idx = encode_ivfpq(emb, coarse, books).collect()
    assert len(idx) == emb.count()
    for r in idx:
        assert 0 <= r["cell"] < 8
        assert len(r["codes"]) == 8
        assert all(0 <= c < 16 for c in r["codes"])
