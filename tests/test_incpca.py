"""Incremental PCA state: int64 quantum sums make batch merging
exactly replay-equivalent — state(batches) merged in ANY grouping must
equal state(union) bit-for-bit, and the eigensolve must read off the
state alone."""

from __future__ import annotations

from .conftest import SF_DIR_SMALL


def _state_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_batched_state_equals_oneshot(spark):
    from xsarsea_spark.pipeline.incpca import moment_merge, moment_state

    emb = spark.read.parquet(f"{SF_DIR_SMALL}/embeddings.parquet")
    full = moment_state(emb, d=64)
    parts = [moment_state(emb.filter(f"vec_id % 3 = {b}"), d=64)
             for b in range(3)]
    merged = moment_merge(parts)
    assert _state_rows(merged) == _state_rows(full)
    # associativity/grouping independence: ((b0+b1)+b2) == (b0+(b1+b2))
    left = moment_merge([moment_merge(parts[:2]), parts[2]])
    right = moment_merge([parts[0], moment_merge(parts[1:])])
    assert _state_rows(left) == _state_rows(right) == _state_rows(full)


def test_eigensolve_from_merged_state_matches_oneshot(spark):
    from xsarsea_spark.pipeline.incpca import (moment_merge,
                                               moment_state,
                                               pca_from_moments)

    emb = spark.read.parquet(f"{SF_DIR_SMALL}/embeddings.parquet")
    one = pca_from_moments(moment_state(emb, d=64), d=64, rounds=12)
    parts = [moment_state(emb.filter(f"vec_id % 2 = {b}"), d=64)
             for b in range(2)]
    inc = pca_from_moments(moment_merge(parts), d=64, rounds=12)
    got = sorted(tuple(r) for r in inc.collect())
    want = sorted(tuple(r) for r in one.collect())
    assert got == want
    assert len(got) == 64


def test_empty_corpus_yields_no_rows(spark):
    from xsarsea_spark.pipeline.incpca import moment_state, pca_from_moments

    emb = spark.read.parquet(
        f"{SF_DIR_SMALL}/embeddings.parquet").filter("vec_id < 0")
    out = pca_from_moments(moment_state(emb, d=64), d=64, rounds=12)
    assert out.count() == 0
