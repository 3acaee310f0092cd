"""Tokenizer artifact persistence: the persisted merge table IS the
tokenizer — save -> load -> single-pass Arrow apply must reproduce the
training loop's encode bit-for-bit, word-level and byte-level, on the
real corpus and on adversarial run-heavy inputs (where greedy-scan vs
run-parity-closed-form equivalence actually matters)."""

from __future__ import annotations

import pytest

from .conftest import SF_DIR_SMALL


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=lambda t: t[0])


def test_save_load_roundtrip_exact(spark, tmp_path):
    from xsarsea_spark.pipeline.bpe import (bpe_load_merges,
                                            bpe_save_merges, bpe_train)

    docs = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
    merges = bpe_train(docs, n_merges=4)
    path = str(tmp_path / "merges")
    bpe_save_merges(merges, path)
    back = bpe_load_merges(spark, path)
    assert back.schema == merges.schema
    assert _rows(back) == _rows(merges)


def test_apply_matches_encode_wordlevel(spark, tmp_path):
    from xsarsea_spark.pipeline.bpe import (bpe_apply, bpe_encode,
                                            bpe_load_merges,
                                            bpe_save_merges, bpe_train)

    docs = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
    path = str(tmp_path / "merges")
    bpe_save_merges(bpe_train(docs, n_merges=4), path)
    got = bpe_apply(docs, bpe_load_merges(spark, path))
    want = bpe_encode(docs, n_merges=4)
    assert got.schema == want.schema
    assert _rows(got) == _rows(want)


def test_apply_matches_encode_bytelevel(spark, tmp_path):
    from xsarsea_spark.pipeline.bpe import (bpe_apply_bytelevel,
                                            bpe_bytelevel_encode,
                                            bpe_bytelevel_train,
                                            bpe_load_merges,
                                            bpe_save_merges)

    # every 4th doc: the byte-level loop is the expensive one and the
    # parity claim is per-row, so a corpus slice loses no coverage
    docs = spark.read.parquet(
        f"{SF_DIR_SMALL}/documents.parquet").filter("doc_id % 4 = 0")
    path = str(tmp_path / "bl_merges")
    bpe_save_merges(bpe_bytelevel_train(docs, n_merges=3), path)
    got = bpe_apply_bytelevel(docs, bpe_load_merges(spark, path))
    want = bpe_bytelevel_encode(docs, n_merges=3)
    assert got.schema == want.schema
    assert _rows(got) == _rows(want)


@pytest.mark.parametrize("texts", [
    # consecutive runs: greedy-leftmost keeps alternating occurrences
    ["a a a a a", "a a a a", "a a a"],
    # merged-token chaining: ("a","a") then ("a a","a a") etc.
    ["a a a a a a a a", "b a a b a a b"],
    # overlap across distinct pairs + singletons
    ["x y x y x", "y x y x y", "x", "y y"],
])
def test_apply_greedy_equals_runparity_adversarial(spark, tmp_path,
                                                   texts):
    from xsarsea_spark.pipeline.bpe import (bpe_apply, bpe_encode,
                                            bpe_train)

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    merges = bpe_train(docs, n_merges=3)
    got = bpe_apply(docs, merges)
    want = bpe_encode(docs, n_merges=3)
    assert _rows(got) == _rows(want)
