"""Driver-data drift protection: the graded corpus is regenerated
every round, and the minimum document has already drifted shorter
across rounds (the round-3 Gopher crash was exactly this class of
bug). Every document-reading suite query must survive an adversarial
``documents`` table — empty/NULL/whitespace-only/1-token/unicode
texts, duplicate rows — without raising. Values are not checked here
(the oracle sweep owns that); this is the no-crash gate."""

from __future__ import annotations

import glob
import shutil

import duckdb
import pandas as pd
import pytest

from xsarsea_spark.suite import REGISTRY

_SRC = "/root/testdata/sf0.001"

_ADV_DOCS = [
    (0, "", "en", "s1"),
    (1, "x", "en", "s1"),
    (2, "hello", None, "s2"),
    (3, "a b", "en", None),
    (4, "   ", "fr", "s1"),
    (5, None, None, None),
    (6, " ".join(["tok"] * 60), "en", "s1"),
    (7, "!!! ??? ... ;;; :::", "en", "s2"),
    (8, "héllo wörld ünïcode " * 25, "de", "s1"),
    (9, "word " * 100, "en", "s1"),
    (10, "word " * 100, "en", "s2"),        # exact duplicate of 9
    (11, "a b c d e f g h i j " * 30, "en", "s1"),
]

_DOC_TAGS = {"text", "quality", "dedup", "multimodal", "sampling",
             "packing", "lm", "chunking", "index", "pipeline",
             "formats"}


@pytest.fixture(scope="module")
def adversarial_dir(tmp_path_factory):
    dst = tmp_path_factory.mktemp("adv_sf")
    for p in glob.glob(f"{_SRC}/*.parquet"):
        shutil.copy(p, dst)
    pdf = pd.DataFrame(
        [(i, t, lang, src, len(t) if t is not None else None)
         for i, t, lang, src in _ADV_DOCS],
        columns=["doc_id", "text", "lang", "source", "n_chars"])
    con = duckdb.connect()
    con.register("adv", pdf)
    con.execute(
        "COPY (SELECT CAST(doc_id AS BIGINT) AS doc_id, text, lang,"
        " source, CAST(n_chars AS BIGINT) AS n_chars FROM adv)"
        f" TO '{dst}/documents.parquet' (FORMAT PARQUET)")
    con.close()
    return str(dst)


_DOC_QUERIES = sorted(
    n for n, q in REGISTRY.items() if _DOC_TAGS & set(q.tags))


@pytest.mark.parametrize("name", _DOC_QUERIES)
def test_survives_adversarial_documents(spark, adversarial_dir, name):
    df = REGISTRY[name].spark(spark, adversarial_dir)
    assert df.count() >= 0


@pytest.fixture(scope="module")
def adversarial_events_dir(tmp_path_factory):
    dst = tmp_path_factory.mktemp("adv_ev")
    for p in glob.glob(f"{_SRC}/*.parquet"):
        shutil.copy(p, dst)
    (dst / "events.parquet").unlink()
    con = duckdb.connect()
    # real base corpus + an adversarial tail: NULL/NaN values, NULL
    # and empty event types, NULL timestamps, malformed JSON props,
    # duplicate event ids, a same-instant burst on one user
    con.execute(f"""
COPY (
  SELECT * FROM '{_SRC}/events.parquet'
  UNION ALL
  SELECT * FROM (VALUES
    (9001, TIMESTAMP '2024-01-15 12:00:00', 901, 'view',
     CAST('NaN' AS DOUBLE), '{{"k": 1}}'),
    (9002, TIMESTAMP '2024-01-15 12:00:00', 901, 'view',
     NULL, 'not json at all'),
    (9003, TIMESTAMP '2024-01-15 12:00:00', 901, NULL,
     1.0, NULL),
    (9004, TIMESTAMP '2024-01-15 12:00:00', 901, '',
     -5.0, ''),
    (9005, NULL, 902, 'purchase', 2.5, '{{}}'),
    (9005, TIMESTAMP '2024-01-16 00:00:00', 902, 'purchase',
     2.5, '{{"k": 2}}'),
    (9006, TIMESTAMP '2024-01-16 00:00:00.000001', NULL,
     'click', 0.0, '{{"k": 3}}')
  ) t(event_id, ts, user_id, event_type, value, props)
) TO '{dst}/events.parquet' (FORMAT PARQUET)""")
    con.close()
    return str(dst)


_EV_QUERIES = sorted(
    n for n, q in REGISTRY.items()
    if {"events", "streaming"} & set(q.tags))


@pytest.mark.parametrize("name", _EV_QUERIES)
def test_survives_adversarial_events(spark, adversarial_events_dir,
                                     name):
    df = REGISTRY[name].spark(spark, adversarial_events_dir)
    assert df.count() >= 0


@pytest.fixture(scope="module")
def adversarial_embeddings_dir(tmp_path_factory):
    dst = tmp_path_factory.mktemp("adv_emb")
    for p in glob.glob(f"{_SRC}/*.parquet"):
        shutil.copy(p, dst)
    (dst / "embeddings.parquet").unlink()
    # real base + an all-zero vector (norm 0 -> cosine divides),
    # a NaN-element vector, exact-duplicate vectors under two ids,
    # a duplicated vec_id, and a large-magnitude vector
    adv = pd.DataFrame(
        [(vid, [float(fill)] * 64, lab) for vid, fill, lab in [
            (9101, 0.0, 0), (9102, float("nan"), 1),
            (9103, 0.25, 2), (9104, 0.25, 2), (9104, 0.25, 2),
            (9105, 1e6, 3)]],
        columns=["vec_id", "embedding", "label"])
    con = duckdb.connect()
    con.register("adv", adv)
    con.execute(f"""
COPY (
  SELECT * FROM '{_SRC}/embeddings.parquet'
  UNION ALL
  SELECT CAST(vec_id AS BIGINT),
         CAST(embedding AS FLOAT[]),
         CAST(label AS INTEGER)
  FROM adv
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)""")
    con.close()
    return str(dst)


_EMB_QUERIES = sorted(
    n for n, q in REGISTRY.items()
    if {"similarity", "iterative"} & set(q.tags)
    and "graph" not in q.tags)


@pytest.mark.parametrize("name", _EMB_QUERIES)
def test_survives_adversarial_embeddings(spark,
                                         adversarial_embeddings_dir,
                                         name):
    df = REGISTRY[name].spark(spark, adversarial_embeddings_dir)
    assert df.count() >= 0
