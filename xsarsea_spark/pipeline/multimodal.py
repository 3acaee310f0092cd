"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Per the engine brief, image/audio/video decode libraries are not
available in this environment, so the DECODE step is a clearly-marked
stub — but everything Spark-side is real and tested: the binary column
schema, Arrow batch shape through ``mapInPandas``, deterministic
feature extraction over raw bytes, and the struct-typed metadata
column.

Scale notes: payloads stay opaque binary end-to-end (no driver
collect); feature extraction is one Arrow-batched pass with bounded
per-batch memory; metadata lives in a struct column so Parquet keeps
it columnar and prunable.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["attach_payload", "extract_features", "decode_image"]


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap documents as multimodal rows: (doc_id, media_type, payload
    binary, meta struct). Real pipelines read payloads from object
    storage; here the UTF-8 text bytes stand in as the opaque blob."""
    return docs.select(
        "doc_id",
        F.lit("application/octet-stream").alias("media_type"),
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            F.length(F.col(text_col)).alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "np.ndarray":
    """STUB: real image decode needs an imaging library (Pillow/cv2),
    which is not installed in this environment. The Spark-side
    plumbing (schema, batching, feature shapes) does not depend on the
    decoder; swap this function for a real one in production."""
    raise NotImplementedError(
        "image decode requires an imaging library; this environment "
        "ships none — extract_features uses raw-byte features instead"
    )


_FEAT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("byte_entropy", T.DoubleType()),
    T.StructField("byte_hist", T.ArrayType(T.DoubleType())),
    T.StructField("content_digest", T.StringType()),
    T.StructField("fake_width", T.LongType()),
    T.StructField("fake_height", T.LongType()),
])


def extract_features(mm: DataFrame, n_bins: int = 16) -> DataFrame:
    """Arrow-batched byte-level feature extraction over the binary
    payload column: length, 16-bin byte histogram (normalized), byte
    entropy, md5 digest, and deterministic fake decode dimensions
    (stand-ins for real width/height until a decoder is plugged in)."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(b >> 4, minlength=n_bins).astype(
                    np.float64)
                tot = max(len(b), 1)
                p = hist / tot
                # explicit left-to-right fold in ascending bin order,
                # skipping zero bins — the exact op sequence a SQL
                # list_filter/list_reduce oracle performs, so the
                # value is engine-reproducible to the last ulp of log2
                acc = 0.0
                for pv in p:
                    if pv > 0.0:
                        acc += float(pv) * float(np.log2(pv))
                entropy = -acc + 0.0
                digest = hashlib.md5(bytes(payload)).hexdigest()
                # deterministic fake decode dims derived from digest
                w = 32 + int(digest[:4], 16) % 480
                h = 32 + int(digest[4:8], 16) % 480
                rows.append((int(doc_id), int(len(b)), entropy,
                             (hist / tot).tolist(), digest, w, h))
            yield pd.DataFrame(rows, columns=[f.name for f in _FEAT_SCHEMA])

    return mm.select("doc_id", "payload").mapInPandas(
        gen, schema=_FEAT_SCHEMA)


_FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.LongType()),
    T.StructField("frame_digest", T.StringType()),
])


def sample_frames(mm: DataFrame, frame_bytes: int = 256,
                  stride: int = 2) -> DataFrame:
    """Video-style frame sampling over the opaque payload: the blob is
    treated as ``n_bytes // frame_bytes`` fixed-size frames, every
    ``stride``-th frame is sliced out in the Arrow batch and reduced
    to its md5 digest (the stand-in for a real decode+thumbnail).

    The kernel IS the production batch shape — binary slicing inside
    mapInPandas, emitted rows bounded by n_frames/stride — while the
    digest arithmetic is exactly re-derivable in SQL (md5 over byte
    substrings), so the operator is value-exact against an oracle
    despite being a Python-side media kernel.
    """

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = len(b) // frame_bytes
                for i in range(0, n_frames, stride):
                    fr = b[i * frame_bytes:(i + 1) * frame_bytes]
                    rows.append(
                        (int(doc_id), i,
                         hashlib.md5(fr).hexdigest()))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _FRAME_SCHEMA])

    return mm.select("doc_id", "payload").mapInPandas(
        gen, schema=_FRAME_SCHEMA)
