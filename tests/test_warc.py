"""WARC DataSource: exact record grammar, adversarial payloads and
header values, gzip multi-member reads, overwrite semantics."""

from __future__ import annotations

import glob
import gzip
import os

import pytest

from xsarsea_spark.sources.warc import (build_warc_record,
                                        parse_warc_bytes,
                                        register_warc)

ROWS = [
    (0, "plain ascii", "en", "src0"),
    (1, "embedded\r\nCRLF and %25 percent", "en", None),
    (2, "unicode é中文 \U0001f600", "zh", "src2"),
    (3, "", "en", "src3"),            # empty payload != null payload
    (4, None, None, "src4"),          # NULL text must survive
    (5, "WARC/1.0\r\nContent-Length: 0\r\n\r\n", "en", "src5"),
]


def _write(spark, tmp_path, compression=None):
    register_warc(spark)
    df = spark.createDataFrame(
        ROWS, "doc_id long, payload string, lang string, source string")
    w = df.write.format("warc").mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    out = str(tmp_path / "w")
    w.save(out)
    return out


def _check_back(spark, out):
    back = spark.read.format("warc").load(out).selectExpr(
        "CAST(headers['warc-x-doc_id'] AS BIGINT) AS doc_id",
        "CASE WHEN payload IS NULL THEN CAST(NULL AS STRING)"
        " ELSE decode(payload, 'UTF-8') END AS text",
        "headers['warc-x-lang'] AS lang",
        "headers['warc-x-source'] AS source",
    ).collect()
    got = sorted((r.doc_id, r.text, r.lang, r.source) for r in back)
    assert got == sorted(ROWS)


def test_roundtrip_plain(spark, tmp_path):
    out = _write(spark, tmp_path)
    assert glob.glob(os.path.join(out, "*.warc"))
    _check_back(spark, out)


def test_roundtrip_gzip_multimember(spark, tmp_path):
    out = _write(spark, tmp_path, compression="gzip")
    parts = glob.glob(os.path.join(out, "*.warc.gz"))
    assert parts
    # concatenate every part into ONE multi-member .gz: the
    # CommonCrawl per-record-member layout must decode in one read
    blob = b"".join(open(p, "rb").read() for p in parts)
    solo = str(tmp_path / "cc")
    os.makedirs(solo)
    with open(os.path.join(solo, "all.warc.gz"), "wb") as f:
        f.write(blob)
    _check_back(spark, solo)


def test_overwrite_clears_prior_parts(spark, tmp_path):
    out = _write(spark, tmp_path)
    first = set(glob.glob(os.path.join(out, "*.warc")))
    out2 = _write(spark, tmp_path)
    assert out2 == out
    second = set(glob.glob(os.path.join(out, "*.warc")))
    assert first.isdisjoint(second)
    _check_back(spark, out)


def test_record_grammar_exact():
    rec = build_warc_record(
        {"WARC-Type": "resource", "WARC-X-k": "a\r\nb%c"}, b"xyz")
    assert rec.startswith(b"WARC/1.0\r\n")
    assert b"WARC-X-k: a%0D%0Ab%25c\r\n" in rec
    assert rec.endswith(b"Content-Length: 3\r\n\r\nxyz\r\n\r\n")
    [(headers, payload)] = list(parse_warc_bytes(rec))
    assert payload == b"xyz"
    assert headers["warc-x-k"] == "a\r\nb%c"


def test_payload_bytes_are_length_delimited():
    # a payload that LOOKS like a record boundary must not split
    evil = b"\r\n\r\nWARC/1.0\r\nContent-Length: 0\r\n\r\n"
    rec = build_warc_record({"WARC-Type": "resource"}, evil)
    more = rec + build_warc_record({"WARC-Type": "resource"}, b"tail")
    out = list(parse_warc_bytes(more))
    assert [p for _, p in out] == [evil, b"tail"]


def test_null_vs_empty_payload():
    recs = (build_warc_record({"A": "1"}, None)
            + build_warc_record({"A": "2"}, b""))
    out = list(parse_warc_bytes(recs))
    assert [p for _, p in out] == [None, b""]


def test_parse_rejects_garbage_and_truncation():
    with pytest.raises(ValueError, match="expected record header"):
        list(parse_warc_bytes(b"HTTP/1.1 200 OK\r\n\r\n"))
    rec = build_warc_record({"A": "1"}, b"0123456789")
    with pytest.raises(ValueError, match="truncated payload"):
        list(parse_warc_bytes(rec[:-8]))


def test_writer_requires_payload_column(spark, tmp_path):
    register_warc(spark)
    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(Exception, match="payload"):
        df.write.format("warc").mode("overwrite").save(
            str(tmp_path / "bad"))


def test_gzip_parts_are_deterministic(spark, tmp_path):
    # mtime is pinned, so identical content -> identical bytes
    o1 = _write(spark, tmp_path / "a", compression="gzip")
    o2 = _write(spark, tmp_path / "b", compression="gzip")
    b1 = sorted(open(p, "rb").read()
                for p in glob.glob(os.path.join(o1, "*.gz")))
    b2 = sorted(open(p, "rb").read()
                for p in glob.glob(os.path.join(o2, "*.gz")))
    assert b1 == b2


def test_record_stream_roundtrip_property():
    """Property: any sequence of (headers, payload) records survives
    build -> concat -> parse exactly — arbitrary header values
    (CR/LF/%/unicode) and arbitrary payload bytes including record-
    boundary look-alikes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    header_val = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),
        max_size=40)
    header_key = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz-", min_size=1,
        max_size=12).map(lambda s: "WARC-X-" + s)
    record = st.tuples(
        st.dictionaries(header_key, header_val, max_size=4),
        st.one_of(st.none(), st.binary(max_size=200)))

    @settings(max_examples=150, deadline=None)
    @given(st.lists(record, max_size=8))
    def check(records):
        blob = b"".join(build_warc_record(h, p) for h, p in records)
        out = list(parse_warc_bytes(blob))
        assert len(out) == len(records)
        for (h_in, p_in), (h_out, p_out) in zip(records, out):
            assert p_out == p_in
            for k, v in h_in.items():
                assert h_out[k.lower()] == v

    check()
