"""Spark 4 Python DataSource for WARC (ISO 28500) — the container
format web-crawl corpora (CommonCrawl WARC/WET) actually arrive in:
``spark.read.format("warc").load(path)`` /
``df.write.format("warc").save(dir)``.

Dependency-free: the record grammar is simple enough to parse exactly
(version line, CRLF header block, ``Content-Length``-delimited payload,
CRLF CRLF record separator), and gzip — including the multi-member
per-record gzip CommonCrawl ships — is in the stdlib. NetCDF got the
same treatment in :mod:`sources.spark_datasource`; this module is its
text-corpus sibling.

Row model (one row per WARC record):

- ``record_id``/``warc_type``/``target_uri``/``warc_date``/
  ``content_type`` STRING — the standard named headers (NULL when
  absent);
- ``content_length`` BIGINT — the payload byte count;
- ``payload`` BINARY — the raw payload bytes, exactly as stored (NULL
  when the record carries the ``WARC-X-Null-Payload`` marker the
  writer emits for NULL inputs — absent-vs-empty must survive the
  trip);
- ``headers`` MAP<STRING,STRING> — every header, lower-cased keys,
  percent-decoded values (so writer-escaped CR/LF/% round-trip).

Writer contract: a ``payload`` column (BINARY or STRING — strings are
UTF-8 encoded) is required; every OTHER column is stringified into a
``WARC-X-<name>`` header (NULL columns simply omit the header), with
``%``, CR and LF percent-escaped so header framing can never be
corrupted by data. Each task writes one ``part-<uuid>.warc[.gz]``
(option ``compression=gzip``) — the one-file-per-task contract every
distributed sink here uses; ``mode("overwrite")`` clears prior parts
driver-side before tasks start, and abort removes this attempt's
files.

Scale notes: the parallel unit is the FILE (a crawl arrives as many
~1 GB segments — the production layout); records inside a file are
decoded streaming, never materialized whole-file. A single plain file
is one partition by construction (records are variable-length and
self-delimiting, so safe mid-file splits would need an index; crawls
never ship one giant file).
"""

from __future__ import annotations

from pyspark.sql.datasource import (DataSource, DataSourceArrowWriter,
                                    DataSourceReader, InputPartition,
                                    WriterCommitMessage)
from pyspark.sql.types import (BinaryType, LongType, MapType,
                               StringType, StructField, StructType)

__all__ = ["WarcDataSource", "register_warc",
           "parse_warc_bytes", "build_warc_record"]

_NULL_MARK = "warc-x-null-payload"

_SCHEMA = StructType([
    StructField("record_id", StringType(), True),
    StructField("warc_type", StringType(), True),
    StructField("target_uri", StringType(), True),
    StructField("warc_date", StringType(), True),
    StructField("content_type", StringType(), True),
    StructField("content_length", LongType(), True),
    StructField("payload", BinaryType(), True),
    StructField("headers", MapType(StringType(), StringType()), True),
])


def _escape(v: str) -> str:
    """Percent-escape what could break header framing: CR/LF (record
    grammar), the escape character itself, and LEADING/TRAILING
    space/tab (the parser's value trim would eat them). Internal
    spaces stay literal — the wire format remains readable and the
    parser never trims inside a value."""
    v = (v.replace("%", "%25").replace("\r", "%0D")
         .replace("\n", "%0A"))
    edge = {" ": "%20", "\t": "%09"}
    if v[:1] in edge:
        v = edge[v[0]] + v[1:]
    if v[-1:] in edge:
        v = v[:-1] + edge[v[-1]]
    return v


def _unescape(v: str) -> str:
    # %25 must decode LAST: escaping encodes '%' first, so no other
    # %XX token can be produced by literal data
    return (v.replace("%0D", "\r").replace("%0A", "\n")
            .replace("%20", " ").replace("%09", "\t")
            .replace("%25", "%"))


def build_warc_record(headers: dict[str, str],
                      payload: bytes | None) -> bytes:
    """One spec-shaped record: version line, escaped headers,
    Content-Length, blank line, payload, record separator."""
    body = payload if payload is not None else b""
    lines = ["WARC/1.0"]
    for k, v in headers.items():
        lines.append(f"{k}: {_escape(v)}")
    if payload is None:
        lines.append("WARC-X-Null-Payload: 1")
    lines.append(f"Content-Length: {len(body)}")
    head = ("\r\n".join(lines) + "\r\n\r\n").encode("utf-8")
    return head + body + b"\r\n\r\n"


def parse_warc_bytes(buf: bytes):
    """Yield (headers: dict lower->unescaped, payload: bytes|None) per
    record. Exact on writer output; tolerant of LF-only header blocks
    (seen in hand-made WET files)."""
    pos, n = 0, len(buf)
    while pos < n:
        # skip inter-record padding
        while pos < n and buf[pos:pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        if not buf.startswith(b"WARC/", pos):
            raise ValueError(
                f"warc: expected record header at byte {pos}, found "
                f"{buf[pos:pos + 16]!r}")
        # header block ends at the first blank line. Walk newline to
        # newline (O(header), NOT buf.find of a fixed blank-line
        # token — searching b"\n\n" in a CRLF file never matches and
        # would rescan the whole remaining buffer per record, an
        # O(n^2) trap at crawl-segment sizes)
        sep = -1
        scan = pos
        while True:
            nl = buf.find(b"\n", scan)
            if nl < 0:
                break
            nxt = buf[nl + 1:nl + 3]
            if nxt[:1] == b"\n":                 # \n\n
                sep, body_at = nl, nl + 2
                break
            if nxt == b"\r\n":                   # \n\r\n
                sep, body_at = nl, nl + 3
                break
            scan = nl + 1
        if sep < 0:
            raise ValueError("warc: unterminated header block")
        head = buf[pos:sep].decode("utf-8")
        headers: dict[str, str] = {}
        # split on the spec's CRLF (LF-only tolerated) — NOT
        # str.splitlines(), which also splits on NEL/VT/FF/U+2028
        # and would truncate header values containing them; trim
        # only ASCII space/tab, never unicode whitespace. A lone
        # trailing \r per line is CRLF framing (raw \r in values is
        # always %0D-escaped), stripped before the key/value split.
        for line in head.replace("\r\n", "\n").split("\n")[1:]:
            if line.endswith("\r"):
                line = line[:-1]
            if not line.strip(" \t"):
                continue
            k, _, v = line.partition(":")
            headers[k.strip(" \t").lower()] = _unescape(v.strip(" \t"))
        try:
            clen = int(headers["content-length"])
        except KeyError:
            raise ValueError("warc: record without Content-Length")
        payload = buf[body_at:body_at + clen]
        if len(payload) != clen:
            raise ValueError("warc: truncated payload")
        if headers.get(_NULL_MARK) == "1":
            yield headers, None
        else:
            yield headers, payload
        pos = body_at + clen
    return


def _read_file_bytes(path: str) -> bytes:
    if path.endswith(".gz"):
        import gzip

        # GzipFile reads ALL concatenated members — the per-record
        # gzip layout CommonCrawl uses decodes in one pass
        with gzip.open(path, "rb") as f:
            return f.read()
    with open(path, "rb") as f:
        return f.read()


def _resolve_paths(path: str) -> list[str]:
    import glob
    import os

    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.warc"))
                       + glob.glob(os.path.join(path, "*.warc.gz")))
        if not files:
            raise FileNotFoundError(f"warc: no .warc[.gz] files in {path}")
        return files
    return [path]


class _File(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _WarcReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc: .load(path) is required")

    def partitions(self):
        return [_File(p) for p in _resolve_paths(self.path)]

    def read(self, partition: _File):
        """Yield Arrow RecordBatches (not per-row tuples): a real
        crawl segment holds ~50k records, and the columnar handoff
        keeps the Python-side cost per record at list-append level
        while Spark ingests each batch in one Arrow exchange."""
        import pyarrow as pa

        named = ("warc-record-id", "warc-type", "warc-target-uri",
                 "warc-date", "content-type")
        schema = pa.schema([
            ("record_id", pa.string()), ("warc_type", pa.string()),
            ("target_uri", pa.string()), ("warc_date", pa.string()),
            ("content_type", pa.string()),
            ("content_length", pa.int64()),
            ("payload", pa.binary()),
            ("headers", pa.map_(pa.string(), pa.string())),
        ])
        cols: list[list] = [[] for _ in range(8)]

        def flush():
            if not cols[0]:
                return None
            batch = pa.RecordBatch.from_arrays(
                [pa.array(c, type=f.type)
                 for c, f in zip(cols, schema)], schema=schema)
            for c in cols:
                c.clear()
            return batch

        for headers, payload in parse_warc_bytes(
                _read_file_bytes(partition.path)):
            for i, k in enumerate(named):
                cols[i].append(headers.get(k))
            cols[5].append(int(headers["content-length"]))
            cols[6].append(payload)
            cols[7].append(list(headers.items()))
            if len(cols[0]) >= 4096:
                yield flush()
        batch = flush()
        if batch is not None:
            yield batch


class _Done(WriterCommitMessage):
    def __init__(self, path: str):
        self.path = path


class _WarcWriter(DataSourceArrowWriter):
    """Arrow-batch writer (the Spark 4 `DataSourceArrowWriter` path):
    rows arrive as pyarrow RecordBatches, columns drop to Python
    lists through Arrow's C conversion once per batch — no Spark Row
    materialization on the hot path."""

    def __init__(self, options, schema: StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc: .save(path) is required")
        self.gzip = options.get("compression", "").lower() == "gzip"
        # gzip level: Python's GzipFile defaults to 9, which costs
        # 2-4x the CPU of the gzip-tool default 6 for a marginal
        # ratio gain on text — at 100 TB the writer is CPU-bound on
        # exactly this. The roundtrip contract is PAYLOAD fidelity
        # (any level decodes identically); the level is an option for
        # deployments that want max ratio back.
        self.compresslevel = int(options.get("compresslevel", "6"))
        names = [f.name for f in schema.fields]
        if "payload" not in names:
            raise ValueError(
                "warc: a 'payload' column (BINARY or STRING) is "
                f"required; got columns {names}")
        ptype = schema["payload"].dataType
        if not isinstance(ptype, (BinaryType, StringType)):
            raise ValueError(
                "warc: 'payload' must be BINARY or STRING, got "
                f"{ptype.simpleString()}")
        self.schema = schema
        self.pay_at = names.index("payload")
        self.meta = [(i, n) for i, n in enumerate(names)
                     if i != self.pay_at]

    def write(self, batches):
        import gzip
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        ext = ".warc.gz" if self.gzip else ".warc"
        dest = os.path.join(self.path,
                            f"part-{uuid.uuid4().hex}{ext}")
        # records stream straight to the file (GzipFile with mtime
        # pinned keeps identical content -> identical bytes): peak
        # memory is one record, not the whole part file — a ~1 GB
        # crawl segment never lives in the Python heap
        with open(dest, "wb") as f:
            # filename pinned empty too: GzipFile would otherwise
            # bake the random part name into the gzip header
            out = gzip.GzipFile(filename="", fileobj=f, mode="wb",
                                compresslevel=self.compresslevel,
                                mtime=0) if self.gzip else f
            try:
                for batch in batches:
                    pay = batch.column(self.pay_at).to_pylist()
                    metas = [(name, batch.column(i).to_pylist())
                             for i, name in self.meta]
                    for r, raw in enumerate(pay):
                        if isinstance(raw, str):
                            raw = raw.encode("utf-8")
                        headers = {"WARC-Type": "resource"}
                        for name, col in metas:
                            v = col[r]
                            if v is not None:
                                headers[f"WARC-X-{name}"] = str(v)
                        out.write(build_warc_record(headers, raw))
            finally:
                if out is not f:
                    out.close()
        return _Done(dest)

    def commit(self, messages):
        pass

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class WarcDataSource(DataSource):
    """``spark.read.format("warc")`` — ISO 28500 web-archive files."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self):
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _WarcReader(self.options)

    def writer(self, schema, overwrite: bool) -> DataSourceArrowWriter:
        if overwrite:
            import glob
            import os

            path = self.options.get("path")
            if path and os.path.isdir(path):
                for p in (glob.glob(os.path.join(path, "*.warc"))
                          + glob.glob(os.path.join(path,
                                                   "*.warc.gz"))):
                    os.remove(p)
        return _WarcWriter(self.options, schema)


def register_warc(spark) -> None:
    """Idempotent format registration for a session."""
    spark.dataSource.register(WarcDataSource)
