"""WARC (Web ARChive) ingestion — the raw-crawl entry point of a
pretraining data pipeline (Common Crawl ships WARC; everything
downstream here — html_to_text, quality, lang-id, dedup, LM filter,
decontam — consumes the documents this source produces).

Format (ISO 28500): a WARC file is a sequence of records, each

    WARC/1.0\\r\\n
    <header-name>: <value>\\r\\n ...          (incl. Content-Length)
    \\r\\n
    <Content-Length bytes of payload>
    \\r\\n\\r\\n                               (record separator)

For ``response`` records the payload is an HTTP response (status line,
headers, blank line, body).  Real crawl files are per-record gzip
members concatenated into one ``.gz`` — Python's ``gzip.decompress``
handles multi-member streams, so the same code path covers plain and
gzipped files.

Scale design: files load through ``binaryFile`` (one task per file —
the natural Common Crawl unit, ~1 GB each; a 100 TB crawl is ~100k
files and parallelizes per file, the same granularity every production
WARC reader uses).  Record splitting and HTTP parsing run as an
Arrow-batched ``mapInPandas`` stage — pure Python per file, no
driver-side work, no shuffle at all: the output is a narrow map-only
expansion feeding the Column-expression text pipeline.  Bodies are
size-capped (``max_body_bytes``) and gzip inflation is stream-bounded
(``max_decompressed_bytes`` via ``bounded_gunzip``) so neither a
pathological record nor a decompression bomb can blow an executor;
malformed records are skipped, never fatal (crawl data is hostile by
default).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WARC_SCHEMA = StructType(
    [
        StructField("file", StringType()),
        StructField("record_offset", LongType()),
        StructField("warc_type", StringType()),
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("http_status", IntegerType()),
        StructField("content_type", StringType()),
        StructField("body", StringType()),
    ]
)


def _parse_headers(block: bytes) -> dict[str, str]:
    out: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, _, v = line.partition(b":")
            out[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1", "replace"
            )
    return out


def iter_warc_records(
    data: bytes, max_body_bytes: int = 1 << 20
) -> Iterator[tuple[int, dict[str, str], bytes]]:
    """Yield ``(offset, warc_headers, payload)`` per record.  Tolerant:
    a record with a missing/garbled Content-Length or truncated payload
    ends the scan for that file instead of raising."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if not data[pos : pos + 5] == b"WARC/":
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        headers = _parse_headers(data[pos:head_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = head_end + 4
        if body_start + length > n:
            break
        yield pos, headers, data[body_start : body_start + min(length, max_body_bytes)]
        pos = body_start + length


def _parse_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content-type, body) from an HTTP response payload; the
    whole payload becomes the body when it isn't HTTP."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    head_end = payload.find(b"\r\n\r\n")
    if head_end < 0:
        return None, None, payload
    head = payload[:head_end]
    status: int | None = None
    first = head.split(b"\r\n", 1)[0].split()
    if len(first) >= 2 and first[1].isdigit():
        status = int(first[1])
    headers = _parse_headers(head)
    return status, headers.get("content-type"), payload[head_end + 4 :]


def bounded_gunzip(data: bytes, max_decompressed_bytes: int) -> bytes:
    """Stream-decompress a (possibly multi-member) gzip buffer with a
    hard ceiling on decompressed size.  ``gzip.decompress`` inflates the
    whole file before any limit can apply, so a decompression bomb (or
    just a very high-ratio member — crawl data is hostile by default)
    OOMs the executor before ``max_body_bytes`` is ever consulted.
    Here output is produced in bounded chunks via ``zlib.decompressobj``
    and the file is abandoned at the ceiling, returning the prefix
    decompressed so far — ``iter_warc_records`` already tolerates a
    truncated tail, so earlier records still parse (skip, never fail)."""
    out: list[bytes] = []
    total = 0
    buf = data
    while buf[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        tail = buf
        try:
            while True:
                chunk = d.decompress(tail, 1 << 20)
                if chunk:
                    total += len(chunk)
                    out.append(chunk)
                    if total >= max_decompressed_bytes:
                        return b"".join(out)[:max_decompressed_bytes]
                if d.eof:
                    break
                tail = d.unconsumed_tail
                if not tail:
                    # input exhausted mid-member: truncated file
                    return b"".join(out)
        except zlib.error:
            return b"".join(out)
        buf = d.unused_data
    return b"".join(out)


def parse_warc_bytes(
    path: str,
    data: bytes,
    record_types: tuple[str, ...],
    max_body_bytes: int,
    max_decompressed_bytes: int = 1 << 30,
) -> Iterator[tuple]:
    if path.endswith(".gz") or data[:2] == b"\x1f\x8b":
        # truncated/garbled members must not kill the task (hypothesis
        # fuzz); bounded_gunzip returns the valid prefix instead of
        # raising, and caps total inflation (decompression bombs).
        data = bounded_gunzip(data, max_decompressed_bytes)
        if not data:
            return
    for offset, headers, payload in iter_warc_records(data, max_body_bytes):
        wtype = headers.get("warc-type", "")
        if record_types and wtype not in record_types:
            continue
        status, ctype, body = (
            _parse_http(payload) if wtype == "response" else (None, None, payload)
        )
        yield (
            path,
            offset,
            wtype,
            headers.get("warc-target-uri"),
            headers.get("warc-date"),
            status,
            ctype,
            body[:max_body_bytes].decode("utf-8", "replace"),
        )


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response",),
    max_body_bytes: int = 1 << 20,
    max_decompressed_bytes: int = 1 << 30,
) -> DataFrame:
    """Load WARC file(s) into one row per record (schema:
    ``file, record_offset, warc_type, target_uri, warc_date,
    http_status, content_type, body``).  ``record_types=()`` keeps every
    record type (request/metadata/warcinfo included)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                rows.extend(
                    parse_warc_bytes(
                        p,
                        bytes(content),
                        record_types,
                        max_body_bytes,
                        max_decompressed_bytes,
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(split, WARC_SCHEMA)


def read_warc_mapping(spark: SparkSession, mapping) -> DataFrame:
    """Registry adapter: mapping options ``record_types`` (comma list)
    and ``max_body_bytes`` pass through."""
    opts = dict(mapping.options)
    rt = tuple(
        t for t in str(opts.get("record_types", "response")).split(",") if t
    )
    return read_warc(
        spark,
        mapping.source,
        record_types=rt,
        max_body_bytes=int(opts.get("max_body_bytes", 1 << 20)),
        max_decompressed_bytes=int(opts.get("max_decompressed_bytes", 1 << 30)),
    )
