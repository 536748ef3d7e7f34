"""WARC ingest — the native container of CommonCrawl, which is the
canonical raw source of LLM pretraining corpora. A minimal,
dependency-free WARC/1.x reader: record framing per ISO 28500
(header block + Content-Length-framed payload), plain or gzip
(including the standard member-per-record concatenated gzip that
makes .warc.gz record-splittable).

Shape for 100 TB: files arrive via ``spark.read.format("binaryFile")``
(one row per file; Spark distributes files across executors), and the
record fan-out is an Arrow ``mapInPandas`` stage — the same by-design
Python surface as the multimodal codecs (operators/multimodal.py):
batched, columnar, no row-at-a-time UDFs. Real deployments split
giant .warc.gz files by gzip-member offsets from the companion CDX
index; this reader documents that contract and handles whole files,
which is exactly CommonCrawl's layout (1 GB files, thousands of
them — file-level parallelism is the intended split).

Reference parity: ingest-shim sibling of sources/ingest.py (HDF5/CSV/
JSON); the reference has no web-archive surface (north-star).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame

#: output schema of the record fan-out
WARC_SCHEMA = (
    "path string, record_idx int, warc_type string, target_uri string, "
    "warc_date string, content_type string, content_length long, "
    "payload binary"
)


def gunzip_members(blob: bytes) -> bytes:
    """Decompress concatenated gzip members (the .warc.gz layout)."""
    out = []
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(blob[pos:]))
        out.append(d.flush())
        consumed = len(blob) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return b"".join(out)


def parse_warc_bytes(blob: bytes, path: str = "") -> list[dict]:
    """Parse one WARC file's bytes into record dicts.

    Tolerant of trailing garbage; raises ValueError on a record with
    a malformed header block (missing Content-Length)."""
    if blob[:2] == b"\x1f\x8b":
        blob = gunzip_members(blob)
    records = []
    pos = 0
    idx = 0
    while True:
        start = blob.find(b"WARC/", pos)
        if start < 0:
            break
        hdr_end = blob.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        lines = blob[start:hdr_end].split(b"\r\n")
        for line in lines[1:]:
            if b":" in line:
                k, _, v = line.partition(b":")
                headers[k.strip().lower().decode("ascii", "replace")] = (
                    v.strip().decode("utf-8", "replace")
                )
        if "content-length" not in headers:
            raise ValueError(
                f"WARC record without Content-Length at offset {start} in {path!r}"
            )
        clen = int(headers["content-length"])
        body_start = hdr_end + 4
        payload = blob[body_start : body_start + clen]
        records.append(
            {
                "path": path,
                "record_idx": idx,
                "warc_type": headers.get("warc-type", ""),
                "target_uri": headers.get("warc-target-uri", ""),
                "warc_date": headers.get("warc-date", ""),
                "content_type": headers.get("content-type", ""),
                "content_length": clen,
                "payload": payload,
            }
        )
        idx += 1
        pos = body_start + clen
    return records


def warc_records(files: DataFrame) -> DataFrame:
    """Fan a ``binaryFile`` DataFrame (path, content, ...) out into
    WARC records with :data:`WARC_SCHEMA`. Arrow-batched; one Python
    stage, linear in bytes; downstream filtering (warc_type =
    'response', content_type prefix) is ordinary Column pushdown."""

    def fan_out(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_warc_bytes(bytes(content), path=str(path)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "path",
                    "record_idx",
                    "warc_type",
                    "target_uri",
                    "warc_date",
                    "content_type",
                    "content_length",
                    "payload",
                ],
            )

    return files.select("path", "content").mapInPandas(fan_out, WARC_SCHEMA)


def read_warc(spark, path: str) -> DataFrame:
    """Read .warc / .warc.gz files under ``path`` as record rows."""
    files = spark.read.format("binaryFile").load(path)
    return warc_records(files)
