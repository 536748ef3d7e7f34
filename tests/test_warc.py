"""WARC ingest (sources/warc.py): framing, gzip members, Spark fan-out."""

from __future__ import annotations

import gzip

from tabata_spark.sources.warc import (
    gunzip_members,
    parse_warc_bytes,
    read_warc,
)


def _record(wtype: str, uri: str, body: bytes) -> bytes:
    hdr = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {wtype}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"Content-Type: text/plain\r\n"
        f"Content-Length: {len(body)}\r\n"
        f"\r\n"
    ).encode()
    return hdr + body + b"\r\n\r\n"


def _warc() -> bytes:
    return (
        _record("warcinfo", "", b"software: test")
        + _record("response", "http://a.example/x", b"hello world")
        + _record("response", "http://b.example/y", b"WARC/1.0 inside body")
    )


def test_parse_plain_warc():
    recs = parse_warc_bytes(_warc(), path="f.warc")
    assert [r["warc_type"] for r in recs] == ["warcinfo", "response", "response"]
    assert recs[1]["target_uri"] == "http://a.example/x"
    assert recs[1]["payload"] == b"hello world"
    # a payload containing 'WARC/1.0' must NOT split the record
    assert recs[2]["payload"] == b"WARC/1.0 inside body"
    assert len(recs) == 3


def test_gzip_member_per_record_roundtrip():
    raw = _warc()
    members = b"".join(
        gzip.compress(_record(t, u, b))
        for t, u, b in [
            ("warcinfo", "", b"software: test"),
            ("response", "http://a.example/x", b"hello world"),
            ("response", "http://b.example/y", b"WARC/1.0 inside body"),
        ]
    )
    assert gunzip_members(members) == raw
    assert len(parse_warc_bytes(members, path="f.warc.gz")) == 3


def test_read_warc_spark_fanout(spark, tmp_path):
    p = tmp_path / "a.warc"
    p.write_bytes(_warc())
    (tmp_path / "b.warc.gz").write_bytes(gzip.compress(_warc()))
    df = read_warc(spark, str(tmp_path))
    rows = df.filter("warc_type = 'response'").collect()
    assert len(rows) == 4  # 2 responses x 2 files
    assert {bytes(r["payload"]) for r in rows} == {
        b"hello world",
        b"WARC/1.0 inside body",
    }
    # Column pushdown over the fan-out works like any other source
    assert df.filter("content_length > 15").count() == 2
