"""URL canonicalization + HTML extraction (operators/text.py)."""

from __future__ import annotations

import pytest

from tabata_spark.operators.text import canonical_url, html_to_text, url_host


def _one(spark, expr, value):
    from pyspark.sql import functions as F

    return (
        spark.createDataFrame([(value,)], "u string")
        .select(expr("u").alias("out"))
        .collect()[0]["out"]
    )


@pytest.mark.parametrize(
    "raw,want",
    [
        ("HTTP://Example.COM:80/a/b/", "http://example.com/a/b"),
        ("https://x.org:443/p?q=1#frag", "https://x.org/p?q=1"),
        (
            "https://a.b/path?utm_source=tw&utm_medium=x&id=7",
            "https://a.b/path?id=7",
        ),
        ("https://a.b/path?utm_source=tw", "https://a.b/path"),
        ("http://h.co//x///y/", "http://h.co/x/y"),
        ("http://h.co/", "http://h.co"),
        ("http://h.co/x?a=1&utm_c=2&b=3", "http://h.co/x?a=1&b=3"),
    ],
)
def test_canonical_url(spark, raw, want):
    assert _one(spark, canonical_url, raw) == want


def test_url_host(spark):
    assert _one(spark, url_host, "HTTPS://WWW.Ex.com:8080/p") == "www.ex.com"


def test_html_to_text(spark):
    html = (
        "<html><head><style>b{color:red}</style>"
        "<script>var x = '<p>no</p>';</script></head>"
        "<!-- comment --><body><h1>Title</h1>"
        "<p>Hello&nbsp;&amp; <b>world</b> &lt;tag&gt;</p></body></html>"
    )
    assert _one(spark, html_to_text, html) == "Title Hello & world <tag>"
