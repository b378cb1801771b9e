"""URL canonicalization (operators/urls.py): rule-by-rule pins on hand
picked URLs plus determinism/idempotence."""

from __future__ import annotations

import pytest

from fs2_kinesis_firehose_spark.operators.urls import canonicalize_url

CASES = [
    # (raw, canon, registered_domain)
    ("HTTP://WWW.Example.COM:80/a/b/?b=2&a=1#frag", "http://example.com/a/b?a=1&b=2", "example.com"),
    ("https://example.com:443//x//y", "https://example.com/x/y", "example.com"),
    ("https://example.com:8443/x", "https://example.com:8443/x", "example.com"),
    # https with explicit :80 is NON-default — kept
    ("https://example.com:80/x", "https://example.com:80/x", "example.com"),
    ("http://cdn.shop.co.uk", "http://cdn.shop.co.uk/", "shop.co.uk"),
    ("http://shop.com/p?utm_source=x&utm_medium=y&gclid=1&q=3", "http://shop.com/p?q=3", "shop.com"),
    # ALL params tracking -> no query part at all
    ("http://shop.com/p?utm_source=x&fbclid=z", "http://shop.com/p", "shop.com"),
    ("http://a.b.c.example.com/", "http://a.b.c.example.com/", "example.com"),
    ("http://localhost/x", "http://localhost/x", "localhost"),
    ("http://example.com", "http://example.com/", "example.com"),
]


@pytest.mark.parametrize("raw,canon,dom", CASES)
def test_canonicalize_rules(spark, raw, canon, dom):
    df = spark.createDataFrame([(raw,)], "url string")
    row = canonicalize_url(df, "url").collect()[0]
    assert row["canon_url"] == canon, raw
    assert row["registered_domain"] == dom, raw


def test_canonicalize_idempotent(spark):
    """Canonicalizing an already-canonical URL must be a fixpoint."""
    df = spark.createDataFrame([(r,) for r, _, _ in CASES], "url string")
    once = canonicalize_url(df, "url").select(
        "canon_url"
    ).withColumnRenamed("canon_url", "url")
    twice = canonicalize_url(once, "url")
    for row in twice.collect():
        assert row["canon_url"] == row["url"]
