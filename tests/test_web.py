"""URL canonicalization rules (operators/web.py) — the sf-scale twin
is the wp_url_canon oracle; these pin each rule on handwritten cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from name_matcher_spark.operators.web import canonical_url, url_dedup_groups


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r.c for r in df.select(canonical_url(F.col("url")).alias("c")).collect()
    ]


def test_canonical_url_rules(spark):
    cases = {
        # scheme + host lowered, www dropped, fragment dropped
        "HTTP://WWW.Example.COM/Path#frag": "http://example.com/Path",
        # default ports stripped per scheme
        "http://a.com:80/x": "http://a.com/x",
        "https://a.com:443/x": "https://a.com/x",
        # non-default port kept
        "http://a.com:8080/x": "http://a.com:8080/x",
        "https://a.com:80/x": "https://a.com:80/x",
        # PATH case preserved; trailing slash runs stripped; root -> /
        "http://a.com/CaseSensitive///": "http://a.com/CaseSensitive",
        "http://a.com": "http://a.com/",
        "http://a.com/": "http://a.com/",
        # query: utm_* and empties dropped, rest sorted
        "http://a.com/p?utm_source=x&b=2&a=1": "http://a.com/p?a=1&b=2",
        "http://a.com/p?b=2&&a=1&utm_medium=m": "http://a.com/p?a=1&b=2",
        "http://a.com/p?utm_only=1": "http://a.com/p",
        # query on root, fragment after query
        "HTTPS://A.com/?z=9&y=8#x": "https://a.com/?y=8&z=9",
    }
    got = _canon(spark, list(cases))
    for (raw, want), c in zip(cases.items(), got):
        assert c == want, (raw, c, want)


def test_url_dedup_groups(spark):
    urls = [
        "http://www.a.com/p?utm_s=1",
        "HTTP://A.COM:80/p/",
        "http://a.com/p#frag",
        "http://b.com/q",  # singleton -> filtered by min_group
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = url_dedup_groups(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.canonical == "http://a.com/p"
    assert r.n_urls == 3
    assert r.keep_url == "HTTP://A.COM:80/p/"  # lexicographic min survivor


def test_canonical_url_unparseable_is_null(spark):
    """Scheme-less / empty / null input must canonicalize to NULL (and
    be excluded from dedup groups), never to a shared garbage key."""
    got = _canon(spark, ["", "no-scheme/path", "ftp-ish"])
    assert got == [None, None, None]
    df = spark.createDataFrame(
        [("",), ("also-no-scheme",), ("http://a.com/p",), ("HTTP://a.com/p/",)],
        "url string",
    )
    rows = url_dedup_groups(df).collect()
    assert len(rows) == 1 and rows[0].canonical == "http://a.com/p"


def test_url_dedup_latest_crawl_wins(spark):
    """With a ts_col the survivor is the newest crawl of the canonical
    URL (tie -> max raw url, deterministic), not the lexicographic min."""
    import datetime as dt

    rows = [
        ("http://a.com/p?utm_x=1", dt.datetime(2026, 1, 1)),
        ("HTTP://WWW.A.com/p", dt.datetime(2026, 3, 1)),   # newest
        ("http://a.com:80/p/", dt.datetime(2026, 2, 1)),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp")
    r = url_dedup_groups(df, ts_col="warc_ts").collect()[0]
    assert r.canonical == "http://a.com/p" and r.n_urls == 3
    assert r.keep_url == "HTTP://WWW.A.com/p"
    # tie on ts -> max raw url
    tied = spark.createDataFrame(
        [("http://b.com/x", dt.datetime(2026, 1, 1)),
         ("http://B.com/x", dt.datetime(2026, 1, 1))],
        "url string, warc_ts timestamp",
    )
    r2 = url_dedup_groups(tied, ts_col="warc_ts").collect()[0]
    assert r2.keep_url == "http://b.com/x"
