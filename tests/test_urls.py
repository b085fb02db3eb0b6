"""URL canonicalization rules (operators/urls.py), rule-by-rule."""

from pyspark.sql import functions as F


def _canon(spark, urls):
    from cpp_near_dedupe_spark.operators.urls import url_canonicalize

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = url_canonicalize(df).collect()
    return {r["url"]: r["canonical_url"] for r in out}


def test_rules(spark):
    got = _canon(
        spark,
        [
            "https://example.com/a/1#section-2",
            "HTTPS://Example.COM/a/1",
            "https://example.com:443/a/1",
            "http://example.com:80/a/1",
            "https://example.com/a/1?utm_source=x&utm_medium=y",
            "https://example.com/a/1?fbclid=abc&gclid=def&ref=tw",
            "https://example.com/a/1?b=2&a=1",
            "https://example.com/a/1/",
            "https://example.com/a/1?keep=1&utm_source=x#frag",
        ],
    )
    assert got["https://example.com/a/1#section-2"] == "https://example.com/a/1"
    assert got["HTTPS://Example.COM/a/1"] == "https://example.com/a/1"
    assert got["https://example.com:443/a/1"] == "https://example.com/a/1"
    assert got["http://example.com:80/a/1"] == "http://example.com/a/1"
    assert (
        got["https://example.com/a/1?utm_source=x&utm_medium=y"]
        == "https://example.com/a/1"
    )
    assert (
        got["https://example.com/a/1?fbclid=abc&gclid=def&ref=tw"]
        == "https://example.com/a/1"
    )
    assert got["https://example.com/a/1?b=2&a=1"] == "https://example.com/a/1?a=1&b=2"
    assert got["https://example.com/a/1/"] == "https://example.com/a/1"
    assert (
        got["https://example.com/a/1?keep=1&utm_source=x#frag"]
        == "https://example.com/a/1?keep=1"
    )
    # path and query case are preserved; non-tracking 'refresh=1' is NOT
    # dropped by the 'ref=' prefix rule
    got2 = _canon(
        spark,
        [
            "https://example.com/A/B?Q=V",
            "https://example.com/a/1?refresh=1",
        ],
    )
    assert got2["https://example.com/A/B?Q=V"] == "https://example.com/A/B?Q=V"
    assert (
        got2["https://example.com/a/1?refresh=1"]
        == "https://example.com/a/1?refresh=1"
    )


def test_url_dedupe_groups(spark):
    from cpp_near_dedupe_spark.operators.urls import url_dedupe

    df = spark.createDataFrame(
        [
            ("https://example.com/a/1",),
            ("https://example.com/a/1/",),
            ("https://example.com/a/1?utm_source=x",),
            ("https://example.com/a/2",),
        ],
        "url string",
    )
    out = url_dedupe(df).collect()
    kept = sorted(r["url"] for r in out if r["is_kept"])
    assert kept == ["https://example.com/a/1", "https://example.com/a/2"]
    assert sum(1 for r in out if not r["is_kept"]) == 2


def test_domain_stats(spark):
    from cpp_near_dedupe_spark.operators.urls import domain_stats

    df = spark.createDataFrame(
        [
            ("https://a.example.com/x",),
            ("https://a.example.com/x/",),
            ("https://A.Example.COM/y",),
            ("https://b.example.com/z",),
        ],
        "url string",
    )
    rows = {r["host"]: r for r in domain_stats(df).collect()}
    assert rows["a.example.com"]["n_pages"] == 3
    assert rows["a.example.com"]["n_canonical"] == 2
    assert rows["b.example.com"]["n_pages"] == 1
