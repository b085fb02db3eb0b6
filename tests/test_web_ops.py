"""HTML extraction, PII scrub, sampling, and crawl-delta operators
(operators/html_text.py, pii.py, sampling.py, crawl_delta.py)."""

from pyspark.sql import functions as F


def _rows(df):
    return [tuple(r) for r in df.collect()]


# --- html_text -------------------------------------------------------------


def _extract(spark, html):
    from cpp_near_dedupe_spark.operators.html_text import html_extract_text

    df = spark.createDataFrame(
        [("u", html.encode("utf-8"))], "url string, html binary"
    )
    return html_extract_text(df).collect()[0]


def test_html_rules(spark):
    r = _extract(
        spark,
        '<html><head><script type="x">var a = "</div>";</script>'
        "<style>p{color:red}</style></head>\n"
        "<body><!-- hidden -->  <p>Hello &amp;lt; world&#39;s\t\n"
        '&quot;best&quot; &lt;tag&gt;&nbsp;page</p></body></html>',
    )
    assert r["extracted_text"] == 'Hello &lt; world\'s "best" <tag> page'
    assert r["n_chars"] == len(r["extracted_text"])


def test_html_script_not_greedy(spark):
    # two script blocks must be removed separately, not span-merged
    r = _extract(spark, "<script>a</script>keep<script>b</script>")
    assert r["extracted_text"] == "keep"


def test_html_plain_text_passthrough(spark):
    r = _extract(spark, "no markup   at\nall")
    assert r["extracted_text"] == "no markup at all"


# --- pii -------------------------------------------------------------------


def _scrub(spark, text):
    from cpp_near_dedupe_spark.operators.pii import pii_scrub

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return pii_scrub(df).collect()[0]


def test_pii_all_classes(spark):
    r = _scrub(
        spark,
        "mail a.b+c@sub.example.org or b@x.co, ip 192.168.0.1, "
        "call 555-867-5309 or 555.867.5309",
    )
    assert r["text_scrubbed"] == (
        "mail <EMAIL> or <EMAIL>, ip <IP>, call <PHONE> or <PHONE>"
    )
    assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (2, 1, 2)


def test_pii_negatives(spark):
    # version strings, decimals and short digit runs are not PII
    r = _scrub(spark, "v1.2.3 costs 12.5 at 999 main st, room 10-20")
    assert r["text_scrubbed"] == "v1.2.3 costs 12.5 at 999 main st, room 10-20"
    assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (0, 0, 0)


def test_pii_null_text(spark):
    from cpp_near_dedupe_spark.operators.pii import pii_scrub

    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = pii_scrub(df).collect()[0]
    assert r["text_scrubbed"] == ""
    assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (0, 0, 0)


# --- sampling --------------------------------------------------------------


def _urls(spark, n_hot, n_cold):
    rows = [(f"https://hot.example.com/p/{i}",) for i in range(n_hot)]
    rows += [(f"https://cold{i}.example.com/x",) for i in range(n_cold)]
    return spark.createDataFrame(rows, "url string")


def test_domain_cap_sample(spark):
    from cpp_near_dedupe_spark.operators.sampling import domain_cap_sample

    out = domain_cap_sample(_urls(spark, 1000, 5), cap=50).toPandas()
    cold = out[out["host"] != "hot.example.com"]
    assert cold["is_kept"].all() and len(cold) == 5
    hot_kept = int(out[out["host"] == "hot.example.com"]["is_kept"].sum())
    # hash-threshold head: EXPECTED ~cap survivors (denom = ceil(1000/50)
    # = 20 → keep-probability 1/20); binomial spread, deterministic value
    assert 25 <= hot_kept <= 85
    # deterministic: a second run is identical
    again = domain_cap_sample(_urls(spark, 1000, 5), cap=50).toPandas()
    assert sorted(map(tuple, out.values.tolist())) == sorted(
        map(tuple, again.values.tolist())
    )


def test_domain_cap_sample_windowless(spark):
    from cpp_near_dedupe_spark.operators.sampling import domain_cap_sample

    plan = domain_cap_sample(_urls(spark, 100, 2), cap=10)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_hash_split(spark):
    from cpp_near_dedupe_spark.operators.sampling import hash_split

    urls = _urls(spark, 5000, 0)
    out = hash_split(urls).toPandas()
    counts = out["split"].value_counts().to_dict()
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > 4500
    assert len(out) == 5000  # total partition, nothing dropped/duplicated
    # stable under re-evaluation and custom weights sum preserved
    out2 = hash_split(urls, weights={"a": 1, "b": 1}).toPandas()
    c2 = out2["split"].value_counts().to_dict()
    assert set(c2) == {"a", "b"} and abs(c2["a"] - c2["b"]) < 500


# --- crawl_delta -----------------------------------------------------------


def test_crawl_delta_statuses(spark):
    from cpp_near_dedupe_spark.operators.crawl_delta import (
        crawl_delta,
        crawl_delta_counts,
    )

    old = spark.createDataFrame(
        [
            ("https://a.com/1", "one"),
            ("https://a.com/2", "two"),
            ("https://a.com/3", "three"),
            ("https://a.com/4", "four"),
        ],
        "url string, text string",
    )
    new = spark.createDataFrame(
        [
            # same canonical url (tracking param + fragment) → unchanged
            ("https://a.com/1?utm_source=x#f", "one"),
            ("https://a.com/2", "two CHANGED"),
            # /3 absent → removed
            ("https://a.com/4", "four"),
            ("https://a.com/5", "five"),  # added
        ],
        "url string, text string",
    )
    got = {
        r["canonical_url"]: r["status"] for r in crawl_delta(old, new).collect()
    }
    assert got == {
        "https://a.com/1": "unchanged",
        "https://a.com/2": "changed",
        "https://a.com/3": "removed",
        "https://a.com/4": "unchanged",
        "https://a.com/5": "added",
    }
    counts = {
        r["status"]: r["n"] for r in crawl_delta_counts(old, new).collect()
    }
    assert counts == {"unchanged": 2, "changed": 1, "removed": 1, "added": 1}
