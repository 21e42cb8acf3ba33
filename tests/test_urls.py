"""functions/urls.py — URL canonicalization (the zeroth dedup pass)."""

from __future__ import annotations

import pyspark.sql.functions as F

from duplicate_finder_spark.functions.urls import canonical_url, url_dup_groups

CASES = [
    # (raw, canonical)
    ("HTTP://Example.COM/a", "http://example.com/a"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("https://example.com:8443/a", "https://example.com:8443/a"),
    ("http://example.com/a#sect-2", "http://example.com/a"),
    ("http://example.com/a?utm_source=x&utm_medium=y",
     "http://example.com/a"),
    ("http://example.com/a?b=1&utm_source=x&c=2",
     "http://example.com/a?b=1&c=2"),
    ("http://example.com/a?gclid=123", "http://example.com/a"),
    ("http://example.com/a?ref=hn&x=1", "http://example.com/a?x=1"),
    # param ORDER preserved — deliberately not sorted
    ("http://example.com/a?z=1&a=2", "http://example.com/a?z=1&a=2"),
    # path/query case preserved; only scheme+authority lowered
    ("HTTPS://Host.Net/CaseSensitive?Key=Val",
     "https://host.net/CaseSensitive?Key=Val"),
    # bare root slash collapses; deeper trailing slashes kept
    ("http://example.com/", "http://example.com"),
    ("http://example.com/a/", "http://example.com/a/"),
    # empty query drops its '?'
    ("http://example.com/a?", "http://example.com/a"),
    # 'refresh=1' must NOT be stripped by the 'ref' rule (anchored =)
    ("http://example.com/a?refresh=1", "http://example.com/a?refresh=1"),
    # no scheme: passes through untouched
    ("not a url", "not a url"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "url string")
    got = [r["c"] for r in
           df.select(canonical_url("url").alias("c")).collect()]
    for (raw, want), g in zip(CASES, got):
        assert g == want, f"{raw!r}: got {g!r}, want {want!r}"


def test_canonical_url_is_expression_only(spark):
    # stays codegen-able: no BatchEvalPython / ArrowEvalPython node
    df = spark.range(10).select(
        F.format_string("http://h/%d?utm_source=x", "id").alias("url"))
    plan = df.select(canonical_url("url"))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan


def test_url_dup_groups_keep_first(spark):
    rows = [("HTTP://A.com/p?utm_source=1",),
            ("http://a.com/p",),
            ("http://a.com/p#frag",),
            ("http://b.com/only",)]
    df = spark.createDataFrame(rows, "url string")
    got = url_dup_groups(df).collect()
    assert len(got) == 1
    g = got[0]
    assert g["canonical_url"] == "http://a.com/p"
    assert g["n_urls"] == 3
    # ASCII min of the raw spellings survives as keep-first
    assert g["min_url"] == "HTTP://A.com/p?utm_source=1"
