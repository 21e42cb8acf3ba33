"""Round-4 additions: broadcast Bloom prefilter, PII scrub, host caps.

Bloom contract: NO false negatives ever (structural), false-positive
rate within a loose bound of theory, distributed word build == a local
reference bitmap bit-for-bit, split_by_membership == the plain
semi/anti joins, and cross_snapshot_decisions with a bloom equals the
plain path row-for-row.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from duplicate_finder_spark.config import PipelineConfig
from duplicate_finder_spark.operators.bloomfilter import (
    BloomFilter, bloom_params, bloom_words, merge_bloom_words,
    split_by_membership)
from duplicate_finder_spark.operators.domains import (cap_per_host,
                                                      host_of, host_stats)
from duplicate_finder_spark.functions.pii import scrub_pii


def _urls(spark, names):
    return spark.createDataFrame([(n,) for n in names], "url string")


# --- bloom ------------------------------------------------------------------

def test_bloom_params_textbook_sizing():
    m, k = bloom_params(1000, 0.01)
    assert m % 64 == 0
    assert 9000 <= m <= 10100          # -n ln p / ln2² ≈ 9585
    assert k in (6, 7)                 # (m/n) ln2 ≈ 6.6
    with pytest.raises(ValueError):
        bloom_params(0, 0.01)
    with pytest.raises(ValueError):
        bloom_params(10, 1.5)


def test_distributed_words_match_local_reference(spark):
    """The explode/groupBy/bit_or build == a python-loop bitmap."""
    names = [f"u{i}" for i in range(200)]
    m, k = bloom_params(200, 0.01)
    bf = BloomFilter.from_words(
        bloom_words(_urls(spark, names), "url", m, k), m, k)
    # local reference: same xxhash64 seeds, evaluated via Spark one col
    pos_rows = (_urls(spark, names).select(F.array(
        *[F.pmod(F.xxhash64("url", F.lit(i)), F.lit(m))
          for i in range(k)]).alias("p")).collect())
    ref = np.zeros(m // 64, dtype=np.int64)
    for r in pos_rows:
        for p in r["p"]:
            ref[p >> 6] |= np.int64(np.uint64(1) << np.uint64(p & 63))
    assert np.array_equal(bf.words, ref)


def test_no_false_negatives_and_bounded_fp(spark):
    members = [f"m{i}" for i in range(500)]
    others = [f"x{i}" for i in range(2000)]
    bf = BloomFilter.build(_urls(spark, members), "url", 500, fpp=0.01)
    probed = bf.maybe_contains(_urls(spark, members + others), "url")
    got = {r["url"]: r["bloom_maybe"] for r in probed.collect()}
    assert all(got[m] for m in members)          # structural guarantee
    fp = sum(got[o] for o in others)
    assert fp <= 0.05 * len(others), fp          # 5× the 1% design fpp


def test_merge_words_equals_build_over_union(spark):
    m, k = bloom_params(300, 0.01)
    a, b = [f"a{i}" for i in range(150)], [f"b{i}" for i in range(150)]
    merged = merge_bloom_words(
        bloom_words(_urls(spark, a), "url", m, k),
        bloom_words(_urls(spark, b), "url", m, k))
    direct = bloom_words(_urls(spark, a + b), "url", m, k)
    assert np.array_equal(
        BloomFilter.from_words(merged, m, k).words,
        BloomFilter.from_words(direct, m, k).words)


def test_split_by_membership_is_exact(spark):
    store = _urls(spark, [f"s{i}" for i in range(100)])
    batch = _urls(spark, [f"s{i}" for i in range(50, 150)])
    bf = BloomFilter.build(store, "url", 100, fpp=0.05)
    inside, outside = split_by_membership(batch, store, bf, "url")
    assert {r["url"] for r in inside.collect()} == \
        {f"s{i}" for i in range(50, 100)}
    assert {r["url"] for r in outside.collect()} == \
        {f"s{i}" for i in range(100, 150)}


def test_cross_snapshot_decisions_bloom_parity(spark):
    from duplicate_finder_spark.operators.crosssnap import (
        cross_snapshot_decisions)
    from duplicate_finder_spark.operators.minhash import signatures
    cfg = PipelineConfig(num_perm=128, lsh_bands=32,
                         jaccard_threshold=0.8)

    def doc(seed):
        return " ".join(f"{seed}{i}" for i in range(60))

    def sigs(rows):
        return signatures(
            spark.createDataFrame(rows, "url string, text string"), cfg)

    store = sigs([("s1", doc("a")), ("s2", doc("b"))])
    new = sigs([("s1", doc("a")), ("n2", doc("c")), ("n3", doc("c")),
                ("n4", doc("d"))])
    bf = BloomFilter.build(store.select("url"), "url", 10, fpp=0.01)
    plain = {tuple(r) for r in
             cross_snapshot_decisions(new, store, cfg).collect()}
    bloomed = {tuple(r) for r in
               cross_snapshot_decisions(new, store, cfg,
                                        store_bloom=bf).collect()}
    assert plain == bloomed
    assert ("s1", "s1", "delete", "dup_of_corpus") in bloomed


def test_probe_is_arrow_vectorized(spark):
    bf = BloomFilter.build(_urls(spark, ["a"]), "url", 1, fpp=0.1)
    probed = bf.maybe_contains(_urls(spark, ["a", "b"]), "url")
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


# --- pii --------------------------------------------------------------------

def test_scrub_pii_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [(1, "mail bob@x.org and ann.lee+s@sub.dom.io now"),
         (2, "server 10.0.0.1 peers 192.168.7.13"),
         (3, "call 555-012-3456 or 555.867.5309 today"),
         (4, "clean text with no identifiers at all"),
         (5, "combo a@b.co 8.8.8.8 555-123-4567")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    assert (got[1]["n_emails"], got[1]["n_ipv4s"], got[1]["n_phones"]) \
        == (2, 0, 0)
    assert got[2]["n_ipv4s"] == 2
    assert got[3]["n_phones"] == 2
    assert got[4]["n_pii"] == 0 and got[4]["redacted_text"] == \
        "clean text with no identifiers at all"
    assert got[5]["redacted_text"] == "combo <EMAIL> <IP> <PHONE>"
    assert got[5]["n_pii"] == 3


def test_scrub_pii_no_python_in_plan(spark):
    df = spark.createDataFrame([(1, "t a@b.co")], "doc_id long, text string")
    plan = scrub_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan    # pure JVM expressions


# --- domains ----------------------------------------------------------------

def _pages(spark):
    rows = []
    for h, n in (("big.example", 9), ("mid.example", 4),
                 ("tiny.example", 1)):
        rows += [(f"https://{h}/p/{i:03d}", f"text {h} {i}")
                 for i in range(n)]
    return spark.createDataFrame(rows, "url string, text string")


def test_host_stats_counts_and_rank(spark):
    got = {r["host"]: r for r in host_stats(_pages(spark)).collect()}
    assert got["big.example"]["n_docs"] == 9
    assert got["big.example"]["n_docs_rank"] == 1
    assert got["tiny.example"]["n_docs_rank"] == 3


def test_cap_per_host_equals_naive_window(spark):
    from pyspark.sql import Window
    pages = _pages(spark)
    for cap in (1, 3, 100):
        got = {r["url"] for r in
               cap_per_host(pages, cap, salt=4).collect()}
        w = Window.partitionBy(host_of("url")).orderBy("url")
        want = {r["url"] for r in
                pages.withColumn("_r", F.row_number().over(w))
                     .filter(F.col("_r") <= cap).collect()}
        assert got == want, cap
    with pytest.raises(ValueError):
        cap_per_host(pages, 0)


def test_host_of_handles_ports_and_case(spark):
    df = spark.createDataFrame(
        [("HTTPS://WWW.Site.ORG:8443/a?b#c",), ("not-a-url",)],
        "url string")
    got = [r[0] for r in df.select(host_of("url")).collect()]
    assert got == ["www.site.org", ""]
