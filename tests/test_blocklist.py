"""Domain/badword blocklist filters (operators/blocklist.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from duplicate_finder_spark.operators.blocklist import (
    badword_filter, domain_blocklist_filter, domain_chain)


def test_domain_chain_suffixes(spark):
    out = spark.range(1).select(
        domain_chain(F.lit("a.b.c")).alias("c1"),
        domain_chain(F.lit("host")).alias("c2"),
        domain_chain(F.lit("")).alias("c3"),
        domain_chain(F.lit("x1.x2.x3.x4"), max_labels=2).alias("c4"),
    ).first()
    assert list(out["c1"]) == ["a.b.c", "b.c", "c"]
    assert list(out["c2"]) == ["host"]
    assert list(out["c3"]) == []
    assert list(out["c4"]) == ["x3.x4", "x4"]


def test_domain_chain_normalizes_fqdn_dots(spark):
    """ADVICE r4: a DNS-root-anchored host ('tracker.example.') must
    produce the same suffix chain as the dotless form, so blocklist
    entries match FQDN-form URLs; doubled and leading dots likewise."""
    out = spark.range(1).select(
        domain_chain(F.lit("tracker.example.")).alias("c1"),
        domain_chain(F.lit("a..b.c")).alias("c2"),
        domain_chain(F.lit(".x.y")).alias("c3"),
        domain_chain(F.lit("...")).alias("c4"),
    ).first()
    assert list(out["c1"]) == ["tracker.example", "example"]
    assert list(out["c2"]) == ["a.b.c", "b.c", "c"]
    assert list(out["c3"]) == ["x.y", "y"]
    assert list(out["c4"]) == []


def test_blocklist_catches_fqdn_trailing_dot(spark):
    bl = spark.createDataFrame([("tracker.example",)], "domain string")
    pages = spark.createDataFrame(
        [(1, "https://tracker.example./y"),
         (2, "https://ads.tracker.example./x")],
        "doc_id long, url string")
    out = {r["url"]: r["blocked_by"]
           for r in domain_blocklist_filter(pages, bl).collect()}
    assert out["https://tracker.example./y"] == "tracker.example"
    assert out["https://ads.tracker.example./x"] == "tracker.example"


def _pages(spark):
    rows = [(1, "https://ads.tracker.example/x"),
            (2, "https://tracker.example/y"),
            (3, "https://nottracker.example/z"),    # NOT a subdomain
            (4, "https://clean.example/ok"),
            (5, "https://deep.cdn.Tracker.example/q"),  # case-folds
            (6, "not-a-url")]
    return spark.createDataFrame(rows, "doc_id long, url string")


def test_domain_blocklist_suffix_semantics(spark):
    bl = spark.createDataFrame([("tracker.example",), ("malware.test",)],
                               "domain string")
    out = {r["url"]: r["blocked_by"]
           for r in domain_blocklist_filter(_pages(spark), bl).collect()}
    assert out["https://ads.tracker.example/x"] == "tracker.example"
    assert out["https://tracker.example/y"] == "tracker.example"
    assert out["https://nottracker.example/z"] is None
    assert out["https://clean.example/ok"] is None
    assert out["https://deep.cdn.Tracker.example/q"] == "tracker.example"
    assert out["not-a-url"] is None
    assert len(out) == 6  # no row multiplication


def test_domain_blocklist_most_specific_hit_reported(spark):
    pages = spark.createDataFrame(
        [(1, "https://a.b.c.example/p")], "doc_id long, url string")
    bl = spark.createDataFrame(
        [("c.example",), ("b.c.example",)], "domain string")
    got = domain_blocklist_filter(pages, bl).first()["blocked_by"]
    assert got == "b.c.example"


def test_domain_blocklist_plan_is_equijoin(spark):
    """Suffix matching must plan as a broadcast EQUI-join over the
    exploded chain — no BroadcastNestedLoopJoin, no regex theta-join."""
    bl = spark.createDataFrame([("x.example",)], "domain string")
    out = domain_blocklist_filter(_pages(spark), bl)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "EvalPython" not in plan and "InPandas" not in plan


from hypothesis import given, settings
from hypothesis import strategies as st

_LABEL = st.sampled_from(["a", "b", "cc", "dd", "x0"])
_HOST = st.lists(_LABEL, min_size=1, max_size=5).map(".".join)


@settings(max_examples=20, deadline=None)
@given(hosts=st.lists(_HOST, min_size=1, max_size=8),
       blocked=st.lists(_HOST, min_size=1, max_size=5))
def test_domain_blocklist_matches_python_reference(spark, hosts, blocked):
    """Random host/list combinations: the exploded-chain equi-join
    verdict equals direct suffix matching, most-specific hit first."""
    def ref(host):
        best = None
        for e in set(blocked):
            if host == e or host.endswith("." + e):
                if best is None or e.count(".") > best.count("."):
                    best = e
        return best

    pages = spark.createDataFrame(
        [(i, f"https://{h}/p") for i, h in enumerate(hosts)],
        "doc_id long, url string")
    bl = spark.createDataFrame([(e,) for e in blocked], "domain string")
    got = {r["doc_id"]: r["blocked_by"]
           for r in domain_blocklist_filter(pages, bl).collect()}
    assert got == {i: ref(h) for i, h in enumerate(hosts)}


def test_badword_filter_counts_and_clean_docs(spark):
    docs = spark.createDataFrame(
        [(1, "the Quick BAD fox bad"),     # 'bad' once distinct
         (2, "all clean words here"),
         (3, "worse and bad and worse"),   # two distinct hits
         (4, "")],
        "doc_id long, text string")
    bw = spark.createDataFrame([("bad",), ("WORSE",)], "word string")
    out = {r["doc_id"]: (r["n_badwords"], r["first_badword"])
           for r in badword_filter(docs, bw).collect()}
    assert out == {1: (1, "bad"), 2: (0, None),
                   3: (2, "bad"), 4: (0, None)}
    assert len(out) == 4


def test_badword_plan_ships_distinct_pairs(spark):
    docs = spark.createDataFrame([(1, "a a a a b")],
                                 "doc_id long, text string")
    bw = spark.createDataFrame([("a",)], "word string")
    out = badword_filter(docs, bw)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "EvalPython" not in plan and "InPandas" not in plan
