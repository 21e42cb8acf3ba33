"""URL-domain and badword blocklist filtering (crawl hygiene).

Every production web corpus runs blocklists before anything else
touches the text: C4 dropped pages containing any token from a
public "bad words" list; RefinedWeb and Dolma filter against
curated URL/domain blocklists (adult, spam, malware aggregators).
Both are cheap, high-leverage gates, and both have a scale trap this
module avoids:

* **Domain lists match by SUFFIX** — blocking ``tracker.example``
  must also catch ``cdn.eu.tracker.example``. The naive plan is a
  LIKE/regex theta-join (corpus × blocklist — quadratic, never
  hash-joinable). Instead each page's host explodes into its
  ancestor-domain chain (``a.b.c`` → ``a.b.c``, ``b.c``, ``c`` —
  bounded by the label count, ≤ ~10 in practice, so the explode is a
  constant-factor map), which turns suffix matching into a plain
  EQUI-join against the blocklist — hash-partitioned, or broadcast
  when the list is small (curated lists are ~10^4-10^6 rows).
* **Badword lists match by TOKEN** — same move: explode distinct
  (doc, token) pairs and equi-join the token list, never a per-doc
  regex alternation over a 400-word pattern (the C4 list), which
  row-at-a-time engines pay per character.

Both filters return the SURVIVORS plus an audit view of what was
blocked and why (the list hit), because curation decisions must be
accountable (same contract as operators/curation.py).

No counterpart in the reference (duplicate_finder.py walks a local
filesystem); LLM-pipeline brief, composed from the same host parsing
as operators/domains.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from duplicate_finder_spark.functions.text import tokens
from duplicate_finder_spark.operators.domains import host_of

__all__ = ["domain_chain", "domain_blocklist_filter", "badword_filter"]


def domain_chain(host: Column, max_labels: int = 10) -> Column:
    """host → its ancestor-domain suffixes, most-specific first:
    ``a.b.c`` → [a.b.c, b.c, c] (capped at ``max_labels`` labels —
    longer hosts contribute their last ``max_labels`` suffixes, which
    over- rather than under-matches nothing: every real blocklist
    entry is far shorter).

    The host is normalized first: FQDN trailing dots (``tracker.
    example.`` — the DNS root-anchored form) and empty labels from
    doubled dots are stripped, so every suffix compares equal to the
    blocklist's dotless entries instead of silently never matching.
    """
    parts = F.split(
        F.regexp_replace(F.regexp_replace(host, r"\.{2,}", "."),
                         r"^\.+|\.+$", ""),
        r"\.")
    n = F.size(parts)
    return F.filter(
        F.transform(
            F.sequence(F.least(n, F.lit(max_labels)), F.lit(1),
                       F.lit(-1)),
            lambda i: F.array_join(F.slice(parts, n - i + 1, i), ".")),
        lambda s: s != "")


def domain_blocklist_filter(pages: DataFrame, blocklist: DataFrame,
                            url_col: str = "url",
                            domain_col: str = "domain",
                            broadcast_list: bool = True) -> DataFrame:
    """Drop pages whose url host equals, or is a subdomain of, any
    blocklist entry. → input columns + ``blocked_by`` (null for
    survivors; the MOST SPECIFIC matching entry otherwise — callers
    filter ``blocked_by IS NULL`` for the clean corpus).

    One explode (≤ label-count per page) + one equi-join (broadcast
    by default; set ``broadcast_list=False`` for 10^7+-row lists to
    hash-join instead) + one min_by aggregate back to one row per
    page — no regex join, no theta-join.
    """
    bl = (blocklist.select(F.lower(F.col(domain_col)).alias("_bl_domain"))
          .distinct())
    if broadcast_list:
        bl = F.broadcast(bl)
    chain = (pages
             .withColumn("_chain", domain_chain(
                 F.lower(host_of(url_col))))
             .select(url_col,
                     F.posexplode("_chain").alias("_depth", "_suffix")))
    hits = (chain.join(bl, chain["_suffix"] == bl["_bl_domain"])
            .groupBy(url_col)
            .agg(F.min_by("_suffix", "_depth").alias("blocked_by")))
    return pages.join(hits, url_col, "left")


def badword_filter(docs: DataFrame, badwords: DataFrame,
                   text_col: str = "text", id_col: str = "doc_id",
                   word_col: str = "word",
                   broadcast_list: bool = True) -> DataFrame:
    """C4-style token blocklist: → input columns + ``n_badwords``
    (distinct list words present, 0 for clean docs) + ``first_badword``
    (lexicographically first hit, null when clean). Tokens compare
    lowercase; the doc side ships DISTINCT (id, token) pairs so a
    spammy page repeating one slur ships it once."""
    bw = (badwords.select(F.lower(F.col(word_col)).alias("_bw"))
          .distinct())
    if broadcast_list:
        bw = F.broadcast(bw)
    toks = (docs.select(F.col(id_col),
                        F.explode(tokens(text_col)).alias("_tok"))
            .select(id_col, F.lower("_tok").alias("_tok"))
            .distinct())
    hits = (toks.join(bw, toks["_tok"] == bw["_bw"])
            .groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_badwords"),
                 F.min("_tok").alias("first_badword")))
    return (docs.join(hits, id_col, "left")
            .withColumn("n_badwords",
                        F.coalesce("n_badwords", F.lit(0))))
