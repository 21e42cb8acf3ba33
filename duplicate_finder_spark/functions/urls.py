"""URL canonicalization — the zeroth dedup pass of a web-scale corpus.

Before any content hash runs, a crawl dedups by URL: the same page is
fetched as ``HTTP://Example.COM:80/a?utm_source=x#frag`` and
``http://example.com/a``, and treating those as two documents inflates
every downstream stage (two signatures, two band fans, one guaranteed
dup pair). The reference dedups by file-path identity only
(duplicate_finder.py:154-169 walks each path once); URL-space identity
is the web generalization of the same "never hash the same thing
twice" rule.

Everything here is JVM-side expression algebra (lower / regexp /
split / filter / array_join) — no UDFs — so it composes into scans
and survives whole-stage codegen; at 10^12 rows this pass is a
map-only projection with zero shuffle.

Canonical form (conservative; order matters):
1. scheme + authority lowercased (path/query case is preserved — it
   is significant on most servers);
2. fragment dropped (never sent to the server);
3. explicit default ports dropped (``:80`` http, ``:443`` https);
4. tracking query parameters removed (``utm_*``, ``gclid``,
   ``fbclid``, ``msclkid``, ``mc_eid``, ``igshid``, ``ref``) — they
   identify the CLICK, not the document; remaining params keep their
   original order (key reordering changes semantics on some
   endpoints — deliberately NOT sorted);
5. the ``?`` is dropped when the query emptied; a bare host root's
   trailing ``/`` is collapsed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# rule-4 param names; a deployment extends this per corpus. Kept as a
# single alternation so the Spark filter lambda and the DuckDB oracle
# (__spark_entry__.py::url_dup_groups) share one literal regex.
TRACKING_RE = "^(utm_[a-z]+|gclid|fbclid|msclkid|mc_eid|igshid|ref)="

_HEAD_RE = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"


def canonical_url(col: str | Column = "url") -> Column:
    """Canonical form of a URL column (pure expression — no UDF)."""
    c = F.col(col) if isinstance(col, str) else col
    # 2. drop fragment first (so port/query rules never see it)
    c = F.regexp_replace(c, r"#.*$", "")
    # 1. lowercase scheme://authority, keep the remainder byte-for-byte
    head = F.regexp_extract(c, _HEAD_RE, 1)
    rest = c.substr(F.length(head) + F.lit(1), F.lit(1 << 30))
    c = F.concat(F.lower(head), rest)
    # 3. drop explicit default ports
    c = F.regexp_replace(c, r"^(http://[^/:?#]+):80(?=[/?]|$)", r"$1")
    c = F.regexp_replace(c, r"^(https://[^/:?#]+):443(?=[/?]|$)", r"$1")
    # 4. rebuild the query without tracking params
    base = F.substring_index(c, "?", 1)
    query = c.substr(F.length(base) + F.lit(2), F.lit(1 << 30))
    kept = F.filter(F.split(query, "&"),
                    lambda p: (p != "") & ~p.rlike(TRACKING_RE))
    c = F.when(~c.contains("?"), c) \
         .when(F.size(kept) > 0,
               F.concat(base, F.lit("?"), F.array_join(kept, "&"))) \
         .otherwise(base)
    # 5. bare-root trailing slash
    return F.regexp_replace(c, r"^([a-z][a-z0-9+.-]*://[^/?#]+)/$", r"$1")


def url_dup_groups(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """→ (canonical_url, n_urls, min_url): canonical-URL groups with
    more than one raw spelling — the crawl's URL-dup report and the
    keep-first rule's input (min raw url survives, mirroring the
    content-hash keep-first of operators/exact.py).

    One narrow groupBy shuffle on the canonical key, partial-agg
    combined map-side; with AQE a skewed giant (a template page linked
    under thousands of tracking variants) splits automatically.
    """
    return (pages
            .select(F.col(url_col).alias("raw_url"),
                    canonical_url(url_col).alias("canonical_url"))
            .groupBy("canonical_url")
            .agg(F.count("*").alias("n_urls"),
                 F.min("raw_url").alias("min_url"))
            .filter(F.col("n_urls") > 1))
