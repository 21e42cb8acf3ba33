"""Per-host corpus accounting and source balancing (Dolma-style caps).

Web-scale training mixes cap how much any single host contributes —
otherwise one mirror farm or SEO spam network dominates the corpus.
This generalizes the reference's group-by-size accounting
(duplicate_finder.py:153-178: bucket, count, act on groups) from
size-buckets to url-host buckets, with the decision being "keep the
first ``max_per_host`` pages" instead of "keep the first file".

Scale design — the hard part is HOST SKEW: at 10^12 pages a head host
(a blog platform, a wiki farm) holds 10^8-10^9 pages, so the naive
``row_number() over (partition by host order by url)`` sends an entire
head host through ONE reducer. ``cap_per_host`` is therefore two-phase:

1. salted pre-rank: partition by (host, pmod(xxhash64(url), salt))
   and keep rank ≤ K within each salt cell. Each reducer sees ~1/salt
   of any host. Because the final winners are the global top-K in a
   TOTAL order (url), every global winner is also a within-cell top-K
   member — the pre-rank is a lossless filter.
2. exact rank over the survivors: ≤ salt·K rows per host remain, so
   the second window is tiny no matter how hot the host was.

The result is EXACTLY equal to the single-window plan (the oracle
asserts this value-for-value), but no reducer ever materializes more
than ``salt·K`` rows per host in phase 2 or ~n_host/salt in phase 1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from duplicate_finder_spark.functions.ranks import global_rank

HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/?#:]+)"


def host_of(col: str | Column = "url") -> Column:
    """Lowercased registrable host of an absolute URL ('' if opaque).

    regexp_extract instead of parse_url so the DuckDB oracle computes
    the identical expression (parse_url has no RE2-engine analogue).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(F.lower(c), HOST_RE, 1)


def host_stats(pages: DataFrame, url_col: str = "url",
               text_col: str = "text") -> DataFrame:
    """→ (host, n_docs, n_chars, n_docs_rank) — corpus composition.

    One map-side-combinable groupBy. The rank runs over the aggregated
    table (one row per host) — SMALLER than the corpus but not small:
    10^12 pages have ~10^8 hosts, so a plain global row_number window
    would drag the whole host table through one reducer. global_rank
    (functions/ranks.py) computes the identical numbering in parallel
    via range-partition + per-partition offsets; (n_docs desc, host)
    is a total order (host unique post-groupBy), so the output equals
    the naive window value-for-value — the oracle asserts it against
    DuckDB's global row_number().
    """
    agg = (pages.select(host_of(url_col).alias("host"),
                        F.length(text_col).alias("_len"))
           .groupBy("host")
           .agg(F.count("*").alias("n_docs"),
                F.sum("_len").alias("n_chars")))
    return global_rank(agg, [F.desc("n_docs"), F.asc("host")],
                       out_col="n_docs_rank")


def cap_per_host(pages: DataFrame, max_per_host: int,
                 url_col: str = "url", salt: int = 64) -> DataFrame:
    """Keep the first ``max_per_host`` pages per host, ordered by url.

    Two-phase skew-bounded top-K (module docstring); output equals the
    naive one-window plan exactly. ``salt`` bounds phase-2 fan-in at
    ``salt * max_per_host`` rows per host.
    """
    if max_per_host < 1:
        raise ValueError(f"max_per_host must be >= 1, got {max_per_host}")
    host = host_of(url_col).alias("_host")
    tagged = pages.withColumn("_host", host).withColumn(
        "_cell", F.pmod(F.xxhash64(url_col), F.lit(salt)))
    pre_w = Window.partitionBy("_host", "_cell").orderBy(url_col)
    survivors = (tagged
                 .withColumn("_r", F.row_number().over(pre_w))
                 .filter(F.col("_r") <= max_per_host)
                 .drop("_r", "_cell"))
    fin_w = Window.partitionBy("_host").orderBy(url_col)
    return (survivors
            .withColumn("_r", F.row_number().over(fin_w))
            .filter(F.col("_r") <= max_per_host)
            .drop("_r", "_host"))
