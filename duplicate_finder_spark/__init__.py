"""duplicate_finder_spark — a PySpark-native near-duplicate detection engine.

A from-scratch re-expression of the query semantics of the reference
``vetalguru/duplicate-finder`` (filter → group-by-size → having count>1 →
content-hash group → verify → rank-within-group → keep/delete → report),
generalized to web-scale near-dup detection over Common-Crawl-style pages:
MinHash/LSH, SimHash, n-gram Jaccard verification, substring containment,
and distributed connected components — all declared with the DataFrame API
so Catalyst/Tungsten/AQE own the physical plan.

Reference semantics are cited per-module as ``file:line`` into
``/root/reference`` (behavioral parity only; no code is ported).
"""

from duplicate_finder_spark.config import PipelineConfig  # noqa: F401

__version__ = "0.1.0"
