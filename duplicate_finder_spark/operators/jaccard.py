"""Exact n-gram Jaccard similarity — the SQL-checkable near-dup operator.

Unlike the MinHash path (operators/minhash.py, probabilistic candidates),
this computes EXACT word-k-gram Jaccard for every colliding pair via
explode + self-equi-join on the shingle — the classic inverted-index
pairing. Quadratic in the worst case (every pair sharing ≥1 shingle gets
a row), so at 100 TB this runs AFTER candidate pruning or on bounded
subsets; its role here is (a) the verify-stage oracle and (b) a directly
DuckDB-checkable queries() entry.

Skew note: high-document-frequency shingles (boilerplate) explode the
self-join; ``max_doc_freq`` drops shingles shared by more than that many
docs — the standard df-cut from plagiarism-detection literature, applied
BEFORE the join so the hot keys never shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from duplicate_finder_spark.operators.minhash import shingle_sets

# default df-cut: a shingle shared by more docs than this is boilerplate
# and is dropped BEFORE the self-join. Finite BY DEFAULT — at web scale a
# template shingle shared by 10^6 docs would otherwise create a 10^12-row
# join; 1000 bounds any single shingle's contribution to ≤ ~5·10^5 pairs
# while being a no-op on corpora smaller than 1000 docs (the oracle path).
DEFAULT_MAX_DOC_FREQ = 1000


def df_cut_stats(docs: DataFrame, k: int = 3,
                 id_col: str = "doc_id", text_col: str = "text",
                 max_doc_freq: int = DEFAULT_MAX_DOC_FREQ) -> DataFrame:
    """The df-cut's audit log as data: 1 row (n_distinct_shingles,
    dropped_shingles, max_doc_freq_seen) for the same (k, max_doc_freq)
    a paired ``ngram_jaccard_pairs`` call uses.

    A separate tiny aggregation job rather than an in-plan Observation:
    the pairing plan self-joins the shingle subtree, which duplicates any
    CollectMetrics node inside it (Spark then fails to surface the
    metrics), and an Observation on the broadcast build side of the
    semi-join is silently swallowed. One extra map-side-combined count
    over the shingles is the honest price of the audit; call it only
    when logging the cut.
    """
    # explode_outer, deliberately: plain explode makes the optimizer
    # infer a `size(sh) > 0` filter below the Generate, and pushing a
    # filter that references a UDF-computed column duplicates the
    # Arrow shingle UDF (it runs once under the pushed filter and
    # again in the projection — the guide §4.4 pathology, via
    # InferFiltersFromGenerate). shingle_sets never emits a null or
    # empty array (blank docs are filtered pre-UDF), so the outer
    # variant is row-identical and evaluates the UDF once.
    sh = (shingle_sets(docs, k, id_col, text_col)
          .select(F.explode_outer("sh").alias("s")))
    counts = sh.groupBy("s").count()
    return counts.agg(
        F.count("*").alias("n_distinct_shingles"),
        F.sum(F.when(F.col("count") > max_doc_freq, 1).otherwise(0))
         .alias("dropped_shingles"),
        F.max("count").alias("max_doc_freq_seen"))


def ngram_jaccard_pairs(docs: DataFrame, k: int = 3,
                        threshold: float = 0.8,
                        id_col: str = "doc_id", text_col: str = "text",
                        max_doc_freq: int | None = DEFAULT_MAX_DOC_FREQ
                        ) -> DataFrame:
    """→ (id_a, id_b, jaccard) for pairs with Jaccard ≥ threshold.

    Shingles are 64-bit hashes from the linear Arrow UDF
    (operators/minhash.py::shingle_sets); set Jaccard over the hashes
    equals Jaccard over the shingle strings up to ~2^-64 collision mass,
    so DuckDB string-shingle oracles still match value-for-value.

    ``max_doc_freq`` (finite by default) drops boilerplate shingles
    before the join; audit what the cut drops with ``df_cut_stats``.
    Pass ``max_doc_freq=None`` only for exact-oracle runs on bounded data.
    """
    arr = shingle_sets(docs, k, id_col, text_col)
    # carry the set size through the explode: the shingle pass (scan +
    # Arrow UDF) then runs ONCE, and the per-pair Jaccard needs no joins
    # back to a sizes table — |set| rides along as a constant per id.
    # The duplicated 8-byte column in the shuffle is far cheaper than a
    # second full pass over the corpus + two extra shuffles at 100 TB.
    # explode_outer: same row set (shingle_sets never emits empty/null
    # arrays) but WITHOUT the optimizer-inferred size(sh)>0 filter that
    # plain explode adds below the Generate — that filter references
    # the UDF output and gets pushed below it, duplicating the Arrow
    # shingle UDF per side (guide §4.4; see df_cut_stats note)
    sh = arr.select("id", "n", F.explode_outer("sh").alias("s"))
    if max_doc_freq is not None:
        # df-cut as a WINDOW count over the shingle exchange — the
        # candidate_pairs census shape (operators/lsh.py:37, measured
        # 1.6-1.7x faster than groupBy + join-back at 2M docs): rows per
        # doc are distinct (shingle_sets dedups), so count(*) over s IS
        # the document frequency, and the one hash exchange on s is
        # shared by the window, then reused by BOTH sides of the
        # self-equi-join below (identical subtrees) — the shingle
        # subtree (scan + tokenize + Arrow UDF) executes exactly once,
        # where the old groupBy census + left-semi probe re-scanned it.
        w = Window.partitionBy("s")
        sh = (sh.withColumn("_df", F.count("*").over(w))
              .filter(F.col("_df") <= max_doc_freq)
              .drop("_df"))
    a = sh.select(F.col("id").alias("id_a"), F.col("n").alias("na"), "s")
    b = sh.select(F.col("id").alias("id_b"), F.col("n").alias("nb"), "s")
    inter = (a.join(b, "s")
             .filter(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b", "na", "nb")
             .agg(F.count("*").alias("c")))
    return (inter
            .withColumn("jaccard",
                        F.col("c") / (F.col("na") + F.col("nb") - F.col("c")))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))
