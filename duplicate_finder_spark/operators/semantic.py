"""SemDeDup-style semantic deduplication over an embedding column.

The lexical stack (MinHash/SimHash/ExactSubstr) catches documents that
SHARE TEXT; it is blind to re-writes — the same press release
paraphrased across a thousand outlets, machine-translated boilerplate,
templated product blurbs with synonyms swapped. SemDeDup (Abbas et al.
2023, arXiv:2303.09540) closes that gap with embeddings: k-means the
embedding space, call within-cluster pairs above a cosine threshold
semantic duplicates, and keep ONE representative per duplicate group —
the member LEAST similar to its centroid (the most informative /
least prototypical example; dropping the prototypical center of a
semantic pile is the paper's measured win for downstream LM quality).

This maps onto the reference's hash-group-delete workflow
(duplicate_finder.py:200-260: group by key, keep one, mark the rest)
with "same hash" generalized to "same semantic neighborhood":

* the k-means cells play the role of the size-prefilter buckets — an
  O(N·k) map-side pass that makes the pair stage sub-quadratic;
* within-cell pairing + exact cosine verify play the role of the hash
  equality check;
* connected components + a keep rule play group+decide, exactly like
  the lexical near-dup chain (operators/components.py,
  operators/decisions.py).

Scale shape (the reason this survives 10^12 documents):

* assignment is centroids-broadcast × corpus-streamed: one map-side
  N×k scoring pass whose argmax is a partial-aggregable ``max_by`` —
  the shuffle carries ONE row per vector, never N×k;
* candidate pairs come from a self-equi-join on ``cell_id`` — the
  corpus never cross-joins itself; per vector the candidate set is its
  cell (≈ N/k, sized by the trainer's ``n_cells``);
* cells above ``hot_cluster_limit`` (embedding-space boilerplate:
  template pages embed near-identically and pile into one cell)
  degrade O(s²) all-pairs → O(s) STAR edges against the cell's min-id
  representative — the same skew fence as the MinHash LSH buckets
  (operators/lsh.py) and the hyperplane buckets (operators/ann.py);
* survivors get the exact JVM-side double-precision cosine verify
  (no Python anywhere in the operator);
* duplicate groups close over cells via connected components
  (operators/components.py — O(log n) rounds, checkpointable).

Honest semantic caveat, same as the paper's: a duplicate pair that
k-means SPLITS across two cells is invisible (no cross-cell pairing).
Recall is governed by the clustering quality / k choice; the driver
gate below constructs its duplicates scale-collinear so assignment
provably co-locates them and the oracle equality is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from duplicate_finder_spark.operators.ann import _dot, _norm, ivf_centroids
from duplicate_finder_spark.operators.components import connected_components


def assign_cells(vectors: DataFrame, centroids: DataFrame,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 round_digits: int = 6) -> DataFrame:
    """→ (vec_id, cell_id, centroid_sim): deterministic
    nearest-centroid assignment — argmax of the ROUNDED cosine with
    smallest ``cell_id`` as tie-break, so assignments are reproducible
    across engines and float-summation orders (the DuckDB oracle
    re-derives them value-for-value).

    ``centroids``: (cell_id int, cv array<double>) — e.g. the output of
    ``operators.ann.ivf_centroids``.

    Scale shape: centroids broadcast, N×k scoring map-side, argmax via
    ``max_by`` over a (sim, -cell_id) struct — partial-aggregable, the
    exchange carries one row per vector.
    """
    # both norms are prejoined so the k-way scoring row evaluates ONE
    # interpreted array fold (the dot), not three: _norm(v) once per
    # vector instead of once per (vector, centroid), _norm(cv) once per
    # centroid on the broadcast side — bit-identical to the inline form
    v = (vectors.select(F.col(id_col).alias("vec_id"),
                        F.col(vec_col).cast("array<double>").alias("v"))
         .withColumn("_nv", _norm(F.col("v"))))
    cents = centroids.withColumn("_ncv", _norm(F.col("cv")))
    sim = F.round(
        _dot(F.col("v"), F.col("cv")) / (F.col("_nv") * F.col("_ncv")),
        round_digits)
    scored = v.crossJoin(F.broadcast(cents)).withColumn("_s", sim)
    # struct ordering is lexicographic: higher sim wins, then higher
    # -cell_id (= smaller cell_id) breaks exact ties
    pick = F.max_by(
        F.struct(F.col("cell_id"), F.col("_s")),
        F.struct(F.col("_s").alias("s"), (-F.col("cell_id")).alias("nc")))
    return (scored.groupBy("vec_id").agg(pick.alias("_p"))
            .select("vec_id",
                    F.col("_p.cell_id").alias("cell_id"),
                    F.col("_p._s").alias("centroid_sim")))


def semantic_dedup(vectors: DataFrame, threshold: float = 0.95,
                   centroids: DataFrame | None = None, n_cells: int = 64,
                   kmeans_iters: int = 2, seed: int = 42,
                   hot_cluster_limit: int = 10_000,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   round_digits: int = 6) -> DataFrame:
    """→ (vec_id, cell_id, centroid_sim, cluster_id, action): one row
    per member of a semantic-duplicate group.

    ``cluster_id`` is the group's minimum vec_id (component
    representative); ``action`` is ``keep`` for exactly one member per
    group — the one with the LOWEST centroid similarity (ties → smaller
    vec_id), per SemDeDup's keep-the-least-prototypical rule — and
    ``drop`` for the rest. Vectors in no duplicate group emit no row
    (they are trivially kept, like singleton hash groups in the exact
    stage).

    Pass pre-trained ``centroids`` (cell_id, cv) for repeated runs /
    cross-engine determinism; otherwise ``ivf_centroids`` trains them
    (deterministic pseudo-random init + ``kmeans_iters`` Lloyd rounds,
    all DataFrame aggregations).
    """
    cents = centroids if centroids is not None else ivf_centroids(
        vectors, n_cells, seed, id_col, vec_col, kmeans_iters)
    assign = assign_cells(vectors, cents, id_col, vec_col, round_digits)

    w = Window.partitionBy("cell_id")
    sized = (assign
             .withColumn("_csize", F.count("*").over(w))
             .withColumn("_crep", F.min("vec_id").over(w))
             .filter(F.col("_csize") > 1))
    small = sized.filter(F.col("_csize") <= hot_cluster_limit)
    hot = sized.filter(F.col("_csize") > hot_cluster_limit)

    left = small.select("cell_id", F.col("vec_id").alias("id_a"))
    right = small.select("cell_id", F.col("vec_id").alias("id_b"))
    pairs_small = (left.join(right, "cell_id")
                   .filter(F.col("id_a") < F.col("id_b"))
                   .select("id_a", "id_b"))
    # _crep = min(vec_id) over the cell ⇒ id_a < id_b holds
    pairs_hot = (hot.filter(F.col("vec_id") != F.col("_crep"))
                 .select(F.col("_crep").alias("id_a"),
                         F.col("vec_id").alias("id_b")))
    # no distinct needed: each vector lives in exactly one cell, the
    # small-cell equi-join emits each unordered pair once (id_a < id_b),
    # and small/hot cells are disjoint — a distinct here would be a
    # full extra exchange over the pair set for nothing
    pairs = pairs_small.unionByName(pairs_hot)

    # norms are computed ONCE per vector, pre-join: array higher-order
    # functions are CodegenFallback (interpreted per element), and a
    # cell member appears in O(cell_size) pairs — recomputing its norm
    # per pair was 2/3 of the verify stage's interpreted work. Division
    # by the prejoined na*nb is bit-identical to the inline form (same
    # fold over the same array).
    a = vectors.select(F.col(id_col).alias("id_a"),
                       F.col(vec_col).cast("array<double>").alias("av"))
    a = a.withColumn("na", _norm(F.col("av")))
    b = vectors.select(F.col(id_col).alias("id_b"),
                       F.col(vec_col).cast("array<double>").alias("bv"))
    b = b.withColumn("nb", _norm(F.col("bv")))
    sim = _dot(F.col("av"), F.col("bv")) / (F.col("na") * F.col("nb"))
    edges = (pairs.join(a, "id_a").join(b, "id_b")
             .withColumn("_sim", F.round(sim, round_digits))
             .filter(F.col("_sim") >= threshold)
             .select(F.col("id_a").alias("src"),
                     F.col("id_b").alias("dst")))

    comp = connected_components(edges).select(
        F.col("url").alias("vec_id"), "cluster_id")
    members = comp.join(assign, "vec_id")
    keep_rank = F.row_number().over(
        Window.partitionBy("cluster_id")
              .orderBy(F.asc("centroid_sim"), F.asc("vec_id")))
    return (members.withColumn("_r", keep_rank)
            .select("vec_id", "cell_id", "centroid_sim", "cluster_id",
                    F.when(F.col("_r") == 1, F.lit("keep"))
                     .otherwise(F.lit("drop")).alias("action")))
