"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exact baseline: queries are broadcast,
the scan side streams — one pass over the corpus per batch of queries,
no shuffle of the big side. The scale path buckets vectors with a
random-hyperplane LSH (SimHash on floats) so candidate sets shrink from
N to a bucket; both share the same JVM-side double-precision kernel
(zip_with multiply + sequential aggregate — deterministic summation
order, reproducible across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_topk(vectors: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                round_digits: int = 6) -> DataFrame:
    """→ (query_id, neighbor_id, sim, rank): exact top-k by cosine.

    Ranking happens on the ROUNDED similarity with the neighbor id as
    tie-break, so results are reproducible across engines/float orders.
    """
    # norms prejoined once per vector (array HOFs are CodegenFallback —
    # interpreted per element — and each vector meets every query row);
    # dividing by the prejoined product is bit-identical to the inline
    # form: same fold over the same array
    q = (queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).cast("array<double>").alias("qv"))
         .withColumn("_nq", _norm(F.col("qv"))))
    n = (vectors.select(F.col(id_col).alias("neighbor_id"),
                        F.col(vec_col).cast("array<double>").alias("nv"))
         .withColumn("_nn", _norm(F.col("nv"))))
    sim = _dot(F.col("qv"), F.col("nv")) / (F.col("_nq") * F.col("_nn"))
    scored = (n.crossJoin(F.broadcast(q))
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("sim", F.round(sim, round_digits)))
    w = F.row_number().over(
        Window.partitionBy("query_id")
              .orderBy(F.desc("sim"), F.asc("neighbor_id")))
    return (scored.withColumn("rank", w)
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "sim", "rank"))


def cosine_pairs_above(vectors: DataFrame, threshold: float,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       round_digits: int = 6,
                       max_rows: int | None = 100_000) -> DataFrame:
    """→ (id_a, id_b, sim ≥ threshold): embedding near-dup pairs.

    All-pairs — exact but O(N²): this is the ORACLE BASELINE, kept only
    to pin the scale path's recall. For web scale use
    ``cosine_pairs_lsh`` (bucketed, hot-bucket-capped, same verify).

    ``max_rows`` is an explicit size fence: pointing this at a corpus
    above it raises loudly instead of detonating an N² cross-join
    (pass None to bypass deliberately).
    """
    if max_rows is not None:
        n = vectors.count()
        if n > max_rows:
            raise ValueError(
                f"cosine_pairs_above is an O(N^2) oracle baseline: input "
                f"has {n} rows > max_rows={max_rows}; use "
                f"cosine_pairs_lsh for the scale path, or pass "
                f"max_rows=None to force")
    a = (vectors.select(F.col(id_col).alias("id_a"),
                        F.col(vec_col).cast("array<double>").alias("av"))
         .withColumn("na", _norm(F.col("av"))))
    b = (vectors.select(F.col(id_col).alias("id_b"),
                        F.col(vec_col).cast("array<double>").alias("bv"))
         .withColumn("nb", _norm(F.col("bv"))))
    sim = _dot(F.col("av"), F.col("bv")) / (F.col("na") * F.col("nb"))
    return (a.crossJoin(b)
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("sim", F.round(sim, round_digits))
            .filter(F.col("sim") >= threshold)
            .select("id_a", "id_b", "sim"))


def cosine_pairs_lsh(vectors: DataFrame, threshold: float,
                     n_planes: int = 8, n_tables: int = 6,
                     hot_bucket_limit: int = 10_000, seed: int = 42,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     round_digits: int = 6) -> DataFrame:
    """→ (id_a, id_b, sim ≥ threshold): the SCALE path for embedding
    near-dup EDGES — the bucketed replacement for the O(N²)
    ``cosine_pairs_above`` oracle baseline.

    Shape mirrors the MinHash LSH pairing (operators/lsh.py:37-59),
    swapping band hashes for multi-table random-hyperplane buckets:

    * candidates come from a self-equi-join on (table, bucket) — the
      corpus never cross-joins; per table a vector meets only its
      bucket's ≈ N/2^n_planes cohabitants;
    * bucket sizes come from one window count; buckets above
      ``hot_bucket_limit`` (embedding-space boilerplate: near-identical
      template pages embed near-identically and pile into one bucket)
      degrade O(s²) all-pairs → O(s) STAR edges against the bucket's
      min-id representative, preserving connectivity for downstream
      connected components while bounding pair counts;
    * survivors get the exact JVM-side cosine verify — precision 1 by
      construction; recall is 1-(1-(1-θ/π)^planes)^tables per pair,
      tuned via n_planes/n_tables.

    Edges-for-clustering semantics (like LSH candidate_pairs), not an
    exhaustive pair list: inside a HOT bucket only star edges survive.
    """
    cand = None
    for t in range(n_tables):
        vb = hyperplane_buckets(vectors, n_planes, seed + 7919 * t,
                                id_col, vec_col) \
            .withColumn("table", F.lit(t))
        cand = vb if cand is None else cand.unionByName(vb)
    w = Window.partitionBy("table", "bucket")
    cand = (cand
            .withColumn("bucket_size", F.count("*").over(w))
            .withColumn("bucket_rep", F.min("vec_id").over(w))
            .filter(F.col("bucket_size") > 1))

    small = cand.filter(F.col("bucket_size") <= hot_bucket_limit)
    hot = cand.filter(F.col("bucket_size") > hot_bucket_limit)

    left = small.select("table", "bucket", F.col("vec_id").alias("id_a"))
    right = small.select("table", "bucket", F.col("vec_id").alias("id_b"))
    pairs_small = (left.join(right, ["table", "bucket"])
                   .filter(F.col("id_a") < F.col("id_b"))
                   .select("id_a", "id_b"))
    # bucket_rep = min(vec_id) over the bucket, so id_a < id_b holds
    pairs_hot = (hot.filter(F.col("vec_id") != F.col("bucket_rep"))
                 .select(F.col("bucket_rep").alias("id_a"),
                         F.col("vec_id").alias("id_b")))
    pairs = pairs_small.unionByName(pairs_hot).distinct()

    # norm once per vector, not once per candidate pair (HOF folds are
    # interpreted; a bucket member appears in O(bucket) pairs) —
    # bit-identical to the inline form
    a = (vectors.select(F.col(id_col).alias("id_a"),
                        F.col(vec_col).cast("array<double>").alias("av"))
         .withColumn("na", _norm(F.col("av"))))
    b = (vectors.select(F.col(id_col).alias("id_b"),
                        F.col(vec_col).cast("array<double>").alias("bv"))
         .withColumn("nb", _norm(F.col("bv"))))
    sim = _dot(F.col("av"), F.col("bv")) / (F.col("na") * F.col("nb"))
    return (pairs.join(a, "id_a").join(b, "id_b")
            .withColumn("sim", F.round(sim, round_digits))
            .filter(F.col("sim") >= threshold)
            .select("id_a", "id_b", "sim"))


def cosine_topk_lsh(vectors: DataFrame, queries: DataFrame, k: int = 10,
                    n_planes: int = 8, n_tables: int = 6, seed: int = 42,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    round_digits: int = 6) -> DataFrame:
    """Approximate top-k: multi-table hyperplane LSH prune + exact
    cosine re-rank within the candidate set. Same output schema as
    ``cosine_topk``; recall < 1 by construction (tune n_tables up /
    n_planes down for higher recall, at more candidates per query).

    Scale shape: each table is an equi-join on the bucket key — the
    corpus never cross-joins. The query side is tiny and broadcast; per
    query the candidate set is Σ_t |bucket_t| ≪ N. Union-then-distinct
    dedups candidates BEFORE the similarity kernel so each pair is
    scored once.
    """
    pairs = None
    for t in range(n_tables):
        vb = hyperplane_buckets(vectors, n_planes, seed + 7919 * t,
                                id_col, vec_col)
        qb = hyperplane_buckets(queries, n_planes, seed + 7919 * t,
                                id_col, vec_col) \
            .withColumnRenamed("vec_id", "query_id")
        m = vb.join(F.broadcast(qb), "bucket") \
              .select("query_id", F.col("vec_id").alias("neighbor_id"))
        pairs = m if pairs is None else pairs.unionByName(m)
    cand = (pairs.filter(F.col("query_id") != F.col("neighbor_id"))
            .distinct())
    q = (queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).cast("array<double>").alias("qv"))
         .withColumn("_nq", _norm(F.col("qv"))))
    n = (vectors.select(F.col(id_col).alias("neighbor_id"),
                        F.col(vec_col).cast("array<double>").alias("nv"))
         .withColumn("_nn", _norm(F.col("nv"))))
    sim = _dot(F.col("qv"), F.col("nv")) / (F.col("_nq") * F.col("_nn"))
    scored = (cand.join(n, "neighbor_id").join(F.broadcast(q), "query_id")
              .withColumn("sim", F.round(sim, round_digits)))
    w = F.row_number().over(
        Window.partitionBy("query_id")
              .orderBy(F.desc("sim"), F.asc("neighbor_id")))
    return (scored.withColumn("rank", w)
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "sim", "rank"))


def ivf_centroids(vectors: DataFrame, n_cells: int, seed: int = 42,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  kmeans_iters: int = 2) -> DataFrame:
    """→ (cell_id, cv): coarse-quantizer centroids — a deterministic
    pseudo-random sample of ``n_cells`` corpus vectors, refined by
    ``kmeans_iters`` Lloyd iterations expressed as DataFrame aggregations
    (spherical k-means: assignment by cosine, update by per-dim mean).

    Scale shape: the init's orderBy+limit plans as TakeOrderedAndProject
    — each partition ships only its n_cells best rows to the driver-side
    heap, never the corpus. Each Lloyd round is one map-side N×M scoring
    pass (centroids broadcast, argmax via partial-aggregable max_by) plus
    a per-(cell, dim) avg whose map-side combine shrinks the shuffle to
    n_cells × dim rows regardless of N.

    Determinism: centroid components are rounded to 9 digits after each
    update so the float summation order of the distributed avg cannot
    leak into assignments (the driver re-derives recall bit-for-bit).
    Cells that lose all members keep their previous centroid.
    """
    w = Window.orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
    cents = (vectors
             .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
             .limit(n_cells)
             .withColumn("cell_id", F.row_number().over(w))
             .select("cell_id", F.col(vec_col).cast("array<double>")
                     .alias("cv")))
    v = vectors.select(F.col(id_col).alias("_vid"),
                       F.col(vec_col).cast("array<double>").alias("_v"))
    for _ in range(kmeans_iters):
        assign = _nearest_cells(vectors, cents, 1, id_col, vec_col, "_vid")
        means = (assign.join(v, "_vid")
                 .select("cell_id", F.posexplode("_v").alias("dim", "val"))
                 .groupBy("cell_id", "dim")
                 .agg(F.round(F.avg("val"), 9).alias("m"))
                 .groupBy("cell_id")
                 .agg(F.array_sort(
                     F.collect_list(F.struct("dim", "m"))).alias("_s"))
                 .select("cell_id",
                         F.transform("_s", lambda x: x["m"]).alias("new_cv")))
        cents = (cents.join(means, "cell_id", "left")
                 .select("cell_id",
                         F.coalesce("new_cv", "cv").alias("cv")))
    return cents


def _nearest_cells(side: DataFrame, cents: DataFrame, n_probe: int,
                   id_col: str, vec_col: str, out_id: str) -> DataFrame:
    """Assign each vector to its ``n_probe`` highest-cosine cells.
    Centroids broadcast; the N×M scoring is map-side, and for n_probe=1
    the argmax is a partial-aggregable max_by (shuffle carries one row
    per vector, not N×M)."""
    v = (side.select(F.col(id_col).alias(out_id),
                     F.col(vec_col).cast("array<double>").alias("v"))
         .withColumn("_nv", _norm(F.col("v"))))
    cents = cents.withColumn("_ncv", _norm(F.col("cv")))
    sim = _dot(F.col("v"), F.col("cv")) / (F.col("_nv") * F.col("_ncv"))
    scored = v.crossJoin(F.broadcast(cents)).withColumn("_s", sim)
    if n_probe == 1:
        return (scored.groupBy(out_id)
                .agg(F.max_by("cell_id", "_s").alias("cell_id")))
    w = F.row_number().over(
        Window.partitionBy(out_id).orderBy(F.desc("_s"), F.asc("cell_id")))
    return (scored.withColumn("_r", w).filter(F.col("_r") <= n_probe)
            .select(out_id, "cell_id"))


def cosine_topk_ivf(vectors: DataFrame, queries: DataFrame, k: int = 10,
                    n_cells: int = 16, n_probe: int = 4, seed: int = 42,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    round_digits: int = 6, kmeans_iters: int = 2,
                    centroids: DataFrame | None = None) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into ``n_cells``
    inverted lists, probe each query's ``n_probe`` nearest cells, exact
    cosine re-rank within the probed lists. Same output schema as
    ``cosine_topk``; recall grows with n_probe/n_cells.

    Repeated-query workloads should train once and pass ``centroids``
    (persisted or warehouse-checkpointed output of ``ivf_centroids``) —
    the k-means refinement then amortizes across every query batch
    instead of re-running per call.

    Scale shape: corpus→cell assignment is one map-side N×M scoring pass
    + a combine-friendly argmax; the candidate join is an equi-join on
    cell_id (corpus never cross-joins queries). Cell population skew is
    data-dependent — AQE's skew-join split is the backstop, and n_cells
    sizes the lists (≈N/n_cells each).
    """
    cents = centroids if centroids is not None else ivf_centroids(
        vectors, n_cells, seed, id_col, vec_col, kmeans_iters)
    v_cells = _nearest_cells(vectors, cents, 1, id_col, vec_col,
                             "neighbor_id")
    q_cells = _nearest_cells(queries, cents, n_probe, id_col, vec_col,
                             "query_id")
    cand = (v_cells.join(F.broadcast(q_cells), "cell_id")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id").distinct())
    q = (queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).cast("array<double>").alias("qv"))
         .withColumn("_nq", _norm(F.col("qv"))))
    n = (vectors.select(F.col(id_col).alias("neighbor_id"),
                        F.col(vec_col).cast("array<double>").alias("nv"))
         .withColumn("_nn", _norm(F.col("nv"))))
    sim = _dot(F.col("qv"), F.col("nv")) / (F.col("_nq") * F.col("_nn"))
    scored = (cand.join(n, "neighbor_id").join(F.broadcast(q), "query_id")
              .withColumn("sim", F.round(sim, round_digits)))
    w = F.row_number().over(
        Window.partitionBy("query_id")
              .orderBy(F.desc("sim"), F.asc("neighbor_id")))
    return (scored.withColumn("rank", w)
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "sim", "rank"))


def hyperplane_buckets(vectors: DataFrame, n_planes: int = 12,
                       seed: int = 42, id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane LSH bucket per vector (sign-bit signature) — the
    scale path for ANN: equal buckets ⇒ likely-high cosine. Hyperplanes
    are derived deterministically from (seed, plane index, dimension)
    via xxhash64 → uniform in [-1, 1], computed JVM-side."""
    dim_idx = F.transform(F.col(vec_col), lambda x, i: i)

    def plane_component(p):
        # deterministic symmetric uniform [-1,1] weight per (plane, dim);
        # pmod, not %: Spark's % keeps the sign of xxhash64 and would
        # bias every weight negative (⇒ all-zero sign bits, one bucket)
        return lambda x, i: (
            (F.pmod(F.xxhash64(F.lit(seed), F.lit(p), i), F.lit(2000001))
             - 1000000) / 1000000.0
        ) * x

    bits = []
    for p in range(n_planes):
        dot = F.aggregate(
            F.zip_with(F.col(vec_col).cast("array<double>"), dim_idx,
                       plane_component(p)),
            F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)))
    bucket = F.lit(0)
    for bit in bits:
        bucket = bucket * 2 + bit
    return vectors.select(F.col(id_col).alias("vec_id"),
                          bucket.alias("bucket"))
