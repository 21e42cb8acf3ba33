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
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
    n = vectors.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).cast("array<double>").alias("nv"))
    sim = _dot(F.col("qv"), F.col("nv")) / (_norm(F.col("qv")) *
                                            _norm(F.col("nv")))
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
                       round_digits: int = 6) -> DataFrame:
    """→ (id_a, id_b, sim ≥ threshold): embedding near-dup pairs.

    All-pairs — exact but O(N²); for web scale, pre-bucket with
    ``hyperplane_buckets`` and run this within buckets.
    """
    a = vectors.select(F.col(id_col).alias("id_a"),
                       F.col(vec_col).cast("array<double>").alias("av"))
    b = vectors.select(F.col(id_col).alias("id_b"),
                       F.col(vec_col).cast("array<double>").alias("bv"))
    sim = _dot(F.col("av"), F.col("bv")) / (_norm(F.col("av")) *
                                            _norm(F.col("bv")))
    return (a.crossJoin(b)
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("sim", F.round(sim, round_digits))
            .filter(F.col("sim") >= threshold)
            .select("id_a", "id_b", "sim"))


def hyperplane_buckets(vectors: DataFrame, n_planes: int = 12,
                       seed: int = 42, id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane LSH bucket per vector (sign-bit signature) — the
    scale path for ANN: equal buckets ⇒ likely-high cosine. Hyperplanes
    are derived deterministically from (seed, plane index, dimension)
    via xxhash64 → uniform in [-1, 1], computed JVM-side."""
    dim_idx = F.transform(F.col(vec_col), lambda x, i: i)

    def plane_component(p):
        # deterministic pseudo-gaussian-ish weight per (plane, dim)
        return lambda x, i: (
            (F.xxhash64(F.lit(seed), F.lit(p), i) % 100000) / 50000.0 - 1.0
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
