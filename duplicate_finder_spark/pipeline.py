"""End-to-end dedup pipeline: exact stage → near-dup candidates → verify
→ connected components → clusters → keep/delete decisions.

This is the engine lifecycle from SURVEY.md §3.4 — a declared DataFrame
program; Catalyst owns parse/analyze/optimize/physical. Stage boundaries
(signatures, edges, clusters) can be checkpointed through the Warehouse
facade for resumability (north rule), see warehouse.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from duplicate_finder_spark.config import PipelineConfig
from duplicate_finder_spark.operators import exact as ex
from duplicate_finder_spark.operators.components import connected_components
from duplicate_finder_spark.operators.lsh import candidate_pairs, verify_pairs
from duplicate_finder_spark.operators.minhash import signatures


def exact_edges(clusters: DataFrame) -> DataFrame:
    """Exact-dup clusters → star edges (rank-1 member ↔ each other member),
    ready to union with near-dup edges before components."""
    rank1 = clusters.filter(F.col("rank") == 1).select(
        "content_hash", F.col("url").alias("src"))
    rest = clusters.filter(F.col("rank") > 1).select(
        "content_hash", F.col("url").alias("dst"))
    return rank1.join(rest, "content_hash").select("src", "dst")


def near_dup_edges(pages: DataFrame, cfg: PipelineConfig,
                   sigs: DataFrame | None = None) -> DataFrame:
    """MinHash/LSH candidates, verified by exact shingle Jaccard →
    (url_a, url_b, jaccard) edges."""
    if sigs is None:
        sigs = signatures(pages, cfg)
    pairs = candidate_pairs(sigs, cfg)
    return verify_pairs(pairs, sigs, cfg.jaccard_threshold)


def dedup_clusters(pages: DataFrame, cfg: PipelineConfig,
                   include_near: bool = True) -> DataFrame:
    """Full clustering → (cluster_id, url, rank, size).

    cluster_id is the component's minimum url (near stage) — and since
    exact edges also use star-to-rank-1 (minimum url of the hash group),
    the representative is the keep-first member in both regimes.
    """
    filtered = ex.apply_filters(pages, cfg)
    exact_cl = ex.exact_clusters(pages, cfg)
    edges = exact_edges(exact_cl)
    if include_near:
        near = near_dup_edges(filtered, cfg).select(
            F.col("url_a").alias("src"), F.col("url_b").alias("dst"))
        edges = edges.unionByName(near)
    assign = connected_components(edges)
    sized = assign.join(
        filtered.select("url", ex.SIZE_COL), "url", "left")
    w = Window.partitionBy("cluster_id").orderBy("url")
    return (sized
            .withColumn("rank", F.row_number().over(w))
            .select("cluster_id", "url", "rank", ex.SIZE_COL))
