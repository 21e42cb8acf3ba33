"""Resumability + determinism (SURVEY.md §5 items 5-6): rerun after a
completed stage reuses checkpoints; two runs produce identical output."""

from __future__ import annotations

from pyspark.sql import functions as F

from duplicate_finder_spark.config import PipelineConfig
from duplicate_finder_spark.pipeline import config_fingerprint, run_resumable
from duplicate_finder_spark.warehouse import get_warehouse

CFG = PipelineConfig(num_perm=128, lsh_bands=32, jaccard_threshold=0.8)


def _decision_set(df):
    return {(r["url"], r["action"]) for r in
            df.select("url", "action").collect()}


def test_resume_skips_completed_stages(spark, small_pages, tmp_path):
    pages, _ = small_pages
    wh = get_warehouse(spark, str(tmp_path / "wh"))
    d1 = run_resumable(spark, pages, CFG, wh, input_id="corpus-v1")
    out1 = _decision_set(d1)

    fp = config_fingerprint(CFG, "corpus-v1")
    m1 = wh.read(f"metrics_{fp}").collect()
    assert all(not r["resumed"] for r in m1)

    # rerun: every checkpointed stage must resume, output identical
    d2 = run_resumable(spark, pages, CFG, wh, input_id="corpus-v1")
    m2 = wh.read(f"metrics_{fp}").collect()
    resumed = {r["stage"]: r["resumed"] for r in m2}
    assert resumed == {"signatures": True, "edges": True,
                       "clusters": True, "decisions": False}
    assert _decision_set(d2) == out1

    # changed config → different fingerprint → full recompute
    cfg2 = PipelineConfig(num_perm=128, lsh_bands=32,
                          jaccard_threshold=0.9)
    run_resumable(spark, pages, cfg2, wh, input_id="corpus-v1")
    fp2 = config_fingerprint(cfg2, "corpus-v1")
    assert fp2 != fp
    m3 = wh.read(f"metrics_{fp2}").collect()
    assert all(not r["resumed"] for r in m3)


def test_determinism_two_runs_identical(spark, small_pages, tmp_path):
    pages, _ = small_pages
    wh_a = get_warehouse(spark, str(tmp_path / "a"))
    wh_b = get_warehouse(spark, str(tmp_path / "b"))
    da = run_resumable(spark, pages, CFG, wh_a, input_id="x")
    db = run_resumable(spark, pages, CFG, wh_b, input_id="x")
    rows_a = sorted(map(tuple, da.select(
        "cluster_id", "url", "rank", "action").collect()))
    rows_b = sorted(map(tuple, db.select(
        "cluster_id", "url", "rank", "action").collect()))
    assert rows_a == rows_b


def test_keep_overrides_flow_through(spark, small_pages, tmp_path):
    pages, _ = small_pages
    wh = get_warehouse(spark, str(tmp_path / "wh"))
    base = run_resumable(spark, pages, CFG, wh, input_id="o")
    some = base.filter(F.col("rank") == 2).select(
        "cluster_id", F.col("url").alias("keep_url")).limit(1)
    ov = some.collect()
    assert ov, "need at least one multi-member cluster"
    overrides = spark.createDataFrame(ov, "cluster_id string, keep_url string")
    d = run_resumable(spark, pages, CFG, wh, input_id="o",
                      keep_overrides=overrides)
    kept = {r["url"]: r["action"] for r in
            d.filter(F.col("cluster_id") == ov[0]["cluster_id"]).collect()}
    assert kept[ov[0]["keep_url"]] == "keep"
    assert all(a == "delete" for u, a in kept.items()
               if u != ov[0]["keep_url"])


def test_manifest_per_partition_lineage(spark, small_pages, tmp_path):
    """Every checkpoint snapshot's manifest carries the per-partition row
    histogram (north rule: per-partition lineage + metrics) and the
    derived skew ratio."""
    pages, _ = small_pages
    wh = get_warehouse(spark, str(tmp_path / "whp"))
    run_resumable(spark, pages, CFG, wh, input_id="corpus-v1")
    fp = config_fingerprint(CFG, "corpus-v1")
    for stage in ("signatures", "edges", "clusters"):
        m = wh.manifest(f"{stage}_{fp}")
        assert m is not None
        assert m.n_partitions == len(m.partition_rows) > 0
        assert sum(m.partition_rows) == m.rows
        assert m.max_partition_rows == max(m.partition_rows)
        assert m.skew_ratio >= 1.0
