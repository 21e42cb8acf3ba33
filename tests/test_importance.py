"""DSIR importance resampling (operators/importance.py).

The driver gate (q_dsir_select) mirrors the deterministic chain
value-for-value in DuckDB; these tests cover the semantics the gate
can't show directly (does the weight actually rank target-like text
first?), the Gumbel resampling variant, edge rows, and the scale-shape
plan claims.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duplicate_finder_spark.operators.importance import (
    dsir_log_ratios, dsir_select, dsir_weights, hashed_feature_counts)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_weights_rank_target_like_text_first(spark):
    target = _docs(spark, [(100, "le chat noir dort"),
                           (101, "le chien noir court")])
    raw = _docs(spark, [(1, "le chat noir mange"),     # target-like
                        (2, "quantum flux capacitor array tensor")])
    out = dsir_select(raw, target, k=2, n_buckets=1 << 10)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["rank"] == 1 and rows[2]["rank"] == 2
    assert rows[1]["weight_micro"] > rows[2]["weight_micro"]


def test_empty_doc_scores_zero_but_stays_addressable(spark):
    target = _docs(spark, [(100, "alpha beta")])
    raw = _docs(spark, [(1, "alpha beta gamma"), (2, "   ")])
    out = dsir_weights(
        raw, dsir_log_ratios(raw, target, 1 << 10), 1 << 10)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[2]["n_feats"] == 0 and rows[2]["weight_micro"] == 0
    assert rows[1]["n_feats"] == 5  # 3 unigrams + 2 bigrams


def test_feature_counts_are_occurrences_not_distinct(spark):
    docs = _docs(spark, [(1, "a a a")])
    n = hashed_feature_counts(docs, 1 << 10).agg(F.sum("n")).first()[0]
    assert n == 5  # 3×"a" + 2×"a a"


def test_gumbel_variant_is_seed_deterministic(spark):
    target = _docs(spark, [(100, "common words here")])
    raw = _docs(spark, [(i, f"common words doc {i}") for i in range(20)])
    a = dsir_select(raw, target, k=5, n_buckets=1 << 10,
                    gumbel_seed=7).collect()
    b = dsir_select(raw, target, k=5, n_buckets=1 << 10,
                    gumbel_seed=7).collect()
    assert a == b and len(a) == 5
    assert [r["rank"] for r in a] == [1, 2, 3, 4, 5]


def test_large_k_parallel_path_equals_topk_path(spark):
    """Forcing the global_rank path (topk_path_max_k=0) must reproduce
    the TakeOrderedAndProject path row-for-row, ranks included — the
    order tuple carries the unique id tie-break, so both paths walk
    the same total order."""
    target = _docs(spark, [(100, "common words here")])
    raw = _docs(spark, [(i, f"common words doc {i}") for i in range(40)])
    small = dsir_select(raw, target, k=25, n_buckets=1 << 10)
    large = dsir_select(raw, target, k=25, n_buckets=1 << 10,
                        topk_path_max_k=0)
    assert sorted(map(tuple, small.collect())) == \
        sorted(map(tuple, large.collect()))
    # gumbel variant too (spark-side determinism contract)
    g_small = dsir_select(raw, target, k=10, n_buckets=1 << 10,
                          gumbel_seed=3)
    g_large = dsir_select(raw, target, k=10, n_buckets=1 << 10,
                          gumbel_seed=3, topk_path_max_k=0)
    assert sorted(map(tuple, g_small.collect())) == \
        sorted(map(tuple, g_large.collect()))


def test_large_k_path_plan_is_parallel(spark):
    """The selection-sized path must range-partition (parallel total
    order) and contain NO unpartitioned window and NO
    TakeOrderedAndProject (no driver-side k-row heap)."""
    target = _docs(spark, [(100, "x y z")])
    raw = _docs(spark, [(i, f"x y doc {i}") for i in range(10)])
    out = dsir_select(raw, target, k=5, n_buckets=1 << 10,
                      topk_path_max_k=0)
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in phys, phys
    assert "TakeOrderedAndProject" not in phys, phys
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    for ln in opt.splitlines():
        if "Window [" in ln and "_gr_pid" in ln:
            assert "windowspecdefinition(_gr_pid" in ln, ln


def test_select_plan_is_topk_and_jvm_only(spark):
    """Scale claims: the global selection plans as
    TakeOrderedAndProject (per-partition heaps, k rows to the driver
    merge — never a full sort of the corpus), the distribution fits
    partial-aggregate below their exchange, and no Python runs."""
    from tests.test_plans import _plan
    target = _docs(spark, [(100, "x y z")])
    raw = _docs(spark, [(i, f"x y doc {i}") for i in range(10)])
    plan = _plan(dsir_select(raw, target, k=3, n_buckets=1 << 10),
                 "simple")
    assert "TakeOrderedAndProject" in plan, plan
    assert "partial_count" in plan, plan
    assert "EvalPython" not in plan and "InPandas" not in plan

    cplan = _plan(hashed_feature_counts(raw, 1 << 10), "simple")
    assert cplan.index("partial_count") > cplan.index(
        "Exchange hashpartitioning(feat")
