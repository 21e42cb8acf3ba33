"""SemDeDup-style semantic dedup (operators/semantic.py).

The driver gate (q_semantic_dedup, oracle-mirrored value-for-value)
covers the pinned-centroid chain end-to-end; these tests cover what the
gate deliberately avoids: the keep rule's least-prototypical semantics
on NON-tied centroid sims, the hot-cell star degradation, and the
trained-centroid (ivf_centroids) path.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from duplicate_finder_spark.operators.semantic import (assign_cells,
                                                       semantic_dedup)


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>")


def _cents(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "cell_id int, cv array<double>")


@pytest.fixture(scope="module")
def cents2d(spark):
    return _cents(spark, [(0, [1.0, 0.0]), (1, [0.0, 1.0])])


def test_keep_rule_is_least_prototypical_not_keep_first(spark, cents2d):
    """SemDeDup keeps the member FURTHEST from its centroid — here the
    HIGHER vec_id, so keep-first would get this wrong."""
    # cos(a, b) ≈ 0.9955 ≥ 0.95; centroid sims: a 0.980581, b 0.958315
    vecs = _vecs(spark, [(1, [1.0, 0.2]),    # more prototypical
                         (2, [1.0, 0.3]),    # least prototypical → keep
                         (9, [-1.0, 0.0])])  # lone vector: no row
    out = semantic_dedup(vecs, threshold=0.95, centroids=cents2d)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2}
    assert rows[2]["action"] == "keep" and rows[1]["action"] == "drop"
    assert rows[1]["cluster_id"] == rows[2]["cluster_id"] == 1
    assert rows[2]["centroid_sim"] < rows[1]["centroid_sim"]
    assert rows[1]["cell_id"] == rows[2]["cell_id"] == 0


def test_groups_close_over_components_one_keep_each(spark, cents2d):
    """A chain a~b, b~c whose ends are not pairwise-similar still forms
    ONE group (components semantics), and exactly one member survives."""
    vecs = _vecs(spark, [(1, [0.00, 1.0]),
                         (2, [0.20, 1.0]),   # sim(1,2)=.981, sim(2,3)=.983
                         (3, [0.40, 1.0])])  # sim(1,3)=.928 < threshold
    out = semantic_dedup(vecs, threshold=0.95, centroids=cents2d)
    rows = out.collect()
    assert {r["cluster_id"] for r in rows} == {1}
    assert sorted(r["vec_id"] for r in rows) == [1, 2, 3]
    keeps = [r for r in rows if r["action"] == "keep"]
    # member 3 has the lowest centroid sim (furthest from [0,1])
    assert [k["vec_id"] for k in keeps] == [3]


def test_hot_cell_degrades_to_star_but_stays_connected(spark, cents2d):
    """A cell above hot_cluster_limit emits only O(s) rep edges; the
    duplicate group must still cluster whole, with one keep."""
    vecs = _vecs(spark, [(10, [1.0, 0.01]), (11, [2.0, 0.02]),
                         (12, [3.0, 0.03]), (13, [4.0, 0.04])])
    out = semantic_dedup(vecs, threshold=0.95, centroids=cents2d,
                         hot_cluster_limit=2).collect()
    assert sorted(r["vec_id"] for r in out) == [10, 11, 12, 13]
    assert {r["cluster_id"] for r in out} == {10}
    # collinear members tie on centroid_sim → smallest vec_id keeps
    assert sorted(r["vec_id"] for r in out
                  if r["action"] == "keep") == [10]


def test_hot_star_edges_respect_verify_threshold(spark, cents2d):
    """Inside a hot cell, a member NOT similar to the rep gets no edge:
    the star is a candidate generator, the cosine verify still gates."""
    vecs = _vecs(spark, [(10, [1.0, 0.01]), (11, [2.0, 0.02]),
                         (12, [3.0, 0.03]),
                         (13, [1.0, 0.45])])  # same cell 0, sim to rep .912
    out = semantic_dedup(vecs, threshold=0.95, centroids=cents2d,
                         hot_cluster_limit=2).collect()
    assert sorted(r["vec_id"] for r in out) == [10, 11, 12]


def test_trained_centroids_recover_planted_dups(spark):
    """No pinned centroids: ivf_centroids trains the cells, and every
    planted scale-collinear pair must still land in one cluster (scale
    copies tie on every rounded centroid cosine, so the deterministic
    argmax co-locates them regardless of where k-means puts the cell)."""
    rng = np.random.RandomState(7)
    base = [(i, rng.randn(16)) for i in range(60)]
    copies = [(i + 1000, 1.5 * v) for i, v in base if i % 5 == 0]
    vecs = _vecs(spark, base + copies)
    out = semantic_dedup(vecs, threshold=0.95, n_cells=4,
                         kmeans_iters=1).collect()
    got = {(r["vec_id"], r["cluster_id"], r["action"]) for r in out}
    expect = set()
    for i, _ in base:
        if i % 5 == 0:
            expect.add((i, i, "keep"))
            expect.add((i + 1000, i, "drop"))
    # keep side may be either member (rounded sims tie → smaller id);
    # assert exact membership and one keep per cluster instead
    assert {(v, c) for v, c, _ in got} == {(v, c) for v, c, _ in expect}
    by_cluster = {}
    for v, c, a in got:
        by_cluster.setdefault(c, []).append(a)
    assert all(sorted(acts) == ["drop", "keep"]
               for acts in by_cluster.values())


def test_assignment_plan_is_broadcast_and_partial_agg(spark, cents2d):
    """Scale claims in explain output: centroids broadcast (never a
    shuffled join), argmax combined map-side below the one exchange,
    and no Python anywhere."""
    from tests.test_plans import _plan
    vecs = _vecs(spark, [(i, [float(i), 1.0]) for i in range(8)])
    plan = _plan(assign_cells(vecs, cents2d), "simple")
    assert "partial_max_by" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_pairing_plan_never_cross_joins_corpus(spark, cents2d):
    """The full operator's plan may broadcast-cross the CENTROIDS, but
    the corpus must only ever meet itself through the cell_id / id
    equi-joins — no CartesianProduct at any size."""
    from tests.test_plans import _plan
    vecs = _vecs(spark, [(i, [float(i % 3), 1.0]) for i in range(12)])
    plan = _plan(semantic_dedup(vecs, threshold=0.95, centroids=cents2d),
                 "simple")
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan
