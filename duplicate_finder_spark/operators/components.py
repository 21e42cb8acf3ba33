"""Distributed connected components: alternating large-star / small-star
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14)
as iterative DataFrame joins — O(log n) rounds, each round plain
groupBy/join shuffles, localCheckpoint per round to cut lineage.

This realizes the transitive grouping the reference gets implicitly from
exact hash equality (equal SHA-256 ⇒ same dict key ⇒ same group,
duplicate_finder.py:198-250): near-dup edges are not transitive, so the
closure must be computed. Node ids are urls; the component representative
is the MINIMUM url — which makes the downstream keep-first decision
(rank-1 by url, duplicate_finder.py:309) the cluster representative for
free.

Convergence: a round's edge set is compared to the previous one by
(count, sum(xxhash64(src,dst))) checksum — O(1) driver data per round,
no exceptAll shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect strictly-larger neighbors to
    min(Γ(u) ∪ {u}).

    The per-u minimum rides a WINDOW over the one hash exchange on u
    instead of a groupBy + join-back: the m-table is one row per NODE,
    which no broadcast threshold survives at 10^12 nodes — the join
    form degrades to a second exchange + sort-merge there, while the
    window form is one exchange + one sort everywhere (the same
    measured trade as the LSH bucket census, operators/lsh.py:40)."""
    nbrs = edges.select(F.col("src").alias("u"), F.col("dst").alias("v")) \
        .unionByName(
            edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
    w = Window.partitionBy("u")
    m = F.least(F.min("v").over(w), F.col("u"))
    return (nbrs.withColumn("m", m)
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("src"), F.col("m").alias("dst"))
            .distinct())


def _small_star(edges: DataFrame) -> DataFrame:
    """For each node u over its ≤-neighbors: connect them (and u) to the
    minimum.

    Window form (see _large_star). The self-row union of the old shape
    ("u itself is a neighbor") becomes a row_number()==1 branch over
    the SAME windowed exchange: edges arrive oriented u > v, so
    m = min(v) < u always, and the old join+filter emitted exactly one
    (u, m) edge per distinct u unconditionally — which is what the
    rank-1 branch emits, without the extra distinct + union exchange."""
    # orient edges larger → smaller
    e = edges.select(
        F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v"))
    w = Window.partitionBy("u")
    wo = Window.partitionBy("u").orderBy("v")
    withm = (e.withColumn("m", F.min("v").over(w))
             .withColumn("_rn", F.row_number().over(wo)))
    members = (withm.filter(F.col("v") != F.col("m"))
               .select(F.col("v").alias("src"), F.col("m").alias("dst")))
    # u != m guard: always true on loop-internal inputs (edges arrive
    # self-loop-free, so m < u), kept so a degenerate direct call with
    # a self-loop row cannot emit (u, u) — exact parity with the old
    # join + v != m filter on the synthetic self row
    self_rows = (withm.filter((F.col("_rn") == 1)
                              & (F.col("u") != F.col("m")))
                 .select(F.col("u").alias("src"), F.col("m").alias("dst")))
    return members.unionByName(self_rows).distinct()


def _checksum(edges: DataFrame) -> tuple[int, int]:
    # decimal(38) accumulator: ANSI-safe (no long overflow) up to ~1e19 edges
    row = edges.agg(
        F.count("*").alias("n"),
        F.sum(F.xxhash64("src", "dst").cast("decimal(30,0)")).alias("h")
    ).collect()[0]
    return row["n"], int(row["h"]) if row["h"] is not None else 0


def _checksum_pair(e1: DataFrame,
                   e2: DataFrame) -> tuple[tuple[int, int], tuple[int, int]]:
    """Both rounds' (count, hash) checksums in ONE driver job: a tagged
    union aggregated by tag. e1 must be (a parent of) e2's lineage with
    a localCheckpoint — the shared RDD means its shuffle stages run
    once, consumed by both the tag-1 branch and e2's star round."""
    tagged = (e1.select(F.lit(1).alias("_t"), "src", "dst")
              .unionByName(e2.select(F.lit(2).alias("_t"), "src", "dst")))
    rows = tagged.groupBy("_t").agg(
        F.count("*").alias("n"),
        F.sum(F.xxhash64("src", "dst").cast("decimal(30,0)")).alias("h")
    ).collect()
    out = {1: (0, 0), 2: (0, 0)}
    for r in rows:
        out[r["_t"]] = (r["n"], int(r["h"]) if r["h"] is not None else 0)
    return out[1], out[2]


def connected_components(edges: DataFrame, max_iter: int = 25,
                         warehouse=None, checkpoint_every: int = 0,
                         table_prefix: str = "cc_round",
                         gc_rounds: bool = True,
                         input_fp: str | None = None) -> DataFrame:
    """edges(src, dst) undirected → assignments (url, cluster_id) where
    cluster_id is the component's minimum url. Every node appearing in an
    edge gets a row (representatives map to themselves).

    Resumability (SURVEY §4 "Iceberg round table"): with ``warehouse``
    (ParquetWarehouse/IcebergWarehouse) and ``checkpoint_every`` > 0,
    every that-many-th round's edge set is written to a RELIABLE
    warehouse table instead of ``localCheckpoint`` — executor-local
    blocks die with the executor, which at 10^12-doc scale means
    restarting all O(log n) rounds; a round table survives and a rerun
    resumes from the highest completed one. The round tables are
    content-addressed: the fingerprint is the canonical input edge set's
    (count, hash) checksum plus the round number, so a rerun over
    different edges can never false-resume (the algorithm is
    deterministic per input, so stale later rounds stay consistent).
    In-session default (checkpoint_every=0) keeps localCheckpoint.

    ``input_fp``: when the CALLER already holds a fingerprint that
    uniquely determines the edge set (run_resumable's config+input
    fingerprint — the edges stage is itself checkpointed under it), pass
    it to skip the up-front content checksum: a pure-resume rerun then
    costs zero passes over the edges before the first round-table probe.
    Direct callers without such a key leave it None and get the
    content-addressed (count, hash) probe.

    Round-table GC (VERDICT r3 #7): once the run CONVERGES, every round
    table except the highest completed one is dropped (``gc_rounds``,
    default on) — a long-lived warehouse no longer accumulates
    ``<prefix>_rN`` tables from every finished CC run. The kept table
    is the post-convergence edge set (retention-contract parity with
    the other stages); stale deeper-round tables left by an earlier
    longer run under the same prefix are swept too. A run that stops by
    max_iter WITHOUT converging (i.e. a crash-resume candidate) keeps
    all its round tables.
    """
    # eager=False: the checkpoint materializes inside the SAME job as the
    # round's convergence checksum — one driver round-trip per round, not
    # two (job-submission latency is pure fixed cost that the wide config
    # can't parallelize away, so halving it helps N→4N efficiency)
    reliable = warehouse is not None and checkpoint_every > 0
    e = edges.filter(F.col("src") != F.col("dst")).select("src", "dst")
    if not reliable:
        # no up-front distinct: duplicate input edges change neither
        # star-round group minima nor the converged star graph (round
        # 1's own distinct sweeps them), so the defensive exchange here
        # bought nothing in-session. The reliable path keeps it — its
        # content-addressed fingerprint must be stable across callers
        # that pass the same edge SET with different duplicate counts.
        e = e.localCheckpoint(eager=False)
        base_fp = ""
    elif input_fp is not None:
        e = e.distinct()
        base_fp = f"cc:{input_fp}"
    else:
        e = e.distinct()
        n0, h0 = _checksum(e)
        base_fp = f"cc:{n0}:{h0}"
    prev = None
    kept_round = 0
    converged = False
    if not reliable:
        # in-session path: TWO large/small star rounds per driver job —
        # each job's final aggregate computes BOTH rounds' checksums at
        # once (tagged union over the two eager=False checkpoints, which
        # share one lineage so the first round's shuffle stages run
        # exactly once). Convergence is still detected per ROUND (the
        # same consecutive-checksum criterion as before), but the job
        # count — the measured wall of this operator once the plan is
        # right (VERDICT r5: "per-job floor × rounds") — drops from
        # rounds+1 to ceil((rounds+1)/2), at the cost of at most one
        # wasted (no-op) star round when convergence lands on the first
        # round of a pair. Union-find equivalence is pinned by
        # test_connected_components_random_graphs.
        i = 0
        while i < max_iter:
            e1 = _small_star(_large_star(e)).localCheckpoint(eager=False)
            if i + 1 >= max_iter:
                cur = _checksum(e1)
                e = e1
                i += 1
                if cur == prev:
                    converged = True
                    break
                prev = cur
                continue
            e2 = _small_star(_large_star(e1)).localCheckpoint(eager=False)
            c1, c2 = _checksum_pair(e1, e2)
            if c1 == prev:
                e = e1
                i += 1
                converged = True
                break
            if c2 == c1:
                e = e2
                i += 2
                converged = True
                break
            e, prev = e2, c2
            i += 2
    else:
        for i in range(1, max_iter + 1):
            if i % checkpoint_every == 0:
                prev_e = e
                e, _resumed = warehouse.checkpoint_or_compute(
                    f"{table_prefix}_r{i}", f"{base_fp}:r{i}",
                    lambda: _small_star(_large_star(prev_e)))
                kept_round = i
            else:
                e = _small_star(_large_star(e)).localCheckpoint(eager=False)
            cur = _checksum(e)
            if cur == prev:
                converged = True
                break
            prev = cur
    if reliable and gc_rounds and converged:
        for j in range(1, max_iter + 1):
            name = f"{table_prefix}_r{j}"
            if j != kept_round and warehouse.exists(name):
                warehouse.drop(name)
    # post-convergence: star edges child→root
    if converged:
        # the converged edge set IS a star graph (fixed point of the
        # star rounds): every dst is a component root and no root ever
        # appears as a src, so the roots are exactly distinct(dst) — the
        # anti-join against distinct(src) would remove nothing. No
        # inner distinct either: the final distinct over the union
        # already dedupes the (dst, dst) rows, so the output plan is
        # one union + one exchange.
        roots = e.select(F.col("dst").alias("url"),
                         F.col("dst").alias("cluster_id"))
    else:
        roots = e.select(F.col("dst").alias("url")).distinct() \
            .join(e.select(F.col("src").alias("url")).distinct(),
                  "url", "left_anti") \
            .select("url", F.col("url").alias("cluster_id"))
    members = e.select(F.col("src").alias("url"),
                       F.col("dst").alias("cluster_id"))
    return members.unionByName(roots).distinct()
