"""Interleaved A/B of arbitrary contract queries: round-start worktree
(var/r5wt) vs HEAD — the tools/ab_cc_clusters.py methodology generalized
so any optimization this round is judged by counterbalanced passes in
ONE Spark session (host drift hits both variants symmetrically).

Usage:
    git worktree add var/r5wt <round-start-commit>   # once
    python tools/ab_queries.py <query>[,query...] [n_reps] [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# override with AB_BASE_WT to A/B against an arbitrary worktree (e.g.
# HEAD~1) instead of the round-start default
BASEWT = os.environ.get("AB_BASE_WT",
                        os.path.join(REPO, "var", "r5wt"))


def _load_entry(root: str):
    for name in list(sys.modules):
        if name == "__spark_entry__" or name.startswith(
                "duplicate_finder_spark"):
            del sys.modules[name]
    for p in (REPO, BASEWT):
        while p in sys.path:
            sys.path.remove(p)
    sys.path.insert(0, root)
    import __spark_entry__ as entrymod
    assert entrymod.__file__.startswith(root), entrymod.__file__
    return entrymod


def main() -> None:
    queries = sys.argv[1].split(",")
    n_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    if not os.path.isdir(BASEWT):
        sys.exit("missing var/r5wt — run: git worktree add var/r5wt "
                 "<round-start-commit>")

    sys.path.insert(0, REPO)
    from duplicate_finder_spark.session import get_spark
    from pyspark.sql import functions as F
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="ab-queries", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    _warm = F.pandas_udf(lambda s: s, "long")
    spark.range(100000).repartition(int(cpus)) \
        .select(_warm("id")).write.format("noop").mode("overwrite").save()

    walls: dict[str, dict[str, list[float]]] = {
        q: {"base": [], "head": []} for q in queries}

    def one_pass(tag: str, root: str) -> None:
        entry = _load_entry(root)
        qs = entry.queries()
        for q in queries:
            if hasattr(entry, "_BPE_MERGES_CACHE"):
                entry._BPE_MERGES_CACHE.clear()
            spark.sparkContext.setJobDescription(f"{tag}:{q}")
            t0 = time.time()
            qs[q](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            walls[q][tag].append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)

    for _ in range(n_reps):
        for tag, root in (("head", REPO), ("base", BASEWT),
                          ("base", BASEWT), ("head", REPO)):
            one_pass(tag, root)
        for tag, root in (("base", BASEWT), ("head", REPO),
                          ("head", REPO), ("base", BASEWT)):
            one_pass(tag, root)

    out = {}
    for q in queries:
        w = walls[q]
        out[q] = {
            "walls": w,
            "min": {k: min(v) for k, v in w.items()},
            "median": {k: round(statistics.median(v), 3)
                       for k, v in w.items()},
            "head_over_base_min": round(
                min(w["head"]) / min(w["base"]), 3),
            "head_over_base_median": round(
                statistics.median(w["head"]) / statistics.median(w["base"]),
                3),
        }
    print(json.dumps({"queries": out, "sf_dir": sf_dir, "cpus": int(cpus)}))
    spark.stop()


if __name__ == "__main__":
    main()
