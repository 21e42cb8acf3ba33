"""Interleaved A/B of the cc_clusters contract query: r3 code vs HEAD
(VERDICT r4 #3 — both r4 best-of-2 walls exceeded r3's single-pass
4.62 s; name the cause: host window vs plan regression).

Methodology (the census-A/B pattern from BENCH/BASELINE.md): ONE Spark
session, the two code versions alternated ABBA BAAB so any host drift
during the run hits both variants symmetrically. Versions are swapped
by re-importing the package from a git worktree of the r3 commit
(var/r3wt) vs the repo root — full sys.modules purge between passes, so
each pass runs its own operator code; the JVM, executors, and page
cache are shared.

Usage:
    git worktree add var/r3wt <r3-commit>   # once
    python tools/ab_cc_clusters.py [sf_dir] [n_reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R3WT = os.path.join(REPO, "var", "r3wt")


def _load_entry(root: str):
    for name in list(sys.modules):
        if name == "__spark_entry__" or name.startswith(
                "duplicate_finder_spark"):
            del sys.modules[name]
    for p in (REPO, R3WT):
        while p in sys.path:
            sys.path.remove(p)
    sys.path.insert(0, root)
    import __spark_entry__ as entrymod
    assert entrymod.__file__.startswith(root), entrymod.__file__
    return entrymod


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    if not os.path.isdir(R3WT):
        sys.exit("missing var/r3wt — run: git worktree add var/r3wt "
                 "<r3-commit>")

    sys.path.insert(0, REPO)
    from duplicate_finder_spark.session import get_spark
    from pyspark.sql import functions as F
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="ab-cc-clusters", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    _warm = F.pandas_udf(lambda s: s, "long")
    spark.range(100000).repartition(int(cpus)) \
        .select(_warm("id")).write.format("noop").mode("overwrite").save()

    walls: dict[str, list[float]] = {"r3": [], "head": []}

    def one_pass(tag: str, root: str) -> None:
        entry = _load_entry(root)
        t0 = time.time()
        entry.queries()["cc_clusters"](spark, sf_dir) \
            .write.format("noop").mode("overwrite").save()
        walls[tag].append(round(time.time() - t0, 3))
        spark.catalog.clearCache()

    # counterbalanced: ABBA then BAAB, repeated
    for _ in range(n_reps):
        for tag, root in (("head", REPO), ("r3", R3WT),
                          ("r3", R3WT), ("head", REPO)):
            one_pass(tag, root)
        for tag, root in (("r3", R3WT), ("head", REPO),
                          ("head", REPO), ("r3", R3WT)):
            one_pass(tag, root)

    out = {
        "walls": walls,
        "min": {k: min(v) for k, v in walls.items()},
        "median": {k: round(statistics.median(v), 3)
                   for k, v in walls.items()},
        "head_over_r3_min": round(min(walls["head"]) / min(walls["r3"]), 3),
        "sf_dir": sf_dir, "cpus": int(cpus),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
