"""Incremental (cross-snapshot) dedup benchmark — two claims measured:

1. **O(batch), not O(corpus)**: deduping a new batch against a stored
   corpus (operators/crosssnap.py — store signatures READ from parquet,
   census pruned to touched buckets, store×store never paired) vs the
   full recompute (sign everything, pair everything) on the same
   store ∪ batch corpus. Speedup = full_wall / incremental_wall.
2. **N→4N scaling of the incremental pass** — same counterbalanced
   8→32→32→8 / untimed-warmup / best-of-2 / ceiling-bracketed
   methodology as tools/bench_scaling.py.

The split is deterministic: pmod(xxhash64(url), 10) == 0 → the new
batch (~10%), the rest is the incumbent corpus. The bench corpus's
built-in dup structure (15% exact groups, 10% near pairs, 5%
boilerplate) crosses the split at random, so the batch carries both
in-batch and against-store duplicates.

Usage: PYTHONPATH=/root/repo python tools/bench_incremental.py [n_rows]
Writes BENCH/runs/incr_<ts>.json and prints a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from bench_scaling import cpu_ceiling, data_path, ensure_data  # noqa: E402

CFG_KW = dict(num_perm=128, lsh_bands=32, jaccard_threshold=0.8)


def store_sig_path(n_rows: int) -> str:
    return f"/root/repo/var/incr_store_sigs_{n_rows}.parquet"


def batch_path(n_rows: int) -> str:
    return f"/root/repo/var/incr_batch_pages_{n_rows}.parquet"


def prepare(n_rows: int) -> None:
    """Sign the incumbent corpus ONCE (the prior run's output at real
    scale) and materialize the batch's pages as their own table (a real
    snapshot ARRIVES as its own input — reading the full corpus and
    filtering per run would charge the incremental pass an O(corpus)
    text scan it doesn't do in production). Untimed, not part of any
    measured wall."""
    if os.path.exists(os.path.join(store_sig_path(n_rows), "_SUCCESS")) \
            and os.path.exists(os.path.join(batch_path(n_rows),
                                            "_SUCCESS")):
        return
    from pyspark.sql import functions as F

    from duplicate_finder_spark.config import PipelineConfig
    from duplicate_finder_spark.operators.minhash import signatures
    from duplicate_finder_spark.session import get_spark
    spark = get_spark(app_name="bench-incr-prep", master="local[32]",
                      shuffle_partitions=32)
    pages = spark.read.parquet(data_path(n_rows))
    is_batch = F.pmod(F.xxhash64("url"), F.lit(10)) == 0
    store = pages.filter(~is_batch)
    signatures(store, PipelineConfig(**CFG_KW)).repartition(64) \
        .write.mode("overwrite").parquet(store_sig_path(n_rows))
    pages.filter(is_batch).repartition(32) \
        .write.mode("overwrite").parquet(batch_path(n_rows))
    spark.stop()


def run_incremental(cpus: int, n_rows: int) -> dict:
    from duplicate_finder_spark.config import PipelineConfig
    from duplicate_finder_spark.operators.crosssnap import (
        cross_snapshot_decisions)
    from duplicate_finder_spark.operators.minhash import signatures
    from duplicate_finder_spark.session import get_spark

    spark = get_spark(app_name=f"bench-incr-{cpus}",
                      master=f"local[{cpus}]", shuffle_partitions=cpus)
    cfg = PipelineConfig(**CFG_KW)
    batch = spark.read.parquet(batch_path(n_rows))
    n_batch = batch.count()
    store_sigs = spark.read.parquet(store_sig_path(n_rows))

    def job():
        new_sigs = signatures(batch, cfg)
        (cross_snapshot_decisions(new_sigs, store_sigs, cfg)
         .write.format("noop").mode("overwrite").save())

    job()  # untimed warmup: UDF daemons, JIT, page cache
    walls = []
    for _ in range(2):
        t0 = time.time()
        job()
        walls.append(time.time() - t0)
    wall = min(walls)
    spark.stop()
    return {"cpus": cpus, "wall_sec": round(wall, 2),
            "walls": [round(w, 2) for w in walls],
            "batch_docs_per_sec": round(n_batch / wall, 1),
            "n_batch": n_batch}


def run_full(cpus: int, n_rows: int) -> dict:
    """The non-incremental alternative: sign and pair the ENTIRE
    store ∪ batch corpus from scratch (what every run would cost
    without the incremental pass)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from duplicate_finder_spark.config import PipelineConfig
    from duplicate_finder_spark.operators.components import (
        connected_components)
    from duplicate_finder_spark.operators.lsh import (candidate_pairs,
                                                      verify_pairs)
    from duplicate_finder_spark.operators.minhash import signatures
    from duplicate_finder_spark.session import get_spark

    spark = get_spark(app_name=f"bench-incr-full-{cpus}",
                      master=f"local[{cpus}]", shuffle_partitions=cpus)
    cfg = PipelineConfig(**CFG_KW)
    pages = spark.read.parquet(data_path(n_rows))
    n_docs = pages.count()

    def job():
        sigs = signatures(pages, cfg)
        edges = verify_pairs(candidate_pairs(sigs, cfg), sigs,
                             cfg.jaccard_threshold, cfg)
        assign = connected_components(
            edges.select(F.col("url_a").alias("src"),
                         F.col("url_b").alias("dst")))
        w = Window.partitionBy("cluster_id").orderBy("url")
        (assign.withColumn("rank", F.row_number().over(w))
         .withColumn("action", F.when(F.col("rank") == 1, "keep")
                                .otherwise("delete"))
         .write.format("noop").mode("overwrite").save())

    job()
    walls = []
    for _ in range(2):
        t0 = time.time()
        job()
        walls.append(time.time() - t0)
    wall = min(walls)
    spark.stop()
    return {"cpus": cpus, "wall_sec": round(wall, 2),
            "walls": [round(w, 2) for w in walls],
            "docs_per_sec": round(n_docs / wall, 1), "n_docs": n_docs}


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    ensure_data(n_rows)
    prepare(n_rows)

    sessions, ceilings = [], []
    for cpus in (8, 32, 32, 8):  # counterbalanced: host drift symmetric
        ceilings.append(cpu_ceiling())
        sessions.append(run_incremental(cpus, n_rows))
        print(json.dumps(sessions[-1]), flush=True)
    ceilings.append(cpu_ceiling())
    full32 = run_full(32, n_rows)
    print(json.dumps(full32), flush=True)
    ceilings.append(cpu_ceiling())

    best = {c: min(s["wall_sec"] for s in sessions if s["cpus"] == c)
            for c in (8, 32)}
    eff = round(best[8] / (4 * best[32]), 3)
    out = {"op": "cross_snapshot_decisions", "n_rows": n_rows,
           "sessions": sessions, "full_recompute_local32": full32,
           "speedup_vs_full_at_32": round(
               full32["wall_sec"] / best[32], 2),
           "cpu_ceiling_windows": ceilings,
           "best_wall": best, "efficiency_8_to_32": eff,
           "ceiling_mean": round(sum(ceilings) / len(ceilings), 3)}
    ts = time.strftime("%Y%m%d_%H%M%S")
    path = f"/root/repo/BENCH/runs/incr_{ts}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"efficiency": eff, "best": best,
                      "speedup_vs_full_at_32":
                          out["speedup_vs_full_at_32"],
                      "ceiling_mean": out["ceiling_mean"], "raw": path}))


if __name__ == "__main__":
    main()
