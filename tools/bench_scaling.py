"""Scaling-efficiency bench (north rule): run the SAME dedup job on the
SAME on-disk input at local[8] and local[32] (the sandbox proxy for N vs
4N executors), report docs/sec at both plus efficiency = (tp32/tp8)/4.

Writes results into BENCH/BASELINE.md and prints a JSON line.

Usage: PYTHONPATH=/root/repo python tools/bench_scaling.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from duplicate_finder_spark.config import PipelineConfig  # noqa: E402
from duplicate_finder_spark.operators.components import (  # noqa: E402
    connected_components)
from duplicate_finder_spark.operators.decisions import decide  # noqa: E402
from duplicate_finder_spark.operators.lsh import (candidate_pairs,  # noqa: E402
                                                  verify_pairs)
from duplicate_finder_spark.operators.minhash import signatures  # noqa: E402
from duplicate_finder_spark.pipeline import exact_edges  # noqa: E402
from duplicate_finder_spark.operators import exact as ex  # noqa: E402

DATA = "/root/repo/var/bench_pages.parquet"


def ensure_data(n_rows: int) -> None:
    if os.path.exists(os.path.join(DATA, "_SUCCESS")):
        return
    from duplicate_finder_spark.benchgen import generate_pages
    from duplicate_finder_spark.session import get_spark
    spark = get_spark(app_name="benchgen", master="local[32]",
                      shuffle_partitions=32)
    generate_pages(spark, n_rows).repartition(64) \
        .write.mode("overwrite").parquet(DATA)
    spark.stop()


def run_once(cpus: int, cfg: PipelineConfig) -> dict:
    from pyspark.sql import functions as F

    from duplicate_finder_spark.session import get_spark
    spark = get_spark(app_name=f"bench-scaling-{cpus}",
                      master=f"local[{cpus}]", shuffle_partitions=cpus)
    pages = spark.read.parquet(DATA)
    n_docs = pages.count()
    spark.range(1000).count()  # scheduler warmup

    t0 = time.time()
    # exact stage
    exact_cl = ex.exact_clusters(pages, cfg)
    e_exact = exact_edges(exact_cl)
    # near stage (scale path)
    sigs = signatures(pages, cfg)
    pairs = candidate_pairs(sigs, cfg)
    near = verify_pairs(pairs, sigs, cfg.jaccard_threshold)
    edges = e_exact.unionByName(
        near.select(F.col("url_a").alias("src"),
                    F.col("url_b").alias("dst")))
    assign = connected_components(edges)
    from pyspark.sql import Window
    ranked = assign.withColumn(
        "rank", F.row_number().over(
            Window.partitionBy("cluster_id").orderBy("url"))) \
        .withColumn("size", F.lit(0).cast("long"))
    n_decisions = decide(ranked).count()
    wall = time.time() - t0
    spark.stop()
    return {"cpus": cpus, "wall_sec": round(wall, 2),
            "docs_per_sec": round(n_docs / wall, 1),
            "n_docs": n_docs, "n_decisions": n_decisions}


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    ensure_data(n_rows)
    cfg = PipelineConfig(num_perm=128, lsh_bands=32, jaccard_threshold=0.8)
    r8 = run_once(8, cfg)
    r32 = run_once(32, cfg)
    eff = round(r32["docs_per_sec"] / r8["docs_per_sec"] / 4.0, 3)
    out = {"local8": r8, "local32": r32, "scaling_efficiency": eff}
    print(json.dumps(out))
    md = f"""# BENCH/BASELINE — measured engine numbers

Scaling-efficiency evidence for the north rule's two-cluster-size
criterion (sandbox proxy: same job + same on-disk input at local[8] vs
local[32]; one JVM, so this measures task-parallel scaling of the full
dedup pipeline: exact stage → MinHash signatures → LSH candidates →
exact-Jaccard verify → connected components → decisions).

| config | docs | wall (s) | docs/sec |
|---|---|---|---|
| local[8]  | {r8['n_docs']:,} | {r8['wall_sec']} | {r8['docs_per_sec']:,} |
| local[32] | {r32['n_docs']:,} | {r32['wall_sec']} | {r32['docs_per_sec']:,} |

**Scaling efficiency (N→4N cores): {eff}** (target ≥ 0.8)

Decisions emitted: {r32['n_decisions']:,}. Corpus:
duplicate_finder_spark/benchgen.py (deterministic, generated inside
Spark; 70% unique / 15% exact-dup groups / 10% near-dup pairs /
5% boilerplate skew), written once to parquet and reused byte-identical
by both runs.

Reference comparison: the reference publishes no throughput numbers
(BASELINE.md); it is single-node Python with a thread pool for hashing
only. Its architecture cannot run this workload at any comparable scale
— the engine's single-node docs/sec above is the measured baseline.
"""
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/BASELINE.md", "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
