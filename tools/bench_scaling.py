"""Scaling-efficiency bench (north rule): run the SAME dedup job on the
SAME on-disk input at local[8] and local[32] (the sandbox proxy for N vs
4N executors), report docs/sec at both plus efficiency = (tp32/tp8)/4.

Writes results into BENCH/BASELINE.md and prints a JSON line.

Usage: PYTHONPATH=/root/repo python tools/bench_scaling.py \
           [n_rows] [persist|recompute]

Variants: 'persist' (default) materializes MinHash signatures once —
max absolute throughput; 'recompute' leaves them unpersisted (3× the
embarrassingly parallel UDF work) — measures compute scaling;
'stages' (VERDICT r3 #4) times each pipeline stage separately (exact /
signatures / candidates / verify / cc / decisions) at both core counts
and reports PER-STAGE scaling efficiency — the diagnostic that names
which stage loses parallel efficiency as the corpus grows. Stage
boundaries are persisted, so each stage is charged exactly once; the
absolute total differs slightly from the fused pipeline (that is what
'persist' measures) but the 8-vs-32 ratio per stage is like-for-like.
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


def data_path(n_rows: int) -> str:
    # the original 1M corpus predates size-parameterized paths
    if n_rows == 1_000_000:
        return DATA
    return f"/root/repo/var/bench_pages_{n_rows}.parquet"


def ensure_data(n_rows: int) -> None:
    global DATA
    DATA = data_path(n_rows)
    if os.path.exists(os.path.join(DATA, "_SUCCESS")):
        return
    from duplicate_finder_spark.benchgen import generate_pages
    from duplicate_finder_spark.session import get_spark
    spark = get_spark(app_name="benchgen", master="local[32]",
                      shuffle_partitions=32)
    generate_pages(spark, n_rows).repartition(64) \
        .write.mode("overwrite").parquet(DATA)
    spark.stop()


def _pipeline_decisions(spark, cfg: PipelineConfig, persist: bool = True):
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    pages = spark.read.parquet(DATA)
    # exact stage
    exact_cl = ex.exact_clusters(pages, cfg)
    e_exact = exact_edges(exact_cl)
    # near stage (scale path). persist=True: signatures materialized
    # once — the Arrow-UDF subtree feeds banding + both verify sides and
    # would recompute 3× otherwise (at real scale this is the warehouse
    # signature checkpoint, pipeline.run_resumable) — max THROUGHPUT.
    # persist=False (variant 'recompute'): 3× embarrassingly parallel
    # UDF work — measures how the engine's COMPUTE scales with cores.
    sigs = signatures(pages, cfg)
    if persist:
        sigs = sigs.persist()
    pairs = candidate_pairs(sigs, cfg)
    near = verify_pairs(pairs, sigs, cfg.jaccard_threshold, cfg)
    edges = e_exact.unionByName(
        near.select(F.col("url_a").alias("src"),
                    F.col("url_b").alias("dst")))
    assign = connected_components(edges)
    ranked = assign.withColumn(
        "rank", F.row_number().over(
            Window.partitionBy("cluster_id").orderBy("url"))) \
        .withColumn("size", F.lit(0).cast("long"))
    return decide(ranked)


def run_once(cpus: int, cfg: PipelineConfig, persist: bool = True,
             n_passes: int = 2) -> dict:
    from pyspark.sql import functions as F

    from duplicate_finder_spark.session import get_spark
    spark = get_spark(app_name=f"bench-scaling-{cpus}",
                      master=f"local[{cpus}]", shuffle_partitions=cpus)
    # size the shuffle to the corpus, exactly as jobs/dedup.py does:
    # at 8M docs the cpus-sized default (32) put ~600 MB partitions in
    # flight and hit UNABLE_TO_ACQUIRE_MEMORY at the 16g heap; the
    # byte-derived value reproduces the linearity probe with no manual
    # knob (VERDICT r4 #5)
    from duplicate_finder_spark.partitioning import (
        autosize_shuffle_partitions)
    n_parts = autosize_shuffle_partitions(spark, spark.read.parquet(DATA))
    print(f"  shuffle.partitions={n_parts} (auto)")
    n_docs = spark.read.parquet(DATA).count()

    # UNTIMED warmup pass: spawns the per-core Python UDF daemons (each
    # imports numpy/pandas — a fixed cost that would otherwise bias the
    # wide config, which spawns 4× the workers), JITs the JVM hot paths,
    # and pulls the input into the OS page cache. The timed pass below is
    # steady-state task-parallel throughput — the quantity the N→4N
    # scaling-efficiency criterion is about.
    _warm = F.pandas_udf(lambda s: s, "long")
    spark.range(100_000).repartition(cpus).select(_warm("id")) \
        .write.format("noop").mode("overwrite").save()
    _pipeline_decisions(spark, cfg, persist).count()

    # best of the timed passes: a hypervisor-steal spike during one pass
    # would otherwise masquerade as an engine scaling property. Cache is
    # cleared first — Spark matches cached plans structurally, so a later
    # pass would silently reuse the previous pass's persisted signatures.
    walls = []
    for _ in range(n_passes):
        spark.catalog.clearCache()
        t0 = time.time()
        n_decisions = _pipeline_decisions(spark, cfg, persist).count()
        walls.append(time.time() - t0)
    wall = min(walls)
    spark.stop()
    return {"cpus": cpus, "wall_sec": round(wall, 2),
            "walls": [round(w, 2) for w in walls],
            "docs_per_sec": round(n_docs / wall, 1),
            "n_docs": n_docs, "n_decisions": n_decisions}


def _staged_walls(spark, cfg: PipelineConfig) -> dict[str, float]:
    """One staged pass: materialize each stage to the noop sink behind a
    persist() boundary, so a stage's wall covers ITS work only (noop
    forces full evaluation; count() would prune UDF columns)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    walls: dict[str, float] = {}
    kept = []

    def clock(name, df, persist=True):
        if persist:
            df = df.persist()
            kept.append(df)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        walls[name] = round(time.time() - t0, 2)
        return df

    pages = spark.read.parquet(DATA)
    exact_cl = clock("exact", ex.exact_clusters(pages, cfg))
    sigs = clock("signatures", signatures(pages, cfg))
    pairs = clock("candidates", candidate_pairs(sigs, cfg))
    # verify_pairs runs its truncation probe at call time — that is
    # part of the stage's cost, so the clock starts before the call
    t0 = time.time()
    near = verify_pairs(pairs, sigs, cfg.jaccard_threshold, cfg).persist()
    kept.append(near)
    near.write.format("noop").mode("overwrite").save()
    walls["verify"] = round(time.time() - t0, 2)
    # release consumed intermediates eagerly: the fat signature blocks
    # (and the pair table) are dead weight past this point, and at 2M
    # docs keeping every stage pinned starves execution memory
    # (UNABLE_TO_ACQUIRE) under 32 concurrent tasks
    sigs.unpersist()
    pairs.unpersist()
    edges = exact_edges(exact_cl).unionByName(
        near.select(F.col("url_a").alias("src"),
                    F.col("url_b").alias("dst")))
    t0 = time.time()
    assign = connected_components(edges).persist()
    kept.append(assign)
    assign.write.format("noop").mode("overwrite").save()
    walls["cc"] = round(time.time() - t0, 2)
    exact_cl.unpersist()
    near.unpersist()
    ranked = assign.withColumn(
        "rank", F.row_number().over(
            Window.partitionBy("cluster_id").orderBy("url"))) \
        .withColumn("size", F.lit(0).cast("long"))
    clock("decisions", decide(ranked), persist=False)
    for df in kept:
        df.unpersist()
    walls["total"] = round(sum(v for k, v in walls.items()
                               if k != "total"), 2)
    return walls


def run_once_staged(cpus: int, cfg: PipelineConfig) -> dict:
    from pyspark.sql import functions as F

    from duplicate_finder_spark.session import get_spark
    spark = get_spark(app_name=f"bench-stages-{cpus}",
                      master=f"local[{cpus}]", shuffle_partitions=cpus)
    from duplicate_finder_spark.partitioning import (
        autosize_shuffle_partitions)
    autosize_shuffle_partitions(spark, spark.read.parquet(DATA))
    n_docs = spark.read.parquet(DATA).count()
    # warmup: UDF daemons + JVM JIT + pull the input into page cache
    _warm = F.pandas_udf(lambda s: s, "long")
    spark.range(100_000).repartition(cpus).select(_warm("id")) \
        .write.format("noop").mode("overwrite").save()
    spark.read.parquet(DATA).write.format("noop").mode("overwrite").save()
    walls = _staged_walls(spark, cfg)
    spark.catalog.clearCache()
    spark.stop()
    return {"cpus": cpus, "n_docs": n_docs, "stage_walls": walls}


def cpu_ceiling() -> float:
    """Measured pure-CPU 8→32-worker scaling efficiency of THIS host —
    the ceiling any workload can reach here. Sub-1.0 on this box: the
    hypervisor steals cycles under full load and per-core turbo drops
    when all 32 cores are busy, so a perfectly parallel job also lands
    below 1.0. Engine efficiency should be read against this number."""
    import multiprocessing as mp

    def _run(workers: int) -> float:
        t0 = time.time()
        with mp.Pool(workers) as p:
            p.map(_burn, [3_000_000] * 64)
        return time.time() - t0

    t8, t32 = _run(8), _run(32)
    return round((t8 / t32) / 4.0, 3)


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def mem_bw_ceiling() -> float:
    """Measured memory-BANDWIDTH 8→32-worker scaling efficiency — the
    busy-loop ceiling above is register-bound, but Arrow/pandas UDF work
    streams memory; on a shared-socket box the bus saturates well before
    32 cores (measured 0.20–0.43 on this host, vs ~0.6 compute), so a
    memory-heavy pipeline phase cannot scale past THIS number no matter
    how it is partitioned."""
    import multiprocessing as mp

    def _run(workers: int) -> float:
        t0 = time.time()
        with mp.Pool(workers) as p:
            p.map(_burn_mem, [40] * 64)
        return time.time() - t0

    t8, t32 = _run(8), _run(32)
    return round((t8 / t32) / 4.0, 3)


def _burn_mem(n: int) -> float:
    import numpy as np
    a = np.ones(8 * 1024 * 1024, dtype=np.float64)  # 64 MiB > L3
    s = 0.0
    for _ in range(n):
        s += float(a.sum())
        a *= 1.0000001
    return s


def main_stages(n_rows: int, cfg: PipelineConfig) -> None:
    """Per-stage scaling diagnosis (VERDICT r3 #4): counterbalanced
    8→32→32→8 staged sessions, per-stage best wall per config,
    per-stage N→4N efficiency — names the stage that loses parallel
    efficiency with corpus size."""
    sessions = []
    for cpus in (8, 32, 32, 8):
        pre = cpu_ceiling()
        r = run_once_staged(cpus, cfg)
        r["cpu_ceiling_pre"] = pre
        sessions.append(r)
    best: dict[int, dict[str, float]] = {}
    for r in sessions:
        acc = best.setdefault(r["cpus"], {})
        for k, v in r["stage_walls"].items():
            acc[k] = min(acc.get(k, v), v)
    stages = [k for k in best[8] if k != "total"]
    eff = {k: round(best[8][k] / best[32][k] / 4.0, 3) for k in
           stages + ["total"] if best[32][k]}
    out = {"variant": "stages", "n_rows": n_rows,
           "local8": best[8], "local32": best[32],
           "stage_efficiency": eff,
           "cpu_ceilings": [s["cpu_ceiling_pre"] for s in sessions],
           "sessions": sessions,
           "run_at": time.strftime("%Y-%m-%d %H:%M:%S")}
    print(json.dumps(out))
    os.makedirs("/root/repo/BENCH/runs", exist_ok=True)
    raw = time.strftime("/root/repo/BENCH/runs/stages_%Y%m%d_%H%M%S.json")
    with open(raw, "w") as f:
        json.dump(out, f, indent=1)
    rows = "\n".join(
        f"| {k} | {best[8][k]} | {best[32][k]} | {eff.get(k, '—')} |"
        for k in stages + ["total"])
    md = f"""# BENCH per-stage scaling run (raw)

Per-stage walls (s), best of two counterbalanced sessions per config,
{n_rows:,} docs; stage boundaries persisted so each stage is charged
once. efficiency = (wall8/wall32)/4.

| stage | local[8] | local[32] | efficiency |
|---|---|---|---|
{rows}

CPU-ceiling windows (session order 8,32,32,8):
{[s['cpu_ceiling_pre'] for s in sessions]}.
Raw JSON: {raw.rsplit('/', 1)[1]} under BENCH/runs/.
"""
    with open("/root/repo/BENCH/LAST_STAGES.md", "w") as f:
        f.write(md)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    variant = sys.argv[2] if len(sys.argv) > 2 else "persist"
    sig_scheme = sys.argv[3] if len(sys.argv) > 3 else "kperm"
    persist = variant != "recompute"
    ensure_data(n_rows)
    cfg = PipelineConfig(num_perm=128, lsh_bands=32, jaccard_threshold=0.8,
                         sig_scheme=sig_scheme)
    if variant == "stages":
        main_stages(n_rows, cfg)
        return
    # COUNTERBALANCED session order 8→32→32→8, one timed pass per
    # session: this shared-VM host drifts minute to minute (measured
    # pure-CPU ceilings swing 0.49–0.80 within an hour), so a sequential
    # 8-then-32 design aliases host drift into the N→4N ratio — whichever
    # config runs in the slow window loses. Interleaving gives each
    # config one early and one late window; best wall per config then
    # compares like-for-like. The CPU ceiling is still measured INSIDE
    # each session's window (before and after), so every timed pass is
    # bracketed by its own host-state evidence.
    sessions = []
    for cpus in (8, 32, 32, 8):
        pre = cpu_ceiling()
        r = run_once(cpus, cfg, persist, n_passes=1)
        post = cpu_ceiling()
        r["cpu_ceiling_pre"] = pre
        r["cpu_ceiling_post"] = post
        sessions.append(r)
    results = {}
    for r in sessions:
        key = f"local{r['cpus']}"
        if key not in results or r["wall_sec"] < results[key]["wall_sec"]:
            acc = results.get(key, {})
            results[key] = dict(
                r, all_walls=acc.get("all_walls", []),
                all_ceilings=acc.get("all_ceilings", []))
        results[key]["all_walls"] = results[key]["all_walls"] + r["walls"]
        results[key]["all_ceilings"] = results[key]["all_ceilings"] + \
            [r["cpu_ceiling_pre"], r["cpu_ceiling_post"]]
    r8, r32 = results["local8"], results["local32"]
    eff = round(r32["docs_per_sec"] / r8["docs_per_sec"] / 4.0, 3)
    ceilings = r8["all_ceilings"] + r32["all_ceilings"]
    ceiling = round(sum(ceilings) / len(ceilings), 3)
    out = {"local8": r8, "local32": r32, "scaling_efficiency": eff,
           "cpu_ceiling_windows": ceilings,
           "cpu_ceiling_mean": ceiling,
           "efficiency_vs_ceiling": round(eff / ceiling, 3) if ceiling
           else None,
           "variant": variant, "sig_scheme": cfg.sig_scheme,
           "session_order": [8, 32, 32, 8],
           "sessions": sessions,
           "run_at": time.strftime("%Y-%m-%d %H:%M:%S"),
           "n_rows": n_rows}
    print(json.dumps(out))
    # raw JSON committed alongside the curated BASELINE.md — every
    # curated claim must be traceable to one of these files
    os.makedirs("/root/repo/BENCH/runs", exist_ok=True)
    raw_path = time.strftime("/root/repo/BENCH/runs/scaling_%Y%m%d_%H%M%S.json")
    with open(raw_path, "w") as f:
        json.dump(out, f, indent=1)
    md = f"""# BENCH scaling run (raw)

Scaling-efficiency evidence for the north rule's two-cluster-size
criterion (sandbox proxy: same job + same on-disk input at local[8] vs
local[32]; one JVM, so this measures task-parallel scaling of the full
dedup pipeline: exact stage → MinHash signatures → LSH candidates →
exact-Jaccard verify → connected components → decisions).

Counterbalanced session order 8→32→32→8 (each config samples one early
and one late window — host drift cannot systematically favor either
config); every session runs an untimed warmup pass first (Python UDF
daemons, JVM JIT, page cache), then one timed pass. Best wall per
config across its two sessions.

| config | docs | wall (s) | all walls (s) | docs/sec |
|---|---|---|---|---|
| local[8]  | {r8['n_docs']:,} | {r8['wall_sec']} | {r8['all_walls']} | {r8['docs_per_sec']:,} |
| local[32] | {r32['n_docs']:,} | {r32['wall_sec']} | {r32['all_walls']} | {r32['docs_per_sec']:,} |

**Scaling efficiency (N→4N cores): {eff}** (target ≥ 0.8)

Hardware context: this host's PURE-CPU 8→32-worker scaling efficiency
(multiprocessing busy-loop, same total work), measured before/after
EVERY session's timed window: local[8] windows {r8['all_ceilings']},
local[32] windows {r32['all_ceilings']} (mean {ceiling}) — hypervisor
steal plus all-cores turbo droop cap what any workload can reach here.
Engine efficiency relative to the mean windowed ceiling:
**{round(eff / ceiling, 3) if ceiling else 'n/a'}**. On a real
multi-executor cluster the N→4N comparison adds nodes (no shared-socket
turbo penalty), so the engine-side number is the conservative bound.

Raw JSON for this run: committed under BENCH/runs/.

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
    # LAST_RUN.md, not BASELINE.md: BASELINE.md is curated by hand from
    # the best measured runs of BOTH pipeline variants (see its method
    # section); each raw run lands here for comparison first.
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/LAST_RUN.md", "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
