"""N→4N scaling measurement for the ExactSubstr pass (exact_substr_apply).

Same methodology as tools/bench_scaling.py (counterbalanced 8→32→32→8
sessions, untimed warmup, best-of-2 timed passes, pure-CPU ceiling probe
bracketing every session), applied to the round-4 corpus-wide
duplicated-span operator on the same synthetic page corpus.

Usage: PYTHONPATH=/root/repo python tools/bench_exact_substr.py [n_rows] [L]
Writes BENCH/runs/exsub_<ts>.json and prints a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from bench_scaling import cpu_ceiling, data_path, ensure_data  # noqa: E402


def run_once(cpus: int, n_rows: int, length: int) -> dict:
    from pyspark.sql import functions as F

    from duplicate_finder_spark.operators.exact_substr import (
        exact_substr_apply)
    from duplicate_finder_spark.session import get_spark

    spark = get_spark(app_name=f"bench-exsub-{cpus}",
                      master=f"local[{cpus}]", shuffle_partitions=cpus)
    pages = spark.read.parquet(data_path(n_rows)).select(
        F.xxhash64("url").alias("doc_id"), "text")
    n_docs = pages.count()
    n_chars = pages.agg(F.sum(F.length("text"))).first()[0]

    def job():
        return exact_substr_apply(pages, length).write \
            .format("noop").mode("overwrite").save()

    job()  # untimed warmup: JIT, page cache, codegen
    walls = []
    for _ in range(2):
        t0 = time.time()
        job()
        walls.append(time.time() - t0)
    wall = min(walls)
    spark.stop()
    return {"cpus": cpus, "wall_sec": round(wall, 2),
            "walls": [round(w, 2) for w in walls],
            "docs_per_sec": round(n_docs / wall, 1),
            "chars_per_sec": round(n_chars / wall, 1),
            "n_docs": n_docs, "n_chars": n_chars}


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    length = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    ensure_data(n_rows)

    sessions, ceilings = [], []
    for cpus in (8, 32, 32, 8):  # counterbalanced: host drift is symmetric
        ceilings.append(cpu_ceiling())
        sessions.append(run_once(cpus, n_rows, length))
        print(json.dumps(sessions[-1]), flush=True)
    ceilings.append(cpu_ceiling())

    best = {c: min(s["wall_sec"] for s in sessions if s["cpus"] == c)
            for c in (8, 32)}
    eff = round(best[8] / (4 * best[32]), 3)
    out = {"op": "exact_substr_apply", "n_rows": n_rows, "length": length,
           "sessions": sessions, "cpu_ceiling_windows": ceilings,
           "best_wall": best, "efficiency_8_to_32": eff,
           "ceiling_mean": round(sum(ceilings) / len(ceilings), 3)}
    ts = time.strftime("%Y%m%d_%H%M%S")
    path = f"/root/repo/BENCH/runs/exsub_{ts}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"efficiency": eff, "best": best,
                      "ceiling_mean": out["ceiling_mean"],
                      "raw": path}))


if __name__ == "__main__":
    main()
