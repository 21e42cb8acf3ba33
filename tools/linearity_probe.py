"""Corpus-size linearity probe with AUTO-SIZED shuffle partitions
(VERDICT r4 #5 'done' criterion): one local[32] session runs the full
dedup pipeline (recompute variant, k-perm) warm+timed at 4M docs, then
at 8M, back-to-back in the same window — with spark.sql.shuffle
.partitions derived from scanned bytes by
``partitioning.autosize_shuffle_partitions`` instead of the manual
doubling the round-4 probe needed (the first r4 8M attempt reused the
4M setting of 32 and died with UNABLE_TO_ACQUIRE_MEMORY at the 16 GiB
heap; `BENCH/BASELINE.md` linearity section).

Pass criteria: the 8M leg completes on the DEFAULT heap with no manual
partition knob, and the 8M/4M wall ratio stays ~2x (linear scaling,
flat docs/sec).

Usage: python tools/linearity_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import bench_scaling as bs  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F

    from duplicate_finder_spark.config import PipelineConfig
    from duplicate_finder_spark.partitioning import (
        autosize_shuffle_partitions)
    from duplicate_finder_spark.session import get_spark

    for n in (4_000_000, 8_000_000):
        bs.ensure_data(n)

    cfg = PipelineConfig()
    spark = get_spark(app_name="linearity-probe", master="local[32]",
                      shuffle_partitions=32)
    _warm = F.pandas_udf(lambda s: s, "long")
    spark.range(100_000).repartition(32).select(_warm("id")) \
        .write.format("noop").mode("overwrite").save()

    legs = []
    for n in (4_000_000, 8_000_000):
        bs.DATA = bs.data_path(n)
        pre = bs.cpu_ceiling()
        n_parts = autosize_shuffle_partitions(
            spark, spark.read.parquet(bs.DATA))
        # warm (untimed): page cache + JIT for this corpus
        bs._pipeline_decisions(spark, cfg, persist=False).count()
        spark.catalog.clearCache()
        t0 = time.time()
        n_dec = bs._pipeline_decisions(spark, cfg, persist=False).count()
        wall = round(time.time() - t0, 2)
        post = bs.cpu_ceiling()
        legs.append({"n_rows": n, "wall_sec": wall,
                     "docs_per_sec": round(n / wall, 1),
                     "shuffle_partitions": n_parts,
                     "n_decisions": n_dec,
                     "cpu_ceiling_pre": pre, "cpu_ceiling_post": post})
        print(json.dumps(legs[-1]))
        spark.catalog.clearCache()
    out = {
        "variant": "linearity-autosize", "legs": legs,
        "wall_ratio_8m_over_4m": round(
            legs[1]["wall_sec"] / legs[0]["wall_sec"], 3),
        "run_at": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(out))
    os.makedirs("/root/repo/BENCH/runs", exist_ok=True)
    stamp = time.strftime("%Y%m%d_%H%M%S")
    with open(f"/root/repo/BENCH/runs/linearity_auto_{stamp}.json",
              "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
