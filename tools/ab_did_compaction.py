"""A/B: candidates-stage doc-id compaction (round 4).

Hypothesis: the LSH candidates stage — the measured pipeline limiter
(BENCH/BASELINE.md "Per-stage scaling": 131 s at local[32], 56% of the
pipeline, efficiency 0.371) — is memory-bandwidth-bound in its single
(band, band_hash) exchange + per-partition sort, and most of the bytes
it moves are the ~40-char ``url`` string riding every one of the
docs × bands exploded rows. Variant B carries ``xxhash64(url)`` (8
bytes) through the exchange, the window census, the self-equi-join and
the pair ``distinct()``, then joins urls back on the (orders of
magnitude smaller) distinct pair output. Same url-pair output set; the
band table and the pair-distinct shuffle shrink ~2x in bytes.

Collision math (why this is safe to even consider): a MISSED candidate
pair needs its two urls to collide under xxhash64 — P = 2^-64 per true
dup pair, ~5e-8 expected misses across 10^12 docs' worth of dup pairs.
A FALSE pair from a collision is harmless: the verify stage re-scores
every candidate against real sketches and drops it.

Method: one session per core count, signatures persisted once (the
stage input, same as the stages harness), untimed warmup of both
variants, then alternating timed A,B,A,B noop writes; best wall per
variant. Output contracts — pair-set equality on the non-hot path,
cluster equality under forced hot buckets (the star CENTER differs,
min-did vs min-url; connectivity does not) — are asserted in
tests/test_lsh_compact.py; here both counts are recorded for the
record (they may legitimately differ when hot buckets exist, because
cross-band distinct() collapses differently around different reps).

Usage: PYTHONPATH=/root/repo python tools/ab_did_compaction.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from duplicate_finder_spark.config import PipelineConfig  # noqa: E402
from duplicate_finder_spark.operators.lsh import (  # noqa: E402
    candidate_pairs, candidate_pairs_compact)
from duplicate_finder_spark.operators.minhash import signatures  # noqa: E402
from tools.bench_scaling import cpu_ceiling, data_path, ensure_data  # noqa: E402


def run_session(cpus: int, n_rows: int, check_equal: bool) -> dict:
    from duplicate_finder_spark.session import get_spark
    spark = get_spark(app_name=f"ab-did-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    cfg = PipelineConfig(num_perm=128, lsh_bands=32, jaccard_threshold=0.8)
    pages = spark.read.parquet(data_path(n_rows))
    sigs = signatures(pages, cfg).persist()
    sigs.write.format("noop").mode("overwrite").save()  # materialize once

    variants = {"A_url": candidate_pairs, "B_did": candidate_pairs_compact}
    # untimed warmup of BOTH variants (JIT, shuffle codecs)
    for fn in variants.values():
        fn(sigs, cfg).write.format("noop").mode("overwrite").save()

    walls: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(2):
        for name, fn in variants.items():
            t0 = time.time()
            fn(sigs, cfg).write.format("noop").mode("overwrite").save()
            walls[name].append(round(time.time() - t0, 2))

    out = {"cpus": cpus,
           "walls": walls,
           "best": {k: min(v) for k, v in walls.items()}}

    if check_equal:
        out["counts"] = {"A_url": candidate_pairs(sigs, cfg).count(),
                         "B_did": candidate_pairs_compact(sigs, cfg).count()}
    sigs.unpersist()
    spark.stop()
    return out


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    ensure_data(n_rows)
    sessions = []
    for i, cpus in enumerate((32, 8)):
        pre = cpu_ceiling()
        r = run_session(cpus, n_rows, check_equal=(i == 0))
        r["cpu_ceiling_pre"] = pre
        sessions.append(r)
    result = {"variant": "ab_did_compaction", "n_rows": n_rows,
              "sessions": sessions,
              "run_at": time.strftime("%Y-%m-%d %H:%M:%S")}
    print(json.dumps(result))
    os.makedirs("/root/repo/BENCH/runs", exist_ok=True)
    path = time.strftime("/root/repo/BENCH/runs/ab_did_%Y%m%d_%H%M%S.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
