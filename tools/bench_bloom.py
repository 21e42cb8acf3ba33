"""Bloom re-crawl prefilter measurements (operators/bloomfilter.py).

What can honestly be measured on one box: the plain url semi/anti
split and the bloom-routed split BOTH scan the store once per batch
locally, so end-to-end walls are expected to be comparable here — the
structural win (the store never shuffles for the probe; the resolve
join's probe side shrinks from |batch| to overlap + fpp·|batch| and
becomes broadcastable; the word table is append-maintained so the
build amortizes to zero across batches) is a cluster property. What
this harness pins numerically:

1. build: wall to aggregate the store's urls into bit_or word rows +
   collect — and the shuffle-size fact: n_word_rows ≤ m/64 regardless
   of corpus rows (reported as rows-shuffled-per-corpus-row).
2. probe: Arrow-UDF throughput over the broadcast bitmap (urls/sec).
3. split parity + walls: bloom-routed split == plain semi/anti split
   exactly, at both parallelism levels.

Usage: PYTHONPATH=/root/repo python tools/bench_bloom.py [n_store]
Writes BENCH/runs/bloom_<ts>.json and prints a summary.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

N_BATCH_FRAC = 10          # batch = store/10 rows, half overlapping
FPP = 0.01


def make_tables(spark, n_store: int):
    from pyspark.sql import functions as F
    url = F.format_string("https://crawl.example/%010d", F.col("id"))
    store = spark.range(n_store).select(url.alias("url"))
    n_batch = n_store // N_BATCH_FRAC
    # half the batch re-crawls stored urls, half is genuinely new
    batch = spark.range(n_store - n_batch // 2,
                        n_store + n_batch // 2).select(url.alias("url"))
    return store, batch, n_batch


def run(cpus: int, n_store: int) -> dict:
    from duplicate_finder_spark.operators.bloomfilter import (
        BloomFilter, bloom_params, bloom_words, split_by_membership)
    from duplicate_finder_spark.session import get_spark

    spark = get_spark(app_name=f"bench-bloom-{cpus}",
                      master=f"local[{cpus}]", shuffle_partitions=cpus)
    store, batch, n_batch = make_tables(spark, n_store)
    store = store.persist()
    store.count()  # materialize: charge neither variant the range calc

    m_bits, k = bloom_params(n_store, FPP)

    def timed(fn):
        t0 = time.time()
        out = fn()
        return out, round(time.time() - t0, 3)

    # 1. build: distributed word agg + bounded collect
    (bf, n_words), t_build = timed(lambda: (
        lambda w: (BloomFilter.from_words(w, m_bits, k), w.count()))(
            bloom_words(store, "url", m_bits, k).persist()))

    # 2. probe-only throughput (no resolve join); one untimed pass
    # first — python workers / Arrow serializers spin up exactly once
    # per executor, same warmup rule as the other harnesses
    bf.maybe_contains(batch, "url").filter("bloom_maybe").count()
    _, t_probe = timed(lambda: bf.maybe_contains(batch, "url")
                       .filter("bloom_maybe").count())

    # 3a. plain split
    def plain():
        a = batch.join(store, "url", "left_semi").count()
        b = batch.join(store, "url", "left_anti").count()
        return a, b
    (pa, pb), t_plain = timed(plain)

    # 3b. bloom-routed split (prebuilt filter — the amortized regime)
    def bloomed():
        i, o = split_by_membership(batch, store, bf, "url")
        return i.count(), o.count()
    (ba, bb), t_bloom = timed(bloomed)
    assert (pa, pb) == (ba, bb), ((pa, pb), (ba, bb))

    store.unpersist()
    spark.stop()
    return {"cpus": cpus, "n_store": n_store, "n_batch": n_batch,
            "m_bits": m_bits, "k": k,
            "bitmap_mib": round(m_bits / 8 / 2**20, 2),
            "n_word_rows": n_words,
            "word_rows_per_store_row": round(n_words / n_store, 4),
            "build_sec": t_build,
            "probe_sec": t_probe,
            "probe_urls_per_sec": round(n_batch / t_probe),
            "split_plain_sec": t_plain, "split_bloom_sec": t_bloom,
            "n_recrawl": pa, "n_new": pb}


def main() -> None:
    n_store = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    sessions = [run(cpus, n_store) for cpus in (8, 32)]
    for s in sessions:
        print(json.dumps(s), flush=True)
    ts = time.strftime("%Y%m%d_%H%M%S")
    path = f"/root/repo/BENCH/runs/bloom_{ts}.json"
    with open(path, "w") as f:
        json.dump({"op": "bloom_recrawl_prefilter",
                   "sessions": sessions}, f, indent=1)
    print(json.dumps({"raw": path}))


if __name__ == "__main__":
    main()
