"""Distributed deterministic bench-corpus generator — pages built INSIDE
Spark from seeded hash expressions (no driver-side Python row loops, no
wall clock), so a 10^6-row corpus generates in seconds and scales with
the cluster exactly like the engine itself.

Layout (by row id, deterministic):
* 70% uniques        — zipf-ish token sequence derived from xxhash64(id,i)
* 15% exact dups     — groups of 4 share the text of their group base
* 10% near dups      — pairs: the second member re-derives ~5% of tokens
* 5%  boilerplate    — one shared template + 8 unique tokens (hot-bucket
                       skew driver, mirrors web template pages)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB = 5000


def _tok(*cols):
    """Deterministic token from hashed inputs: 'w<idx>' with zipf-ish
    skew (square the uniform to favor low ranks)."""
    u = (F.abs(F.xxhash64(*cols)) % 1_000_000) / 1_000_000.0
    idx = F.floor(F.pow(u, 2.2) * VOCAB).cast("int")
    return F.concat(F.lit("w"), idx.cast("string"))


def generate_pages(spark: SparkSession, n_rows: int,
                   seed: int = 42, avg_tokens: int = 200) -> DataFrame:
    df = spark.range(n_rows).withColumn("seed", F.lit(seed))
    # slice assignment by id
    slice_col = (F.when(F.col("id") % 100 < 70, "unique")
                  .when(F.col("id") % 100 < 85, "exact")
                  .when(F.col("id") % 100 < 95, "near")
                  .otherwise("boiler"))
    # content identity: exact groups of 4 share a base id; near pairs of 2
    base_id = (F.when(slice_col == "exact",
                      (F.col("id") / 4).cast("long") * 4)
                .when(slice_col == "near",
                      (F.col("id") / 2).cast("long") * 2)
                .otherwise(F.col("id")))
    is_mutant = (slice_col == "near") & (F.col("id") % 2 == 1)
    n_tokens = (avg_tokens / 2
                + F.pmod(F.xxhash64("seed", base_id), avg_tokens)
                ).cast("int")

    idxs = F.sequence(F.lit(1), n_tokens)
    # base token for position i of the base document
    base_tok = lambda i: _tok(F.col("seed"), base_id, i)  # noqa: E731
    # mutants re-derive ~5% of positions (deterministic positions)
    mut_tok = lambda i: F.when(  # noqa: E731
        F.pmod(F.xxhash64(F.col("seed"), base_id, i, F.lit("mut")), 20) == 0,
        _tok(F.col("seed"), F.col("id"), i, F.lit("mutval"))
    ).otherwise(base_tok(i))
    body = F.when(is_mutant, F.concat_ws(" ", F.transform(idxs, mut_tok))) \
            .otherwise(F.concat_ws(" ", F.transform(idxs, base_tok)))

    # boilerplate: fixed 240-token template + 8 page-unique tokens
    template = F.concat_ws(" ", F.transform(
        F.sequence(F.lit(1), F.lit(240)),
        lambda i: _tok(F.lit(seed), F.lit(-1), i)))
    payload = F.concat_ws(" ", F.transform(
        F.sequence(F.lit(1), F.lit(8)),
        lambda i: _tok(F.col("seed"), F.col("id"), i, F.lit("pay"))))
    boiler_text = F.concat_ws(" ", template, payload)

    text = F.when(slice_col == "boiler", boiler_text).otherwise(body)
    return (df.select(
        F.format_string("https://site%03d.example/p/%012d",
                        (F.col("id") % 997).cast("int"), "id").alias("url"),
        (F.lit("2025-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("id").cast("double"))).alias("warc_ts"),
        text.alias("text"),
        F.element_at(F.array(F.lit("en"), F.lit("de"), F.lit("uk"),
                             F.lit("fr")),
                     (F.pmod(F.xxhash64("id"), 4) + 1).cast("int"))
        .alias("lang"))
        .withColumn("html", F.encode(
            F.concat(F.lit("<html><body>"), F.col("text"),
                     F.lit("</body></html>")), "utf-8")))
