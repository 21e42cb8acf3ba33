"""Training-sequence packing: map documents to fixed-token sequences.

After curation and dedup, a pretraining pipeline concatenates the
surviving documents (in a deterministic order) and slices the token
stream into fixed-length training sequences (GPT-style concatenate-
and-chunk packing). The planner's job is the MAP, not the tensors:
which sequence(s) does each document land in, where does it start, and
which documents straddle a sequence boundary (the fraction a masking /
best-fit packer would care about). This module computes that map as
pure DataFrame algebra.

Sharding is the scale story: a single global token cumsum would be one
total sort of the corpus. Real pipelines pack per output shard, so
``pack_sequences`` hash-buckets documents into ``n_shards`` independent
streams (the engine-portable sha256-prefix bucket of the id — the
operators/importance.py idiom, so the DuckDB oracle derives identical
shards) and runs the running-token window WITHIN each shard —
embarrassingly parallel, one bounded sort per shard, no global
ordering anywhere. Each shard's sequences are numbered independently;
(shard, seq) is the global sequence key.

Determinism: shard assignment is a hash of the id and the within-shard
order is the id itself, so the packing map is bit-identical across
partitionings, reruns, and engines — the contract every operator here
follows (operators/sampling.py, operators/importance.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from duplicate_finder_spark.functions.text import token_count
from duplicate_finder_spark.operators.importance import _bucket

__all__ = ["pack_sequences", "packing_stats"]


def pack_sequences(docs: DataFrame, seq_len: int,
                   n_shards: int = 1024,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """→ (id, shard, n_tokens, start_tok, first_seq, last_seq,
    crosses_boundary) — the packing map of every non-empty doc.

    ``start_tok`` is the doc's offset in its shard's concatenated
    token stream; ``first_seq``/``last_seq`` are the first and last
    ``seq_len``-token sequences the doc touches within the shard;
    ``crosses_boundary`` flags docs a boundary splits.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    sid = F.col(id_col)
    base = (docs
            .select(sid,
                    _bucket(sid.cast("string"), n_shards)
                    .cast("int").alias("shard"),
                    token_count(text_col).cast("long").alias("n_tokens"))
            .filter(F.col("n_tokens") > 0))
    w = (Window.partitionBy("shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = base.withColumn("end_tok", F.sum("n_tokens").over(w))
    start = F.col("end_tok") - F.col("n_tokens")
    first = F.floor(start / seq_len)
    last = F.floor((F.col("end_tok") - 1) / seq_len)
    return (out
            .select(id_col, "shard", "n_tokens",
                    start.alias("start_tok"),
                    first.cast("long").alias("first_seq"),
                    last.cast("long").alias("last_seq"),
                    (first != last).cast("int")
                    .alias("crosses_boundary")))


def packing_stats(docs: DataFrame, seq_len: int,
                  n_shards: int = 1024,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """One-row packing summary: docs, tokens, full sequences produced,
    boundary-crossing docs, and the padding tokens the final partial
    sequence of each shard would cost — the numbers that size a
    training run. All partial-aggregable over the packing map."""
    m = pack_sequences(docs, seq_len, n_shards, id_col, text_col)
    per_shard = m.groupBy("shard").agg(
        F.sum("n_tokens").alias("_tok"),
        F.count("*").alias("_docs"),
        F.sum("crosses_boundary").alias("_cross"))
    pad = (F.lit(seq_len) - F.pmod(F.col("_tok"), F.lit(seq_len))) \
        % seq_len
    return (per_shard
            .agg(F.sum("_docs").cast("long").alias("n_docs"),
                 F.sum("_tok").cast("long").alias("n_tokens"),
                 F.sum(F.floor(F.col("_tok") / seq_len)).cast("long")
                 .alias("n_full_sequences"),
                 F.sum("_cross").cast("long")
                 .alias("n_boundary_docs"),
                 F.sum(pad).cast("long").alias("n_pad_tokens")))
