"""Sequence packing map (operators/packing.py): closed-form expected
offsets on a single shard, shard independence, determinism across
partitionings, and the one-row stats rollup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duplicate_finder_spark.operators.packing import (pack_sequences,
                                                      packing_stats)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_single_shard_offsets_and_boundaries(spark):
    # token counts 6, 5, 4 packed at seq_len=8 in doc_id order:
    # doc1 [0,6) seq 0; doc2 [6,11) seqs 0-1 (crosses); doc3 [11,15)
    # seqs 1 (no cross)
    docs = _docs(spark, [(1, "a b c d e f"),
                         (2, "g h i j k"),
                         (3, "l m n o"),
                         (4, "   ")])          # blank → excluded
    got = {r.doc_id: r for r in
           pack_sequences(docs, 8, n_shards=1).collect()}
    assert sorted(got) == [1, 2, 3]
    assert (got[1].start_tok, got[1].first_seq, got[1].last_seq,
            got[1].crosses_boundary) == (0, 0, 0, 0)
    assert (got[2].start_tok, got[2].first_seq, got[2].last_seq,
            got[2].crosses_boundary) == (6, 0, 1, 1)
    assert (got[3].start_tok, got[3].first_seq, got[3].last_seq,
            got[3].crosses_boundary) == (11, 1, 1, 0)
    assert all(r.shard == 0 for r in got.values())


def test_shards_pack_independently(spark):
    rows = [(i, "w " * 10) for i in range(64)]
    m = pack_sequences(_docs(spark, rows), 16, n_shards=4)
    # within every shard the first doc (by id) starts at 0 and offsets
    # are gapless
    for shard_rows in m.groupBy("shard").agg(
            F.sort_array(F.collect_list(
                F.struct("doc_id", "start_tok", "n_tokens"))).alias("l")
            ).collect():
        pos = 0
        for r in shard_rows.l:
            assert r.start_tok == pos
            pos += r.n_tokens


def test_partition_invariance(spark):
    rows = [(i, "t " * (1 + i % 13)) for i in range(100)]
    docs = _docs(spark, rows)
    a = {tuple(r) for r in pack_sequences(docs, 32, 4).collect()}
    b = {tuple(r) for r in
         pack_sequences(docs.repartition(7), 32, 4).collect()}
    assert a == b and len(a) == 100


def test_packing_stats_closed_form(spark):
    docs = _docs(spark, [(1, "a b c d e f"),
                         (2, "g h i j k"),
                         (3, "l m n o")])
    s = packing_stats(docs, 8, n_shards=1).collect()[0]
    # 15 tokens → 1 full sequence, 1 partial costing 8-15%8=1 pad
    assert (s.n_docs, s.n_tokens, s.n_full_sequences,
            s.n_boundary_docs, s.n_pad_tokens) == (3, 15, 1, 1, 1)


def test_pad_zero_when_exact_multiple(spark):
    docs = _docs(spark, [(1, "a b c d"), (2, "e f g h")])
    s = packing_stats(docs, 8, n_shards=1).collect()[0]
    assert (s.n_full_sequences, s.n_pad_tokens) == (1, 0)


def test_seq_len_validated(spark):
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(_docs(spark, [(1, "a")]), 0)
