"""Corpus signature store for the incremental (cross-snapshot) dedup
workflow — the append-only layout jobs/incremental.py commits into,
plus its maintenance operations (compaction, orphan GC).

Layout: the kept corpus is the union of per-batch signature tables
``corpus_sigs__<batch-id>`` listed in a tiny ``corpus_batches``
registry table (batch_id, rows, committed_at). Each ingest run writes
O(batch) rows — its kept survivors — and commits them with one registry
row; the incumbent corpus is read but never rewritten. This is
Iceberg's append-snapshot pattern expressed on the warehouse facade's
atomic-swap primitive.

Why compaction exists: after B batches the store is B tables, so every
read is a B-way ``unionByName`` — B scan legs in the plan, B× the
file-listing overhead, and (under the parquet facade) B directory
trees. At one snapshot per month that is slow growth, but a
crawl-segment-per-batch cadence reaches hundreds quickly — the same
growth class as the CC round tables the components operator GCs.
``compact_store`` folds committed batch tables into one while keeping
the read contract identical:

1. fold = all committed batches except the newest ``keep_last``
   (default 1 — the newest batch stays individually addressable so a
   crash-recovery rerun of it stays well-defined, see below);
2. the folded tables' union is written as one
   ``corpus_sigs__compacted-<hash>`` table (hash of the folded ids —
   deterministic, so a crashed compaction rerun rewrites the same
   table and fingerprint instead of orphaning a half-built one);
3. the registry is rewritten — the ONE commit point — with the merged
   row carrying the OLDEST folded ``committed_at`` (the merged block
   stays ordered before every surviving batch, preserving
   oldest-first read order);
4. the folded tables are dropped (post-commit GC; a crash between 3
   and 4 leaves unreferenced tables that ``gc_store`` removes later).

Store-side semantics are order-insensitive — incumbents always beat
arrivals regardless of which batch they arrived in, and store members
are never deleted — so folding tables cannot change any future
decision (asserted by test_store_compact.py's before/after equality).

Reprocessing contract: ``read_store(exclude=batch_id)`` makes a rerun
of an UNCOMPACTED batch id recompute against the same incumbents it
originally saw. Compaction finalizes its folded batches: their rows
are inside the merged table, so a later rerun of a folded id sees its
own documents as incumbents and deletes the whole batch as
``dup_of_corpus`` re-crawls. That is consistent (the corpus keeps
exactly one copy) but almost never what an operator wants — keep
``keep_last`` ≥ the number of batches still eligible for reprocess.
"""

from __future__ import annotations

import hashlib
import time
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STORE_PREFIX = "corpus_sigs__"
REGISTRY = "corpus_batches"
REGISTRY_SCHEMA = "batch_id string, rows long, committed_at double"


def store_batches(wh, exclude: str | None = None) -> list[str]:
    """Committed batch ids from the registry, oldest first."""
    if not wh.exists(REGISTRY):
        return []
    rows = wh.read(REGISTRY).select("batch_id", "committed_at").collect()
    return [r["batch_id"] for r in
            sorted(rows, key=lambda r: r["committed_at"])
            if r["batch_id"] != exclude]


def read_store(wh, template: DataFrame, columns: list[str],
               exclude: str | None = None) -> DataFrame:
    """The kept corpus's signatures: union of committed per-batch
    tables. ``template`` supplies the (empty-store) schema."""
    batches = store_batches(wh, exclude=exclude)
    if not batches:
        return template.select(*columns).limit(0)
    return reduce(DataFrame.unionByName,
                  (wh.read(STORE_PREFIX + b).select(*columns)
                   for b in batches))


def registry_rows(wh, exclude: str | None = None) -> list[tuple]:
    """(batch_id, rows, committed_at) tuples, oldest first."""
    if not wh.exists(REGISTRY):
        return []
    return sorted(
        ((r["batch_id"], r["rows"], r["committed_at"])
         for r in wh.read(REGISTRY).collect()
         if r["batch_id"] != exclude),
        key=lambda t: t[2])


def commit_batch(wh, spark: SparkSession, batch_id: str,
                 rows: int) -> list[tuple]:
    """Append (or replace) one registry row — the batch's commit point.
    A replaced batch id moves to the end: the reprocessed batch is the
    newest arrival. Returns the PRIOR surviving rows (for summaries)."""
    prior = registry_rows(wh, exclude=batch_id)
    reg = spark.createDataFrame(
        prior + [(batch_id, rows, time.time())], REGISTRY_SCHEMA)
    wh.write(reg, REGISTRY, stage="registry", fingerprint=batch_id)
    return prior


def compact_store(wh, spark: SparkSession, columns: list[str],
                  keep_last: int = 1) -> dict:
    """Fold committed batch tables into one (see module docstring for
    the commit protocol). Returns a summary dict; a no-op (fewer than
    two foldable batches) returns {"folded": 0, ...} without writing."""
    rows = registry_rows(wh)
    cut = len(rows) - keep_last if keep_last > 0 else len(rows)
    fold, survive = rows[:cut], rows[cut:]
    if len(fold) < 2:
        return {"folded": 0, "store_batches": len(rows)}

    fold_ids = [b for b, _, _ in fold]
    merged_id = ("compacted-"
                 + hashlib.sha256("|".join(fold_ids).encode())
                 .hexdigest()[:12])
    merged = reduce(DataFrame.unionByName,
                    (wh.read(STORE_PREFIX + b).select(*columns)
                     for b in fold_ids))
    manifest = wh.write(merged, STORE_PREFIX + merged_id,
                        stage="store_compact", fingerprint=merged_id)
    # the commit: one registry write swaps B folded rows for the merged
    # row; its committed_at is the oldest folded one so oldest-first
    # read order is preserved
    reg = spark.createDataFrame(
        [(merged_id, manifest.rows, fold[0][2])] + survive,
        REGISTRY_SCHEMA)
    wh.write(reg, REGISTRY, stage="registry", fingerprint=merged_id)
    for b in fold_ids:  # post-commit GC
        wh.drop(STORE_PREFIX + b)
    return {"folded": len(fold_ids), "merged_id": merged_id,
            "merged_rows": manifest.rows,
            "store_batches": 1 + len(survive)}


def gc_store(wh) -> list[str]:
    """Drop ``corpus_sigs__`` tables no registry row references —
    leftovers of a crash between a batch/compaction table write and its
    registry commit. An unreferenced table is invisible to every reader
    (``read_store`` walks the registry), so dropping it cannot change
    any result — but an ingest that has written its kept table and not
    yet committed its registry row looks exactly like such an orphan,
    so run this from a maintenance window (the incremental job's
    --compact pass does), never concurrently with an ingest."""
    live = {STORE_PREFIX + b for b in store_batches(wh)}
    dropped = [t for t in wh.tables()
               if t.startswith(STORE_PREFIX) and t not in live]
    for t in dropped:
        wh.drop(t)
    return dropped
