"""Distributed BPE tokenizer training + encoding (Sennrich et al. 2016,
arXiv:1508.07909) — pure JVM expression algebra, no Python UDFs.

Every web-scale pretraining pipeline trains a subword tokenizer over
(a sample of) the deduplicated corpus before token counting, packing,
and budget sampling make sense in *model* tokens rather than
whitespace words. This module adds that stage with the same engine
contract as the rest of the repo: deterministic, DuckDB-oracle-able,
and shaped for 10^12 documents.

Algorithm (classic weighted-vocabulary BPE):

1. ``word_counts`` collapses the corpus to its DISTINCT-WORD table
   ``(word, cnt)`` — ONE corpus pass, a map-side-combinable groupBy
   whose shuffle is bounded by the number of distinct words (~10^7-8
   for web text), not by corpus size. Every training iteration after
   this touches only the word table: the standard trick that makes
   BPE tractable at any corpus scale.
2. ``bpe_train`` represents each word as a canonical symbol string
   (symbols joined by TWO spaces, one space at each end — see below)
   and repeats ``n_merges`` times: count adjacent symbol pairs
   weighted by word count (explode → combinable groupBy, shuffle
   bounded by distinct pairs), take the global argmax with the
   deterministic tie-break (count desc, left asc, right asc) via
   orderBy+limit(1) — plans as TakeOrderedAndProject, ONE row reaches
   the driver per iteration (the merge list is inherently sequential;
   this is the algorithm's data dependence, not a scalability
   shortcut) — then applies the merge as a single JVM ``replace`` map
   pass and re-persists the word table (previous round unpersisted).
3. ``bpe_apply`` / ``encode_stats`` replay the learned merge list (a
   driver-side list of ≤ a few thousand rows) as chained ``replace``
   expressions over the distinct-word table, then join words back to
   documents — the corpus is encoded via its vocabulary, never
   re-segmented row by row.

Canonical symbol-string trick: a word's symbols are joined with a
DOUBLE space and wrapped in single spaces, e.g. ``low`` →
``" l  o  w "``. Applying merge (a,b) is then the plain (non-regex)
global replace ``" a  b "`` → ``" ab "``: each match consumes one of
the two boundary spaces on each side, leaving the other for the
neighboring match, so left-to-right non-overlapping replacement —
the semantics of both Spark's ``replace`` and DuckDB's ``replace`` —
is EXACTLY BPE's greedy left-to-right within-word merge order
(e.g. ``a a a`` + merge (a,a) → ``aa a``, and ``a a a a`` → ``aa aa``).
Words are whitespace tokens so symbols can never contain a space.

End-of-word handling: merges apply within words only and no explicit
end-of-word marker symbol is appended (the boundary spaces already
prevent cross-word merges); a marker variant would only re-label the
symbols, not change the mechanics.

Determinism: counts are integers, the tie-break is total on (cnt,
left, right), and replacement order within a word is specified —
bit-identical output across partitionings, engines, and reruns. The
driver oracle recomputes the full merge sequence in DuckDB SQL
(unrolled stages) and must match value-for-value.

Unicode caveat: Spark splits strings into UTF-16 code units while
DuckDB splits UTF-8 code points, so astral-plane characters (emoji)
would char-split differently; callers that need oracle parity filter
the vocabulary to an ASCII-safe alphabet (``word_filter``). The
operator itself is alphabet-agnostic.

No counterpart in the reference (duplicate_finder.py hashes bytes);
this is part of the LLM-pipeline brief, alongside token_stats
(functions/text.py) whose whitespace tokenization it reuses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

from duplicate_finder_spark.functions.text import tokens

__all__ = ["word_counts", "bpe_train", "bpe_apply", "bpe_vocab",
           "encode_stats", "ASCII_PRINTABLE"]

#: words made only of printable non-space ASCII — the oracle-parity
#: alphabet (see module docstring).
ASCII_PRINTABLE = r"^[\x21-\x7e]+$"

_MERGE_SCHEMA = ("merge_rank long, left string, right string, "
                 "merged string, pair_count long")


def word_counts(docs: DataFrame, text_col: str = "text",
                word_filter: str | None = ASCII_PRINTABLE) -> DataFrame:
    """→ (word, cnt): the corpus collapsed to its distinct-word table.

    One combinable groupBy; the only pass over the full corpus in the
    whole training flow."""
    w = docs.select(F.explode(tokens(text_col)).alias("word"))
    if word_filter:
        w = w.filter(F.col("word").rlike(word_filter))
    return w.groupBy("word").agg(F.count("*").cast("long").alias("cnt"))


def _canon(word_col):
    """word → canonical symbol string: chars joined by '  ', wrapped
    in single spaces ('low' → ' l  o  w ')."""
    return F.concat(F.lit(" "),
                    F.array_join(F.split(word_col, ""), "  "),
                    F.lit(" "))


def _pair_counts(words: DataFrame) -> DataFrame:
    """(s, cnt) → (left, right, cnt): adjacent-symbol pair counts,
    weighted by word count. Combinable; shuffle bounded by distinct
    pairs."""
    syms = F.split(F.trim("s"), "  ")
    n = F.size(syms)
    pairs = F.when(n > 1, F.arrays_zip(
        F.slice(syms, 1, n - 1).alias("left"),
        F.slice(syms, 2, n - 1).alias("right"))) \
        .otherwise(F.array().cast("array<struct<left:string,right:string>>"))
    return (words.select(F.explode(pairs).alias("p"), "cnt")
            .groupBy(F.col("p.left").alias("left"),
                     F.col("p.right").alias("right"))
            .agg(F.sum("cnt").cast("long").alias("cnt")))


def _words_checksum(words: DataFrame) -> tuple[int, int]:
    """O(1)-driver content checksum of the (word, cnt) table — the
    content-addressed resume key when the caller holds no stable
    input fingerprint (same pattern as components._checksum)."""
    row = words.agg(
        F.count("*").alias("n"),
        F.sum(F.xxhash64("word", "cnt")).alias("h")).first()
    return row["n"], int(row["h"]) if row["h"] is not None else 0


def bpe_train(words: DataFrame, n_merges: int,
              max_words: int | None = None,
              warehouse=None, checkpoint_every: int = 0,
              input_fp: str | None = None,
              table_prefix: str = "bpe_train") -> DataFrame:
    """Learn ``n_merges`` BPE merges over the (word, cnt) table.

    → (merge_rank, left, right, merged, pair_count), merge_rank
    1-based in learn order. Stops early (fewer rows) when no pair is
    left to merge. Each iteration: one bounded pair-count shuffle, a
    1-row TakeOrderedAndProject argmax, one replace map pass; the
    word table is re-persisted per round and the previous round
    unpersisted, so lineage is cut at each materialized cache.

    ``max_words``: production vocabularies run tens of thousands of
    merges, and every merge iterates over the word table — at 10^8
    distinct web-text words that is the dominant cost. The standard
    fix (what sentencepiece/HF tokenizer trainers do by sampling the
    corpus) falls out of the word-count collapse for free: train on
    the ``max_words`` highest-count words only — a Zipf head that
    covers ≳99.9% of token OCCURRENCES at 10^6 words — and the
    iteration cost becomes O(max_words) regardless of corpus size.
    Deterministic (count desc, word asc) cut, ranked through the
    parallel ``global_rank`` so any cutoff size is safe (no driver
    heap, no single-reducer window). Merges learned on the head apply
    to ALL words at encode time; tail words simply fall back to more,
    shorter tokens — the same behavior a sampled trainer exhibits.
    Counts reported in ``pair_count`` are head-corpus counts.

    Resumability: a production vocabulary is tens of thousands of
    SEQUENTIAL merges — the longest inherently serial computation in
    the engine, so a crash must not restart it. With ``warehouse``
    (Parquet/Iceberg) and ``checkpoint_every`` > 0, every that-many-th
    round writes the current word table and the merges-so-far to
    reliable warehouse tables (plus a terminal checkpoint at the last
    round), content-addressed by ``input_fp`` — or, when the caller
    holds none, by an O(1)-driver (count, hash) checksum of the input
    — plus the (n_merges, max_words) config, so a rerun over
    different input or config can never false-resume. A rerun resumes
    from the highest matching round; older round tables are GC'd as
    newer ones land (rolling, CC-style). Checkpoint reads also cut
    the replace-chain lineage, bounding plan depth for long runs.
    """
    spark = words.sparkSession
    reliable = warehouse is not None and checkpoint_every > 0
    merges: list[Row] = []
    cur = None
    base_fp = ""
    rounds: list[int] = []
    if reliable:
        if input_fp is None:
            n0, h0 = _words_checksum(words)
            input_fp = f"{n0}:{h0}"
        base_fp = f"bpe:{input_fp}:{n_merges}:{max_words}"
        rounds = sorted({*range(checkpoint_every, n_merges + 1,
                                checkpoint_every), n_merges})
        for k in reversed(rounds):
            wname = f"{table_prefix}_words_r{k}"
            mname = f"{table_prefix}_merges_r{k}"
            mw = warehouse.manifest(wname)
            mm = warehouse.manifest(mname)
            if (mw is not None and mm is not None
                    and mw.fingerprint == f"{base_fp}:r{k}"
                    and mm.fingerprint == f"{base_fp}:r{k}"):
                cur = warehouse.read(wname).persist()
                cur.count()
                merges = [Row(**r.asDict()) for r in
                          warehouse.read(mname)
                          .orderBy("merge_rank").collect()]
                start = k
                break
    if cur is None:
        if max_words is not None:
            from duplicate_finder_spark.functions.ranks import global_rank
            words = (global_rank(words,
                                 [F.desc("cnt"), F.asc("word")],
                                 out_col="_wr")
                     .filter(F.col("_wr") <= max_words).drop("_wr"))
        cur = words.select(_canon(F.col("word")).alias("s"),
                           "cnt").persist()
        cur.count()
        start = 0
    try:
        for rank in range(start + 1, n_merges + 1):
            top = (_pair_counts(cur)
                   .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
                   .limit(1).collect())
            if top:
                left, right, cnt = (top[0]["left"], top[0]["right"],
                                    top[0]["cnt"])
                merges.append(Row(merge_rank=rank, left=left, right=right,
                                  merged=left + right, pair_count=cnt))
                nxt = cur.select(
                    F.replace("s", F.lit(f" {left}  {right} "),
                              F.lit(f" {left + right} ")).alias("s"),
                    "cnt").persist()
                nxt.count()
                cur.unpersist()
                cur = nxt
            exhausted = not top
            at_ckpt = reliable and (rank in rounds or exhausted)
            if at_ckpt:
                # on early exhaustion the state is terminal: record it
                # under the LAST round so a rerun resumes past the loop
                k = n_merges if exhausted else rank
                fp = f"{base_fp}:r{k}"
                warehouse.write(cur, f"{table_prefix}_words_r{k}",
                                stage="bpe_words", fingerprint=fp)
                warehouse.write(
                    spark.createDataFrame(merges, _MERGE_SCHEMA),
                    f"{table_prefix}_merges_r{k}",
                    stage="bpe_merges", fingerprint=fp)
                for j in rounds:
                    if j != k:
                        for nm in (f"{table_prefix}_words_r{j}",
                                   f"{table_prefix}_merges_r{j}"):
                            m = warehouse.manifest(nm)
                            if m is not None and m.fingerprint \
                                    .startswith(f"{base_fp}:"):
                                warehouse.drop(nm)
                stored = warehouse.read(
                    f"{table_prefix}_words_r{k}").persist()
                stored.count()
                cur.unpersist()
                cur = stored
            if exhausted:
                break
    finally:
        cur.unpersist()
    return spark.createDataFrame(merges, _MERGE_SCHEMA)


def bpe_apply(words: DataFrame, merges: list[tuple[str, str]],
              word_col: str = "word") -> DataFrame:
    """Encode each word with a learned merge list (driver-side,
    ordered). → input columns + (bpe_tokens array<string>,
    n_bpe_tokens long). Chained JVM replaces — no Python."""
    s = _canon(F.col(word_col))
    for left, right in merges:
        s = F.replace(s, F.lit(f" {left}  {right} "),
                      F.lit(f" {left + right} "))
    toks = F.split(F.trim(s), "  ")
    return (words.withColumn("bpe_tokens", toks)
            .withColumn("n_bpe_tokens", F.size("bpe_tokens").cast("long")))


def bpe_vocab(words: DataFrame, merges: list[tuple[str, str]],
              word_col: str = "word", cnt_col: str = "cnt") -> DataFrame:
    """→ (token_id, token, n_occurrences): the trained tokenizer's
    shipping artifact — every surviving symbol after the merge list,
    its corpus occurrence count (weighted by word count), and a
    deterministic 1-based id in (count desc, token asc) order.

    The id ranking runs through ``global_rank`` (functions/ranks.py):
    a mid-training vocabulary is alphabet + merges but an UNTRIMMED
    one at web scale is bounded below by distinct characters seen —
    large enough that the naive global row_number window's single
    reducer is the wrong default."""
    from duplicate_finder_spark.functions.ranks import global_rank
    occ = (bpe_apply(words, merges, word_col)
           .select(F.explode("bpe_tokens").alias("token"),
                   F.col(cnt_col).alias("_cnt"))
           .groupBy("token")
           .agg(F.sum("_cnt").cast("long").alias("n_occurrences")))
    return (global_rank(occ, [F.desc("n_occurrences"), F.asc("token")],
                        out_col="token_id")
            .select(F.col("token_id").cast("long"), "token",
                    "n_occurrences"))


def encode_stats(docs: DataFrame, merges: list[tuple[str, str]],
                 text_col: str = "text", id_col: str = "doc_id",
                 word_filter: str | None = ASCII_PRINTABLE) -> DataFrame:
    """→ (id, n_words, n_bpe_tokens): per-doc token accounting under
    the learned tokenizer — the number that token-budget sampling and
    sequence packing should run on.

    The corpus is encoded THROUGH its vocabulary: distinct words are
    encoded once (tiny vs corpus), then joined back to the exploded
    corpus — the chained replaces never run per occurrence. Docs with
    no qualifying words report 0/0.
    """
    w = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("word"))
    if word_filter:
        w = w.filter(F.col("word").rlike(word_filter))
    vocab = bpe_apply(w.select("word").distinct(), merges) \
        .select("word", "n_bpe_tokens")
    per_doc = (w.join(vocab, "word")
               .groupBy(id_col)
               .agg(F.count("*").cast("long").alias("n_words"),
                    F.sum("n_bpe_tokens").cast("long")
                     .alias("n_bpe_tokens")))
    base = docs.select(id_col).distinct()
    return (base.join(per_doc, id_col, "left")
            .select(id_col,
                    F.coalesce("n_words", F.lit(0)).cast("long")
                     .alias("n_words"),
                    F.coalesce("n_bpe_tokens", F.lit(0)).cast("long")
                     .alias("n_bpe_tokens")))
