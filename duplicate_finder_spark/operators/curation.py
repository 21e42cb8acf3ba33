"""End-to-end training-corpus curation funnel (RefinedWeb-style compose).

The reference is a single-purpose tool: group files by hash, delete
duplicates (duplicate_finder.py: scan → group → delete). A web-scale
training-data pipeline runs that dedup as ONE stage of a funnel; this
module composes the engine's own operators into the canonical chain and
accounts for every stage so curation decisions are auditable:

  raw (train split)
    → quality gate        (Gopher-style: min tokens, within-doc
                           duplicate-window character fraction)
    → decontamination     (drop train docs sharing any word n-gram with
                           the held-out eval split — Lee et al. 2021;
                           GPT-3 Appendix C)
    → paragraph dedup     (CCNet corpus-wide keep-first; docs whose
                           every paragraph duplicated an earlier one
                           vanish, survivors are rewritten)

Output is the funnel itself: one row per stage with surviving doc count
and character mass — the numbers a curation report prints.

Scale notes (100 TB):
- Every stage reuses an operator whose plan is already scale-vetted:
  within-doc flags from operators/paragraphs.py (narrow + one combine-
  friendly agg), decontamination from operators/contamination.py's
  broadcast-probe shape (one pass over train, eval grams broadcast),
  paragraph apply's single sha2-keyed shuffle.
- The four stage aggregates are unioned; each is a count+sum over a
  progressively filtered branch sharing the same scan. At cluster scale
  you would cache the quality survivors before fanning out — here the
  branches are cheap relative to the dedup shuffle they share.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from duplicate_finder_spark.functions.text import token_count, tokens
from duplicate_finder_spark.operators.contamination import ngrams
from duplicate_finder_spark.operators.gopherquality import gopher_filter
from duplicate_finder_spark.operators.lm import lm_score
from duplicate_finder_spark.operators.paragraphs import (
    _flag_occurrences, paragraph_dedup_apply, paragraphs)

__all__ = ["quality_gate", "decontaminate", "curation_funnel"]


def _stage(df: DataFrame, idx: int, name: str,
           chars_col: str = "text") -> DataFrame:
    return df.agg(
        F.lit(idx).alias("stage_idx"),
        F.lit(name).alias("stage"),
        F.count("*").cast("long").alias("n_docs"),
        F.coalesce(F.sum(F.length(chars_col)), F.lit(0))
         .cast("long").alias("n_chars"))


def quality_gate(train: DataFrame, min_tokens: int = 20,
                 max_dup_frac: float = 0.07, w: int = 2,
                 id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Gopher-style quality stage: token-length floor plus a
    duplicate-window character-fraction ceiling. Docs below the floor
    never reach the paragraph flagging (narrow prefilter); the
    dup-fraction agg is one combine-friendly shuffle, and survivors
    come back through a broadcast-able semi-join."""
    long_enough = train.filter(token_count(text_col) >= min_tokens)
    dupf = (_flag_occurrences(
                paragraphs(long_enough, w, id_col, text_col),
                id_col, within_doc=True)
            .groupBy(id_col)
            .agg((F.sum(F.when(F.col("occ") > 1, F.col("n_chars"))
                        .otherwise(0)) / F.sum("n_chars")).alias("_dupf")))
    return long_enough.join(
        dupf.filter(F.col("_dupf") <= max_dup_frac).select(id_col),
        id_col, "semi")


def decontaminate(train: DataFrame, eval_docs: DataFrame, n: int = 6,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Drop every train doc sharing any word n-gram with the eval set
    (Lee et al. 2021; GPT-3 Appendix C). One pass over train, eval
    grams broadcast, xxhash64 probe with a string-equality collision
    guard — same shape as contamination_check, but as a mutation."""
    probe = (eval_docs.select(tokens(text_col).alias("_toks"))
             .select(F.explode(ngrams(F.col("_toks"), n)).alias("_egram"))
             .distinct()
             .withColumn("_h", F.xxhash64("_egram")))
    tgrams = (train.select(id_col, tokens(text_col).alias("_toks"))
              .select(id_col, F.explode(ngrams(F.col("_toks"), n))
                               .alias("_tgram")))
    dirty = (tgrams.join(F.broadcast(probe),
                         F.xxhash64("_tgram") == F.col("_h"), "inner")
             .filter(F.col("_tgram") == F.col("_egram"))
             .select(id_col).distinct())
    return train.join(dirty, id_col, "left_anti")


def curation_funnel(docs: DataFrame, eval_pred: Column,
                    min_tokens: int = 20, max_dup_frac: float = 0.07,
                    gopher_w: int = 2, contam_n: int = 6,
                    para_w: int = 3, id_col: str = "doc_id",
                    text_col: str = "text",
                    gopher_kw: dict | None = None,
                    lm_target: DataFrame | None = None,
                    lm_max_mean_nll: int = 0,
                    lm_buckets: int = 1 << 14) -> DataFrame:
    """Run the curation chain; return per-stage (idx, name, docs, chars).

    ``eval_pred`` marks held-out benchmark docs: they are excluded from
    the funnel at stage 0 (they are not training data) and their n-grams
    are the decontamination probe set.

    Two optional stages slot in between quality and decontamination:

    * ``gopher_kw`` (threshold kwargs for
      :func:`~duplicate_finder_spark.operators.gopherquality.gopher_filter`)
      enables the full Gopher Table A1 rule gate — a join-free
      codegen'd filter, free at any scale;
    * ``lm_target`` enables the CCNet perplexity gate: a hashed
      add-one bigram model is fit on the target sample and docs with
      ``mean_nll_micro > lm_max_mean_nll`` (integer micro-nats) are
      dropped. The model tables broadcast; the only added wide work is
      the per-doc score agg plus one id semi-join — the same shape as
      the quality gate's dup-fraction stage.
    """
    train = docs.filter(~eval_pred).select(id_col, text_col)
    ev = docs.filter(eval_pred).select(id_col, text_col)

    # stage 1 — quality: length floor + Gopher duplicate-window gate
    quality = quality_gate(train, min_tokens, max_dup_frac, gopher_w,
                           id_col, text_col)
    stages: list[tuple[DataFrame, str, str]] = [
        (train, "raw", text_col), (quality, "quality", text_col)]
    cur = quality

    if gopher_kw is not None:
        cur = gopher_filter(cur, id_col, text_col, **gopher_kw)
        stages.append((cur, "gopher_rules", text_col))

    if lm_target is not None:
        if lm_max_mean_nll <= 0:
            # mirrors the jobs/curate.py CLI guard: the threshold is in
            # integer micro-nats, so a zero/negative cut would silently
            # drop essentially every document.
            raise ValueError(
                "lm_target set but lm_max_mean_nll <= 0: the perplexity "
                "gate needs a positive micro-nat threshold (e.g. the "
                "target corpus's observed p60 mean_nll_micro)")
        keep = (lm_score(cur, lm_target, lm_buckets, id_col, text_col)
                .filter(F.col("mean_nll_micro") <= lm_max_mean_nll)
                .select(id_col))
        cur = cur.join(keep, id_col, "semi")
        stages.append((cur, "lm_filter", text_col))

    # decontamination: any shared contam_n-gram with eval ⇒ out
    decon = decontaminate(cur, ev, contam_n, id_col, text_col)
    stages.append((decon, "decontaminated", text_col))

    # CCNet paragraph dedup over the survivors.
    deduped = paragraph_dedup_apply(decon, para_w, id_col, text_col)
    stages.append((deduped, "para_deduped", "clean_text"))

    out = _stage(stages[0][0], 0, stages[0][1], stages[0][2])
    for i, (df, name, chars) in enumerate(stages[1:], start=1):
        out = out.unionByName(_stage(df, i, name, chars))
    return out
