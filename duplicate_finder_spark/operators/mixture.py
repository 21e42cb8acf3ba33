"""Temperature-scaled source mixture weighting (pretraining data mix).

After dedup/filter/selection, a pretraining run doesn't consume the
corpus uniformly: it samples each SOURCE (crawl snapshot, curated
domain, books/code/web bucket — the ``source`` label on the documents
table) at a chosen rate. The standard scheme (GPT-3 §2.2, Gopher
Table A2, LLaMA Table 1) is temperature sampling: a source holding
share ``p_i`` of the corpus tokens is sampled proportionally to
``p_i^α`` with ``0 < α ≤ 1`` — α=1 is natural sampling, smaller α
flattens the mix toward small high-quality sources, at the price of
repeating their tokens (epochs > 1).

``mixture_weights`` computes, per source:

* ``n_docs``, ``n_tokens`` — corpus accounting (whitespace tokens,
  same tokenization as token_stats);
* ``nat_share`` — natural token share p_i;
* ``mix_weight`` — normalized temperature weight q_i = p_i^α / Σ p^α;
* ``budget_tokens`` — q_i × budget, the tokens drawn from this source;
* ``epochs`` — budget_tokens / n_tokens, how many passes over the
  source the draw implies (the number mix designers watch: ≫1 means
  the source will be memorized).

Scale shape: one map-side-combinable groupBy over the corpus (shuffle
bounded by the number of distinct sources — mixture labels are
curated, dozens to thousands); everything after runs on the one-row-
per-source table, with the normalizing constants computed by a single
partial-aggregable global agg and broadcast back via crossJoin of a
1-row DataFrame (never a driver collect in the plan, never a window
over data). Ratios are rounded to 6 dp so the DuckDB oracle matches
bit-for-bit despite distributed float-sum ordering: the groupBy sums
are exact integers, so rounding only touches the final divisions.
No counterpart in the reference (LLM-pipeline brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duplicate_finder_spark.functions.text import token_count

__all__ = ["mixture_weights"]


def mixture_weights(docs: DataFrame, alpha: float, budget_tokens: int,
                    source_col: str = "source",
                    text_col: str = "text") -> DataFrame:
    """→ (source, n_docs, n_tokens, nat_share, mix_weight,
    budget_tokens, epochs) — the temperature-α sampling plan for a
    ``budget_tokens`` training run. Sources with zero tokens keep
    zero weight (0^α = 0)."""
    if not 0 < alpha <= 1:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be > 0, got {budget_tokens}")
    per_src = (docs
               .select(F.col(source_col).alias("source"),
                       token_count(text_col).cast("long").alias("_t"))
               .groupBy("source")
               .agg(F.count("*").cast("long").alias("n_docs"),
                    F.sum("_t").cast("long").alias("n_tokens")))
    scaled = per_src.withColumn(
        "_pa", F.pow(F.col("n_tokens").cast("double"), F.lit(alpha)))
    totals = scaled.agg(F.sum("n_tokens").cast("double").alias("_tot"),
                        F.sum("_pa").alias("_tot_pa"))
    return (scaled.crossJoin(F.broadcast(totals))
            .withColumn("nat_share",
                        F.round(F.col("n_tokens") / F.col("_tot"), 6))
            .withColumn("mix_weight",
                        F.round(F.col("_pa") / F.col("_tot_pa"), 6))
            .withColumn("budget_tokens",
                        F.round(F.col("_pa") / F.col("_tot_pa")
                                * budget_tokens).cast("long"))
            .withColumn("epochs",
                        F.when(F.col("n_tokens") > 0,
                               F.round(F.col("_pa") / F.col("_tot_pa")
                                       * budget_tokens
                                       / F.col("n_tokens"), 6))
                        .otherwise(F.lit(0.0)))
            .select("source", "n_docs", "n_tokens", "nat_share",
                    "mix_weight", "budget_tokens", "epochs"))
