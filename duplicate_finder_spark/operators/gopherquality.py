"""Gopher document-level quality rules (Rae et al. 2021, Table A1).

The engine already carries two of Gopher's signal families —
within-doc repetition (operators/paragraphs.py::repetition_signals) and
a composite length/punct gate (functions/text.py::quality_score). This
module adds the REMAINING Table A1 document filters as one pass, each
rule surfaced as its own column so downstream stages can gate on any
subset (the paper removes a document when ANY rule fails):

* word count inside ``[min_words, max_words]``;
* mean word length inside ``[min_mean_word_len, max_mean_word_len]``;
* symbol-to-word ratio (``#`` and ellipsis) ≤ ``max_symbol_word_ratio``;
* ≤ ``max_bullet_line_frac`` of lines starting with a bullet;
* ≤ ``max_ellipsis_line_frac`` of lines ending with an ellipsis;
* ≥ ``min_alpha_word_frac`` of words containing an alphabetic char;
* ≥ ``min_required_hits`` distinct words from the required-stopword
  list (the paper: ≥ 2 of {the, be, to, of, and, that, have, with}).

This generalizes the reference's scalar pre-filters (size band +
file-kind predicate, duplicate_finder.py:137-166) to content-level
document gating — the same "cheap per-row predicate before the
expensive stage" role, at web-pretraining semantics.

Scale shape (10^12 docs): every signal is a codegen'd JVM projection
over the text column — no shuffle, no UDF, no join; the pass flag
composes with the curation funnel as a pushdown-able predicate. Mean
word length uses ``length(array_join(tokens, ''))`` (sum of token
lengths) instead of a per-token aggregate fold, so the projection stays
linear in the document.

Engine-parity notes (the DuckDB oracle mirrors every rule):

* fractions are ``round(x, 6)`` on both engines;
* ellipsis counts both the Unicode char and the three-dot spelling
  (disjoint occurrences of ``…`` plus ``...``);
* a blank document has zero words and zero lines: every ratio is
  defined as 0.0 and the word-count band fails, so blanks never pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from duplicate_finder_spark.functions.text import tokens

__all__ = ["REQUIRED_STOPWORDS", "gopher_filter",
           "gopher_quality_signals"]

# Rae et al. 2021 Table A1 "stop word filter" list.
REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and",
                      "that", "have", "with")


def _occurrences(col: Column, needle: str) -> Column:
    """Non-overlapping occurrence count of a literal in a string."""
    return (F.length(col) - F.length(F.replace(col, F.lit(needle)))) \
        / len(needle)


def _frac(num: Column, den: Column) -> Column:
    return F.round(F.when(den == 0, F.lit(0.0)).otherwise(num / den), 6)


def _signal_exprs(text_col: str,
                  required_stopwords: tuple[str, ...]
                  ) -> dict[str, Column]:
    """The seven Table A1 signals as named (rounded) expressions."""
    text = F.col(text_col)
    toks = tokens(text)
    n_words = F.size(toks)
    # sum of token lengths, linear: concat without separators
    mean_wl = F.round(
        F.when(n_words == 0, F.lit(0.0))
        .otherwise(F.length(F.array_join(toks, "")) / n_words), 6)

    n_symbols = (_occurrences(text, "#")
                 + _occurrences(text, "…")
                 + _occurrences(F.replace(text, F.lit("…")), "..."))
    symbol_ratio = _frac(n_symbols, n_words)

    lines = F.filter(F.split(text, "\n"),
                     lambda ln: F.trim(ln) != "")
    n_lines = F.size(lines)
    bullet = F.size(F.filter(
        lines, lambda ln: F.ltrim(ln).startswith("•")
        | F.ltrim(ln).startswith("- ")))
    ellipsis = F.size(F.filter(
        lines, lambda ln: F.rtrim(ln).endswith("…")
        | F.rtrim(ln).endswith("...")))
    bullet_frac = _frac(bullet, n_lines)
    ellipsis_frac = _frac(ellipsis, n_lines)

    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    alpha_frac = _frac(alpha_words, n_words)

    required = F.array(*[F.lit(w) for w in required_stopwords])
    hits = F.size(F.array_intersect(
        F.array_distinct(F.transform(toks, F.lower)), required))

    return {
        "n_words": n_words.cast("long"),
        "mean_word_len": mean_wl,
        "symbol_word_ratio": symbol_ratio,
        "bullet_line_frac": bullet_frac,
        "ellipsis_line_frac": ellipsis_frac,
        "alpha_word_frac": alpha_frac,
        "n_required_stopwords": hits.cast("long"),
    }


def _rule_exprs(min_words: int, max_words: int,
                min_mean_word_len: float, max_mean_word_len: float,
                max_symbol_word_ratio: float,
                max_bullet_line_frac: float,
                max_ellipsis_line_frac: float,
                min_alpha_word_frac: float,
                min_required_hits: int,
                sig: dict[str, Column]) -> dict[str, Column]:
    """Per-rule predicates over the (rounded) signal expressions."""
    return {
        "ok_words": (sig["n_words"] >= min_words)
        & (sig["n_words"] <= max_words),
        "ok_mean_word_len":
            (sig["mean_word_len"] >= min_mean_word_len)
            & (sig["mean_word_len"] <= max_mean_word_len),
        "ok_symbols": sig["symbol_word_ratio"] <= max_symbol_word_ratio,
        "ok_bullets": sig["bullet_line_frac"] <= max_bullet_line_frac,
        "ok_ellipsis":
            sig["ellipsis_line_frac"] <= max_ellipsis_line_frac,
        "ok_alpha": sig["alpha_word_frac"] >= min_alpha_word_frac,
        "ok_stopwords":
            sig["n_required_stopwords"] >= min_required_hits,
    }


def gopher_quality_signals(docs: DataFrame,
                           id_col: str = "doc_id",
                           text_col: str = "text",
                           min_words: int = 50,
                           max_words: int = 100_000,
                           min_mean_word_len: float = 3.0,
                           max_mean_word_len: float = 10.0,
                           max_symbol_word_ratio: float = 0.1,
                           max_bullet_line_frac: float = 0.9,
                           max_ellipsis_line_frac: float = 0.3,
                           min_alpha_word_frac: float = 0.8,
                           required_stopwords: tuple[str, ...]
                           = REQUIRED_STOPWORDS,
                           min_required_hits: int = 2) -> DataFrame:
    """→ one row per doc: every Table A1 signal + per-rule booleans +
    the conjunctive ``passes_gopher`` flag.

    Defaults are the paper's thresholds; callers filtering synthetic or
    domain corpora scale them (the driver query documents its scaled
    choices the way CONTAM_N scales GPT-3's 13-gram probe).
    """
    sig = _signal_exprs(text_col, required_stopwords)
    out = docs.select(F.col(id_col),
                      *[c.alias(n) for n, c in sig.items()])
    named = {n: F.col(n) for n in sig}
    rules = _rule_exprs(min_words, max_words, min_mean_word_len,
                        max_mean_word_len, max_symbol_word_ratio,
                        max_bullet_line_frac, max_ellipsis_line_frac,
                        min_alpha_word_frac, min_required_hits, named)
    passes = None
    for name, cond in rules.items():
        out = out.withColumn(name, cond.cast("int"))
        c = F.col(name) == 1
        passes = c if passes is None else (passes & c)
    return out.withColumn("passes_gopher", passes.cast("int"))


def gopher_filter(docs: DataFrame,
                  id_col: str = "doc_id",
                  text_col: str = "text",
                  **thresholds) -> DataFrame:
    """Keep only docs passing EVERY Table A1 rule — as one join-free
    codegen'd filter over the input (all other columns preserved), the
    shape a funnel stage wants at 10^12 docs. ``thresholds`` accepts
    the same keyword arguments as :func:`gopher_quality_signals`.
    """
    kw = dict(min_words=50, max_words=100_000,
              min_mean_word_len=3.0, max_mean_word_len=10.0,
              max_symbol_word_ratio=0.1, max_bullet_line_frac=0.9,
              max_ellipsis_line_frac=0.3, min_alpha_word_frac=0.8,
              required_stopwords=REQUIRED_STOPWORDS,
              min_required_hits=2)
    unknown = set(thresholds) - set(kw)
    if unknown:
        raise TypeError(f"unknown gopher thresholds: {sorted(unknown)}")
    kw.update(thresholds)
    required = kw.pop("required_stopwords")
    sig = _signal_exprs(text_col, required)
    rules = _rule_exprs(**kw, sig=sig)
    passes = None
    for cond in rules.values():
        passes = cond if passes is None else (passes & cond)
    return docs.filter(passes)
