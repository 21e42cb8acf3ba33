"""C4-style line and page cleanup (Raffel et al. 2020, §2.2).

The C4 ("Colossal Clean Crawled Corpus") filters are the other classic
web-text cleanup family beside Gopher's document rules
(operators/gopherquality.py): LINE-level removal followed by PAGE-level
gates. This module implements them faithfully, scaled knobs exposed:

* keep only lines that terminate in sentence punctuation (C4 kept
  lines ending in ``.``, ``!``, ``?`` or a closing quote);
* drop lines with fewer than ``min_line_words`` words (C4 used 3);
* drop lines containing any ``bad_phrases`` member, case-insensitive
  (C4 dropped lines with the word "javascript" and boilerplate like
  cookie/privacy notices);
* drop the whole page when it contains "lorem ipsum" or a curly brace
  (code), or when fewer than ``min_kept_lines`` lines survive (C4
  required ≥ 3 sentences).

Output is one row per SURVIVING page: the line accounting plus
``clean_text`` (the kept lines re-joined with newlines) — the same
mutation shape as paragraph_dedup_apply, so the stage composes into
the curation funnel ahead of dedup.

Scale shape (10^12 pages): a single codegen'd JVM projection + filter —
``split``/``filter``/``array_join`` over the text column, no shuffle,
no UDF, no join. Filters push down to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["BAD_PHRASES", "TERMINALS", "c4_clean"]

# C4's line-level boilerplate markers (the paper names "javascript" and
# cookie/policy notices).
BAD_PHRASES = ("javascript", "lorem ipsum", "cookie policy",
               "privacy policy", "terms of use", "uses cookies")

# sentence terminators C4 accepts at end-of-line (closing quote forms
# included)
TERMINALS = (".", "!", "?", '."', '!"', '?"')


def _line_ok(ln: Column, min_line_words: int,
             bad_phrases: tuple[str, ...]) -> Column:
    t = F.trim(ln)
    low = F.lower(t)
    ends = None
    for term in TERMINALS:
        c = t.endswith(term)
        ends = c if ends is None else (ends | c)
    enough = F.size(F.split(t, r"\s+")) >= min_line_words
    clean = None
    for p in bad_phrases:
        c = ~low.contains(p)
        clean = c if clean is None else (clean & c)
    return ends & enough & clean


def c4_clean(docs: DataFrame,
             id_col: str = "doc_id",
             text_col: str = "text",
             min_line_words: int = 3,
             min_kept_lines: int = 3,
             bad_phrases: tuple[str, ...] = BAD_PHRASES,
             drop_brace: bool = True) -> DataFrame:
    """→ (id, n_lines, n_kept_lines, clean_text) for surviving pages.

    Pages containing "lorem ipsum" (any case) or — with ``drop_brace``
    — a ``{`` are removed outright; then lines failing the terminal-
    punctuation / word-count / bad-phrase tests are removed; then pages
    with fewer than ``min_kept_lines`` surviving lines are removed.
    """
    text = F.col(text_col)
    low = F.lower(text)
    page_ok = ~low.contains("lorem ipsum")
    if drop_brace:
        page_ok = page_ok & ~text.contains("{")

    lines = F.filter(F.split(text, "\n"), lambda ln: F.trim(ln) != "")
    kept = F.filter(lines,
                    lambda ln: _line_ok(ln, min_line_words, bad_phrases))

    out = (docs
           .filter(page_ok)
           .select(F.col(id_col),
                   F.size(lines).cast("long").alias("n_lines"),
                   F.size(kept).cast("long").alias("n_kept_lines"),
                   F.array_join(F.transform(kept, F.trim), "\n")
                   .alias("clean_text")))
    return out.filter(F.col("n_kept_lines") >= min_kept_lines)


def dedup_lines_within_doc(docs: DataFrame,
                           id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """Remove REPEATED lines within each document, keeping the first
    occurrence in order (the within-doc cousin of the corpus-level
    paragraph dedup in operators/paragraphs.py — boilerplate nav bars,
    cookie banners, and footer text repeat inside one scraped page as
    often as across pages).  → (id, n_lines, n_kept_lines, clean_text).

    Expression-only and join-free: ``array_distinct`` keeps first
    occurrences in order, so the whole operator is a codegen'd
    projection — no shuffle, no Python, safe at any corpus size.
    """
    lines = F.split(F.col(text_col), "\n")
    kept = F.array_distinct(lines)
    return docs.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        F.array_join(kept, "\n").alias("clean_text"))
