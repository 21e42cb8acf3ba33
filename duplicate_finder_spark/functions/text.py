"""Text-analysis column expressions — all JVM-side built-ins (no Python UDFs).

These generalize the reference's size column (its only per-file "feature",
duplicate_finder.py:144) into the text features a web-scale training-data
pipeline needs: token counts, word-k-gram shingles, quality ratios, and a
stopword-based language-ID heuristic. Everything here is expressible in
ANSI-ish SQL so the DuckDB oracle can verify it value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WS = r"\s+"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str = "text") -> Column:
    """Whitespace tokens; blank text → empty array."""
    c = _c(col)
    return F.when(F.trim(c) == "", F.array().cast("array<string>")) \
            .otherwise(F.split(F.trim(c), WS))


def token_count(col: Column | str = "text") -> Column:
    return F.size(tokens(col))


def word_shingles(col: Column | str = "text", k: int = 3) -> Column:
    """Distinct word k-gram shingles joined by single spaces.

    Docs with fewer than k tokens contribute their whole (normalized)
    token string as one shingle, so short docs still participate in
    Jaccard instead of silently vanishing. Blank docs → empty array.

    PERFORMANCE TRAP: the slice lambda captures the outer token array,
    and Spark re-evaluates captured expressions per element — this
    expression is O(n_tokens²) per row. Use ONLY on short documents
    (SQL-parity queries); the scale path is
    operators/minhash.py::signatures, which shingles linearly over
    JVM-hashed tokens inside an Arrow UDF.
    """
    toks = tokens(col)
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), n - k + 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    whole = F.array(F.concat_ws(" ", toks))
    return F.when(n == 0, F.array().cast("array<string>")) \
            .when(n < k, F.array_distinct(whole)) \
            .otherwise(F.array_distinct(grams))


def char_ngrams(col: Column | str = "text", n: int = 8) -> Column:
    """Distinct character n-grams (for fine-grained Jaccard / winnowing)."""
    c = _c(col)
    length = F.length(c)
    grams = F.transform(
        F.sequence(F.lit(1), length - n + 1),
        lambda i: F.substring(c, i, n),  # type: ignore[arg-type]
    )
    return F.when(length < n,
                  F.when(length > 0, F.array(c))
                   .otherwise(F.array().cast("array<string>"))) \
            .otherwise(F.array_distinct(grams))


# BPE-style pre-tokenizer classes (GPT-2-ish, simplified to what Java
# and DuckDB regex engines agree on): letter runs, digit runs, and each
# punctuation mark as its own token — the unit a byte-pair encoder would
# merge within. Counting these approximates LLM token counts far better
# than whitespace words on punctuation-heavy web text.
BPE_TOKEN_RX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_tokens(col: Column | str = "text") -> Column:
    """BPE-ish pre-tokens (letter runs / digit runs / single punct)."""
    return F.regexp_extract_all(_c(col), F.lit(BPE_TOKEN_RX), 0)


def bpe_token_count(col: Column | str = "text") -> Column:
    return F.size(bpe_tokens(col))


def punct_ratio(col: Column | str = "text") -> Column:
    """Share of non-alphanumeric, non-space chars (quality signal)."""
    c = _c(col)
    total = F.length(c)
    stripped = F.length(F.regexp_replace(c, r"[^0-9A-Za-z\s]", ""))
    return F.when(total == 0, F.lit(0.0)) \
            .otherwise((total - stripped) / total)


_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "a"],
    "de": ["der", "die", "und", "das", "ist", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "un", "est"],
    "uk": ["і", "та", "в", "на", "це", "що", "не"],
}


def stopword_ratio(col: Column | str = "text", lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    toks = tokens(col)
    words = _STOPWORDS[lang]
    hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(*words)))
    return F.when(F.size(toks) == 0, F.lit(0.0)) \
            .otherwise(hits / F.size(toks))


def lang_scores(col: Column | str = "text") -> dict[str, Column]:
    """Per-language stopword hit counts (n-gram-free heuristic lang-ID)."""
    toks = tokens(col)
    return {
        lang: F.size(F.filter(toks, lambda t: F.lower(t).isin(*words)))
        for lang, words in _STOPWORDS.items()
    }


def quality_score(col: Column | str = "text") -> Column:
    """Composite [0,1] quality: length band + low punct + some stopwords.

    Deterministic and SQL-parity-able; thresholds follow common web-corpus
    filtering heuristics (Gopher-style length/punct gates).
    """
    c = _c(col)
    n_tok = token_count(col)
    len_ok = (F.length(c) >= 50) & (F.length(c) <= 100_000)
    tok_ok = (n_tok >= 10) & (n_tok <= 50_000)
    punct_ok = punct_ratio(col) <= 0.3
    return (len_ok.cast("double") + tok_ok.cast("double")
            + punct_ok.cast("double")) / 3.0
