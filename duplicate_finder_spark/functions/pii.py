"""PII detection and redaction — JVM-side regex expressions only.

A web-scale training-data pipeline scrubs personally identifiable
information before anything ships to a training mix (the C4 / Dolma
cleanup stage). The reference has no analogue (it never looks inside
file contents beyond hashing, duplicate_finder.py:139-152); this is a
training-data extension of its content pipeline.

Design constraints:

* Every pattern is written in the common subset of Java regex (Spark's
  ``regexp_count`` / ``regexp_replace``) and RE2 (DuckDB) — no
  lookbehind, no backreferences — so the DuckDB oracle verifies counts
  AND redacted text value-for-value.
* Pure column expressions: the scan stays inside whole-stage codegen,
  no Python in the hot path, trivially scale-safe (embarrassingly
  parallel, no shuffle).
* Redaction order is fixed (EMAIL → IPV4 → PHONE) and identical on
  both engines; counts are measured on the ORIGINAL text per class, so
  a token consumed by an earlier redaction still counts for its own
  class.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Patterns deliberately conservative (precision over recall): a false
# redaction destroys training text, a miss is caught by later passes.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"

# applied in this exact order on both engines — order matters because
# a redaction token must never be re-matched by a later class
_CLASSES = (
    ("emails", EMAIL_RE, EMAIL_TOKEN),
    ("ipv4s", IPV4_RE, IPV4_TOKEN),
    ("phones", PHONE_RE, PHONE_TOKEN),
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_counts(col: Column | str = "text") -> dict[str, Column]:
    """Per-class match counts on the raw text (pre-redaction)."""
    c = _c(col)
    return {f"n_{name}": F.regexp_count(c, F.lit(pat)).cast("long")
            for name, pat, _tok in _CLASSES}


def redact_pii(col: Column | str = "text") -> Column:
    """Text with every PII match replaced by its class token."""
    c = _c(col)
    for _name, pat, tok in _CLASSES:
        c = F.regexp_replace(c, pat, tok)
    return c


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """→ df + per-class counts, total, and the redacted text column.

    Narrow map-only transform: no shuffle, no UDF; at 10^12 docs this
    is a single codegen'd projection fused into whatever scan feeds it.
    """
    counts = pii_counts(text_col)
    out = df
    for name, expr in counts.items():
        out = out.withColumn(name, expr)
    total = None
    for name in counts:
        total = F.col(name) if total is None else total + F.col(name)
    return (out.withColumn("n_pii", total)
            .withColumn("redacted_text", redact_pii(text_col)))
