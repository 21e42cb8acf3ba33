"""HTML → text extraction (the input_hint invariant).

The north rule pins a per-row invariant: the engine's extracted text
must be BYTE-identical per url to the reference fixture's ``text``
column (BASELINE.json input_hint). So extraction is deliberately
conservative: strip markup at the BYTE level and decode — no
whitespace normalization, no entity rewriting, no unicode
normalization (NFC/NFD pass through untouched). Anything cleverer
(readability heuristics, boilerplate removal) belongs in a separate,
explicitly lossy operator — not here, where byte identity is the
contract.

Markup handled (real-crawl adversarial cases):
* comments ``<!-- … -->`` — may contain ``>``; removed whole
* CDATA sections ``<![CDATA[ … ]]>`` — may contain ``>``; removed
  whole (they only appear in script/XML islands, never as prose)
* tags with ``>`` inside quoted attribute values
  (``<a title="x > y">``) — the quoted spans are skipped, so the tag
  closes at the real ``>``

Malformed UTF-8 (routine in crawl data) must not fail the task/stage:
the default UDF QUARANTINES the row (returns NULL — the F6 error-row
skip, counted by the caller via a null-count); ``errors='replace'``
and ``errors='strict'`` variants exist behind ``make_extract_text``
(strict is what the fixture-invariant test pins).

Runs as an Arrow-batched pandas UDF over the ``html`` binary column —
the UDF surface SURVEY.md §2.10 names ``extract_text``.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# byte-level markup pattern: markup delimiters are ASCII, so stripping
# before decode can never split or alter a multi-byte UTF-8 sequence.
# Order matters: comments and CDATA first (non-greedy, DOTALL — their
# bodies may contain '>' and newlines), then tags. The tag alternative
# consumes quoted attribute values atomically so a '>' inside quotes
# does not terminate the tag. An unterminated comment/CDATA falls
# through to the tag branch (matching up to the first '>'), never
# swallowing the rest of the document.
_MARKUP_RX = re.compile(
    rb"<!--.*?-->"
    rb"|<!\[CDATA\[.*?\]\]>"
    rb"|<[^>\"']*(?:\"[^\"]*\"[^>\"']*|'[^']*'[^>\"']*)*>",
    re.DOTALL)


def strip_markup(b: bytes) -> bytes:
    """Byte-level markup strip — the pure kernel, shared by the UDF and
    the property tests."""
    return _MARKUP_RX.sub(b"", b)


def make_extract_text(errors: str = "quarantine"):
    """Build the extraction pandas UDF with the chosen decode policy:
    'quarantine' (default — malformed UTF-8 → NULL row, job survives),
    'replace' (U+FFFD substitution, explicit lossy opt-in), or
    'strict' (raise — the fixture-invariant test mode)."""
    if errors not in ("quarantine", "replace", "strict"):
        raise ValueError(f"unknown errors policy: {errors}")

    @F.pandas_udf(StringType())
    def _extract(html: pd.Series) -> pd.Series:
        def one(b) -> str | None:
            if b is None:
                return None
            stripped = strip_markup(bytes(b))
            try:
                return stripped.decode("utf-8")
            except UnicodeDecodeError:
                if errors == "quarantine":
                    return None
                if errors == "replace":
                    return stripped.decode("utf-8", "replace")
                raise
        return html.map(one)

    return _extract


extract_text = make_extract_text()
extract_text_strict = make_extract_text("strict")


def extracted(html_col: Column | str = "html") -> Column:
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    return extract_text(c)


def with_extracted_text(pages: DataFrame, html_col: str = "html",
                        out_col: str = "text",
                        errors: str = "quarantine") -> DataFrame:
    """pages(html, …) → + ``out_col`` extracted from markup. At real
    scale this REPLACES the fixture's pre-extracted text column; the
    fixture keeps both so the invariant is checkable row-by-row."""
    udf = make_extract_text(errors)
    return pages.withColumn(out_col, udf(F.col(html_col)))
