"""HTML → text extraction (the input_hint invariant).

The north rule pins a per-row invariant: the engine's extracted text
must be BYTE-identical per url to the reference fixture's ``text``
column (BASELINE.json input_hint). So extraction is deliberately
conservative: strip markup tags at the BYTE level and decode — no
whitespace normalization, no entity rewriting, no unicode
normalization (NFC/NFD pass through untouched). Anything cleverer
(readability heuristics, boilerplate removal) belongs in a separate,
explicitly lossy operator — not here, where byte identity is the
contract.

Runs as an Arrow-batched pandas UDF over the ``html`` binary column —
the UDF surface SURVEY.md §2.10 names ``extract_text``.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# byte-level tag pattern: tags are ASCII, so stripping before decode can
# never split or alter a multi-byte UTF-8 sequence
_TAG_RX = re.compile(rb"<[^>]*>")


@F.pandas_udf(StringType())
def extract_text(html: pd.Series) -> pd.Series:
    def one(b) -> str | None:
        if b is None:
            return None
        return _TAG_RX.sub(b"", bytes(b)).decode("utf-8")
    return html.map(one)


def extracted(html_col: Column | str = "html") -> Column:
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    return extract_text(c)


def with_extracted_text(pages: DataFrame, html_col: str = "html",
                        out_col: str = "text") -> DataFrame:
    """pages(html, …) → + ``out_col`` extracted from markup. At real
    scale this REPLACES the fixture's pre-extracted text column; the
    fixture keeps both so the invariant is checkable row-by-row."""
    return pages.withColumn(out_col, extracted(html_col))
