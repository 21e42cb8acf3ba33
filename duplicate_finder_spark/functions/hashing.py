"""Content-hash column expressions (U1 generalized).

Parity: the reference computes hex SHA-256 over raw file bytes
(utils.py:10-16); ``F.sha2(col, 256)`` over the UTF-8 bytes of ``text``
yields the identical hex digest CPython's hashlib produces for
``text.encode('utf-8')`` (asserted in tests/test_hash_parity.py).

Scale note: at 100 TB the cheap 64-bit ``xxhash64`` prefilter groups first;
SHA-256 runs only on rows whose xxhash64 group has count>1 — the same
"cheap key first" reduction the reference applies with file size
(duplicate_finder.py:176-196), one level deeper.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def content_sha256(col: Column | str = "text") -> Column:
    """Hex SHA-256 of the column's UTF-8 bytes (binary passes through)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c.cast("binary"), 256)


def content_xxhash64(col: Column | str = "text") -> Column:
    """Cheap 64-bit prefilter hash (JVM-side, codegen'd)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(c)


def normalized_fingerprint(col: Column | str = "text") -> Column:
    """MD5 fingerprint of whitespace-normalized, lower-cased text.

    Document-level fingerprint for normalization-insensitive exact dedup
    (a web-scale staple the reference's byte-exact hash can't express).
    SQL-parity-able: duckdb ``md5(lower(regexp_replace(trim(text),
    '\\s+', ' ', 'g')))``.
    """
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))
    return F.md5(normalized)
