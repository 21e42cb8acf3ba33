"""Unix-glob include/exclude predicates over the ``url`` column (F3/F4).

Parity: the reference matches POSIX full paths with ``fnmatch.fnmatch``
(duplicate_finder.py:151-164); include takes precedence over exclude
(duplicate_finder_config.py:36-38) — i.e. includes are applied first, then
excludes drop from the included set.

The glob is translated ONCE on the driver to a regex (fnmatch.translate)
and applied with ``rlike`` — a JVM-side, codegen'd predicate; no Python in
the scan path. ``fnmatch.translate`` emits Python-regex syntax
(``(?s:...)\\Z``) that Java's regex engine also accepts after mapping
``\\Z`` → ``$`` under DOTALL, which the rewrite below performs.
"""

from __future__ import annotations

import fnmatch

from pyspark.sql import Column
from pyspark.sql import functions as F


def glob_to_java_regex(pattern: str) -> str:
    """Translate a Unix glob to a regex valid in both Java and RE2-ish
    engines: anchored, dot-matches-newline."""
    rx = fnmatch.translate(pattern)  # e.g. '(?s:...)\\Z'
    if rx.endswith("\\Z"):
        rx = rx[:-2] + "$"
    # rlike is a CONTAINS match; fnmatch.fnmatch is re.match (anchored at
    # the start) — anchor explicitly or 'src1/*' would match 'xsrc1/a'
    return "^" + rx


def include_predicate(patterns: list[str] | None,
                      col: Column | str = "url") -> Column:
    """Row kept iff it matches ≥1 include glob; None → keep all."""
    c = F.col(col) if isinstance(col, str) else col
    if not patterns:
        return F.lit(True)
    pred = F.lit(False)
    for p in patterns:
        pred = pred | c.rlike(glob_to_java_regex(p))
    return pred


def exclude_predicate(patterns: list[str] | None,
                      col: Column | str = "url") -> Column:
    """Row kept iff it matches NO exclude glob; None → keep all."""
    c = F.col(col) if isinstance(col, str) else col
    if not patterns:
        return F.lit(True)
    pred = F.lit(True)
    for p in patterns:
        pred = pred & ~c.rlike(glob_to_java_regex(p))
    return pred
