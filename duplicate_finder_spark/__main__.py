"""``python -m duplicate_finder_spark`` — the reference's primary
lifecycle (``python -m duplicate_finder``, reference __main__.py:12)
over the Spark engine."""

from __future__ import annotations

import sys

from duplicate_finder_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
