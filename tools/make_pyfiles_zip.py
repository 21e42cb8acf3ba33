"""Build dist/duplicate_finder_spark.zip for ``spark-submit --py-files``
(SURVEY.md §3.4 lifecycle). Stdlib-only so it runs anywhere a standard
``python -m build`` wheel pipeline isn't available; the zip layout
(package dir at archive root) is exactly what zipimport / Spark's
PYTHONPATH shipping expects.

Usage: python tools/make_pyfiles_zip.py [out_dir]
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "duplicate_finder_spark"


def build_zip(out_dir: Path | str = REPO / "dist") -> Path:
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    out = out_dir / "duplicate_finder_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for py in sorted(PKG.rglob("*.py")):
            if "__pycache__" in py.parts:
                continue
            z.write(py, py.relative_to(REPO))
    return out


if __name__ == "__main__":
    target = build_zip(sys.argv[1]) if len(sys.argv) > 1 else build_zip()
    print(target)
