"""CLI argument surface — flag-for-flag parity with the reference
(`/root/reference/duplicate_finder/cli_args.py:18-130`), plus the
Spark-only knobs the engine needs (table format, master override,
checkpoint dir). ``--threads/-j`` maps to local-mode cores and
``spark.sql.shuffle.partitions`` instead of a thread pool
(reference ``threads_count``, duplicate_finder_config.py:186-199).
"""

from __future__ import annotations

import argparse


class ArgumentParserAdapter:
    def __init__(self) -> None:
        self.parser = argparse.ArgumentParser(
            prog="duplicate-finder-spark",
            description="Script to find and delete duplicates of the files",
            formatter_class=argparse.RawTextHelpFormatter,
        )
        self._add_arguments()

    def _add_arguments(self) -> None:
        p = self.parser
        p.add_argument(
            "folder_path",
            type=str,
            help="Mandatory parameter: "
                 "path to folder for searching duplicates.",
        )

        sort_group = p.add_mutually_exclusive_group()
        sort_group.add_argument(
            "--sort-by-group-size", "-g",
            action="store_true",
            help="Optional: Sort duplicate groups by number"
                 " of files in group (descending)",
        )
        sort_group.add_argument(
            "--sort-by-file-size", "-s",
            action="store_true",
            help="Optional: Sort duplicate groups by file size (descending)",
        )

        p.add_argument(
            "--output", "-o",
            type=str,
            help="Optional: path to output file (e.g., duplicates.txt)",
        )
        p.add_argument(
            "--exclude", "-e",
            type=str,
            nargs="*",
            default=[],
            help="Optional: list of exclude patterns (supports wildcards).\n"
                 "Unix-style glob syntax, matched against full paths.",
        )
        p.add_argument(
            "--include", "-i",
            type=str,
            nargs="*",
            default=[],
            help="Optional: list of include patterns (supports wildcards).\n"
                 "Unix-style glob syntax, matched against full paths.",
        )
        p.add_argument(
            "--delete", "-d",
            action="store_true",
            help="Optional: delete duplicate files (keep first file in group)",
        )
        p.add_argument(
            "--delete-report", "-r",
            type=str,
            help="Optional: path to report file where deleted"
                 " file paths will be saved",
        )
        p.add_argument(
            "--dry-run", "-n",
            action="store_true",
            help="Optional: No action. Show a list of files to be deleted"
                 " without actually deleting them",
        )
        p.add_argument(
            "--interactive", "-t",
            action="store_true",
            help="Optional: interactive mode (talk),"
                 " select files to delete group by group",
        )
        p.add_argument(
            "--threads", "-j",
            type=int,
            default=None,
            help="Optional: parallelism (local-mode cores + shuffle"
                 " partitions). Dynamically adjusted by default",
        )
        p.add_argument(
            "--min-size", "-m",
            type=str,
            default=None,
            help="Optional: Minimum file size to consider for"
                 " duplicate detection (e.g. 100K, 5M, 1G)",
        )
        p.add_argument(
            "--max-size", "-x",
            type=str,
            default=None,
            help="Optional: Maximum file size to consider for"
                 " duplicate detection (e.g. 100K, 5M, 1G)",
        )
        p.add_argument(
            "--verify-content", "-v",
            action="store_true",
            help="Optional: Compare files byte by byte to verify"
                 " they are identical (default is to compare file sizes only)",
        )

        # --- engine-only flags (no reference counterpart) -------------------
        p.add_argument(
            "--format",
            choices=("files", "parquet", "warc"),
            default="files",
            help="Input kind: 'files' walks folder_path as real files"
                 " (Spark binaryFile source); 'parquet' reads a pages"
                 " table (url, text) — the web-scale path; 'warc' reads"
                 " Common-Crawl-style web archives (.warc / .warc.gz)",
        )
        p.add_argument(
            "--master",
            type=str,
            default=None,
            help="Spark master override (default local[<threads>])",
        )
        p.add_argument(
            "--checkpoint-dir",
            type=str,
            default=None,
            help="Warehouse root for resumable stage checkpoints",
        )

    def parse(self, argv: list[str] | None = None) -> argparse.Namespace:
        return self.parser.parse_args(argv)
