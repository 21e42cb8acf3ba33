"""CLI argument surface — flag-for-flag parity with the reference
(`/root/reference/duplicate_finder/cli_args.py:18-130`), plus the
Spark-only knobs the engine needs (table format, master override,
checkpoint dir, group cap). ``--threads/-j`` maps to local-mode cores
and ``spark.sql.shuffle.partitions`` instead of a thread pool
(reference ``threads_count``, duplicate_finder_config.py:186-199).

The FLAG NAMES and semantics are the shared public contract; the help
prose here is this engine's own wording.
"""

from __future__ import annotations

import argparse


class ArgumentParserAdapter:
    def __init__(self) -> None:
        self.parser = argparse.ArgumentParser(
            prog="duplicate-finder-spark",
            description="Find (and optionally remove) duplicate content"
                        " with a Spark-backed pipeline",
            formatter_class=argparse.RawTextHelpFormatter,
        )
        self._add_arguments()

    def _add_arguments(self) -> None:
        p = self.parser
        p.add_argument(
            "folder_path",
            type=str,
            help="Directory (or table path, see --format) to scan.",
        )

        sort_group = p.add_mutually_exclusive_group()
        sort_group.add_argument(
            "--sort-by-group-size", "-g",
            action="store_true",
            help="Order the report by member count per group, largest"
                 " groups first",
        )
        sort_group.add_argument(
            "--sort-by-file-size", "-s",
            action="store_true",
            help="Order the report by byte size, biggest entries first",
        )

        p.add_argument(
            "--output", "-o",
            type=str,
            help="Write the duplicate-group report to this file as well"
                 " as stdout",
        )
        p.add_argument(
            "--exclude", "-e",
            type=str,
            nargs="*",
            default=[],
            help="Glob pattern(s); any path matching one is dropped AFTER\n"
                 "includes are applied (full-path Unix-style matching,\n"
                 "e.g. '*.log' or '**/.git/**').",
        )
        p.add_argument(
            "--include", "-i",
            type=str,
            nargs="*",
            default=[],
            help="Glob pattern(s); when given, only paths matching at\n"
                 "least one are scanned (full-path Unix-style matching).",
        )
        p.add_argument(
            "--delete", "-d",
            action="store_true",
            help="Remove every duplicate except the first member of each"
                 " group",
        )
        p.add_argument(
            "--delete-report", "-r",
            type=str,
            help="Record each deletion (or failure) into this file",
        )
        p.add_argument(
            "--dry-run", "-n",
            action="store_true",
            help="Preview what --delete would remove; nothing is touched",
        )
        p.add_argument(
            "--interactive", "-t",
            action="store_true",
            help="Prompt per group: pick the member to keep, the rest are"
                 " removed",
        )
        p.add_argument(
            "--threads", "-j",
            type=int,
            default=None,
            help="Parallelism: local-mode cores and shuffle partitions"
                 " (auto when omitted)",
        )
        p.add_argument(
            "--min-size", "-m",
            type=str,
            default=None,
            help="Ignore content smaller than this (accepts 100K / 5M /"
                 " 1G style values)",
        )
        p.add_argument(
            "--max-size", "-x",
            type=str,
            default=None,
            help="Ignore content larger than this (accepts 100K / 5M /"
                 " 1G style values)",
        )
        p.add_argument(
            "--verify-content", "-v",
            action="store_true",
            help="Byte-compare members before reporting (the Spark engine"
                 " always groups\nby full SHA-256 of the exact bytes, so"
                 " this is implied — kept for parity)",
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
        p.add_argument(
            "--max-groups",
            type=int,
            default=None,
            help="Cap the number of duplicate groups collected to the"
                 " driver for the report\n(shows the first N under the"
                 " selected ordering; deletion then applies to\nthose N"
                 " only). Default: unlimited, like the reference",
        )

    def parse(self, argv: list[str] | None = None) -> argparse.Namespace:
        return self.parser.parse_args(argv)
