"""CLI subprocess e2e — the reference's test_cli_args.py scenarios
(reference tests/test_cli_args.py:17-59) against the Spark CLI:
--help usage text, duplicate-group stdout, [would delete] in dry-run,
exclude filtering, plus the interactive reprompt loop.

Each test spawns a real ``python -m duplicate_finder_spark`` process
(own JVM, ~15 s), so scenarios are batched where the reference keeps
them separate.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)


def create_file(path: Path, content: str = "data") -> str:
    path.write_text(content)
    return str(path)


def run_cli(*args: str, input_text: str | None = None
            ) -> subprocess.CompletedProcess:
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, "-m", "duplicate_finder_spark", *args],
        capture_output=True, input=input_text, text=True,
        env=env, cwd=REPO, timeout=180)


def test_help_shows_usage() -> None:
    result = run_cli("--help")
    assert result.returncode == 0
    assert "usage" in result.stdout.lower()
    # reference-parity flags all present in the help text
    for flag in ("--include", "--exclude", "--min-size", "--max-size",
                 "--delete", "--dry-run", "--interactive", "--threads",
                 "--sort-by-group-size", "--sort-by-file-size",
                 "--verify-content", "--delete-report", "--output"):
        assert flag in result.stdout


def test_find_duplicates_in_cli(tmp_path: Path) -> None:
    create_file(tmp_path / "a.txt", "dupe")
    create_file(tmp_path / "b.txt", "dupe")
    result = run_cli(str(tmp_path), "--threads", "2")
    assert result.returncode == 0
    assert "Duplicate files" in result.stdout
    assert "Group 1/1 (2 file(s)" in result.stdout
    assert str(tmp_path / "a.txt") in result.stdout


def test_dry_run_output_and_reports(tmp_path: Path) -> None:
    create_file(tmp_path / "x1.txt", "dupe")
    create_file(tmp_path / "x2.txt", "dupe")
    out = tmp_path / "dups.txt"
    rep = tmp_path / "deleted.txt"
    result = run_cli(str(tmp_path), "--delete", "--dry-run",
                     "--output", str(out), "--delete-report", str(rep),
                     "--threads", "2")
    assert result.returncode == 0
    assert "[would delete]" in result.stdout
    assert "Total possible deletions: 1" in result.stdout
    # nothing actually deleted in dry-run
    assert (tmp_path / "x1.txt").exists() and (tmp_path / "x2.txt").exists()
    # K2 report file, reference byte format
    report = out.read_text()
    assert report.startswith("Duplicate files:\n")
    assert "(2 file(s), size: 4 bytes):" in report
    # K3 deletion report
    assert "[would delete]" in rep.read_text()


def test_exclude_via_cli(tmp_path: Path) -> None:
    create_file(tmp_path / "keep.txt", "abc")
    create_file(tmp_path / "skip.log", "abc")
    result = run_cli(str(tmp_path), "--exclude", "*.log", "--threads", "2")
    assert result.returncode == 0
    assert "Duplicate files" not in result.stdout


def test_interactive_reprompt_and_keep_choice(tmp_path: Path) -> None:
    create_file(tmp_path / "a.txt", "dupe")
    create_file(tmp_path / "b.txt", "dupe")
    # invalid input first → reprompt; then keep [2] → a.txt deleted
    result = run_cli(str(tmp_path), "--interactive", "--threads", "2",
                     input_text="zz\n2\n")
    assert result.returncode == 0
    assert "Invalid input. Please enter a number from the list." \
        in result.stdout
    assert f"Deleted: {tmp_path / 'a.txt'}" in result.stdout
    assert not (tmp_path / "a.txt").exists()
    assert (tmp_path / "b.txt").exists()
    assert "Total deleted interactively: 1" in result.stdout


def test_warc_mode_dedup(spark, tmp_path: Path) -> None:
    """--format warc: Common-Crawl-style ingestion — text is extracted
    from the archives' html and deduped; survivors land in parquet."""
    from tests.test_sources_warc import _response

    seg = tmp_path / "segs"
    seg.mkdir()
    html = b"<html><body>same text</body></html>"
    (seg / "a.warc").write_bytes(
        _response(b"http://a.example/", html)
        + _response(b"http://b.example/", html))
    (seg / "b.warc").write_bytes(
        _response(b"http://c.example/", b"<html>unique</html>"))

    result = run_cli(str(seg), "--format", "warc", "--delete",
                     "--threads", "2", input_text="y\n")
    assert result.returncode == 0, result.stderr[-2000:]
    assert "Duplicate files" in result.stdout
    assert "Deleted: http://b.example/" in result.stdout

    out = spark.read.parquet(str(seg) + "__dedup")
    assert sorted(r["url"] for r in out.collect()) == [
        "http://a.example/", "http://c.example/"]


def test_interactive_parquet_rewrites_survivors(spark, tmp_path: Path) -> None:
    """ADVICE r2: interactive 'deletion' on table input must actually
    rewrite survivors (it used to be a silent no-op that reported
    success)."""
    rows = [("u1", "same text"), ("u2", "same text"), ("u3", "unique")]
    src = str(tmp_path / "pages")
    spark.createDataFrame(rows, "url string, text string") \
        .write.parquet(src)

    # keep member [2] (u2) → u1 deleted
    result = run_cli(src, "--format", "parquet", "--interactive",
                     "--threads", "2", input_text="2\n")
    assert result.returncode == 0, result.stderr[-2000:]
    assert "Deleted: u1" in result.stdout
    assert f"Survivors written to: {src}__dedup" in result.stdout
    out = spark.read.parquet(src + "__dedup")
    assert sorted(r["url"] for r in out.collect()) == ["u2", "u3"]
    assert spark.read.parquet(src).count() == 3  # input untouched


def test_max_groups_caps_report(tmp_path: Path) -> None:
    """--max-groups N collects only the first N groups and banners the
    elision; without the flag output is uncapped (reference parity)."""
    for i in range(4):
        create_file(tmp_path / f"a{i}.txt", f"dupe-{i}")
        create_file(tmp_path / f"b{i}.txt", f"dupe-{i}")
    result = run_cli(str(tmp_path), "--max-groups", "2", "--threads", "2")
    assert result.returncode == 0
    assert "(showing first 2 of 4 groups" in result.stdout
    assert "Group 1/2" in result.stdout and "Group 2/2" in result.stdout
    assert "Group 3" not in result.stdout
    # uncapped: all four groups, no banner
    result2 = run_cli(str(tmp_path), "--threads", "2")
    assert "showing first" not in result2.stdout
    assert "Group 4/4" in result2.stdout


def test_missing_and_corrupt_paths(tmp_path: Path) -> None:
    """ADVICE r2: not-a-dir prints the reference's explicit ERROR and
    exits clean; a genuinely corrupt input propagates with a nonzero
    exit instead of masquerading as an empty scan."""
    missing = tmp_path / "nope"
    result = run_cli(str(missing), "--threads", "2")
    assert result.returncode == 0
    assert "is not a folder or doesn't exist" in result.stdout
    assert "No files found or all files are excluded." in result.stdout

    # corrupt parquet table → real failure, nonzero exit
    bad = tmp_path / "badtable"
    bad.mkdir()
    (bad / "part-0.parquet").write_bytes(b"this is not parquet data")
    result2 = run_cli(str(bad), "--format", "parquet", "--threads", "2")
    assert result2.returncode != 0
    assert "No files found" not in result2.stdout


def test_checkpoint_dir_resumes_clusters(tmp_path: Path) -> None:
    """--checkpoint-dir makes the CLI's hash-cluster stage resumable:
    run 2 over the same scan reads the warehouse stage (manifest
    untouched) instead of re-hashing."""
    import json

    scan = tmp_path / "scan"
    scan.mkdir()
    create_file(scan / "a.txt", "dupe")
    create_file(scan / "b.txt", "dupe")
    wh = tmp_path / "wh"   # outside the scanned folder
    r1 = run_cli(str(scan), "--checkpoint-dir", str(wh),
                 "--threads", "2")
    assert r1.returncode == 0 and "Group 1/1" in r1.stdout
    assert "Resumed hash clusters" not in r1.stdout
    tables = [d for d in wh.iterdir() if d.name.startswith("cli_clusters_")]
    assert len(tables) == 1
    snap = next(d for d in tables[0].iterdir()
                if d.name.startswith("snapshot-"))
    before = json.loads((snap / "manifest.json").read_text())["written_at"]

    r2 = run_cli(str(scan), "--checkpoint-dir", str(wh),
                 "--threads", "2")
    assert r2.returncode == 0 and "Group 1/1" in r2.stdout
    assert "Resumed hash clusters from checkpoint." in r2.stdout
    after = json.loads((snap / "manifest.json").read_text())["written_at"]
    assert after == before, "stage must be read, not recomputed"

    # membership change (new file) invalidates the checkpoint
    create_file(scan / "c.txt", "dupe")
    r3 = run_cli(str(scan), "--checkpoint-dir", str(wh),
                 "--threads", "2")
    assert r3.returncode == 0
    assert "Resumed hash clusters" not in r3.stdout
    assert "Group 1/1 (3 file(s)" in r3.stdout

    # CONTENT edit in place (same file set) also invalidates: the files
    # probe folds in sum(length) + max(modificationTime) from the
    # binaryFile listing, so a rerun must NOT serve the stale clusters
    # (which, with --delete, could remove a file that is no longer a
    # duplicate)
    import os
    import time as _time
    (scan / "c.txt").write_text("no longer a dupe")
    future = _time.time() + 5
    os.utime(scan / "c.txt", (future, future))  # robust to coarse mtime
    r4 = run_cli(str(scan), "--checkpoint-dir", str(wh),
                 "--threads", "2")
    assert r4.returncode == 0
    assert "Resumed hash clusters" not in r4.stdout
    assert "Group 1/1 (2 file(s)" in r4.stdout


def test_parquet_mode_survivor_rewrite(spark, tmp_path: Path) -> None:
    """--format parquet: the web-scale path — dedups a pages table and
    writes survivors to <folder>__dedup instead of mutating input."""
    rows = [("u1", "same text"), ("u2", "same text"), ("u3", "unique")]
    src = str(tmp_path / "pages")
    spark.createDataFrame(rows, "url string, text string") \
        .write.parquet(src)

    result = run_cli(src, "--format", "parquet", "--delete",
                     "--threads", "2", input_text="y\n")
    assert result.returncode == 0, result.stderr[-2000:]
    assert "Duplicate files" in result.stdout
    assert "Deleted: u2" in result.stdout
    assert f"Survivors written to: {src}__dedup" in result.stdout

    out = spark.read.parquet(src + "__dedup")
    assert sorted(r["url"] for r in out.collect()) == ["u1", "u3"]
    # input untouched
    assert spark.read.parquet(src).count() == 3
