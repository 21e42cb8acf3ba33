"""Scalar parity tables ported from the reference test contract
(/root/reference/tests/test_utils.py:45-122 and
tests/test_duplicate_finder_config.py:59-63)."""

import pytest

from duplicate_finder_spark.config import (PipelineConfig, humanize_size,
                                           normalize_parallelism,
                                           normalize_patterns, parse_size,
                                           validate_size_str)


@pytest.mark.parametrize("s, expected", [
    ("1B", 1), ("1K", 1000), ("1KB", 1000),
    ("1M", 1000**2), ("1MB", 1000**2),
    ("1G", 1000**3), ("1GB", 1000**3),
    ("1T", 1000**4), ("1TB", 1000**4),
    ("1Ki", 1024), ("1KiB", 1024),
    ("1Mi", 1024**2), ("1MiB", 1024**2),
    ("1Gi", 1024**3), ("1GiB", 1024**3),
    ("1Ti", 1024**4), ("1TiB", 1024**4),
    ("123", 123),
    ("  2.5 MB ", int(2.5 * 1000**2)),
    ("10mb", 10 * 1000**2),
])
def test_parse_size_valid(s, expected):
    assert parse_size(s) == expected


@pytest.mark.parametrize("s", ["abc", "10XB", "1.2.3GB", "MB", ".", ""])
def test_parse_size_invalid(s):
    with pytest.raises(ValueError):
        parse_size(s)


@pytest.mark.parametrize("n, expected", [
    (0, "0 B"), (1, "1 B"), (512, "512 B"), (1023, "1023 B"),
    (1024, "1.0 KB"), (1536, "1.5 KB"),
    (1024**2, "1.0 MB"), (1.5 * 1024**2, "1.5 MB"),
    (1024**3, "1.0 GB"), (1024**4, "1.0 TB"), (1024**5, "1.0 PB"),
])
def test_humanize_valid(n, expected):
    assert humanize_size(n) == expected


@pytest.mark.parametrize("bad", [None, -1, "100", [1024], {"bytes": 1024}])
def test_humanize_invalid(bad):
    assert humanize_size(bad) == "Invalid size"


def test_strict_layer_rejects_unit_without_b():
    # U2/U6 divergence: "10M" fine for parse_size, rejected by config layer
    assert parse_size("10M") == 10 * 1000**2
    with pytest.raises(ValueError):
        validate_size_str("10M")
    assert validate_size_str("10MB") == 10 * 1000**2
    assert validate_size_str(None) is None


def test_parallelism_defaulting():
    import os
    expected = min(32, os.cpu_count() or 8)
    assert normalize_parallelism(None) == expected
    assert normalize_parallelism(0) == expected
    assert normalize_parallelism(-5) == expected
    assert normalize_parallelism(16) == 16
    assert normalize_parallelism(64) == 64  # allowed, reference only warns


def test_pattern_normalization():
    assert normalize_patterns(None) is None
    assert normalize_patterns([" *.html ", "", "  "]) == ["*.html"]


def test_pipeline_config_normalizes():
    cfg = PipelineConfig(min_size_str="1KiB", max_size_str=" 2.5 MB ",
                         include_patterns=[" */p/* "],
                         sort_by_group_size=True, sort_by_file_size=True)
    assert cfg.min_size == 1024
    assert cfg.max_size == int(2.5e6)
    assert cfg.include_patterns == ["*/p/*"]
    assert cfg.sort_by_group_size and not cfg.sort_by_file_size  # O3
    assert cfg.rows_per_band == cfg.num_perm // cfg.lsh_bands


def test_pipeline_config_bad_bands():
    with pytest.raises(ValueError):
        PipelineConfig(num_perm=100, lsh_bands=16)
