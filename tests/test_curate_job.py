"""jobs/curate.py lifecycle: the curation funnel runs via real
``spark-submit --py-files``, checkpoints every stage through the
warehouse, emits the JSON funnel summary, and a rerun resumes every
stage from the checkpoints."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="no spark-submit on PATH")
def test_spark_submit_curate_job(spark, tmp_path: Path) -> None:
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    inp = str(tmp_path / "docs")
    docs.write.parquet(inp)

    # SemDeDup embedding side-table: sha-derived unit-unique directions
    # (max accidental pairwise cosine ≈ 0.875 — measured) plus planted
    # scale-collinear partners: doc i%25==1 duplicates doc i-1 exactly
    import hashlib

    def _vec(i: int) -> list[float]:
        if i % 25 == 1:
            return [2.0 * x for x in _vec(i - 1)]
        return [int(hashlib.sha256(f"{i}:{d}".encode())
                    .hexdigest()[:8], 16) / 2 ** 31 - 1.0
                for d in range(16)]

    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    emb_path = str(tmp_path / "emb")
    spark.createDataFrame([(i, _vec(i)) for i in ids],
                          "vec_id long, embedding array<double>") \
        .write.parquet(emb_path)
    n_planted = sum(1 for i in ids if i % 25 == 1 and (i - 1) in set(ids))

    # DSIR target sample: the fr-language docs
    tgt_path = str(tmp_path / "target")
    docs.filter("lang = 'fr'").select("doc_id", "text") \
        .write.parquet(tgt_path)

    sys.path.insert(0, str(REPO / "tools"))
    from make_pyfiles_zip import build_zip
    zip_path = build_zip(tmp_path)
    wh = str(tmp_path / "wh")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # engine must come from --py-files only

    def submit() -> dict:
        res = subprocess.run(
            [SPARK_SUBMIT, "--master", "local[4]",
             "--conf", "spark.sql.shuffle.partitions=4",
             "--conf", "spark.ui.enabled=false",
             "--py-files", str(zip_path),
             str(REPO / "jobs" / "curate.py"),
             "--input", inp, "--warehouse", wh,
             "--eval-mod", "50", "--eval-rem", "7",
             "--exact-substr-len", "30",
             "--embeddings", emb_path, "--semantic-threshold", "0.95",
             "--semantic-cells", "16",
             "--sample-strata", "lang", "--sample-budget", "3000",
             "--dsir-target", tgt_path, "--dsir-k", "100",
             "--input-id", "docs-v1"],
            capture_output=True, text=True, env=env,
            cwd=str(tmp_path), timeout=420)
        assert res.returncode == 0, res.stderr[-3000:]
        line = [ln for ln in res.stdout.splitlines()
                if ln.startswith("{")][-1]
        return json.loads(line)

    first = submit()
    stages = [s["stage"] for s in first["funnel"]]
    assert stages == ["quality", "decontaminated", "para_deduped",
                      "exact_substr", "semantic_deduped", "sampled",
                      "dsir_selected"]
    rows = [s["rows"] for s in first["funnel"]]
    # monotone funnel, every stage load-bearing on this corpus
    assert all(a >= b for a, b in zip(rows, rows[1:])), rows
    assert rows[-1] > 0
    assert first["rows"] == rows[-1]
    assert not any(s["resumed"] for s in first["funnel"])
    # semantic stage removed at most one member per planted pair and
    # strictly fewer rows than its input (the plants are load-bearing)
    semantic_removed = rows[3] - rows[4]
    assert 0 < semantic_removed <= n_planted
    # DSIR is a hard top-k fence
    assert rows[-1] == min(100, rows[-2])

    second = submit()
    assert [s["rows"] for s in second["funnel"]] == rows
    assert all(s["resumed"] for s in second["funnel"])
    assert second["rows"] == first["rows"]


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="no spark-submit on PATH")
def test_curate_job_host_cap_and_pii(spark, tmp_path: Path) -> None:
    """--max-per-host runs the skew-bounded cap as the first stage and
    --redact-pii replaces identifiers in the surviving text as the
    last; both show up in the funnel metrics and the curated output."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .withColumn("url", F.format_string(
                "https://h%02d.example/%06d",
                (F.col("doc_id") % 20).cast("int"), F.col("doc_id")))
            .withColumn("text", F.when(
                F.col("doc_id") % 5 == 0,
                F.concat("text", F.lit(" ping admin@mail.example now")))
                .otherwise(F.col("text"))))
    inp = str(tmp_path / "docs")
    docs.write.parquet(inp)

    sys.path.insert(0, str(REPO / "tools"))
    from make_pyfiles_zip import build_zip
    zip_path = build_zip(tmp_path)
    wh = str(tmp_path / "wh")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)

    res = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.ui.enabled=false",
         "--py-files", str(zip_path),
         str(REPO / "jobs" / "curate.py"),
         "--input", inp, "--warehouse", wh,
         "--eval-mod", "50", "--eval-rem", "7",
         "--url-col", "url", "--max-per-host", "10",
         "--redact-pii", "--input-id", "docs-v2"],
        capture_output=True, text=True, env=env,
        cwd=str(tmp_path), timeout=420)
    assert res.returncode == 0, res.stderr[-3000:]
    out = json.loads([ln for ln in res.stdout.splitlines()
                      if ln.startswith("{")][-1])
    stages = [s["stage"] for s in out["funnel"]]
    assert stages == ["host_capped", "quality", "decontaminated",
                      "para_deduped", "pii_redacted"]

    # the cap stage kept exactly the naive window plan's winners
    train = docs.filter((F.col("doc_id") % 50) != 7)
    w = Window.partitionBy(F.regexp_extract(
        F.lower("url"), r"^[a-z][a-z0-9+.-]*://([^/?#:]+)", 1)) \
        .orderBy("url")
    expected_capped = (train.withColumn("_r", F.row_number().over(w))
                       .filter(F.col("_r") <= 10).count())
    assert out["funnel"][0]["rows"] == expected_capped

    # surviving text carries the token, never the raw identifier
    from duplicate_finder_spark.warehouse import get_warehouse
    curated = get_warehouse(spark, wh).read("curated")
    assert curated.filter(
        F.col("text").contains("admin@mail.example")).count() == 0
    assert curated.filter(F.col("text").contains("<EMAIL>")).count() > 0


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="no spark-submit on PATH")
def test_curate_job_tokenizer_and_mixture_artifacts(spark,
                                                    tmp_path: Path) -> None:
    """--bpe-merges and --mix-alpha append the training artifacts after
    curation: the bpe_merges/bpe_vocab/mixture tables land in the
    warehouse, match the in-process library computation, and the
    funnel row counts are untouched by either artifact stage."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    inp = str(tmp_path / "docs")
    docs.write.parquet(inp)

    sys.path.insert(0, str(REPO / "tools"))
    from make_pyfiles_zip import build_zip
    zip_path = build_zip(tmp_path)
    wh_dir = str(tmp_path / "wh")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)

    res = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.ui.enabled=false",
         "--py-files", str(zip_path),
         str(REPO / "jobs" / "curate.py"),
         "--input", inp, "--warehouse", wh_dir,
         "--eval-mod", "50", "--eval-rem", "7",
         "--bpe-merges", "3", "--bpe-checkpoint-every", "2",
         "--mix-alpha", "0.7", "--mix-budget", "100000",
         "--input-id", "docs-v4"],
        capture_output=True, text=True, env=env,
        cwd=str(tmp_path), timeout=420)
    assert res.returncode == 0, res.stderr[-3000:]
    out = json.loads([ln for ln in res.stdout.splitlines()
                      if ln.startswith("{")][-1])
    stages = [s["stage"] for s in out["funnel"]]
    assert stages == ["quality", "decontaminated", "para_deduped",
                      "bpe_merges", "bpe_vocab", "mixture"]
    by = {s["stage"]: s["rows"] for s in out["funnel"]}
    assert by["bpe_merges"] == 3
    assert by["bpe_vocab"] > 3          # alphabet + merges
    # curated rows come from the last FILTER stage, not the artifacts
    assert out["rows"] == by["para_deduped"]

    # artifact tables equal the in-process computation on the survivors
    from duplicate_finder_spark.operators.bpe import bpe_train, word_counts
    from duplicate_finder_spark.operators.mixture import mixture_weights
    from duplicate_finder_spark.warehouse import get_warehouse
    wh = get_warehouse(spark, wh_dir)
    curated = wh.read("curated").select("doc_id", "text")
    want_merges = sorted(map(tuple, bpe_train(
        word_counts(curated), 3).collect()))
    fp = [t for t in wh.tables() if t.startswith("bpe_merges_")]
    got_merges = sorted(map(tuple, wh.read(fp[0]).collect()))
    assert got_merges == want_merges
    mix_t = [t for t in wh.tables() if t.startswith("mixture_")]
    got_mix = sorted(map(tuple, wh.read(mix_t[0]).collect()))
    want_mix = sorted(map(tuple, mixture_weights(
        curated.join(docs.select("doc_id", "source"), "doc_id"),
        0.7, 100000).collect()))
    assert got_mix == want_mix and len(got_mix) > 1


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="no spark-submit on PATH")
def test_curate_job_blocklist_stages(spark, tmp_path: Path) -> None:
    """--domain-blocklist drops blocked hosts (subdomain-suffix
    semantics) as the first stage; --badwords drops docs containing a
    listed token after the quality gate; both counts match the
    in-process library composition."""
    from pyspark.sql import functions as F

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .withColumn("url", F.format_string(
                "https://%ssite%02d.example/%06d",
                F.when(F.col("doc_id") % 2 == 0, F.lit("cdn."))
                 .otherwise(F.lit("")),
                (F.col("doc_id") % 20).cast("int"), F.col("doc_id"))))
    inp = str(tmp_path / "docs")
    docs.write.parquet(inp)
    bl_path = str(tmp_path / "bl")
    spark.createDataFrame([("site03.example",), ("site11.example",)],
                          "domain string").write.parquet(bl_path)
    bw_path = str(tmp_path / "bw")
    spark.createDataFrame([("slow",)], "word string") \
        .write.parquet(bw_path)

    sys.path.insert(0, str(REPO / "tools"))
    from make_pyfiles_zip import build_zip
    zip_path = build_zip(tmp_path)
    wh_dir = str(tmp_path / "wh")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)

    res = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.ui.enabled=false",
         "--py-files", str(zip_path),
         str(REPO / "jobs" / "curate.py"),
         "--input", inp, "--warehouse", wh_dir,
         "--eval-mod", "50", "--eval-rem", "7",
         "--url-col", "url", "--domain-blocklist", bl_path,
         "--badwords", bw_path, "--input-id", "docs-v5"],
        capture_output=True, text=True, env=env,
        cwd=str(tmp_path), timeout=420)
    assert res.returncode == 0, res.stderr[-3000:]
    out = json.loads([ln for ln in res.stdout.splitlines()
                      if ln.startswith("{")][-1])
    stages = {s["stage"]: s["rows"] for s in out["funnel"]}
    assert [s["stage"] for s in out["funnel"]] == [
        "domain_blocked", "quality", "badword_filtered",
        "decontaminated", "para_deduped"]

    from duplicate_finder_spark.operators.blocklist import (
        badword_filter, domain_blocklist_filter)
    from duplicate_finder_spark.operators.curation import quality_gate
    train = docs.filter((F.col("doc_id") % 50) != 7)
    bl = spark.createDataFrame([("site03.example",), ("site11.example",)],
                               "domain string")
    blocked = domain_blocklist_filter(
        train.select("doc_id", "text", "url"), bl) \
        .filter(F.col("blocked_by").isNull())
    n_blocked = blocked.count()
    assert stages["domain_blocked"] == n_blocked < train.count()
    q = quality_gate(blocked.select("doc_id", "text"), 20, 0.07, 2)
    bw = spark.createDataFrame([("slow",)], "word string")
    n_bw = badword_filter(q, bw).filter(F.col("n_badwords") == 0).count()
    assert stages["badword_filtered"] == n_bw < stages["quality"]


def test_domain_blocklist_requires_url_col(tmp_path: Path) -> None:
    sys.path.insert(0, str(REPO / "jobs"))
    import curate
    assert curate.main(["--input", "x", "--warehouse", "y",
                        "--eval-mod", "10",
                        "--domain-blocklist", "bl"]) == 2


def test_mix_alpha_validation(tmp_path: Path) -> None:
    sys.path.insert(0, str(REPO / "jobs"))
    import curate
    assert curate.main(["--input", "x", "--warehouse", "y",
                        "--eval-mod", "10", "--mix-alpha", "0.5"]) == 2
    assert curate.main(["--input", "x", "--warehouse", "y",
                        "--eval-mod", "10", "--mix-alpha", "1.5",
                        "--mix-budget", "10"]) == 2


def test_eval_split_flags_are_exclusive(tmp_path: Path) -> None:
    sys.path.insert(0, str(REPO / "jobs"))
    import curate
    assert curate.main(["--input", "x", "--warehouse", "y"]) == 2
    assert curate.main(["--input", "x", "--warehouse", "y",
                        "--eval-input", "e", "--eval-mod", "10"]) == 2


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="no spark-submit on PATH")
def test_curate_job_gopher_and_lm_gates(spark, tmp_path: Path) -> None:
    """--gopher-rules and --lm-target slot the Table A1 gate and the
    perplexity gate between quality and decontamination; each stage's
    row count equals the library composition run in-process."""
    from pyspark.sql import functions as F

    from duplicate_finder_spark.operators.curation import quality_gate
    from duplicate_finder_spark.operators.gopherquality import (
        gopher_filter)
    from duplicate_finder_spark.operators.lm import lm_score

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    inp = str(tmp_path / "docs")
    tgt = str(tmp_path / "target")
    docs.write.parquet(inp)
    docs.filter(F.col("lang") == "fr").write.parquet(tgt)

    sys.path.insert(0, str(REPO / "tools"))
    from make_pyfiles_zip import build_zip
    zip_path = build_zip(tmp_path)
    wh = str(tmp_path / "wh")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    nll_max = 7_950_000   # ~p70 at sf0.001 — the gate drops the tail

    res = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.ui.enabled=false",
         "--py-files", str(zip_path),
         str(REPO / "jobs" / "curate.py"),
         "--input", inp, "--warehouse", wh,
         "--eval-mod", "50", "--eval-rem", "7",
         "--gopher-rules", "--gopher-min-words", "20",
         "--gopher-min-stopwords", "1",
         "--lm-target", tgt, "--lm-max-mean-nll", str(nll_max),
         "--input-id", "docs-v3"],
        capture_output=True, text=True, env=env,
        cwd=str(tmp_path), timeout=420)
    assert res.returncode == 0, res.stderr[-3000:]
    out = json.loads([ln for ln in res.stdout.splitlines()
                      if ln.startswith("{")][-1])
    stages = {s["stage"]: s["rows"] for s in out["funnel"]}
    assert [s["stage"] for s in out["funnel"]] == [
        "quality", "gopher_rules", "lm_filtered", "decontaminated",
        "para_deduped"]

    train = docs.filter((F.col("doc_id") % 50) != 7) \
                .select("doc_id", "text")
    q = quality_gate(train, 20, 0.07, 2)
    g = gopher_filter(q, min_words=20, min_required_hits=1)
    kept = (lm_score(g, docs.filter(F.col("lang") == "fr")
                     .select("doc_id", "text"), 1 << 14)
            .filter(F.col("mean_nll_micro") <= nll_max))
    nq, ng, nl = q.count(), g.count(), kept.count()
    assert (stages["quality"], stages["gopher_rules"],
            stages["lm_filtered"]) == (nq, ng, nl)
    # the LM gate is load-bearing at sf0.001 (the gopher gate's drops
    # are corpus-dependent — oracled at sf0.01 via curation_funnel_full)
    assert nq >= ng > nl > 0


def test_lm_target_requires_threshold(tmp_path: Path) -> None:
    sys.path.insert(0, str(REPO / "jobs"))
    import curate
    assert curate.main(["--input", "x", "--warehouse", "y",
                        "--eval-mod", "10", "--lm-target", "t"]) == 2


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="no spark-submit on PATH")
def test_curate_job_line_dedup_and_softdedup(spark, tmp_path: Path) -> None:
    """--dedup-lines strips within-doc repeated lines before paragraph
    dedup and --softdedup-weights writes the 1/multiplicity artifact
    table over the surviving corpus; both show in the funnel."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # plant a repeated banner line inside every doc and an exact text
    # clone for every doc_id % 10 == 1
    banner = "SUBSCRIBE TO OUR NEWSLETTER TODAY."
    planted = docs.select(
        "doc_id",
        F.concat(F.lit(banner + "\n"), F.col("text"),
                 F.lit("\n" + banner)).alias("text"))
    clones = (planted.filter(F.col("doc_id") % 10 == 1)
              .select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                      "text"))
    inp = str(tmp_path / "docs")
    planted.unionByName(clones).write.parquet(inp)

    sys.path.insert(0, str(REPO / "tools"))
    from make_pyfiles_zip import build_zip
    zip_path = build_zip(tmp_path)
    wh = str(tmp_path / "wh")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)

    res = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.ui.enabled=false",
         "--py-files", str(zip_path),
         str(REPO / "jobs" / "curate.py"),
         "--input", inp, "--warehouse", wh,
         "--eval-mod", "50", "--eval-rem", "7",
         "--dedup-lines", "--softdedup-weights",
         "--input-id", "docs-v3"],
        capture_output=True, text=True, env=env,
        cwd=str(tmp_path), timeout=420)
    assert res.returncode == 0, res.stderr[-3000:]
    out = json.loads([ln for ln in res.stdout.splitlines()
                      if ln.startswith("{")][-1])
    stages = [s["stage"] for s in out["funnel"]]
    assert stages == ["quality", "decontaminated", "line_deduped",
                      "para_deduped", "softdedup"]

    from duplicate_finder_spark.warehouse import get_warehouse
    whh = get_warehouse(spark, wh)
    curated = whh.read("curated")
    # the duplicated banner survives exactly once per doc
    two_banners = curated.filter(
        F.size(F.filter(F.split("text", "\n"),
                        lambda ln: ln == banner)) > 1).count()
    assert two_banners == 0
    assert curated.filter(F.col("text").contains(banner)).count() > 0
    # softdedup artifact: one weight row per curated doc, and the
    # table matches a recompute over the CURATED corpus — i.e. the
    # stage ran over the funnel's final survivors, not an earlier
    # stage's rows (paragraph dedup upstream breaks exact clone
    # pairs, so multiplicity here reflects post-funnel content)
    soft_name = [t for t in whh.tables()
                 if t.startswith("softdedup_")][0]
    soft = whh.read(soft_name)
    assert soft.count() == curated.count()
    from duplicate_finder_spark.operators.sampling import \
        softdedup_weights as _sw
    expected = {r.doc_id: (r.dup_count, r.weight) for r in
                _sw(curated.select("doc_id", "text")).collect()}
    got = {r.doc_id: (r.dup_count, r.weight) for r in soft.collect()}
    assert got == expected
    assert all(0 < w <= 1 for _, w in got.values())
