"""Unit tests for operators/curation.py (end-to-end curation funnel)."""

import pyspark.sql.functions as F

from duplicate_finder_spark.operators.curation import curation_funnel


def _run(spark, rows, **kw):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = curation_funnel(docs, (F.col("doc_id") % 10) == 9, **kw)
    return {r.stage: r for r in out.collect()}


def test_each_stage_drops_its_target(spark):
    long_clean = " ".join(f"w{i}" for i in range(30))           # survives all
    repetitive = "dup dup dup dup " * 10                        # gopher gate
    contaminated = "evaltoken " + " ".join(f"e{i}" for i in range(29))
    eval_doc = "evaltoken " + " ".join(f"e{i}" for i in range(29))
    rows = [
        (1, long_clean),
        (2, "too short"),          # length gate
        (3, repetitive),           # dup-window gate
        (4, contaminated),         # shares 6-grams with eval doc 9
        (9, eval_doc),             # eval split — excluded at raw
    ]
    st = _run(spark, rows, min_tokens=20, max_dup_frac=0.07)
    assert st["raw"].n_docs == 4
    assert st["quality"].n_docs == 2          # drops 2 and 3
    assert st["decontaminated"].n_docs == 1   # drops 4
    assert st["para_deduped"].n_docs == 1
    assert st["raw"].n_chars == sum(len(t) for _, t in rows[:4])


def test_paragraph_stage_rewrites_chars(spark):
    # doc 2 fully duplicates doc 1's paragraphs -> vanishes; doc 3 shares
    # its first 3-token paragraph with doc 1 -> shrinks
    p1 = " ".join(f"a{i}" for i in range(21))
    p3 = " ".join(f"a{i}" for i in range(3)) + " " + \
        " ".join(f"b{i}" for i in range(18))
    st = _run(spark, [(1, p1), (2, p1), (3, p3)],
              min_tokens=20, max_dup_frac=1.0)
    assert st["raw"].n_docs == 3
    assert st["decontaminated"].n_docs == 3   # no eval docs at all
    assert st["para_deduped"].n_docs == 2
    assert st["para_deduped"].n_chars < st["decontaminated"].n_chars


def test_empty_eval_split_is_noop_decontamination(spark):
    txt = " ".join(f"t{i}" for i in range(25))
    st = _run(spark, [(1, txt)], min_tokens=20)
    assert st["quality"].n_docs == st["decontaminated"].n_docs == 1


def test_funnel_is_monotone(spark, small_pages):
    pages, _truth = small_pages
    docs = pages.selectExpr(
        "cast(xxhash64(url) as long) as doc_id", "text").limit(150)
    st = _run(spark, docs.collect(), min_tokens=5, max_dup_frac=0.5)
    seq = [st[s].n_docs for s in
           ("raw", "quality", "decontaminated", "para_deduped")]
    assert seq == sorted(seq, reverse=True)
    assert st["raw"].n_docs > 0
