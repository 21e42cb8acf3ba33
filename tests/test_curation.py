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


def test_optional_gopher_and_lm_stages(spark):
    import math
    # docs 1-3 pass length; doc 2 fails the gopher stopword rule
    # (no required stopword); docs 1,3 reach the LM stage, where doc 3
    # (bigrams unseen by the target model) scores the uniform NLL and
    # is cut by a threshold just under it
    d1 = "the data " * 15              # 30 words, in-model bigrams
    d2 = "zz qq " * 15                 # no required stopword
    d3 = "the " + " ".join(f"num{i}" for i in range(29))  # off-model
    target = spark.createDataFrame([(9, d1)], "doc_id long, text string")
    docs = spark.createDataFrame([(1, d1), (2, d2), (3, d3)],
                                 "doc_id long, text string")
    v = 64
    out = curation_funnel(
        docs, F.lit(False), min_tokens=20, max_dup_frac=1.0,
        gopher_kw=dict(min_words=20, min_required_hits=1),
        lm_target=target,
        lm_max_mean_nll=round(1e6 * math.log(v)) - 1, lm_buckets=v)
    st = {r.stage: r for r in out.collect()}
    assert [st[s].stage_idx for s in
            ("raw", "quality", "gopher_rules", "lm_filter",
             "decontaminated", "para_deduped")] == [0, 1, 2, 3, 4, 5]
    assert st["quality"].n_docs == 3
    assert st["gopher_rules"].n_docs == 2     # doc 2 out
    assert st["lm_filter"].n_docs == 1        # doc 3 out
    assert st["para_deduped"].n_docs == 1


def test_lm_target_without_threshold_raises(spark):
    """ADVICE r4: the library API must mirror the CLI guard — lm_target
    with the default (0) micro-nat threshold would silently drop
    essentially every document."""
    import pytest
    docs = spark.createDataFrame([(1, "the data " * 15)],
                                 "doc_id long, text string")
    target = spark.createDataFrame([(9, "the data " * 15)],
                                   "doc_id long, text string")
    with pytest.raises(ValueError, match="lm_max_mean_nll"):
        curation_funnel(docs, F.lit(False), lm_target=target)
    with pytest.raises(ValueError, match="lm_max_mean_nll"):
        curation_funnel(docs, F.lit(False), lm_target=target,
                        lm_max_mean_nll=-5)


def test_default_funnel_shape_unchanged(spark):
    txt = "the words here repeat rarely " * 5
    st = _run(spark, [(1, txt)], min_tokens=20)
    assert sorted((r.stage_idx, r.stage) for r in st.values()) == [
        (0, "raw"), (1, "quality"), (2, "decontaminated"),
        (3, "para_deduped")]


def test_gopher_filter_preserves_columns_and_rejects_unknown(spark):
    import pytest
    from duplicate_finder_spark.operators.gopherquality import (
        gopher_filter)
    docs = spark.createDataFrame(
        [(1, "the data and the rows", "keepme")],
        "doc_id long, text string, extra string")
    out = gopher_filter(docs, min_words=3, min_required_hits=1)
    assert out.columns == ["doc_id", "text", "extra"]
    assert out.collect()[0].extra == "keepme"
    with pytest.raises(TypeError, match="unknown gopher"):
        gopher_filter(docs, min_wordz=3)
