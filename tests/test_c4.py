"""C4 line/page cleanup (operators/c4.py): each gate exercised on
hand-built pages with closed-form expected survivors."""

from __future__ import annotations

from duplicate_finder_spark.operators.c4 import c4_clean


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run(spark, rows, **kw):
    return {r.doc_id: r for r in c4_clean(_docs(spark, rows),
                                          **kw).collect()}


def test_line_gates_punct_words_and_boilerplate(spark):
    text = ("a good long sentence here.\n"      # kept
            "no terminal punctuation here\n"    # dropped: no terminal
            "too short.\n"                      # dropped: < 3 words
            "enable javascript to continue.\n"  # dropped: bad phrase
            'he said "stop right there."\n'     # kept: quote terminal
            "is this a question?\n"             # kept
            "This site uses cookies today.\n")  # dropped: bad phrase
    got = _run(spark, [(1, text)], min_kept_lines=1)
    r = got[1]
    assert (r.n_lines, r.n_kept_lines) == (7, 3)
    assert r.clean_text.split("\n") == [
        "a good long sentence here.",
        'he said "stop right there."',
        "is this a question?"]


def test_page_gates_lorem_brace_and_min_lines(spark):
    ok = "one fine sentence right here.\nand another one follows it.\n"
    got = _run(spark, [
        (1, ok),
        (2, ok + "Lorem Ipsum dolor sit amet."),   # page out, any case
        (3, ok + "function f() { return 1; }"),    # page out: brace
        (4, "only one kept line here.\nnope\n"),   # out: < 2 kept
    ], min_kept_lines=2)
    assert sorted(got) == [1]
    assert got[1].n_kept_lines == 2


def test_brace_gate_optional(spark):
    rows = [(1, "keep this { braced } sentence today.\n"
                "and a second clean line too.")]
    assert _run(spark, rows, min_kept_lines=1) == {}
    got = _run(spark, rows, min_kept_lines=1, drop_brace=False)
    assert got[1].n_kept_lines == 2


def test_blank_lines_ignored_in_counts(spark):
    text = "\n\nfirst real sentence is kept.\n\nsecond one is kept too.\n"
    got = _run(spark, [(1, text)], min_kept_lines=2)
    assert (got[1].n_lines, got[1].n_kept_lines) == (2, 2)


def test_line_dedup_within_doc_keeps_first_in_order(spark):
    from duplicate_finder_spark.operators.c4 import dedup_lines_within_doc
    rows = [
        (1, "nav bar\nreal content one.\nnav bar\nreal content two.\n"
            "nav bar"),
        (2, "a\nb\nc"),           # nothing repeated
        (3, ""),                  # empty text = one empty line
        (4, "x\nx\nx\nx"),        # all one line
    ]
    out = {r.doc_id: r for r in
           dedup_lines_within_doc(
               spark.createDataFrame(rows, "doc_id long, text string"))
           .collect()}
    assert out[1].clean_text == "nav bar\nreal content one.\nreal content two."
    assert (out[1].n_lines, out[1].n_kept_lines) == (5, 3)
    assert out[2].clean_text == "a\nb\nc" and out[2].n_kept_lines == 3
    assert (out[3].n_lines, out[3].n_kept_lines) == (1, 1)
    assert out[4].clean_text == "x" and out[4].n_lines == 4


def test_line_dedup_plan_is_shuffle_and_python_free(spark):
    from duplicate_finder_spark.operators.c4 import dedup_lines_within_doc
    df = dedup_lines_within_doc(
        spark.createDataFrame([(1, "a\nb")], "doc_id long, text string"))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
