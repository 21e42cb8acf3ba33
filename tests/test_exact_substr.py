"""Unit tests for operators/exact_substr.py (Lee-et-al ExactSubstr).

A brute-force Python reference computes the same semantics directly
from gram strings (no hashing), so these tests catch both hash-plumbing
and span-coalescing mistakes independently of the DuckDB driver oracle.
"""

import pytest

from duplicate_finder_spark.operators.exact_substr import (
    anchor_grams, exact_substr_apply, exact_substr_spans)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _spans_py(docs, L, keep_first):
    """Brute-force reference: dict doc_id -> sorted [(start, end)] 1-based."""
    occs = {}  # gram -> [(doc_id, pos)]
    for did, text in sorted(docs):
        for p in range(1, len(text) - L + 2):
            occs.setdefault(text[p - 1:p - 1 + L], []).append((did, p))
    flagged = {}
    for hits in occs.values():
        if len(hits) < 2:
            continue
        for did, p in (sorted(hits)[1:] if keep_first else hits):
            flagged.setdefault(did, set()).add(p)
    out = {}
    for did, ps in flagged.items():
        spans, run = [], []
        for p in sorted(ps):
            if run and p == run[-1] + 1:
                run.append(p)
            else:
                if run:
                    spans.append((run[0], run[-1] + L - 1))
                run = [p]
        spans.append((run[0], run[-1] + L - 1))
        out[did] = spans
    return out


def _apply_py(docs, L):
    spans = _spans_py(docs, L, keep_first=True)
    out = {}
    for did, text in docs:
        kept, cur = [], 1
        for s, e in spans.get(did, []):
            kept.append(text[cur - 1:s - 1])
            cur = e + 1
        kept.append(text[cur - 1:])
        out[did] = "".join(kept)
    return out


CORPUS = [
    # doc 0 and 2 share a long verbatim run; doc 1 is clean filler
    (0, "aaaa THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG zz unique tail0"),
    (1, "completely unrelated filler text with no repeats at all here ok"),
    (2, "pre THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG zz and more suffix"),
    # doc 3 repeats a run WITHIN itself
    (3, "SELF REPEATED RUN OF MANY CHARS!! mid SELF REPEATED RUN OF MANY "
        "CHARS!! end"),
    (4, "short"),  # below anchor length: contributes nothing
]
L = 20


class TestSpans:
    def test_matches_bruteforce(self, spark):
        got = {}
        for r in exact_substr_spans(_df(spark, CORPUS), L).collect():
            got.setdefault(r.doc_id, []).append(
                (r.span_start, r.span_start + r.span_len - 1))
        want = _spans_py(CORPUS, L, keep_first=False)
        assert {k: sorted(v) for k, v in got.items()} == want
        # the audit view reports BOTH occurrences of the shared run
        assert 0 in got and 2 in got and 3 in got and 1 not in got

    def test_no_dups_no_rows(self, spark):
        df = _df(spark, [(0, "abcdefghijklmnopqrstuvwxyz0123456789"),
                         (1, "zyxwvutsrqponmlkjihgfedcba9876543210")])
        assert exact_substr_spans(df, L).count() == 0

    def test_whole_doc_duplicated(self, spark):
        t = "an exactly duplicated document body of decent length"
        out = exact_substr_spans(_df(spark, [(0, t), (1, t)]), L).collect()
        assert sorted((r.doc_id, r.span_start, r.span_len) for r in out) \
            == [(0, 1, len(t)), (1, 1, len(t))]


class TestApply:
    def test_matches_bruteforce(self, spark):
        got = {r.doc_id: r.clean_text
               for r in exact_substr_apply(_df(spark, CORPUS), L).collect()}
        assert got == _apply_py(CORPUS, L)

    def test_keep_first_is_global_doc_order(self, spark):
        t = "ZZ THE GLOBALLY FIRST OCCURRENCE WINS HERE tail padding words"
        got = {r.doc_id: r.clean_text for r in exact_substr_apply(
            _df(spark, [(7, t), (3, t)]), L).collect()}
        assert got[3] == t              # lower doc_id survives verbatim
        assert got[7] != t and len(got[7]) < len(t)

    def test_untouched_docs_byte_identical(self, spark):
        out = {r.doc_id: r.clean_text
               for r in exact_substr_apply(_df(spark, CORPUS), L).collect()}
        assert out[1] == CORPUS[1][1]
        assert out[4] == CORPUS[4][1]
        assert len(out) == len(CORPUS)  # every doc gets a row

    def test_within_doc_repeat_keeps_first_copy(self, spark):
        out = {r.doc_id: r.clean_text
               for r in exact_substr_apply(_df(spark, CORPUS), L).collect()}
        assert out[3].count("SELF REPEATED RUN OF MANY CHARS!!") == 1
        assert out[3].startswith("SELF REPEATED RUN OF MANY CHARS!! mid ")


class TestRandomizedCorpus:
    """Seeded random corpora over a 3-char alphabet — dense incidental
    repeats exercise island coalescing and keep-first ranking far
    harder than the planted fixtures."""

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_bruteforce(self, spark, seed):
        # multibyte chars in the alphabet pin code-point (not byte or
        # UTF-16-unit) position semantics against the Python reference
        import random
        rng = random.Random(seed)
        docs = [(i, "".join(rng.choice("ab é中") for _ in range(rng.randint(
            0, 60)))) for i in range(12)]
        Lr = 8
        got_spans = {}
        for r in exact_substr_spans(_df(spark, docs), Lr).collect():
            got_spans.setdefault(r.doc_id, []).append(
                (r.span_start, r.span_start + r.span_len - 1))
        want = _spans_py(docs, Lr, keep_first=False)
        assert {k: sorted(v) for k, v in got_spans.items()} == want
        got_apply = {r.doc_id: r.clean_text
                     for r in exact_substr_apply(_df(spark, docs),
                                                 Lr).collect()}
        assert got_apply == _apply_py(docs, Lr)


class TestAnchors:
    def test_position_count_and_bounds(self, spark):
        df = _df(spark, [(0, "abcdefghijklmnopqrstuvwxyz")])
        g = anchor_grams(df, 20).collect()
        assert sorted(r.p for r in g) == list(range(1, 8))

    def test_rejects_degenerate_length(self, spark):
        with pytest.raises(ValueError):
            anchor_grams(_df(spark, CORPUS), 1)

    def test_equal_grams_equal_keys(self, spark):
        df = _df(spark, [(0, "SHARED PREFIX OF TWENTYx"),
                         (1, "SHARED PREFIX OF TWENTYy")])
        g = anchor_grams(df, 23).filter("p = 1").collect()
        assert len(g) == 2
        assert (g[0].h1, g[0].h2) == (g[1].h1, g[1].h2)
