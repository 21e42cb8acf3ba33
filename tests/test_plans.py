"""Physical-plan audits: the scale claims in the operator docstrings
must be visible in `explain` output, not just asserted in comments.

Each test pins one plan property that matters at 100 TB:
- filters reach the parquet scan (PushedFilters) — otherwise every
  query reads the full corpus;
- the size-prefilter semi-join broadcasts its tiny HAVING side — the
  big table must never shuffle for it;
- exact_clusters does its ranking + HAVING in ONE hash-partition
  exchange — the plan-shape promise in operators/exact.py;
- per-doc computation runs in Arrow-vectorized Python (ArrowEvalPython),
  never row-at-a-time (BatchEvalPython) — the input_hint invariant;
- scalar text features stay inside whole-stage codegen (no Python at
  all).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duplicate_finder_spark.config import PipelineConfig
from duplicate_finder_spark.operators import exact as ex
from duplicate_finder_spark.operators.minhash import signatures


def _plan(df, mode="formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode)


@pytest.fixture(scope="module")
def parquet_pages(spark, small_pages, tmp_path_factory):
    pages, _ = small_pages
    path = str(tmp_path_factory.mktemp("plans") / "pages.parquet")
    pages.write.parquet(path)
    return spark.read.parquet(path)


def test_media_synth_fans_out_codec_work(spark):
    """The driver's media corpora synthesize payloads with per-row
    codec work (pure-Python PNG/GIF/WebP/JPEG encodes, and the
    consumer's decodes) from a tiny one-file scan; without an explicit
    round-robin fan-out all of it serializes on one task. Pin the
    partition count at default parallelism for all three synths."""
    import __spark_entry__ as e
    goal = spark.sparkContext.defaultParallelism
    for synth in (e._synth_images, e._synth_wavs, e._synth_avis):
        df = synth(spark, "/root/testdata/sf0.001")
        assert df.rdd.getNumPartitions() == goal, synth.__name__


def test_size_filter_pushed_to_parquet_scan(parquet_pages):
    cfg = PipelineConfig(min_size=100, max_size=5000)
    # filter on a stored column (length() wouldn't push) — the glob
    # include/exclude predicates are rlike and stay above the scan,
    # so probe pushdown with the url prefix filter
    df = parquet_pages.filter(F.col("url").startswith("https://site01")) \
                      .select("url")
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "StartsWith(url,https://site01" in plan
    # column pruning: the scan must not read text/html for a url-only query
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "text" not in read_schema[0]
    assert cfg.min_size == 100  # cfg exercised above for completeness


def test_size_prefilter_broadcasts_having_side(parquet_pages):
    df = parquet_pages.withColumn("size", F.length("text").cast("long"))
    plan = _plan(ex.size_prefilter(df))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # the big side must not have a hash-partition exchange below the join
    assert "Exchange hashpartitioning" not in plan.split(
        "BroadcastHashJoin")[0]


def test_exact_clusters_single_shuffle(parquet_pages):
    plan = _plan(ex.exact_clusters(parquet_pages, PipelineConfig()))
    # the BIG table shuffles exactly once — one hashpartitioning exchange
    # on content_hash serves BOTH window functions (rank + HAVING count).
    # The only other exchange is the tiny pre-broadcast size-count
    # aggregate (carries (size, count) pairs, not the corpus).
    shuffles = [ln for ln in plan.splitlines()
                if "Arguments: hashpartitioning" in ln]
    big = [ln for ln in shuffles if "content_hash" in ln]
    small = [ln for ln in shuffles if "size" in ln and
             "content_hash" not in ln]
    assert len(big) == 1, plan
    assert len(shuffles) == len(big) + len(small), plan
    # both windows sit above that single exchange: two Window nodes, one
    # content_hash exchange
    assert plan.count("windowspecdefinition(content_hash") == 2


def test_signatures_run_arrow_vectorized(parquet_pages):
    cfg = PipelineConfig(num_perm=16, lsh_bands=4)
    plan = _plan(signatures(parquet_pages, cfg))
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python


def test_text_features_stay_jvm_side(parquet_pages):
    from duplicate_finder_spark.functions.text import (punct_ratio,
                                                       quality_score,
                                                       token_count)
    df = parquet_pages.select(
        token_count("text").alias("n"),
        punct_ratio("text").alias("p"),
        quality_score("text").alias("q"))
    plan = _plan(df)
    assert "EvalPython" not in plan          # no Python at all
    # formatted mode stars codegen'd nodes — the scalar projection must
    # sit inside whole-stage codegen
    assert "* Project" in plan


def test_cosine_pairs_lsh_never_cross_joins(spark):
    """The bucketed embedding-pairs scale path must plan as equi-joins
    on (table, bucket) — no cartesian/nested-loop join anywhere, unlike
    its O(N²) oracle baseline cosine_pairs_above."""
    from duplicate_finder_spark.operators.ann import (cosine_pairs_above,
                                                      cosine_pairs_lsh)
    emb = spark.createDataFrame(
        [(i, [float(i % 5), 1.0, float(i % 3)]) for i in range(40)],
        "vec_id long, embedding array<float>")
    plan = _plan(cosine_pairs_lsh(emb, 0.9, n_planes=3, n_tables=4))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or "BroadcastHashJoin" in plan
    # the baseline IS the cross join (fenced as oracle-only)
    baseline = _plan(cosine_pairs_above(emb, 0.9))
    assert "CartesianProduct" in baseline \
        or "BroadcastNestedLoopJoin" in baseline


def test_truncation_probe_prunes_the_udf(parquet_pages):
    """verify_pairs' 'can any doc be truncated?' probe must be a pure
    JVM scan: n_tokens is computed BEFORE the signature UDF, so a
    max(n_tokens) aggregate prunes the Arrow projection entirely —
    otherwise the probe would cost a full signature pass per call."""
    cfg = PipelineConfig(num_perm=16, lsh_bands=4)
    probe = signatures(parquet_pages, cfg).agg(F.max("n_tokens"))
    plan = _plan(probe)
    assert "EvalPython" not in plan, plan


def test_verify_fast_path_single_join_pass(spark, parquet_pages):
    """With no truncatable doc (bound ≤ sketch_k) verify_pairs must
    return the single-pass exact plan: no union branches, no
    InMemoryRelation (the persisted scored table exists only on the
    truncated path), exactly two joins (pairs⋈a⋈b)."""
    from duplicate_finder_spark.operators.lsh import verify_pairs
    # fixture docs exceed 512 tokens, so force the no-truncation regime
    cfg = PipelineConfig(num_perm=16, lsh_bands=4, sketch_k=1_000_000)
    sigs = signatures(parquet_pages, cfg)
    pairs = spark.createDataFrame([("a", "b")], "url_a string, url_b string")
    out = verify_pairs(pairs, sigs, 0.8, cfg)
    plan = _plan(out)
    assert "Union" not in plan, plan
    assert "InMemoryTableScan" not in plan, plan


def test_no_row_python_anywhere_in_contract(spark):
    """Global input_hint invariant: every driver-contract query plans its
    Python (if any) as ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas
    — BatchEvalPython (row-at-a-time pickling) must never appear."""
    import __spark_entry__ as entry
    offenders = []
    for name, fn in entry.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        plan = _plan(df, "extended")
        if "BatchEvalPython" in plan:
            offenders.append(name)
    assert not offenders, offenders


def test_lsh_candidate_band_table_shuffles_once(parquet_pages):
    """r4, MEASURED (BENCH/BASELINE.md per-stage A/B): the LSH bucket
    census stays a WINDOW so the exploded band table is exchanged
    exactly once and that exchange is REUSED by the census annotation
    and both sides of the small-bucket self-join. The groupBy+join-back
    alternative was measured 1.6× slower at 2M docs (census build and
    join probe scan the band subtree twice; at web dup rates the
    collision census exceeds any broadcast threshold). This test pins
    the winning shape: one hashpartitioning exchange on (band,
    band_hash), every other consumer a ReusedExchange, and exactly one
    ArrowEvalPython (the signature UDF runs once)."""
    from duplicate_finder_spark.operators.lsh import candidate_pairs

    cfg = PipelineConfig(num_perm=128, lsh_bands=32,
                         jaccard_threshold=0.8)
    pairs = candidate_pairs(signatures(parquet_pages, cfg), cfg)
    # exchange reuse is an AQE RUNTIME property: execute, then inspect
    # the final adaptive plan (the pre-execution plan prints one
    # exchange per consumer and proves nothing)
    pairs.collect()
    fin = pairs._jdf.queryExecution().executedPlan().toString() \
        .split("Initial Plan")[0]
    live = [ln for ln in fin.splitlines()
            if "Exchange hashpartitioning" in ln and "band" in ln
            and "Reused" not in ln]
    assert len(live) == 1, fin
    assert fin.count("ReusedExchange") >= 2, fin


def test_simhash_block_table_reuses_exchanges(parquet_pages):
    """Same window-census shape for the SimHash block join. The
    representative's fingerprint rides the census window as a
    struct-min (no second window pass). Known, accepted residual:
    Catalyst canonicalizes the four consumers (self-join left/right,
    hot star, chain lag) into TWO exchange families — the small-join
    pair and the hot-branch pair each share one exchange, so the block
    table shuffles twice, not four times; within-family ReusedExchange
    is what this test pins (a single family needs the pushed-filter
    sets below the exchange to canonicalize equal, which the
    small-vs-hot branches do not)."""
    from duplicate_finder_spark.operators.simhash import (simhash,
                                                          simhash_pairs)

    cfg = PipelineConfig(simhash_hamming_max=3)
    pairs = simhash_pairs(simhash(parquet_pages), cfg)
    pairs.collect()
    fin = pairs._jdf.queryExecution().executedPlan().toString() \
        .split("Initial Plan")[0]
    live = [ln for ln in fin.splitlines()
            if "Exchange hashpartitioning" in ln and "block" in ln
            and "Reused" not in ln]
    assert len(live) <= 2, fin
    assert fin.count("ReusedExchange") >= 2, fin


def test_exact_substr_text_never_shuffles(parquet_pages):
    """operators/exact_substr.py scale claim: the per-position explode
    is narrow, and every Exchange in the anchor-gram / ranking / island
    path ships only (ids, positions, hash keys) — never text. The one
    place text may legitimately travel is the final splice join's
    recomposition, keyed by skew-free doc_id (broadcast at test scale;
    a doc_id shuffle at cluster scale — same contract as
    paragraph_dedup_apply). The whole plan is JVM-only."""
    import re

    from duplicate_finder_spark.operators.exact_substr import (
        exact_substr_apply, exact_substr_spans)

    docs = parquet_pages.select(F.col("url").alias("doc_id"),
                                F.col("text"))
    for df in (exact_substr_spans(docs, 30, id_col="doc_id"),
               exact_substr_apply(docs, 30, id_col="doc_id")):
        plan = _plan(df)
        assert "EvalPython" not in plan and "InPandas" not in plan
        # formatted detail blocks: "(n) Exchange\nArguments: ...\n...
        # Input [k]: [...]" — capture partition keys + exchanged schema
        blocks = re.findall(
            r"\(\d+\) Exchange\b.*?\nInput \[\d+\]: \[(.*?)\]"
            r".*?\nArguments: (.*?)\n", plan, flags=re.S)
        assert blocks, plan  # the parse must find the exchanges
        for cols, args in blocks:
            if re.search(r"hashpartitioning\(doc_id#\d+", args):
                continue  # recomposition exchange: text allowed
            assert "text#" not in cols, (args, cols)


def test_bloom_build_combines_map_side(parquet_pages):
    """operators/bloomfilter.py scale claim: the word-table build's one
    exchange carries pre-combined (word_idx, word) rows — partial
    bit_or below the shuffle, so ≤ m/64 rows per map task regardless
    of corpus rows — and the whole build is JVM-only."""
    from duplicate_finder_spark.operators.bloomfilter import bloom_words
    plan = _plan(bloom_words(parquet_pages, "url", 1 << 16, 5),
                 "simple")
    assert "partial_bit_or" in plan, plan
    assert plan.index("partial_bit_or") > plan.index(
        "Exchange hashpartitioning(word_idx")  # combine BELOW the shuffle
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_cap_per_host_is_two_phase_and_jvm_only(parquet_pages):
    """operators/domains.py skew claim: the cap runs as a salted
    (_host, _cell) pre-rank exchange followed by a _host-only exchange
    over the ≤ salt·K survivors — never a single whole-host window as
    the only shuffle."""
    import re

    from duplicate_finder_spark.operators.domains import cap_per_host
    plan = _plan(cap_per_host(parquet_pages, 3, salt=16), "simple")
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any("_cell" in p for p in parts), parts   # salted phase 1
    assert any("_host" in p and "_cell" not in p
               for p in parts), parts                # exact phase 2
    assert "EvalPython" not in plan


def test_gopher_and_c4_are_shuffle_and_python_free(parquet_pages):
    """The Gopher Table A1 gate and the C4 cleanup are pure codegen'd
    projections/filters: no exchange, no Python eval of any kind —
    free at any corpus size."""
    from duplicate_finder_spark.operators.c4 import c4_clean
    from duplicate_finder_spark.operators.gopherquality import (
        gopher_filter, gopher_quality_signals)
    docs = parquet_pages.selectExpr(
        "cast(xxhash64(url) as long) as doc_id", "text")
    for df in (gopher_quality_signals(docs),
               gopher_filter(docs),
               c4_clean(docs)):
        plan = _plan(df)
        assert "Exchange" not in plan
        assert "EvalPython" not in plan


def test_lm_score_broadcasts_both_model_tables(parquet_pages):
    """lm_score's two count tables (≤ n_buckets rows) must reach the
    scoring pass as broadcasts — the corpus side never shuffles until
    the per-doc aggregate, and nothing runs in Python."""
    from duplicate_finder_spark.operators.lm import lm_score
    docs = parquet_pages.selectExpr(
        "cast(xxhash64(url) as long) as doc_id", "text")
    plan = _plan(lm_score(docs, docs.limit(50), n_buckets=1 << 12))
    # formatted mode prints each node in the tree AND the detail list
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "EvalPython" not in plan
    # the only hash exchanges are the doc-id aggregate and the tiny
    # model-count aggregates — none may carry the text column
    for seg in plan.split("Exchange hashpartitioning")[1:]:
        assert "text" not in seg.split("\n")[0]


def test_pack_sequences_single_shard_window_exchange(parquet_pages):
    """The packing map is one hash exchange on the shard key (the
    per-shard window sort) — no global sort, no Python."""
    from duplicate_finder_spark.operators.packing import pack_sequences
    docs = parquet_pages.selectExpr(
        "cast(xxhash64(url) as long) as doc_id", "text")
    plan = _plan(pack_sequences(docs, 128, n_shards=16))
    # exactly ONE exchange node (tree mention + detail mention), and it
    # hash-partitions on the shard key — never a global range sort
    assert plan.count("Exchange") == 2
    assert "hashpartitioning(shard" in plan
    assert "rangepartitioning" not in plan
    assert "EvalPython" not in plan


def test_ngram_jaccard_shingle_pass_runs_once(parquet_pages):
    """r6: the df-cut is a window census on the single shingle
    exchange, so the Arrow shingle UDF subtree has exactly one copy in
    the optimized plan (the old groupBy + left-semi census re-scanned
    it; both self-join sides now reuse the same exchange)."""
    from duplicate_finder_spark.operators.jaccard import \
        ngram_jaccard_pairs
    out = ngram_jaccard_pairs(parquet_pages, k=3, threshold=0.8,
                              id_col="url", text_col="text")
    plan = _plan(out, "simple")
    # one UDF node per self-join side — plain explode used to make the
    # optimizer infer a size(sh)>0 filter whose pushdown DUPLICATED the
    # UDF within each side (4 nodes total, guide §4.4)
    assert plan.count("ArrowEvalPython") == 2, plan
    assert "BatchEvalPython" not in plan
    # ...and at runtime the two identical sides share one exchange, so
    # the shingle pass executes exactly once (collect() executes THIS
    # DataFrame's own QueryExecution, making the final adaptive plan
    # inspectable — a noop write would run a separate execution)
    out.collect()
    final = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in final, final


def test_video_neardup_frame_hash_pass_runs_once(spark):
    """r6: per-video distinct hash sets come from one collect_set
    exchange; the Python frame-hash subtree has a single consumer (one
    MapInPandas / one aggregate over it), and no sizes table is joined
    back (the only join is the hash self-join)."""
    from duplicate_finder_spark.operators.videohash import \
        video_neardup_pairs
    fh = spark.createDataFrame(
        [(1, 0, 10), (1, 1, 11), (2, 0, 10), (2, 1, 11)],
        "doc_id long, frame_no int, ahash long")

    def run(batches):
        for b in batches:
            yield b

    hashes = fh.mapInPandas(run, "doc_id long, frame_no int, ahash long")
    out = video_neardup_pairs(hashes, min_jaccard=0.5)
    plan = _plan(out, "simple")
    # one Python node per self-join side (the old shape consumed the
    # frame-hash subtree from a distinct + two censuses + two sizes
    # join-backs); at runtime the two identical sides share exchanges
    assert plan.count("MapInPandas") == 2, plan
    # exactly one join (the ahash self-equi-join) — no size join-backs
    joins = sum(plan.count(k) for k in
                ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "BroadcastNestedLoopJoin", "CartesianProduct"))
    assert joins == 1, plan
    out.collect()
    final = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in final, final
