"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises an operator from SURVEY.md §2 (or a
training-data-pipeline extension) through the ``duplicate_finder_spark``
library; ``oracle_sql()`` holds the DuckDB-runnable ANSI equivalent.
Column names/types are aligned pair-by-pair (the driver hashes values
after sorting columns by name).

Dedup queries that need duplicates to exist run over a deterministic
SELF-UNION of ``documents`` (copy shifted by +10_000_000 in doc_id) —
the sf0.01 corpus has no planted exact dups, and an empty-vs-empty match
would verify nothing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duplicate_finder_spark.config import PipelineConfig
from duplicate_finder_spark.functions.globs import glob_to_java_regex
from duplicate_finder_spark.functions.hashing import (content_sha256,
                                                      normalized_fingerprint)
from duplicate_finder_spark.functions.text import (bpe_token_count,
                                                   punct_ratio,
                                                   quality_score,
                                                   stopword_ratio,
                                                   token_count, tokens)
from duplicate_finder_spark.operators import exact as ex
from duplicate_finder_spark.partitioning import fan_out
from duplicate_finder_spark.operators import decisions as dec
from duplicate_finder_spark.operators.decisions import keep_best
from duplicate_finder_spark.operators.audit import pair_recall_audit
from duplicate_finder_spark.operators.setops import vocab_overlap
from duplicate_finder_spark.operators.events import (event_gaps,
                                                     rollup_by_type_hour)
from duplicate_finder_spark.operators.ann import (cosine_pairs_above,
                                                  cosine_pairs_lsh,
                                                  cosine_topk,
                                                  cosine_topk_ivf,
                                                  cosine_topk_lsh)
from duplicate_finder_spark.operators.components import connected_components
from duplicate_finder_spark.operators.events import (duplicate_events,
                                                     hourly_rollup,
                                                     session_stats)
from duplicate_finder_spark.operators.lcs import lcs_verify
from duplicate_finder_spark.operators.substring import containment_pairs
from duplicate_finder_spark.operators.jaccard import (df_cut_stats,
                                                      ngram_jaccard_pairs)
from duplicate_finder_spark.operators.crosssnap import (
    cross_snapshot_apply, cross_snapshot_decisions)
from duplicate_finder_spark.operators.lsh import candidate_pairs, verify_pairs
from duplicate_finder_spark.operators.minhash import signatures
from duplicate_finder_spark.operators.multimodal import (binary_meta,
                                                         extract_features,
                                                         with_payload)
from duplicate_finder_spark.operators.contamination import (
    contamination_check, ngram_census)
from duplicate_finder_spark.operators.curation import curation_funnel
from duplicate_finder_spark.operators.exact_substr import (
    exact_substr_apply, exact_substr_spans)
from duplicate_finder_spark.operators.sampling import (
    softdedup_weights, stratified_sample, token_budget_sample)
from duplicate_finder_spark.operators.paragraphs import (paragraph_dedup_apply,
                                                         paragraph_dedup_stats,
                                                         repetition_signals)
from duplicate_finder_spark.operators.importance import dsir_select
from duplicate_finder_spark.operators.bpe import (bpe_train, bpe_vocab,
                                                  encode_stats, word_counts)
from duplicate_finder_spark.operators.mixture import mixture_weights
from duplicate_finder_spark.operators.blocklist import (
    badword_filter, domain_blocklist_filter)
from duplicate_finder_spark.operators.gopherquality import (
    gopher_quality_signals)
from duplicate_finder_spark.operators.lm import lm_score
from duplicate_finder_spark.operators.c4 import (c4_clean,
                                                 dedup_lines_within_doc)
from duplicate_finder_spark.operators.packing import pack_sequences
from duplicate_finder_spark.operators.imagehash import (
    image_hashes, image_neardup_pairs)
from duplicate_finder_spark.operators.audiohash import (
    audio_hashes, audio_neardup_pairs)
from duplicate_finder_spark.operators.videohash import (
    video_frame_hashes, video_neardup_pairs)
from duplicate_finder_spark.operators.semantic import semantic_dedup
from duplicate_finder_spark.operators.simhash import simhash, simhash_pairs

SHIFT = 10_000_000
JACCARD_T = 0.8
COSINE_T = 0.42
ANN_K = 10
ANN_NQ = 10
SEM_T = 0.95   # semantic-dup cosine threshold (SemDeDup ε = 0.05)
SEM_K = 8      # semantic_dedup centroids = embeddings of vec_id < SEM_K
DSIR_K = 100          # dsir_select keeps the top-100 raw docs
DSIR_BUCKETS = 16384  # hashed unigram+bigram feature buckets
LM_BUCKETS = 16384    # lm_score hashed word/bigram buckets
# Gopher Table A1 thresholds scaled to the synthetic corpus the way
# CONTAM_N scales GPT-3's 13-gram probe: docs are 10-99 words of a
# ~30-word vocabulary, so the paper's min_words=50 / ≥2-required-
# stopword gates become 20 / ≥1 ("the" is the list's only member
# present) — both load-bearing at sf0.01 (367/500 pass).
GOPHER_MIN_WORDS = 20
GOPHER_MIN_STOPWORD_HITS = 1

GLOB_INCLUDE = ["src1/*", "src2/*"]
GLOB_EXCLUDE = ["*3"]

_STOP = {
    "de": ["der", "die", "und", "das", "ist", "ein", "zu"],
    "en": ["the", "and", "of", "to", "in", "is", "a"],
    "fr": ["le", "la", "et", "les", "des", "un", "est"],
    "uk": ["і", "та", "в", "на", "це", "що", "не"],
}


# --- helpers ----------------------------------------------------------------

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _self_union(docs: DataFrame) -> DataFrame:
    """documents ∪ shifted copy — deterministic exact-dup harness."""
    base = docs.select("doc_id", "text")
    copy = docs.select((F.col("doc_id") + SHIFT).alias("doc_id"), "text")
    return base.unionByName(copy)


def _exact_clusters_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _self_union(_docs(spark, sf_dir))
    return ex.exact_clusters(u, PipelineConfig(), url_col="doc_id")


# --- queries ----------------------------------------------------------------

def q_exact_dup_clusters(spark, sf_dir):
    return _exact_clusters_docs(spark, sf_dir) \
        .select("content_hash", "doc_id")


def q_exact_dup_decisions(spark, sf_dir):
    cl = _exact_clusters_docs(spark, sf_dir)
    return cl.select(
        "doc_id", "content_hash",
        F.when(F.col("rank") == 1, "keep").otherwise("delete").alias("action"))


def q_dup_group_stats(spark, sf_dir):
    st = ex.cluster_stats(_exact_clusters_docs(spark, sf_dir))
    return st.select("content_hash", "group_size", "doc_size",
                     "total_bytes", "reclaimable_bytes", "n_comparisons")


def q_size_prefilter(spark, sf_dir):
    docs = _docs(spark, sf_dir).withColumn(
        "size", F.length("text").cast("long"))
    return ex.size_prefilter(docs).select("doc_id", "size")


def q_filter_size_range(spark, sf_dir):
    cfg = PipelineConfig(min_size=150, max_size=300)
    docs = _docs(spark, sf_dir)
    return ex.apply_filters(docs, cfg, url_col="doc_id") \
        .select("doc_id", F.col("size"))


def q_filter_glob(spark, sf_dir):
    docs = _docs(spark, sf_dir).withColumn(
        "url", F.concat_ws("/", "source", F.col("doc_id").cast("string")))
    cfg = PipelineConfig(include_patterns=GLOB_INCLUDE,
                         exclude_patterns=GLOB_EXCLUDE)
    return ex.apply_filters(docs, cfg, url_col="url") \
        .select("doc_id", "url")


def q_url_dup_groups(spark, sf_dir):
    """URL canonicalization dedup (functions/urls.py) — the zeroth
    pass of a web-scale pipeline: every document is "crawled" under
    2-3 raw spellings (mixed-case host + explicit :443 + fragment;
    tracking-only query) that all canonicalize to one lowercase URL.
    Expression-only (lower/regexp/split/filter) + one groupBy shuffle.
    The oracle is the closed form: each doc_id's group key, spelling
    count, and lexicographic-min raw spelling are all derivable in
    SQL without reimplementing the canonicalizer."""
    from duplicate_finder_spark.functions.urls import url_dup_groups
    docs = _docs(spark, sf_dir).select("doc_id")
    site = (F.col("doc_id") % 50).cast("int")
    base = F.format_string("https://site%03d.example/p/%d", site,
                           F.col("doc_id"))
    v1 = docs.select(base.alias("url"))
    v2 = docs.select(F.format_string(
        "HTTPS://SITE%03d.EXAMPLE:443/p/%d#frag", site,
        F.col("doc_id")).alias("url"))
    v3 = (docs.filter(F.col("doc_id") % 2 == 0)
          .select(F.concat(base,
                           F.lit("?utm_source=feed&gclid=x")).alias("url")))
    pages = v1.unionByName(v2).unionByName(v3)
    return url_dup_groups(pages)


def q_fingerprint_dups(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    base = docs.select("doc_id", "text")
    noisy = docs.select(
        (F.col("doc_id") + SHIFT).alias("doc_id"),
        F.concat(F.upper("text"), F.lit("  ")).alias("text"))
    u = base.unionByName(noisy).withColumn(
        "fingerprint", normalized_fingerprint("text"))
    # single shuffle: window count over the fingerprint partitioning
    # (broadcasting the colliding-fingerprint set would not scale)
    w = Window.partitionBy("fingerprint")
    return (u.select("fingerprint", "doc_id")
            .withColumn("_cnt", F.count("*").over(w))
            .filter(F.col("_cnt") > 1)
            .select("fingerprint", "doc_id"))


def q_dedup_apply(spark, sf_dir):
    """K4 applied: survivors of the destructive delete (anti-join rewrite
    of MERGE…DELETE) over the self-union — exactly one member per
    content, keep-first by doc_id."""
    u = _self_union(_docs(spark, sf_dir))
    cl = _exact_clusters_docs(spark, sf_dir)
    d = dec.decide(cl)
    survivors = dec.apply_delete(u, d, delete_duplicates=True,
                                 dry_run=False, assume_yes=True,
                                 url_col="doc_id")
    return survivors.select("doc_id")


def q_decision_summary(spark, sf_dir):
    """A5 totals: docs + bytes per action over the exact-dup decisions."""
    cl = _exact_clusters_docs(spark, sf_dir)
    return dec.decision_summary(dec.decide(cl)) \
        .select("action", "n_docs", F.col("total_bytes").cast("long")
                .alias("total_bytes"))


def q_vocab_setops(spark, sf_dir):
    """§2.7 set operations: src1∩src2 and src1∖src2 token vocabularies."""
    return vocab_overlap(_docs(spark, sf_dir), "src1", "src2")


def q_lang_vocab_stats(spark, sf_dir):
    """Distinct aggregate: vocabulary size + token volume per language."""
    d = _docs(spark, sf_dir)
    return (d.select("lang", F.explode(tokens("text")).alias("token"))
            .groupBy("lang")
            .agg(F.countDistinct("token").alias("vocab_size"),
                 F.count("*").alias("n_tokens")))


def q_events_rollup(spark, sf_dir):
    return rollup_by_type_hour(_events(spark, sf_dir))


def q_events_gaps(spark, sf_dir):
    return event_gaps(_events(spark, sf_dir))


def q_token_stats(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id",
        token_count("text").cast("long").alias("n_tokens"),
        F.round(punct_ratio("text"), 6).alias("punct_ratio"))


def q_token_stats_bpe(spark, sf_dir):
    """BPE-ish pre-tokenizer counts + per-lang stopword ratio — the
    LLM-oriented complement of whitespace token_stats."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        bpe_token_count("text").cast("long").alias("n_bpe_tokens"),
        F.round(stopword_ratio("text", "en"), 6).alias("stopword_ratio_en"))


BPE_N_MERGES = 6   # unrolled stage count in the DuckDB oracle chain
_BPE_MERGES_CACHE: dict[str, list] = {}


def _bpe_merges(spark, sf_dir):
    """Learned merge rows over sf_dir's documents, memoized — training
    runs one driver argmax per merge, and both BPE queries replay the
    same tokenizer."""
    rows = _BPE_MERGES_CACHE.get(sf_dir)
    if rows is None:
        wc = word_counts(_docs(spark, sf_dir))
        rows = bpe_train(wc, BPE_N_MERGES).orderBy("merge_rank").collect()
        _BPE_MERGES_CACHE[sf_dir] = rows
    return rows


def q_bpe_train_merges(spark, sf_dir):
    """Distributed BPE tokenizer training (operators/bpe.py): collapse
    the corpus to its distinct-word table (one combinable pass), then
    learn BPE_N_MERGES merges by iterated weighted pair-count argmax
    with the (count desc, left asc, right asc) tie-break. All JVM
    expression algebra; the oracle recomputes the identical merge
    sequence in DuckDB via an unrolled CTE chain (the double-space
    canonical-string replace trick reproduces BPE's greedy
    left-to-right within-word merge order in both engines)."""
    rows = _bpe_merges(spark, sf_dir)
    return spark.createDataFrame(
        rows, "merge_rank long, left string, right string, "
              "merged string, pair_count long")


def q_bpe_encode_stats(spark, sf_dir):
    """Per-doc token accounting under the learned BPE tokenizer
    (operators/bpe.py encode_stats): distinct words are encoded once
    through the merge list (chained JVM replaces), then joined back to
    the exploded corpus — model-token counts for budget sampling and
    packing. Docs with no ASCII-printable words report 0/0."""
    rows = _bpe_merges(spark, sf_dir)
    merges = [(r["left"], r["right"]) for r in rows]
    return encode_stats(_docs(spark, sf_dir), merges)


def q_bpe_vocab(spark, sf_dir):
    """The trained tokenizer's shipping artifact (operators/bpe.py
    bpe_vocab): every symbol surviving the learned merges, weighted
    occurrence count, deterministic (count desc, token asc) id — the
    id ranking runs through the parallel global_rank, oracled against
    DuckDB's single-reducer row_number()."""
    rows = _bpe_merges(spark, sf_dir)
    merges = [(r["left"], r["right"]) for r in rows]
    return bpe_vocab(word_counts(_docs(spark, sf_dir)), merges)


BLOCKED_DOMAINS = ["host00.example", "host07.example"]
BADWORDS = ["slow", "merge", "the"]


def q_domain_blocklist(spark, sf_dir):
    """URL-domain blocklist with subdomain-suffix semantics
    (operators/blocklist.py): hosts explode into their ancestor-domain
    chain, so suffix matching is a broadcast EQUI-join, never a
    LIKE/regex theta-join. Synthetic crawl: head hosts plus cdn.*
    subdomain mirrors; the blocklist catches both the apex and every
    subdomain, and survivors carry a null verdict."""
    docs = _docs(spark, sf_dir).select("doc_id")
    hidx = F.when(F.col("doc_id") % 10 < 5, F.lit(0)) \
            .otherwise((F.col("doc_id") % 10).cast("int"))
    host = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("cdn.")).otherwise(F.lit("")),
        F.format_string("host%02d.example", hidx))
    pages = docs.select("doc_id", F.concat(
        F.lit("https://"), host,
        F.format_string("/%08d", F.col("doc_id"))).alias("url"))
    bl = spark.createDataFrame([(d,) for d in BLOCKED_DOMAINS],
                               "domain string")
    out = domain_blocklist_filter(pages, bl)
    return out.select("doc_id", "url", "blocked_by")


def q_badword_filter(spark, sf_dir):
    """C4-style token blocklist (operators/blocklist.py): distinct
    (doc, token) pairs equi-join the broadcast word list — no per-doc
    regex alternation. Returns per-doc distinct-hit count and the
    lexicographically first hit."""
    bw = spark.createDataFrame([(w,) for w in BADWORDS], "word string")
    return badword_filter(_docs(spark, sf_dir), bw) \
        .select("doc_id", "n_badwords", "first_badword")


MIX_ALPHA = 0.7          # mixture temperature (Gopher/LLaMA-style)
MIX_BUDGET = 1_000_000   # training-run token budget


def q_source_mixture_weights(spark, sf_dir):
    """Temperature-α source mixture plan (operators/mixture.py): per
    source label, natural token share, α-scaled normalized mix weight,
    the token draw under MIX_BUDGET, and the implied epochs. One
    combinable groupBy over the corpus; the normalizers broadcast back
    onto the one-row-per-source table."""
    return mixture_weights(_docs(spark, sf_dir), MIX_ALPHA, MIX_BUDGET)


def q_quality_scores(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id", F.round(quality_score("text"), 6).alias("quality"))


def q_lang_distribution(spark, sf_dir):
    return (_docs(spark, sf_dir)
            .groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.round(F.avg(token_count("text")), 6).alias("avg_tokens")))


def q_lang_id(spark, sf_dir):
    toks = tokens("text")
    scores = {
        lang: F.size(F.filter(toks, lambda t: F.lower(t).isin(*words)))
        for lang, words in _STOP.items()
    }
    s = scores
    guess = (
        F.when((s["de"] + s["en"] + s["fr"] + s["uk"]) == 0, "und")
         .when((s["de"] >= s["en"]) & (s["de"] >= s["fr"])
               & (s["de"] >= s["uk"]), "de")
         .when((s["en"] >= s["fr"]) & (s["en"] >= s["uk"]), "en")
         .when(s["fr"] >= s["uk"], "fr")
         .otherwise("uk"))
    return _docs(spark, sf_dir).select("doc_id", guess.alias("lang_guess"))


def q_ngram_jaccard_pairs(spark, sf_dir):
    pairs = ngram_jaccard_pairs(_docs(spark, sf_dir), k=3,
                                threshold=JACCARD_T)
    return pairs.select(F.col("id_a").alias("doc_id_a"),
                        F.col("id_b").alias("doc_id_b"),
                        F.round("jaccard", 6).alias("jaccard"))


def q_ngram_df_cut_stats(spark, sf_dir):
    """The df-cut's audit log as an oracled query: distinct shingles,
    how many the default cut would drop, and the hottest shingle's
    document frequency — the skew evidence logged alongside
    ngram_jaccard_pairs runs."""
    return df_cut_stats(_docs(spark, sf_dir), k=3, max_doc_freq=1000)


def _verified_near_dup_pairs(spark, sf_dir):
    """Shared MinHash→LSH→verify chain. Signatures are persisted: the
    Arrow-UDF subtree feeds three consumers (banding + both verify
    sides) and would otherwise be recomputed per branch — at scale this
    materialization is the warehouse signature checkpoint
    (pipeline.run_resumable); in-session, MEMORY_AND_DISK persist."""
    cfg = PipelineConfig(num_perm=128, lsh_bands=32,
                         jaccard_threshold=JACCARD_T)
    docs = _docs(spark, sf_dir).select(
        F.format_string("%012d", F.col("doc_id")).alias("url"), "text")
    sigs = signatures(docs, cfg).persist()
    return verify_pairs(candidate_pairs(sigs, cfg), sigs,
                        cfg.jaccard_threshold, cfg)


def q_minhash_lsh_pairs(spark, sf_dir):
    """Approximate path whose output must equal the exact n-gram query —
    same shingle config, LSH candidates + exact verify."""
    verified = _verified_near_dup_pairs(spark, sf_dir)
    return verified.select(
        F.col("url_a").cast("long").alias("doc_id_a"),
        F.col("url_b").cast("long").alias("doc_id_b"),
        F.round("jaccard", 6).alias("jaccard"))


def q_cc_clusters(spark, sf_dir):
    """Clusters over the scale path (MinHash/LSH candidates + exact
    verify); the oracle closes over the exact n-gram pairs — equality
    holds because verify keeps exactly the pairs with true Jaccard ≥ T
    and the LSH s-curve at (32 bands × 4 rows) has ~1-5e-8 miss mass
    at T=0.8."""
    verified = _verified_near_dup_pairs(spark, sf_dir)
    edges = verified.select(F.col("url_a").alias("src"),
                            F.col("url_b").alias("dst"))
    assign = connected_components(edges)
    return assign.select(F.col("cluster_id").cast("long").alias("cluster_id"),
                         F.col("url").cast("long").alias("doc_id"))


def q_neardup_keep_best(spark, sf_dir):
    """Quality-aware survivor policy (operators/decisions.keep_best):
    same flagship near-dup clusters as cc_clusters, but the KEPT member
    is the cluster's longest document (RefinedWeb-style keep-longest;
    ties → smallest doc_id), not the smallest id. One window exchange
    over the cluster assignment."""
    verified = _verified_near_dup_pairs(spark, sf_dir)
    edges = verified.select(F.col("url_a").alias("src"),
                            F.col("url_b").alias("dst"))
    assign = connected_components(edges).select(
        F.col("cluster_id").cast("long").alias("cluster_id"),
        F.col("url").cast("long").alias("doc_id"))
    members = assign.join(
        _docs(spark, sf_dir).select("doc_id", "n_chars"), "doc_id")
    out = keep_best(members, "n_chars", cluster_col="cluster_id",
                    id_col="doc_id")
    return out.select("cluster_id", "doc_id", "n_chars", "action",
                      "reason")


def q_dedup_recall_audit(spark, sf_dir):
    """The north rule's headline metric as a first-class query output
    (operators/audit.pair_recall_audit): recall + precision of the
    approximate scale path (MinHash→LSH→sketch verify) against the
    EXACT n-gram Jaccard pair set, both computed in Spark on the same
    corpus at the same shingle config. The oracle recomputes n_truth
    exactly in DuckDB and asserts recall = precision = 1.0 — the
    s-curve contract of (32 bands × 4 rows) at T=0.8 (miss mass
    ~1e-8); any approximate-path regression lands here as a value
    mismatch, not just in the pairwise queries."""
    detected = _verified_near_dup_pairs(spark, sf_dir).select(
        F.col("url_a").cast("long").alias("url_a"),
        F.col("url_b").cast("long").alias("url_b"))
    truth = ngram_jaccard_pairs(_docs(spark, sf_dir), k=3,
                                threshold=JACCARD_T).select(
        F.col("id_a").alias("url_a"), F.col("id_b").alias("url_b"))
    return pair_recall_audit(detected, truth).select(
        F.col("n_truth").cast("long").alias("n_truth"),
        F.col("n_detected").cast("long").alias("n_detected"),
        F.col("n_hit").cast("long").alias("n_hit"),
        F.round("recall", 6).alias("recall"),
        F.round("precision", 6).alias("precision"))


def q_oph_recall_audit(spark, sf_dir):
    """Same audit as dedup_recall_audit, but the signature stage runs
    ONE-PERMUTATION hashing with rotation densification
    (operators/minhash._oph_block — O(1) work per shingle instead of
    O(num_perm); Li/Owen/Zhang 2012, Shrivastava/Li 2014) through the
    identical LSH banding + sketch-bounded exact verify. The oracle
    asserts recall = precision = 1.0 against the exact n-gram truth:
    per-slot collision probability is still ≈ true Jaccard, so the
    (32 bands × 4 rows) s-curve miss mass stays ~1e-8 at T=0.8 — a
    regression in the OPH kernel or its densification lands here as a
    value mismatch."""
    cfg = PipelineConfig(num_perm=128, lsh_bands=32,
                         jaccard_threshold=JACCARD_T, sig_scheme="oph")
    docs = _docs(spark, sf_dir).select(
        F.format_string("%012d", F.col("doc_id")).alias("url"), "text")
    sigs = signatures(docs, cfg).persist()
    detected = verify_pairs(candidate_pairs(sigs, cfg), sigs,
                            cfg.jaccard_threshold, cfg).select(
        F.col("url_a").cast("long").alias("url_a"),
        F.col("url_b").cast("long").alias("url_b"))
    truth = ngram_jaccard_pairs(_docs(spark, sf_dir), k=3,
                                threshold=JACCARD_T).select(
        F.col("id_a").alias("url_a"), F.col("id_b").alias("url_b"))
    return pair_recall_audit(detected, truth).select(
        F.col("n_truth").cast("long").alias("n_truth"),
        F.col("n_detected").cast("long").alias("n_detected"),
        F.col("n_hit").cast("long").alias("n_hit"),
        F.round("recall", 6).alias("recall"),
        F.round("precision", 6).alias("precision"))


# sliding-window long docs: window w concatenates docs
# [S*w, S*w + W) ordered by doc_id, so every window exceeds sketch_k
# shingles (truncated regime) and adjacent windows have controlled
# overlap — Δ=1 windows share 38/42 of their doc mass (j ≈ 0.9),
# Δ=2 share 36/44 (j ≈ 0.82), Δ≥3 fall below threshold. This is the
# driver-gate coverage for the verify stage's TRUNCATED sketch path
# (bottom-k estimate + borderline exact re-verify): surviving pairs
# land in the borderline band and are exact-verified, so membership
# equals the DuckDB string-shingle oracle value-for-value.
LONGDOC_W = 40
LONGDOC_S = 2


def q_sketch_verify_longdocs(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    n = docs.count()
    # size fence: the docs × windows range join below is a broadcast
    # nested-loop by construction (inequality predicate) — O(N · N/S)
    # row comparisons. That is the point at harness scale (it BUILDS the
    # long-doc fixture), but fail loudly instead of letting it run
    # against a big sf (same guard as q_simhash_block_recall).
    if n > 50_000:
        raise ValueError(
            f"q_sketch_verify_longdocs window-builder range join fenced "
            f"at 50000 docs (got {n}); run it on a small sf only")
    n_w = (n - LONGDOC_W) // LONGDOC_S + 1
    wins = spark.range(n_w).select(F.col("id").alias("w"))
    ld = (docs.join(
            F.broadcast(wins),
            (F.col("doc_id") >= F.col("w") * LONGDOC_S)
            & (F.col("doc_id") < F.col("w") * LONGDOC_S + LONGDOC_W))
          .groupBy("w")
          .agg(F.array_join(
              F.transform(
                  F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                  lambda x: x["text"]), " ").alias("text"))
          .select(F.format_string("%06d", "w").alias("url"), "text"))
    cfg = PipelineConfig(num_perm=128, lsh_bands=32,
                         jaccard_threshold=JACCARD_T)
    sigs = signatures(ld, cfg).persist()
    out = verify_pairs(candidate_pairs(sigs, cfg), sigs,
                       cfg.jaccard_threshold, cfg)
    return out.select(F.col("url_a").cast("long").alias("window_a"),
                      F.col("url_b").cast("long").alias("window_b"))


def q_lsh_hot_bucket_clusters(spark, sf_dir):
    """Hot-bucket degradation, driver-gated end-to-end: every run of 25
    consecutive doc_ids shares one text (the run leader's), so each LSH
    band bucket holds 25 identical signatures — far above the forced
    hot_bucket_limit=5 — and the pairing MUST take the O(s) star-edge
    path (operators/lsh.py:55-57). Star edges verify at jaccard 1.0 and
    connected components recovers exactly the 25-doc groups; the oracle
    is the closed-form grouping (cluster = run leader), so any loss of
    connectivity under skew degradation breaks the hash match."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    leader = (F.col("doc_id") - F.col("doc_id") % 25).alias("leader")
    leaders = docs.select(leader, "text").filter(
        F.col("doc_id") % 25 == 0).withColumnRenamed("text", "ltext")
    cloned = (docs.select("doc_id", leader)
              .join(F.broadcast(leaders), "leader")
              .select(F.format_string("%012d", "doc_id").alias("url"),
                      F.col("ltext").alias("text")))
    cfg = PipelineConfig(num_perm=128, lsh_bands=32,
                         jaccard_threshold=JACCARD_T, hot_bucket_limit=5)
    sigs = signatures(cloned, cfg).persist()
    edges = verify_pairs(candidate_pairs(sigs, cfg), sigs,
                         cfg.jaccard_threshold, cfg) \
        .select(F.col("url_a").alias("src"), F.col("url_b").alias("dst"))
    assign = connected_components(edges)
    return assign.select(F.col("cluster_id").cast("long").alias("cluster_id"),
                         F.col("url").cast("long").alias("doc_id"))


def q_ann_cosine_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    out = cosine_topk(emb, emb.filter(F.col("vec_id") < ANN_NQ), k=ANN_K)
    return out.select("query_id", "neighbor_id", "sim",
                      F.col("rank").cast("long").alias("rank"))


def q_embedding_cosine_pairs(spark, sf_dir):
    emb = _emb(spark, sf_dir).filter(F.col("vec_id") < 200)
    return cosine_pairs_above(emb, COSINE_T).select(
        F.col("id_a").alias("vec_id_a"), F.col("id_b").alias("vec_id_b"),
        "sim")


def _semantic_corpus(spark, sf_dir):
    """embeddings ∪ scale-collinear copies — the deterministic
    semantic-dup harness (the raw table is 500 independent random
    vectors with max pairwise cosine ≈ 0.48, far below SEM_T, so dup
    structure is planted): vec_id%7==0 gains a ×1.5 copy at id+10000,
    vec_id%14==0 ADDITIONALLY a ×0.25 copy at id+20000 — cosine with
    the original is exactly 1.0 (scale-invariant), every other pair
    stays < 0.5, so the SEM_T gate has no rounding-boundary risk and
    nearest-centroid assignment provably co-locates each dup group in
    one cell."""
    base = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    c1 = base.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.5)).alias("embedding"))
    c2 = base.filter(F.col("vec_id") % 14 == 0).select(
        (F.col("vec_id") + 20000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(0.25)).alias("embedding"))
    return base.unionByName(c1).unionByName(c2)


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup (operators/semantic.py) with pinned centroids — the
    embeddings of the SEM_K smallest vec_ids — so the whole chain
    (assignment argmax, within-cell pairing, cosine verify, connected
    components, lowest-centroid-sim keep rule) is mirrored
    value-for-value by the DuckDB oracle. The trained-centroid
    (ivf_centroids) and hot-cell star paths are unit-tested
    (tests/test_semantic.py)."""
    # persist the synthesized corpus: semantic_dedup scans its vectors
    # three times (assignment + both verify sides) — the same
    # materialize-shared-subtree pattern as _verified_near_dup_pairs'
    # signature persist; at scale this is the warehouse embedding
    # checkpoint. Measured −12% on the contract query at sf0.1.
    corpus = _semantic_corpus(spark, sf_dir).persist()
    cents = (_emb(spark, sf_dir).filter(F.col("vec_id") < SEM_K)
             .select(F.col("vec_id").cast("int").alias("cell_id"),
                     F.col("embedding").cast("array<double>").alias("cv")))
    out = semantic_dedup(corpus, threshold=SEM_T, centroids=cents)
    return out.select(F.col("vec_id").cast("long").alias("vec_id"),
                      F.col("cell_id").cast("long").alias("cell_id"),
                      "centroid_sim",
                      F.col("cluster_id").cast("long").alias("cluster_id"),
                      "action")


def q_dsir_select(spark, sf_dir):
    """DSIR importance resampling (operators/importance.py): fr-language
    docs are the trusted target sample, everything else is the raw
    crawl; keep the DSIR_K raw docs whose hashed unigram+bigram
    distribution best matches the target. Deterministic variant
    (integer micro-log-ratio weights, id tie-break) — the oracle
    re-derives buckets (sha256 prefix mod DSIR_BUCKETS), smoothed log
    ratios, per-doc integer weights, and the top-k value-for-value.
    The Gumbel resampling variant is unit-tested Spark-side."""
    docs = _docs(spark, sf_dir)
    target = docs.filter(F.col("lang") == "fr").select("doc_id", "text")
    raw = docs.filter(F.col("lang") != "fr").select("doc_id", "text")
    return dsir_select(raw, target, DSIR_K, n_buckets=DSIR_BUCKETS)


def q_multimodal_binary_meta(spark, sf_dir):
    return binary_meta(with_payload(_docs(spark, sf_dir)))


def q_tpch_pricing_summary(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    d = F.col("l_discount").cast("decimal(18,2)")
    ep = F.col("l_extendedprice").cast("decimal(18,2)")
    out = (li.filter(F.col("l_shipdate") <=
                     F.lit("1998-09-02 00:00:00").cast("timestamp"))
           .groupBy("l_returnflag", "l_linestatus")
           .agg(F.sum("l_quantity").alias("sum_qty"),
                F.sum(ep).alias("_sbp"),
                F.sum(ep * (F.lit(1).cast("decimal(18,2)") - d)).alias("_sdp"),
                F.count("*").alias("count_order")))
    return out.select(
        "l_returnflag", "l_linestatus", "sum_qty",
        F.col("_sbp").cast("double").alias("sum_base_price"),
        F.col("_sdp").cast("double").alias("sum_disc_price"),
        F.round(F.col("sum_qty") / F.col("count_order"), 6).alias("avg_qty"),
        "count_order")


def q_top_orders_per_customer(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    top = (orders.withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") <= 3))
    return (top.join(F.broadcast(cust),
                     top.o_custkey == cust.c_custkey)
            .select("c_custkey", "c_name", "o_orderkey", "o_totalprice",
                    F.col("rn").cast("long").alias("rn")))


def q_nation_order_revenue(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    tp = F.col("o_totalprice").cast("decimal(18,2)")
    return (orders
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .groupBy("n_name")
            .agg(F.count("*").alias("n_orders"),
                 F.sum(tp).cast("double").alias("total_revenue")))


def q_region_nation_count(spark, sf_dir):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    return (nation.join(F.broadcast(region),
                        nation.n_regionkey == region.r_regionkey)
            .groupBy("r_name").agg(F.count("*").alias("n_nations")))


def _containment_harness(spark, sf_dir):
    """base docs (≥250 chars) ∪ planted inner slices (tokens 5..34 of
    every 5th doc, id shifted) — deterministic containment ground truth."""
    docs = _docs(spark, sf_dir).filter(F.length("text") >= 250)
    base = docs.select("doc_id", "text")
    inner = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + SHIFT).alias("doc_id"),
        F.array_join(F.slice(F.split("text", " "), 5, 30), " ")
         .alias("text"))
    return base.unionByName(inner)


def q_substring_containment(spark, sf_dir):
    u = _containment_harness(spark, sf_dir)
    pairs = containment_pairs(u, url_col="doc_id")
    return pairs.select(
        F.col("url_inner").cast("long").alias("doc_id_inner"),
        F.col("url_outer").cast("long").alias("doc_id_outer"))


def q_lcs_verify(spark, sf_dir):
    """Suffix/rolling-hash LCS over the planted containment pairs; the
    oracle closes the loop: LCS(inner, outer) == length(inner) exactly
    when inner ⊆ outer."""
    u = _containment_harness(spark, sf_dir)
    pairs = u.filter(F.col("doc_id") >= SHIFT).select(
        F.col("doc_id").alias("url_a"),
        (F.col("doc_id") - SHIFT).alias("url_b"))
    out = lcs_verify(pairs, u, url_col="doc_id")
    return out.select(F.col("url_a").cast("long").alias("doc_id_inner"),
                      F.col("url_b").cast("long").alias("doc_id_outer"),
                      "lcs_len")


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def q_events_sessions(spark, sf_dir):
    return session_stats(_events(spark, sf_dir), gap_minutes=30)


def q_events_hourly(spark, sf_dir):
    return hourly_rollup(_events(spark, sf_dir))


def q_events_dup_groups(spark, sf_dir):
    return duplicate_events(_events(spark, sf_dir))


# approximate operators, surfaced as deterministic 1-row recall checks
# (oracle = the pinned expected constants; everything is seeded, so the
# driver re-derives the exact same numbers every run)

def q_simhash_block_recall(spark, sf_dir):
    """Manku block-join exactness check: the banded equi-join must find
    EXACTLY the pairs a brute-force all-pairs Hamming scan finds
    (pigeonhole: hamming_max < n_blocks). 1 row: counts + recall."""
    docs = _docs(spark, sf_dir).select(
        F.format_string("%012d", "doc_id").alias("url"), "text")
    # size fence: the brute-force side is O(N^2) by design (it IS the
    # recall oracle); fail loudly instead of cross-joining a big sf
    n_docs = docs.count()
    if n_docs > 50_000:
        raise ValueError(
            f"q_simhash_block_recall brute-force baseline fenced at "
            f"50000 docs (got {n_docs}); run it on a small sf only")
    cfg = PipelineConfig(simhash_hamming_max=3)
    sims = simhash(docs).persist()
    blocked = simhash_pairs(sims, cfg)
    a = sims.select(F.col("url").alias("url_a"),
                    F.col("simhash").alias("sh_a"))
    b = sims.select(F.col("url").alias("url_b"),
                    F.col("simhash").alias("sh_b"))
    brute = (a.crossJoin(b)
             .filter((F.col("url_a") < F.col("url_b"))
                     & (F.col("sh_a") != 0) & (F.col("sh_b") != 0))
             .withColumn("hamming",
                         F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
             .filter(F.col("hamming") <= cfg.simhash_hamming_max)
             .select("url_a", "url_b"))
    n_blocked = blocked.count()
    n_brute = brute.count()
    n_matched = blocked.select("url_a", "url_b") \
        .join(brute, ["url_a", "url_b"], "inner").count()
    sims.unpersist()
    return spark.createDataFrame(
        [(n_blocked, n_brute, n_matched,
          round(n_matched / n_brute, 6) if n_brute else 1.0)],
        "n_pairs_blocked long, n_pairs_brute long, n_matched long, "
        "recall double")


def _topk_recall_row(spark, approx: DataFrame, exact: DataFrame,
                     k: int, nq: int, floor: int) -> DataFrame:
    """Floor-gated recall row (VERDICT r4 #4 / ADVICE wording): n_truth
    is corpus-derived (a regression in the EXACT side shifts it and is
    caught by the oracle's SQL recomputation); the approximate side is
    gated as ``n_hits >= floor`` rather than a bit-exact pinned count,
    so a benign seeding/rounding change that keeps recall at-or-above
    the measured floor stays green while a real recall regression goes
    red. ``recall_floor`` = floor/n_truth is the guaranteed lower bound,
    deterministic on both sides."""
    truth = exact.select("query_id", "neighbor_id")
    hits = approx.select("query_id", "neighbor_id") \
        .join(truth, ["query_id", "neighbor_id"], "inner").count()
    n_truth = truth.count()
    return spark.createDataFrame(
        [(nq, k, n_truth, floor, hits >= floor,
          round(floor / n_truth, 6))],
        "n_queries long, k long, n_truth long, n_hits_floor long, "
        "meets_floor boolean, recall_floor double")


# ANN RECALL FLOOR PROVENANCE: measured at sf0.01 (embeddings = 500 ×
# 64-dim), nq=10 (vec_id < 10), k=10, xxhash64-seeded hyperplanes /
# centroid init (operators/ann.py, seed=42). The floors are the exact
# hit counts observed under that config tuple:
#   95 ← cosine_topk_lsh(n_planes=3, n_tables=16)
#   91 ← cosine_topk_ivf(n_cells=8, n_probe=6, 2 Lloyd iterations)
# VALID AT sf0.01 ONLY — the driver's CORRECTNESS scale. At other scale
# factors the corpus changes and the floors do not transfer: a red on
# these queries at sf0.001 is EXPECTED, not a regression (n_truth
# adapts via the oracle's SQL, the floor constant does not).
ANN_LSH_HITS_FLOOR = 95
ANN_IVF_HITS_FLOOR = 91


def q_ann_lsh_recall(spark, sf_dir):
    """Hyperplane-LSH ANN recall vs brute force, same (seeded) params the
    rows-only query used — floor-gated (see ANN_LSH_HITS_FLOOR)."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < ANN_NQ)
    approx = cosine_topk_lsh(emb, q, k=ANN_K, n_planes=3, n_tables=16)
    exact = cosine_topk(emb, q, k=ANN_K)
    return _topk_recall_row(spark, approx, exact, ANN_K, ANN_NQ,
                            ANN_LSH_HITS_FLOOR)


def q_ann_ivf_recall(spark, sf_dir):
    """IVF ANN recall vs brute force (seeded sample centroids + 2 Lloyd
    k-means iterations — 91/100 at 8 cells / 6 probes vs 88 unrefined);
    floor-gated (see ANN_IVF_HITS_FLOOR)."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < ANN_NQ)
    approx = cosine_topk_ivf(emb, q, k=ANN_K, n_cells=8, n_probe=6)
    exact = cosine_topk(emb, q, k=ANN_K)
    return _topk_recall_row(spark, approx, exact, ANN_K, ANN_NQ,
                            ANN_IVF_HITS_FLOOR)


def q_embedding_pairs_lsh_recall(spark, sf_dir):
    """Scale-path embedding pairing (cosine_pairs_lsh: multi-table
    hyperplane buckets + hot-bucket star edges + exact verify) vs the
    exact all-pairs baseline, floor-gated at recall 1.0: the oracle
    derives ``n_pairs_exact`` from the corpus in SQL (a regression in
    the exact side shifts it and is caught) and the bucketed path is
    gated as ``n_matched >= n_pairs_exact`` (meets_floor) rather than a
    triple pinned equality — the final exact-verify step makes false
    positives impossible, so only a recall LOSS can flip this red.
    Floor measured at sf0.01 under (3 planes × 16 tables, xxhash64
    seed 42); valid at sf0.01 only, like the ANN floors above."""
    emb = _emb(spark, sf_dir)
    exact = cosine_pairs_above(emb, COSINE_T).select("id_a", "id_b")
    lsh = cosine_pairs_lsh(emb, COSINE_T, n_planes=3, n_tables=16) \
        .select("id_a", "id_b")
    n_exact = exact.count()
    n_matched = lsh.join(exact, ["id_a", "id_b"], "inner").count()
    return spark.createDataFrame(
        [(n_exact, n_matched >= n_exact, 1.0)],
        "n_pairs_exact long, meets_floor boolean, recall_floor double")


def q_multimodal_features(spark, sf_dir):
    """Feature extraction through the (stub) decoder; the raw
    array<float> is projected to a canonical integer-string key
    (round(f*255) recovers the sha256 bytes exactly) so the driver can
    hash rows AND DuckDB can reproduce it in SQL."""
    feats = extract_features(with_payload(_docs(spark, sf_dir)))
    key = F.array_join(
        F.transform("feature",
                    lambda x: F.round(x * 255).cast("int").cast("string")),
        ",")
    return feats.select("doc_id", "n_bytes", key.alias("feature_key"))


def q_png_decode_features(spark, sf_dir):
    """REAL PNG decode driver-gated end-to-end (VERDICT r3 next #1): a
    deterministic solid-color PNG is synthesized per doc (dimensions and
    RGB derived from doc_id; the row filter CYCLES through all five
    types 0-4, so the gate exercises Sub/Up/Average/Paeth defiltering,
    not just the trivial path), pushed through the Arrow-batched
    ``extract_features`` where ``decode_image`` must decode the actual
    zlib-compressed pixels. For a solid h×w image of color (r,g,b) the
    pixel-statistics feature is closed-form — [h/4096, w/4096, r/255,
    g/255, b/255, 0, 0, 0] — so DuckDB reproduces the expected key from
    doc_id alone; a decoder that falls back to the sha256 stub (or
    mis-defilters a single byte) hash-mismatches."""
    import numpy as np
    import pandas as pd

    from duplicate_finder_spark.operators.multimodal import encode_png

    docs = _docs(spark, sf_dir).select("doc_id")

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                h, w = 1 + i % 5, 1 + (i // 5) % 5
                color = [i % 256, (i * 7) % 256, (i * 13) % 256]
                img = np.full((h, w, 3), color, dtype=np.uint8)
                payloads.append(encode_png(img, row_filters=[i % 5]))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    pages = docs.mapInPandas(gen, "doc_id long, payload binary")
    feats = extract_features(pages)
    key = F.array_join(
        F.transform("feature",
                    lambda x: F.round(x * 1000000).cast("int")
                    .cast("string")), ",")
    return feats.select("doc_id", key.alias("feature_key"))


def q_webp_decode_features(spark, sf_dir):
    """REAL WebP-lossless decode driver-gated end-to-end: a solid-color
    VP8L file is synthesized per doc (dims/color from doc_id; the
    writer CYCLES its option paths — literal, LZ77 runs, color cache,
    SUBTRACT_GREEN, every PREDICTOR mode, cross-color, palette with
    bundling — so the gate exercises each decoder branch, not one
    stream shape) and pushed through the Arrow-batched
    ``extract_features`` where ``decode_image`` must entropy-decode
    and inverse-transform the actual bits.  Lossless ⇒ the solid-color
    pixel-statistics feature is closed-form from doc_id; one stub
    fallback or one mis-inverted transform hash-mismatches."""
    import numpy as np
    import pandas as pd

    from duplicate_finder_spark.operators.webpcodec import encode_webp

    docs = fan_out(_docs(spark, sf_dir).select("doc_id"))

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                h, w = 1 + i % 6, 1 + (i // 6) % 7
                img = np.full((h, w, 3),
                              [(i * 3) % 256, (i * 11) % 256,
                               (i * 17) % 256], dtype=np.uint8)
                kw = ({}, {"use_lz77": True}, {"cache_bits": 4},
                      {"subtract_green": True}, {"predictor": i % 14},
                      {"color_transform":
                       (i % 256, (i * 5) % 256, (i * 9) % 256)},
                      {"palette": True})[i % 7]
                payloads.append(encode_webp(img, **kw))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    pages = docs.mapInPandas(gen, "doc_id long, payload binary")
    feats = extract_features(pages)
    key = F.array_join(
        F.transform("feature",
                    lambda x: F.round(x * 1000000).cast("int")
                    .cast("string")), ",")
    return feats.select("doc_id", key.alias("feature_key"))


def q_jpeg_decode_features(spark, sf_dir):
    """REAL baseline-JPEG decode driver-gated end-to-end: a solid-color
    JPEG is synthesized per doc (dims/color from doc_id; the encoder
    CYCLES subsampling 4:4:4 / 4:2:0 and restart intervals 0/1/2, so
    the gate covers interleaved-MCU upsampling and RSTn predictor
    resets, not just the trivial stream shape) and pushed through the
    Arrow-batched ``extract_features``, where ``decode_image`` must
    Huffman-decode + IDCT the actual entropy-coded bits.  JPEG is
    lossy, so instead of a closed-form feature key the Spark side
    asserts the decode against the known ground truth — dimensions
    exact, per-channel mean within the measured solid-color bound
    (≤ 3/255) — and emits a boolean; DuckDB's oracle is the constant
    TRUE row set, so one stub fallback (sha256 features) or one
    mis-decoded block hash-mismatches the gate."""
    import numpy as np
    import pandas as pd

    from duplicate_finder_spark.operators.jpegcodec import encode_jpeg

    docs = _docs(spark, sf_dir).select("doc_id")

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            payloads, expect = [], []
            for i in ids:
                i = int(i)
                h, w = 1 + i % 5, 1 + (i // 5) % 5
                color = [i % 256, (i * 7) % 256, (i * 13) % 256]
                img = np.full((h, w, 3), color, dtype=np.uint8)
                payloads.append(encode_jpeg(
                    img, quality=90,
                    subsampling="420" if i % 2 else "444",
                    restart_interval=i % 3))
                expect.append([h / 4096.0, w / 4096.0,
                               *(c / 255.0 for c in color)])
            yield pd.DataFrame({"doc_id": ids, "payload": payloads,
                                "expect": expect})

    pages = docs.mapInPandas(
        gen, "doc_id long, payload binary, expect array<double>")
    feats = extract_features(pages.select("doc_id", "payload"))
    joined = feats.join(pages.select("doc_id", "expect"), "doc_id")
    # image_feature rounds to 6dp, so "exact" dims compare within the
    # rounding (1e-6) — an off-by-one dimension differs by 1/4096 ≈ 2.4e-4
    dims_ok = (F.abs(F.col("feature")[0] - F.col("expect")[0]) < 1e-4) & \
        (F.abs(F.col("feature")[1] - F.col("expect")[1]) < 1e-4)
    chan_ok = None
    for k in range(2, 5):
        c = F.abs(F.col("feature")[k] - F.col("expect")[k]) <= 3.0 / 255
        chan_ok = c if chan_ok is None else (chan_ok & c)
    return joined.select("doc_id", (dims_ok & chan_ok).alias("ok"))


def q_wav_audio_features(spark, sf_dir):
    """REAL WAV decode driver-gated end-to-end (completes the modality
    set: image=png/jpeg gates, video=avi gate, audio=this): a
    deterministic PCM WAV is synthesized per doc — constant-amplitude
    signal c = m/64 with m from doc_id, n = 100 + doc_id%50 samples at
    8 kHz, CYCLING bits 8/16 and channels 1/2 (stereo carries the same
    signal on both channels, so mono-mix preserves c) — and pushed
    through ``extract_features(modality='audio')``.  Every feature is
    closed-form: duration n/(8000·3600), rms=peak=bands=c, zcr=0; the
    amplitudes are chosen so c·10⁶ is an integer (m/64 · 10⁶ =
    15625·m), so the 6-dp rounding on both sides is exact and DuckDB
    reproduces the key digit-for-digit from doc_id alone.  A stub
    fallback (sha256 bytes) or any PCM/mono-mix bug hash-mismatches."""
    import struct

    import pandas as pd

    docs = _docs(spark, sf_dir).select("doc_id")

    def wav_bytes(i: int) -> bytes:
        m = 1 + i % 63
        n = 100 + i % 50
        bits = 16 if i % 2 else 8
        channels = 1 + (i // 2) % 2
        rate = 8000
        if bits == 16:
            frame = struct.pack("<h", 512 * m) * channels
        else:
            frame = bytes([128 + 2 * m]) * channels
        data = frame * n
        block = channels * bits // 8
        fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block,
                          block, bits)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame({
                "doc_id": ids,
                "payload": [wav_bytes(int(i)) for i in ids]})

    pages = docs.mapInPandas(gen, "doc_id long, payload binary")
    feats = extract_features(pages, modality="audio")
    key = F.array_join(
        F.transform("feature",
                    lambda x: F.round(x * 1000000).cast("int")
                    .cast("string")), ",")
    return feats.select("doc_id", key.alias("feature_key"))


def q_avi_frame_sample(spark, sf_dir):
    """REAL video frame sampling driver-gated end-to-end: a deterministic
    MJPEG-AVI is synthesized per doc (1 + doc_id%6 solid 8x8 frames,
    colors derived from doc_id and frame index), pushed through
    ``sample_frames`` (RIFF walk → even sampling → contained JPEG
    payloads), and each sampled frame is decoded and checked against its
    known color.  The SAMPLING LOGIC is oracled closed-form: DuckDB
    recomputes the expected (doc_id, frame_no) fanout as i*n//m over
    m = min(3, n) — a wrong frame index, a dropped row, or a stub
    fallback (which emits byte slices, not decodable frames) all
    hash-mismatch."""
    import numpy as np
    import pandas as pd

    from duplicate_finder_spark.operators.avicodec import encode_avi_mjpeg
    from duplicate_finder_spark.operators.jpegcodec import decode_jpeg
    from duplicate_finder_spark.operators.multimodal import sample_frames

    docs = _docs(spark, sf_dir).select("doc_id")

    def color(i: int, j: int) -> list[int]:
        return [(i * 17 + j * 31) % 256, (i * 7) % 256, (j * 53) % 256]

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                n = 1 + i % 6
                frames = [np.full((8, 8, 3), color(i, j), np.uint8)
                          for j in range(n)]
                payloads.append(encode_avi_mjpeg(frames, quality=90))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    pages = docs.mapInPandas(gen, "doc_id long, payload binary")
    sampled = sample_frames(pages, max_frames=3)

    def check(batches):
        for pdf in batches:
            oks = []
            for i, j, frame in zip(pdf["doc_id"].astype("int64"),
                                   pdf["frame_no"], pdf["frame"]):
                img = decode_jpeg(bytes(frame))
                exp = np.array(color(int(i), int(j)))
                oks.append(bool(img is not None
                                and img.shape == (8, 8, 3)
                                and np.abs(img.astype(int) - exp).max()
                                <= 2))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"),
                                "frame_no": pdf["frame_no"].astype("int32"),
                                "ok": oks})

    return sampled.mapInPandas(check, "doc_id long, frame_no int, ok boolean")


def q_streaming_neardup_pairs(spark, sf_dir):
    """The r4 STREAMING near-dup store driver-gated end-to-end: the
    corpus arrives as three micro-batches (doc_id % 3) through a real
    writeStream/foreachBatch run — warehouse-snapshot base + bucketed
    delta state, mid-stream compaction included (compact_every=2) —
    and the accumulated edge set must equal the BATCH pipeline's pair
    set value-for-value (same exact n-gram oracle as minhash_lsh_pairs:
    with an unexpired watermark, incremental new-vs-store pairing over
    micro-batches covers exactly the batch pair set, each pair found
    when its later member arrives). The url-hash batch split scatters
    near-dup pair members across different micro-batches, so the
    store-lookup (cross-batch) path is load-bearing, not incidental."""
    import shutil
    import tempfile

    from duplicate_finder_spark.streaming.neardup import (
        StreamingNearDup, streaming_near_dup)

    docs = _docs(spark, sf_dir).select(
        F.format_string("%012d", F.col("doc_id")).alias("url"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        "text")
    n = docs.count()
    if n > 50_000:
        raise ValueError(
            f"q_streaming_neardup_pairs harness fenced at 50000 docs "
            f"(got {n}); run it on a small sf only")
    cfg = PipelineConfig(num_perm=128, lsh_bands=32,
                         jaccard_threshold=JACCARD_T)
    root = tempfile.mkdtemp(prefix="snd_gate_")
    try:
        src = f"{root}/src"
        for b in range(3):
            docs.filter(F.pmod(F.xxhash64("url"), F.lit(3)) == b) \
                .coalesce(1).write.parquet(f"{src}/b{b}")
        snd = StreamingNearDup(spark, cfg, f"{root}/state",
                               watermark_minutes=10_000_000,
                               compact_every=2, edge_buckets=8)
        stream = (spark.readStream.schema(docs.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src + "/*"))
        q = streaming_near_dup(stream, snd, f"{root}/ckpt")
        q.awaitTermination()
        rows = [(int(r["url_a"]), int(r["url_b"]),
                 round(r["jaccard"], 6))
                for r in snd.edges().collect()]   # tiny: the pair set
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        rows, "doc_id_a long, doc_id_b long, jaccard double")


PARA_W = 3        # corpus-wide paragraph window (tokens)
GOPHER_W = 2      # within-doc repetition window (tokens)


def q_paragraph_dedup_stats(spark, sf_dir):
    """CCNet-style corpus-wide paragraph dedup accounting: the ~30-word
    vocabulary makes 3-token windows collide naturally across docs
    (sf0.01: 1,756 duplicate paragraphs), so keep-first semantics are
    exercised without a planted fixture."""
    return paragraph_dedup_stats(_docs(spark, sf_dir), w=PARA_W)


def q_paragraph_dedup_apply(spark, sf_dir):
    """Rewrite docs keeping first-occurrence paragraphs only; docs whose
    every paragraph duplicated an earlier one vanish (sf0.01: 487/500
    survive — the disappears-entirely edge is load-bearing)."""
    return paragraph_dedup_apply(_docs(spark, sf_dir), w=PARA_W)


def q_gopher_repetition(spark, sf_dir):
    """Gopher repetition signals (Rae et al. 2021 Table A1): within-doc
    duplicate-window fraction + char mass, and the top word-2-gram's
    character coverage, per document."""
    return repetition_signals(_docs(spark, sf_dir), w=GOPHER_W)


def q_gopher_quality_filter(spark, sf_dir):
    """The REST of Gopher Table A1 (Rae et al. 2021) beyond the
    repetition signals: word-count band, mean word length, symbol and
    bullet/ellipsis line ratios, alphabetic-word fraction, required
    stopwords — one codegen'd JVM projection, per-rule booleans plus
    the conjunctive pass flag (367/500 pass at sf0.01)."""
    return gopher_quality_signals(
        _docs(spark, sf_dir), min_words=GOPHER_MIN_WORDS,
        min_required_hits=GOPHER_MIN_STOPWORD_HITS)


def q_lm_perplexity(spark, sf_dir):
    """CCNet-style LM quality ranking: hashed add-one word-bigram model
    fit on the trusted sample (lang='fr', the same target split as
    dsir_select), every doc scored by integer micro-nat NLL. Target
    docs score lower (sf0.01: mean 9.34e6 vs 9.55e6 micro-nats/bigram)
    — the signal separates, deterministically."""
    docs = _docs(spark, sf_dir)
    return lm_score(docs, docs.filter(F.col("lang") == "fr"),
                    n_buckets=LM_BUCKETS)


CONTAM_N = 6      # probe n-gram length (GPT-3 used 13; scaled to corpus)
CENSUS_N = 3      # census n-gram length
EVAL_MOD = 50     # doc_id % EVAL_MOD == 7 → held-out "benchmark" docs


def q_eval_contamination(spark, sf_dir):
    """Benchmark decontamination: fraction of each held-out doc's word
    6-grams occurring verbatim in the training split (deterministic
    split: doc_id % 50 == 7 is eval). Planted near-dups score ~0.97,
    clean docs 0.0 — the gate separates cleanly at sf0.01. One pass
    over train with the eval gram set broadcast."""
    docs = _docs(spark, sf_dir)
    is_eval = (F.col("doc_id") % EVAL_MOD) == 7
    return contamination_check(docs.filter(~is_eval), docs.filter(is_eval),
                               n=CONTAM_N)


def q_ngram_dup_census(spark, sf_dir):
    """Memorization-risk audit: histogram of cross-document word-3-gram
    repetition — (n_docs, n_grams) for grams in ≥2 distinct docs. Gram
    text never shuffles (sha2 keys, map-side combine)."""
    return ngram_census(_docs(spark, sf_dir), n=CENSUS_N)


def q_curation_funnel(spark, sf_dir):
    """RefinedWeb-style curation chain composed from the engine's own
    operators — quality gate (min 20 tokens, Gopher dup-window ≤ 0.07)
    → eval decontamination (shared 6-gram ⇒ out) → CCNet paragraph
    dedup — with per-stage doc/char accounting. Every stage drops docs
    at sf0.01 (490 → 432 → 430 → 419), so the whole chain is
    load-bearing, not decorative."""
    return curation_funnel(_docs(spark, sf_dir),
                           (F.col("doc_id") % EVAL_MOD) == 7,
                           min_tokens=20, max_dup_frac=0.07,
                           gopher_w=GOPHER_W, contam_n=CONTAM_N,
                           para_w=PARA_W)


IMG_V_MOD = 251   # synthesized cell-value modulus (prime, < 256)


def _synth_images(spark, sf_dir):
    """Deterministic 16×16 image per doc: 8×8 grid of 2×2 constant
    cells, cell value ((src+1)·k²) % 251 with k = gy·8+gx+1 and
    src = doc_id (quadratic mixing decorrelates the 64-bit hashes
    across docs — a linear formula was measured at 29,903 hamming≤3
    pairs vs this formula's 324), except doc_id % 20 == 1 clones its
    predecessor's PIXELS (exact image dup) and % 20 == 2 clones
    doc_id−2 with ONE perturbed corner cell (near dup — the
    perturbation shifts the global mean, so which bits flip is decided
    by the same closed-form arithmetic the DuckDB oracle recomputes).
    The CONTAINER cycles by doc_id % 4 — PPM, PNG, GIF, lossless
    WebP — so clone pairs usually straddle formats: the downstream
    hash/near-dup gates only pass if every lossless decoder returns
    bit-identical pixels (re-encoded duplicates must cluster)."""
    import numpy as np
    import pandas as pd
    from duplicate_finder_spark.operators.multimodal import (encode_gif,
                                                             encode_png,
                                                             encode_ppm)
    from duplicate_finder_spark.operators.webpcodec import encode_webp

    def synth(batches):
        gy, gx = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
        k = (gy * 8 + gx + 1).astype(np.int64)
        encoders = (encode_ppm, encode_png, encode_gif,
                    lambda im: encode_webp(im, use_lz77=True,
                                           subtract_green=True))
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                src = d - 1 if d % 20 == 1 else \
                    (d - 2 if d % 20 == 2 else d)
                v = ((src + 1) * k * k) % IMG_V_MOD
                if d % 20 == 2:
                    v = v.copy()
                    v[0, 0] = (src * 7 + 97) % IMG_V_MOD
                px = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)
                img = np.stack([px.astype(np.uint8)] * 3, axis=2)
                payloads.append(encoders[d % 4](img))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": payloads})

    # per-row codec work: a tiny one-file scan must not serialize the
    # encode (and the consumer's decode) on a single core
    return (fan_out(_docs(spark, sf_dir).select("doc_id"))
            .mapInPandas(synth, "doc_id long, payload binary"))


def q_image_ahash(spark, sf_dir):
    """Perceptual average hash of every synthesized image through the
    REAL PPM decode path: integer-exact 8×8 mean-threshold bits packed
    as a signed 64-bit value. The oracle rebuilds every hash
    closed-form from doc_id — any decode or hash drift mismatches."""
    return image_hashes(_synth_images(spark, sf_dir))


def q_image_neardup_pairs(spark, sf_dir):
    """Image near-dup pairs: the SimHash Manku block join over aHashes
    (hamming ≤ 3, pigeonhole-exact with 4 blocks). Planted exact
    clones (doc_id % 20 == 1) land at hamming 0; the perturbed-corner
    plants (% 20 == 2) land wherever the closed-form arithmetic puts
    them. Oracle = brute-force Hamming over the recomputed hashes."""
    hashes = image_hashes(_synth_images(spark, sf_dir))
    return image_neardup_pairs(hashes, PipelineConfig(), n_blocks=4)


def q_image_dedup_decisions(spark, sf_dir):
    """End-to-end cross-format image dedup: aHash over the REAL
    decoders (the corpus cycles PPM/PNG/GIF/WebP containers) → Manku
    block join → connected components → keep-first survivor per
    cluster. Re-encodes of the same pixels collapse to one kept copy
    regardless of container; the oracle rebuilds pairs closed-form and
    runs a recursive-CTE components + min-keeps pass."""
    hashes = image_hashes(_synth_images(spark, sf_dir))
    pairs = image_neardup_pairs(hashes, PipelineConfig(), n_blocks=4)
    edges = pairs.select(F.col("doc_id_a").alias("src"),
                         F.col("doc_id_b").alias("dst"))
    assign = connected_components(edges)
    return assign.select(
        F.col("url").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
        F.when(F.col("url") == F.col("cluster_id"), F.lit("keep"))
        .otherwise(F.lit("delete")).alias("action"))


AUD_Q_MOD = 61    # synthesized window amplitude modulus (8-bit PCM
# quantum q/128 is a dyadic rational → the float energy comparison in
# audio_fingerprint64 is EXACT, so the oracle can rebuild every bit in
# integer arithmetic: 64·q_w ≥ Σq)


def _synth_wavs(spark, sf_dir):
    """Deterministic 8-bit PCM mono WAV per doc: 128 samples = 64
    2-sample windows of constant amplitude q(w) = (((src+2)·(w+1)²)
    % 251) % 61, src = doc_id (the double-mod decorrelates window
    profiles across docs — measured 324 hamming≤3 pairs vs ~1800 for
    single-mod variants); doc_id % 20 == 1 clones its predecessor
    exactly, % 20 == 2 clones doc_id−2 with window 0 perturbed to
    (src·7+43) % 61."""
    import struct

    import pandas as pd

    def wav_bytes(d: int) -> bytes:
        src = d - 1 if d % 20 == 1 else (d - 2 if d % 20 == 2 else d)
        qs = [(((src + 2) * (w + 1) * (w + 1)) % 251) % AUD_Q_MOD
              for w in range(64)]
        if d % 20 == 2:
            qs[0] = (src * 7 + 43) % AUD_Q_MOD
        data = bytes(128 + q for q in qs for _ in range(2))
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
                  + b"data" + struct.pack("<I", len(data)) + data)
        return (b"RIFF" + struct.pack("<I", 4 + len(chunks))
                + b"WAVE" + chunks)

    def synth(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": [wav_bytes(int(d)) for d in pdf["doc_id"]]})

    # per-row codec work: a tiny one-file scan must not serialize the
    # encode (and the consumer's decode) on a single core
    return (fan_out(_docs(spark, sf_dir).select("doc_id"))
            .mapInPandas(synth, "doc_id long, payload binary"))


def q_audio_fingerprint(spark, sf_dir):
    """Energy-profile fingerprint of every synthesized clip through the
    REAL RIFF/PCM decode: 64 window-vs-clip mean-energy bits packed as
    a signed 64-bit value. The oracle rebuilds every bit closed-form
    in integer arithmetic (the dyadic-exactness contract in
    operators/audiohash.py) — any decode or windowing drift
    mismatches."""
    return audio_hashes(_synth_wavs(spark, sf_dir))


def q_audio_neardup_pairs(spark, sf_dir):
    """Audio near-dup pairs: the SimHash Manku block join over energy
    fingerprints (hamming ≤ 3, pigeonhole-exact with 4 blocks), exact
    clones planted at doc_id % 20 == 1. Oracle = brute-force Hamming
    over the closed-form fingerprints."""
    hashes = audio_hashes(_synth_wavs(spark, sf_dir))
    return audio_neardup_pairs(hashes, PipelineConfig(), n_blocks=4)


VID_FRAMES = 6    # synthesized frames per video
VID_JACCARD = 0.45


def _synth_avis(spark, sf_dir):
    """Deterministic RIFF/AVI per doc whose movi ``00dc`` chunks carry
    16×16 PPM frames (the container walk returns raw payloads, so
    frame decode exercises the PPM path with closed-form pixels).
    Frame f cell k∈[1,64] value = (((src+1)·(64f+k)²) % 1009) % 251 —
    the 1009 > 500 inner prime prevents src wrap collisions. Plants:
    doc_id % 20 == 1 clones its predecessor (Jaccard 1.0); % 20 == 2
    takes doc_id−2's frames 0-3 plus its own 4-5 (Jaccard 0.5 with
    both members of the preceding pair). Measured at sf0.01: every
    video has 6 distinct frame hashes, 25 exact + 50 near pairs, zero
    background pairs at τ=0.45."""
    import struct

    import numpy as np
    import pandas as pd
    from duplicate_finder_spark.operators.multimodal import encode_ppm

    def frame_ppm(src: int, f: int) -> bytes:
        gy, gx = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
        k = (64 * f + gy * 8 + gx + 1).astype(np.int64)
        v = (((src + 1) * k * k) % 1009) % IMG_V_MOD
        px = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)
        return encode_ppm(np.stack([px.astype(np.uint8)] * 3, axis=2))

    def avi_bytes(d: int) -> bytes:
        src = d - 1 if d % 20 == 1 else (d - 2 if d % 20 == 2 else d)
        frames = [frame_ppm(src, f) for f in range(VID_FRAMES)]
        if d % 20 == 2:
            frames[4] = frame_ppm(d, 4)
            frames[5] = frame_ppm(d, 5)
        chunks = b"".join(
            b"00dc" + struct.pack("<I", len(p)) + p + (b"\0" * (len(p) & 1))
            for p in frames)
        movi = b"LIST" + struct.pack("<I", 4 + len(chunks)) + b"movi" \
            + chunks
        return b"RIFF" + struct.pack("<I", 4 + len(movi)) + b"AVI " + movi

    def synth(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": [avi_bytes(int(d)) for d in pdf["doc_id"]]})

    # per-row codec work: a tiny one-file scan must not serialize the
    # encode (and the consumer's decode) on a single core
    return (fan_out(_docs(spark, sf_dir).select("doc_id"))
            .mapInPandas(synth, "doc_id long, payload binary"))


def q_video_neardup_pairs(spark, sf_dir):
    """Video near-dup via frame-hash set Jaccard: real AVI container
    walk → real PPM frame decode → per-frame aHash (fused in one
    Arrow pass) → inverted-index join on the 8-byte hashes. The oracle
    rebuilds every frame hash closed-form and brute-forces the Jaccard
    pair set (25 exact + 50 near plants at sf0.01)."""
    hashes = video_frame_hashes(_synth_avis(spark, sf_dir),
                                max_frames=16)
    return video_neardup_pairs(hashes, min_jaccard=VID_JACCARD)


SEQ_LEN = 128     # sequence_packing training-sequence length, tokens
PACK_SHARDS = 8   # independent packing streams (≈ 60 docs each at
# sf0.01 — plenty of boundary crossings per shard)


def q_sequence_packing(spark, sf_dir):
    """Concatenate-and-chunk training-sequence packing map: which
    fixed-128-token sequence(s) each doc lands in, within 8 hash
    shards packed independently (the per-output-shard parallelism a
    real pipeline uses instead of a global token sort)."""
    return pack_sequences(_docs(spark, sf_dir), SEQ_LEN,
                          n_shards=PACK_SHARDS)


C4_LINE_W = 8   # synthesized line width, words (the corpus has no
# newline/punctuation structure, so the C4 harness builds it
# closed-form from doc_id — the same pattern as the codec queries)


def q_line_dedup_within_doc(spark, sf_dir):
    """Within-doc repeated-line removal (keep the first occurrence in
    order): a join-free codegen'd projection — array_distinct keeps
    first occurrences — oracled against a per-line unnest + min(pos)
    grouping + ordered string_agg rebuild in DuckDB."""
    return dedup_lines_within_doc(_docs(spark, sf_dir))


def q_softdedup_weights(spark, sf_dir):
    """Duplication-aware sampling weights over the self-union corpus
    (every text appears at least twice): weight = 1/exact-multiplicity
    — the reweight-instead-of-remove soft-dedup policy. Partial-agg
    multiplicity + AQE-skew-splittable equi-join back on the hash."""
    return softdedup_weights(_self_union(_docs(spark, sf_dir)))


def q_c4_line_filters(spark, sf_dir):
    """C4 §2.2 cleanup over pages with synthesized line structure:
    every 8-word chunk becomes a line, terminal '.' omitted when
    (doc_id+i) % 7 == 0, ' javascript' injected when % 13 == 5,
    'lorem ipsum' / '{' pages planted at doc_id % 40 == 3 / % 50 == 11.
    Line filters drop unterminated/short/boilerplate lines; page gates
    drop the planted pages and pages with < 2 surviving lines."""
    docs = _docs(spark, sf_dir)
    toks = tokens("text")
    w = C4_LINE_W
    nl = F.ceil(F.size(toks) / w).cast("int")

    def line(i):
        body = F.concat_ws(" ", F.slice(toks, i * w + 1, w))
        js = F.when((F.col("doc_id") + i) % 13 == 5,
                    F.lit(" javascript")).otherwise(F.lit(""))
        term = F.when((F.col("doc_id") + i) % 7 == 0,
                      F.lit("")).otherwise(F.lit("."))
        return F.concat(body, js, term)

    body = F.array_join(
        F.transform(F.sequence(F.lit(0), nl - 1), line), "\n")
    synth = (F.when(F.col("doc_id") % 40 == 3,
                    F.concat(body, F.lit("\nlorem ipsum dolor sit.")))
             .when(F.col("doc_id") % 50 == 11,
                   F.concat(body, F.lit("\nvar x = { y: 1 }.")))
             .otherwise(body))
    sdocs = docs.select("doc_id", synth.alias("text"))
    return c4_clean(sdocs, min_line_words=3, min_kept_lines=2)


LM_MAX_MEAN_NLL = 8_200_000   # lm_filter keep threshold, micro-nats —
# ≈ p75 of the gopher-survivor score distribution at sf0.01 (CCNet
# keeps the low-perplexity head+middle of its ranking)


def q_curation_funnel_full(spark, sf_dir):
    """The funnel with BOTH optional gates enabled: raw → quality →
    Gopher Table A1 rules → CCNet LM-perplexity filter →
    decontamination → paragraph dedup. Every stage drops docs at
    sf0.01 (490 → 432 → 348 → 264 → 263 → 259), so each gate is
    load-bearing on top of the previous one."""
    docs = _docs(spark, sf_dir)
    return curation_funnel(
        docs, (F.col("doc_id") % EVAL_MOD) == 7,
        min_tokens=20, max_dup_frac=0.07,
        gopher_w=GOPHER_W, contam_n=CONTAM_N, para_w=PARA_W,
        gopher_kw=dict(min_words=GOPHER_MIN_WORDS,
                       min_required_hits=GOPHER_MIN_STOPWORD_HITS),
        lm_target=docs.filter(F.col("lang") == "fr"),
        lm_max_mean_nll=LM_MAX_MEAN_NLL, lm_buckets=LM_BUCKETS)


EXSUB_L = 30  # ExactSubstr anchor length, chars (Lee et al. used 50 tokens;
              # 30 chars ≈ 5 words separates planted from incidental dups
              # cleanly at this corpus's ~300-char docs)


def q_mp3_stream_meta(spark, sf_dir):
    """REAL mp3 FRAME-HEADER parsing driver-gated end-to-end (audio
    decode itself stays the honest stub — see operators/mp3meta.py):
    a bit-valid MPEG-1 Layer III stream is synthesized per doc with the
    scripted writer — k = 3 + doc_id%5 frames at 44.1 kHz, bitrate
    index a = 1 + doc_id%14, every-3rd doc alternating a second index
    b = 1 + (5·doc_id + 3)%14 (VBR), padding bits cycling, every-4th
    doc prefixed with an ID3v2 tag and every (4n+2)-th with junk bytes
    to exercise skip/resync — and walked by ``mp3_stream_meta``. Every
    output (frame count, duration, mean bitrate, VBR flag) is
    closed-form from doc_id, so DuckDB reproduces it digit-for-digit;
    a frame-length, table-lookup, ID3-skip, or resync bug mismatches."""
    import pandas as pd

    from duplicate_finder_spark.operators.mp3meta import (
        encode_mp3_stream, mp3_stream_meta)

    docs = _docs(spark, sf_dir).select("doc_id")

    def stream(i: int) -> bytes:
        k = 3 + i % 5
        a, b = 1 + i % 14, 1 + (5 * i + 3) % 14
        vbr = i % 3 == 0
        frames = [(b if (vbr and j % 2 == 1) else a, (i + j) % 2)
                  for j in range(k)]
        return encode_mp3_stream(
            frames, id3_size=17 if i % 4 == 1 else 0,
            junk_prefix=5 if i % 4 == 2 else 0)

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame({
                "doc_id": ids,
                "payload": [stream(int(i)) for i in ids]})

    pages = docs.mapInPandas(gen, "doc_id long, payload binary")
    return mp3_stream_meta(pages)


def q_mp3_frame_integrity(spark, sf_dir):
    """Round-5 provable mp3 surface driver-gated end-to-end: CRC-16
    frame protection (kernel anchored to the published CRC-16/CMS
    check value, tests/test_mp3meta.py), full mono side-info bit
    layout (bit-reservoir accounting via main_data_begin), and the
    Xing VBR header. Scripted per doc_id: k = 2 + i%4 frames at
    bitrate index 1 + i%14; even i → protected with real CRCs, with
    frame 0's CRC corrupted when i%5==0; odd i → unprotected with
    main_data_begin = (37i)%511 + 1 on even frames (bit reservoir);
    i%3==0 → Xing header claiming k frames. Every output is
    closed-form from doc_id, so DuckDB reproduces it exactly; a CRC,
    bit-layout, or walk bug mismatches."""
    import pandas as pd

    from duplicate_finder_spark.operators.mp3meta import (
        encode_mp3_stream, mp3_frame_integrity)

    docs = _docs(spark, sf_dir).select("doc_id")

    def stream(i: int) -> bytes:
        k = 2 + i % 4
        frames = [(1 + i % 14, 0)] * k
        prot = i % 2 == 0
        side = None
        if not prot:
            mdb = (37 * i) % 511 + 1
            side = [dict(main_data_begin=mdb if j % 2 == 0 else 0)
                    for j in range(k)]
        return encode_mp3_stream(
            frames, protection=prot, side_infos=side,
            corrupt_crc_frames=(0,) if (prot and i % 5 == 0) else (),
            xing_frames=k if i % 3 == 0 else None)

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame({
                "doc_id": ids,
                "payload": [stream(int(i)) for i in ids]})

    pages = docs.mapInPandas(gen, "doc_id long, payload binary")
    return mp3_frame_integrity(pages)


def q_mp4_container_meta(spark, sf_dir):
    """REAL MP4 (ISO-BMFF) box-tree parsing driver-gated end-to-end
    (codec payloads stay the honest stub): a bit-valid container is
    synthesized per doc — brand cycling 4 values, timescale
    1000·(1 + doc_id%4), duration 1000 + (7·doc_id)%100000, mvhd
    version = doc_id%2 (32- vs 64-bit duration paths), 1 + doc_id%2
    video tracks, an audio track on every 3rd doc, a 'text' track
    (counted as other) on every 5th — and walked by ``mp4_meta``.
    Every output is closed-form from doc_id; a box-length, fourcc,
    version-branch, or handler-type bug mismatches."""
    import pandas as pd

    from duplicate_finder_spark.operators.mp4meta import (encode_mp4,
                                                          mp4_meta)

    docs = _docs(spark, sf_dir).select("doc_id")
    brands = ("isom", "mp42", "avc1", "dash")

    def container(i: int) -> bytes:
        tracks = ("vide",) * (1 + i % 2)
        if i % 3 == 0:
            tracks += ("soun",)
        if i % 5 == 0:
            tracks += ("text",)
        return encode_mp4(brands[i % 4], 1000 * (1 + i % 4),
                          1000 + (7 * i) % 100000, tracks,
                          mvhd_version=i % 2)

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame({
                "doc_id": ids,
                "payload": [container(int(i)) for i in ids]})

    pages = docs.mapInPandas(gen, "doc_id long, payload binary")
    return mp4_meta(pages)


SAMPLE_K = 20           # stratified quota per language
SAMPLE_BUDGET = 3000    # token budget per language


def q_stratified_sample(spark, sf_dir):
    """Deterministic data-mixing quota: the 20 hash-first docs of each
    language (md5 order key — engine-portable, partition-invariant)."""
    return stratified_sample(_docs(spark, sf_dir), "lang", SAMPLE_K)


def q_token_budget_sample(spark, sf_dir):
    """Token-budget fill per language: walk docs in md5 hash order,
    keep while the running token total stays ≤ 3000 (hard cap)."""
    return token_budget_sample(_docs(spark, sf_dir), "lang",
                               SAMPLE_BUDGET, token_count("text"))


def q_neardup_dedup_apply(spark, sf_dir):
    """The flagship chain as ONE keep-first mutation — MinHash/LSH
    candidates → sketch-bounded exact verify → connected components →
    drop every cluster member except the minimum doc_id → surviving
    corpus. This is the near-dup generalization of the reference's
    delete step (duplicate_finder.py keep-first unlink), end-to-end
    through the scale path."""
    docs = _docs(spark, sf_dir)
    verified = _verified_near_dup_pairs(spark, sf_dir)
    assign = connected_components(
        verified.select(F.col("url_a").alias("src"),
                        F.col("url_b").alias("dst")))
    drop = (assign.filter(F.col("url") != F.col("cluster_id"))
            .select(F.col("url").cast("long").alias("doc_id")))
    return (docs.join(drop, "doc_id", "left_anti")
            .select("doc_id", F.length("text").cast("long")
                    .alias("n_chars")))


def _snapshot_split(spark, sf_dir):
    """Cross-snapshot fixture: store = even doc_ids (the kept corpus);
    new = a crawl batch with (a) exact re-crawls of store docs
    (doc_id%4==2 → +SHIFT: must drop as dup_of_corpus), (b) TWO copies
    of docs the store has never seen (doc_id%4==1 → +SHIFT and
    +2·SHIFT: a new-only cluster, keep-first inside the batch) and
    (c) singleton unseen docs (doc_id%4==3 → +SHIFT: keep). urls are
    zero-padded digits so min-url keep-first == numeric order; natural
    near-dups in the corpus cross the split arbitrarily and the oracle
    recomputes the same ground truth."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")

    def u(c):
        return F.format_string("%012d", c)

    store = (docs.filter(F.col("doc_id") % 2 == 0)
             .select(u(F.col("doc_id")).alias("url"), "text"))
    n1 = docs.filter(F.col("doc_id") % 4 == 1)
    new = (n1.select(u(F.col("doc_id") + SHIFT).alias("url"), "text")
           .unionByName(n1.select(
               u(F.col("doc_id") + 2 * SHIFT).alias("url"), "text"))
           .unionByName(docs.filter(F.col("doc_id") % 4 == 2).select(
               u(F.col("doc_id") + SHIFT).alias("url"), "text"))
           .unionByName(docs.filter(F.col("doc_id") % 4 == 3).select(
               u(F.col("doc_id") + SHIFT).alias("url"), "text")))
    cfg = PipelineConfig(num_perm=128, lsh_bands=32,
                         jaccard_threshold=JACCARD_T)
    # both signature sets feed banding + verify + the url marker joins;
    # at scale the store side is the warehouse signature table (read,
    # not recomputed) and the new side is the resumable signature stage
    return signatures(new, cfg).persist(), \
        signatures(store, cfg).persist(), cfg


def q_cross_snapshot_decisions(spark, sf_dir):
    """Incremental batch dedup — the monthly-snapshot workflow: new
    crawl vs kept corpus, incumbents win, new-only clusters keep-first,
    store×store never recomputed, census pruned to touched buckets
    (operators/crosssnap.py)."""
    new_sigs, store_sigs, cfg = _snapshot_split(spark, sf_dir)
    d = cross_snapshot_decisions(new_sigs, store_sigs, cfg)
    return d.select(F.col("url").cast("long").alias("doc_id"),
                    F.col("cluster_id").cast("long").alias("cluster_id"),
                    "action", "reason")


def q_cross_snapshot_apply(spark, sf_dir):
    """The snapshot update itself: store ∪ kept-new signatures — what
    gets written back as the next run's corpus table."""
    new_sigs, store_sigs, cfg = _snapshot_split(spark, sf_dir)
    updated = cross_snapshot_apply(new_sigs, store_sigs, cfg)
    return updated.select(
        F.col("url").cast("long").alias("doc_id"),
        F.col("n_shingles").cast("long").alias("n_shingles"))


def q_exact_substr_spans(spark, sf_dir):
    """Lee-et-al ExactSubstr audit view: every maximal character span of
    length ≥ 30 occurring verbatim ≥ 2 times anywhere in the corpus
    (all occurrences reported). Anchor-gram + island plan — one 32-byte
    exchange per character position, text never shuffles."""
    return exact_substr_spans(_docs(spark, sf_dir), length=EXSUB_L)


def q_exact_substr_apply(spark, sf_dir):
    """ExactSubstr keep-first mutation: duplicated spans after their
    globally-first occurrence (ranked by doc_id, position) are spliced
    out of the text by a JVM aggregate fold; untouched docs pass through
    byte-identical. The suffix-array pass of Lee et al. 2021 §4.1,
    re-expressed as anchor grams + one window rank + islands."""
    return exact_substr_apply(_docs(spark, sf_dir), length=EXSUB_L)


def _host_pages(spark, sf_dir):
    """Skewed synthetic crawl: half the corpus lands on host00 (the
    mirror-farm head host), the rest spreads over host05-host09."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    hidx = F.when(F.col("doc_id") % 10 < 5, F.lit(0)) \
            .otherwise((F.col("doc_id") % 10).cast("int"))
    url = F.format_string("https://host%02d.example/%08d", hidx,
                          F.col("doc_id"))
    return docs.select("doc_id", url.alias("url"), "text")


def q_host_corpus_stats(spark, sf_dir):
    """Corpus composition by url host (operators/domains.py) — the
    accounting view a source-balancing pass reads. One combinable
    groupBy; the rank is the scale-safe parallel global_rank
    (functions/ranks.py: range-partition + partition-offset cumsum),
    oracled here value-for-value against DuckDB's single-reducer
    row_number() OVER (ORDER BY ...)."""
    from duplicate_finder_spark.operators.domains import host_stats
    return host_stats(_host_pages(spark, sf_dir)) \
        .withColumn("n_docs_rank", F.col("n_docs_rank").cast("long"))


def q_host_cap_apply(spark, sf_dir):
    """Dolma-style per-host cap: keep the first 3 pages per host by
    url order, via the two-phase skew-bounded top-K (salted pre-rank,
    then exact rank over ≤ salt·K survivors) — no reducer ever sees a
    whole head host. Oracle is the naive one-window plan: the two-phase
    result must equal it exactly."""
    from duplicate_finder_spark.operators.domains import cap_per_host
    kept = cap_per_host(_host_pages(spark, sf_dir), 3, salt=8)
    return kept.select("doc_id", "url")


def q_pii_scrub(spark, sf_dir):
    """PII scrub stage (functions/pii.py): per-class counts + redacted
    text, pure JVM regex in one codegen'd projection. Deterministic
    PII is injected per doc_id (email + IPv4 always, phone on every
    3rd doc) so both engines score the same plants on top of whatever
    the raw text happens to contain."""
    from duplicate_finder_spark.functions.pii import scrub_pii
    docs = _docs(spark, sf_dir)
    synth = F.concat(
        F.substring("text", 1, 40),
        F.lit(" reach user"), F.col("doc_id").cast("string"),
        F.lit("@mail.example or 10."),
        (F.col("doc_id") % 200).cast("string"), F.lit(".0.7"),
        F.when(F.col("doc_id") % 3 == 0,
               F.lit(" tel 555-012-3456")).otherwise(F.lit("")))
    out = scrub_pii(docs.select("doc_id", synth.alias("text")))
    return out.select("doc_id", "n_emails", "n_ipv4s", "n_phones",
                      "n_pii", "redacted_text")


def q_bloom_recrawl_probe(spark, sf_dir):
    """Broadcast Bloom-filter re-crawl prefilter
    (operators/bloomfilter.py): the batch probes the store's bitmap;
    negatives skip the store join entirely, the maybe slice resolves
    exactly. The oracle recomputes plain membership in SQL, so a single
    false NEGATIVE (structurally impossible) or a mis-resolved false
    positive flips the gate."""
    from duplicate_finder_spark.operators.bloomfilter import (
        BloomFilter, split_by_membership)
    docs = _docs(spark, sf_dir).select("doc_id")
    url = F.format_string("https://crawl.example/%d", F.col("doc_id"))
    store = docs.filter(F.col("doc_id") % 3 != 0).select(url.alias("url"))
    batch = docs.filter(F.col("doc_id") % 2 == 0) \
                .select("doc_id", url.alias("url"))
    bf = BloomFilter.build(store, "url",
                           n_expected=max(1, store.count()), fpp=0.01)
    in_store, fresh = split_by_membership(batch, store, bf, "url")
    return (in_store.select("doc_id", F.lit(True).alias("is_recrawl"))
            .unionByName(
                fresh.select("doc_id", F.lit(False).alias("is_recrawl"))))


def q_quality_classifier(spark, sf_dir):
    """Trainable quality gate (operators/classifier.py): Newton-step
    logistic regression where each step is ONE map-side-combinable
    aggregation of O(d²) sufficient statistics — the weak label
    (n_chars > 300, cheap metadata) is distilled into a smooth model
    over pure-JVM text features. The oracle corpus-derives n_docs and
    the label prevalence; the confusion counts are the pinned
    empirical property of this exact config (features
    stop_en/punct/ascii/log_tokens, n_iter=4, reg=1e-2, threshold
    0.5, sf0.01) — measured identical across local[4/16/32] and
    shuffle partitions 3/7/32."""
    from duplicate_finder_spark.operators.classifier import (
        confusion, fit_quality_classifier)
    docs = _docs(spark, sf_dir)
    label = F.col("n_chars") > 300
    scored, _w, _names = fit_quality_classifier(docs, label)
    return confusion(scored, label)


# --- contract ---------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact-dup keep/delete decisions on sf0.001."""
    return q_exact_dup_decisions(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "exact_dup_clusters": q_exact_dup_clusters,
        "exact_dup_decisions": q_exact_dup_decisions,
        "dup_group_stats": q_dup_group_stats,
        "dedup_apply": q_dedup_apply,
        "decision_summary": q_decision_summary,
        "vocab_setops": q_vocab_setops,
        "lang_vocab_stats": q_lang_vocab_stats,
        "events_rollup": q_events_rollup,
        "events_gaps": q_events_gaps,
        "size_prefilter": q_size_prefilter,
        "filter_size_range": q_filter_size_range,
        "filter_glob": q_filter_glob,
        "url_dup_groups": q_url_dup_groups,
        "fingerprint_dups": q_fingerprint_dups,
        "token_stats": q_token_stats,
        "token_stats_bpe": q_token_stats_bpe,
        "bpe_train_merges": q_bpe_train_merges,
        "bpe_encode_stats": q_bpe_encode_stats,
        "bpe_vocab": q_bpe_vocab,
        "source_mixture_weights": q_source_mixture_weights,
        "domain_blocklist": q_domain_blocklist,
        "badword_filter": q_badword_filter,
        "quality_scores": q_quality_scores,
        "lang_distribution": q_lang_distribution,
        "lang_id": q_lang_id,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "ngram_df_cut_stats": q_ngram_df_cut_stats,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "sketch_verify_longdocs": q_sketch_verify_longdocs,
        "lsh_hot_bucket_clusters": q_lsh_hot_bucket_clusters,
        "cc_clusters": q_cc_clusters,
        "neardup_keep_best": q_neardup_keep_best,
        "dedup_recall_audit": q_dedup_recall_audit,
        "oph_recall_audit": q_oph_recall_audit,
        "ann_cosine_topk": q_ann_cosine_topk,
        "embedding_cosine_pairs": q_embedding_cosine_pairs,
        "semantic_dedup": q_semantic_dedup,
        "dsir_select": q_dsir_select,
        "multimodal_binary_meta": q_multimodal_binary_meta,
        "tpch_pricing_summary": q_tpch_pricing_summary,
        "top_orders_per_customer": q_top_orders_per_customer,
        "nation_order_revenue": q_nation_order_revenue,
        "region_nation_count": q_region_nation_count,
        "substring_containment": q_substring_containment,
        "lcs_verify": q_lcs_verify,
        "events_sessions": q_events_sessions,
        "events_hourly": q_events_hourly,
        "events_dup_groups": q_events_dup_groups,
        "simhash_block_recall": q_simhash_block_recall,
        "multimodal_features": q_multimodal_features,
        "png_decode_features": q_png_decode_features,
        "webp_decode_features": q_webp_decode_features,
        "jpeg_decode_features": q_jpeg_decode_features,
        "avi_frame_sample": q_avi_frame_sample,
        "wav_audio_features": q_wav_audio_features,
        "streaming_neardup_pairs": q_streaming_neardup_pairs,
        "ann_lsh_recall": q_ann_lsh_recall,
        "ann_ivf_recall": q_ann_ivf_recall,
        "embedding_pairs_lsh_recall": q_embedding_pairs_lsh_recall,
        "paragraph_dedup_stats": q_paragraph_dedup_stats,
        "paragraph_dedup_apply": q_paragraph_dedup_apply,
        "gopher_repetition": q_gopher_repetition,
        "gopher_quality_filter": q_gopher_quality_filter,
        "lm_perplexity": q_lm_perplexity,
        "eval_contamination": q_eval_contamination,
        "ngram_dup_census": q_ngram_dup_census,
        "curation_funnel": q_curation_funnel,
        "curation_funnel_full": q_curation_funnel_full,
        "c4_line_filters": q_c4_line_filters,
        "line_dedup_within_doc": q_line_dedup_within_doc,
        "softdedup_weights": q_softdedup_weights,
        "sequence_packing": q_sequence_packing,
        "image_ahash": q_image_ahash,
        "image_neardup_pairs": q_image_neardup_pairs,
        "image_dedup_decisions": q_image_dedup_decisions,
        "audio_fingerprint": q_audio_fingerprint,
        "audio_neardup_pairs": q_audio_neardup_pairs,
        "video_neardup_pairs": q_video_neardup_pairs,
        "exact_substr_spans": q_exact_substr_spans,
        "exact_substr_apply": q_exact_substr_apply,
        "neardup_dedup_apply": q_neardup_dedup_apply,
        "cross_snapshot_decisions": q_cross_snapshot_decisions,
        "cross_snapshot_apply": q_cross_snapshot_apply,
        "stratified_sample": q_stratified_sample,
        "token_budget_sample": q_token_budget_sample,
        "mp3_stream_meta": q_mp3_stream_meta,
        "mp3_frame_integrity": q_mp3_frame_integrity,
        "mp4_container_meta": q_mp4_container_meta,
        "host_corpus_stats": q_host_corpus_stats,
        "host_cap_apply": q_host_cap_apply,
        "pii_scrub": q_pii_scrub,
        "bloom_recrawl_probe": q_bloom_recrawl_probe,
        "quality_classifier": q_quality_classifier,
    }


# --- oracles ----------------------------------------------------------------

from duplicate_finder_spark.functions.pii import (EMAIL_RE as _PII_EMAIL,
                                                  IPV4_RE as _PII_IPV4,
                                                  PHONE_RE as _PII_PHONE)

# host index of the synthetic skewed crawl (_host_pages)
_HOST_IDX = "(CASE WHEN doc_id % 10 < 5 THEN 0 ELSE doc_id % 10 END)"

_UNION = f"""
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {SHIFT} AS doc_id, text FROM documents
"""

# paragraph fixture: non-overlapping {w}-token windows of each doc's
# whitespace tokens (mirrors operators/paragraphs.py::paragraphs; the
# corpus has no newline structure, so the window IS the paragraph unit)
_PARAS = r"""
  WITH words AS (
    SELECT doc_id, length(text) AS doc_chars,
           regexp_split_to_array(trim(text), '\s+') AS ws
    FROM documents WHERE trim(text) <> ''
  ), pidx AS (
    SELECT doc_id, doc_chars, ws,
           unnest(range(0, cast(ceil(len(ws) / {w}.0) AS INT))) AS i
    FROM words
  ), paras AS (
    SELECT doc_id, i AS para_idx,
           array_to_string(ws[i*{w}+1 : i*{w}+{w}], ' ') AS para
    FROM pidx
  )
"""

# per-doc-DISTINCT overlapping word {n}-grams (mirrors
# operators/contamination.py::_doc_grams; docs with < n tokens yield none)
_NGRAMS = r"""
  WITH toks AS (
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                ELSE regexp_split_to_array(trim(text), '\s+') END AS t
    FROM documents
  ), grams AS (
    SELECT doc_id, unnest(list_distinct(
      CASE WHEN len(t) < {n} THEN []::VARCHAR[]
           ELSE [array_to_string(t[i:i+{n}-1], ' ')
                 for i in range(1, len(t) - {n} + 2)] END)) AS gram
    FROM toks
  )
"""

_SHINGLES = r"""
  WITH toksrc AS (
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                ELSE regexp_split_to_array(trim(text), '\s+') END AS t
    FROM documents
  ), sh AS (
    SELECT doc_id, unnest(list_distinct(
      CASE WHEN len(t) = 0 THEN []::VARCHAR[]
           WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
           ELSE [array_to_string(t[i:i+2], ' ')
                 for i in range(1, len(t) - 1)] END)) AS s
    FROM toksrc
  ), sizes AS (
    SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
  ), inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
  ), jac AS (
    SELECT id_a, id_b, c * 1.0 / (sa.n + sb.n - c) AS j
    FROM inter
    JOIN sizes sa ON id_a = sa.doc_id
    JOIN sizes sb ON id_b = sb.doc_id
  )
"""

_JACCARD_PAIRS_SQL = _SHINGLES + f"""
  SELECT id_a AS doc_id_a, id_b AS doc_id_b, round(j, 6) AS jaccard
  FROM jac WHERE j >= {JACCARD_T}
"""

# cross-snapshot fixture corpus (mirrors _snapshot_split): store =
# even doc_ids; new = +SHIFT / +2·SHIFT copies per the split comments
_SNAP_CORPUS = f"""
  WITH RECURSIVE corpus AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT doc_id + {SHIFT} AS doc_id, text FROM documents
    WHERE doc_id % 4 = 1
    UNION ALL
    SELECT doc_id + {2 * SHIFT} AS doc_id, text FROM documents
    WHERE doc_id % 4 = 1
    UNION ALL
    SELECT doc_id + {SHIFT} AS doc_id, text FROM documents
    WHERE doc_id % 4 = 2
    UNION ALL
    SELECT doc_id + {SHIFT} AS doc_id, text FROM documents
    WHERE doc_id % 4 = 3
  )""" + _SHINGLES.replace("WITH toksrc", ", toksrc", 1).replace(
    "FROM documents", "FROM corpus", 1)

# incremental edge set (≥ 1 new member; store×store excluded), then
# the same recursive components as cc_clusters, then the incremental
# decision rule: incumbents win, new-only clusters keep-first
_SNAP_DECIDED = _SNAP_CORPUS + f"""
  , pairs AS (
      SELECT id_a, id_b FROM jac
      WHERE j >= {JACCARD_T}
        AND (id_a >= {SHIFT} OR id_b >= {SHIFT})),
  edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
  nodes AS (SELECT DISTINCT src AS node FROM edges),
  reach AS (
    SELECT node, node AS r FROM nodes
    UNION
    SELECT e.dst AS node, reach.r
    FROM reach JOIN edges e ON e.src = reach.node
  ),
  comp AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node),
  cinfo AS (
    SELECT cluster_id,
           max(CASE WHEN node < {SHIFT} THEN 1 ELSE 0 END) AS has_store,
           min(CASE WHEN node >= {SHIFT} THEN node END) AS first_new
    FROM comp GROUP BY cluster_id),
  matched AS (SELECT node AS doc_id FROM comp),
  decided AS (
    SELECT c.node AS doc_id, c.cluster_id,
           CASE WHEN ci.has_store = 1 THEN 'delete'
                WHEN c.node = ci.first_new THEN 'keep'
                ELSE 'delete' END AS action,
           CASE WHEN ci.has_store = 1 THEN 'dup_of_corpus'
                WHEN c.node = ci.first_new THEN 'cluster_rep'
                ELSE 'dup_in_batch' END AS reason
    FROM comp c JOIN cinfo ci USING (cluster_id)
    WHERE c.node >= {SHIFT}),
  singles AS (
    -- zero-token docs carry no signature (exact dedup owns blanks:
    -- operators/minhash.py::signatures), so they get no decision row
    SELECT c.doc_id, c.doc_id AS cluster_id,
           'keep' AS action, 'unique' AS reason
    FROM (SELECT DISTINCT doc_id FROM corpus
          WHERE doc_id >= {SHIFT} AND trim(text) <> '') c
    ANTI JOIN matched USING (doc_id))
"""

_TOKCOUNT = (r"CASE WHEN trim(text) = '' THEN 0 "
             r"ELSE len(regexp_split_to_array(trim(text), '\s+')) END")

_PUNCT = (r"CASE WHEN length(text) = 0 THEN 0.0 "
          r"ELSE (length(text) - length(regexp_replace(text, "
          r"'[^0-9A-Za-z\s]', '', 'g'))) * 1.0 / length(text) END")


def _bpe_chain_sql(n_merges: int) -> str:
    """DuckDB mirror of operators/bpe.py bpe_train, unrolled: word
    counts (same tokenization + ASCII filter as word_counts), then per
    merge i a pair-count CTE p{i}, a 1-row argmax b{i} with the
    (count desc, left, right) tie-break, and the merged word table
    w{i+1} via the double-space canonical-string replace — whose
    left-to-right non-overlapping semantics equal Spark's F.replace,
    so the chains agree word-for-word. Returns the WITH prefix ending
    at w{n_merges}.

    Every stage CTE is AS MATERIALIZED: each w{{i+1}} references w{{i}}
    and b{{i}} several times, so DuckDB's default CTE inlining expands
    the chain exponentially (~4^n copies of w0 — the un-materialized
    query never finishes at n=6)."""
    ctes = [r"""tok AS (
           SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word
           FROM documents WHERE trim(text) <> ''),
         wc AS MATERIALIZED (
           SELECT word, count(*)::BIGINT AS cnt FROM tok
           WHERE regexp_matches(word, '^[\x21-\x7e]+$') GROUP BY word),
         w0 AS MATERIALIZED (
           SELECT word, ' ' || array_to_string(string_split(word, ''),
                  '  ') || ' ' AS s, cnt FROM wc)"""]
    for i in range(n_merges):
        ctes.append(f"""
         p{i} AS MATERIALIZED (
           SELECT pr.l AS l, pr.r AS r, sum(cnt)::BIGINT AS c FROM (
             SELECT unnest([{{'l': syms[j], 'r': syms[j+1]}}
                            for j in generate_series(1, len(syms)-1)])
                      AS pr, cnt
             FROM (SELECT string_split(trim(s), '  ') AS syms, cnt
                   FROM w{i})
           ) GROUP BY 1, 2),
         b{i} AS MATERIALIZED (SELECT l, r, c FROM p{i}
                  ORDER BY c DESC, l ASC, r ASC LIMIT 1),
         w{i + 1} AS MATERIALIZED (
           SELECT word, replace(s,
             ' ' || (SELECT l FROM b{i}) || '  '
                 || (SELECT r FROM b{i}) || ' ',
             ' ' || (SELECT l || r FROM b{i}) || ' ') AS s, cnt
           FROM w{i})""")
    return "WITH " + ",".join(ctes)

_COS_SIM = """
  round(
    list_sum([qv[i] * nv[i] for i in range(1, len(qv) + 1)]) /
    (sqrt(list_sum([x * x for x in qv])) *
     sqrt(list_sum([x * x for x in nv]))), 6)
"""


def _stop_sql(words: list[str]) -> str:
    lits = ", ".join("'" + w + "'" for w in words)
    return (f"len(list_filter(regexp_split_to_array(trim(text), '\\s+'), "
            f"t -> lower(t) IN ({lits})))")


def oracle_sql() -> dict[str, str]:
    inc_rx = [glob_to_java_regex(p) for p in GLOB_INCLUDE]
    exc_rx = [glob_to_java_regex(p) for p in GLOB_EXCLUDE]
    inc_pred = " OR ".join(f"regexp_matches(url, '{r}')" for r in inc_rx)
    exc_pred = " AND ".join(f"NOT regexp_matches(url, '{r}')" for r in exc_rx)
    sw = {lang: _stop_sql(words) for lang, words in _STOP.items()}
    lang_case = f"""
      CASE WHEN ({sw['de']}) + ({sw['en']}) + ({sw['fr']}) + ({sw['uk']}) = 0
             THEN 'und'
           WHEN ({sw['de']}) >= ({sw['en']}) AND ({sw['de']}) >= ({sw['fr']})
                AND ({sw['de']}) >= ({sw['uk']}) THEN 'de'
           WHEN ({sw['en']}) >= ({sw['fr']}) AND ({sw['en']}) >= ({sw['uk']})
             THEN 'en'
           WHEN ({sw['fr']}) >= ({sw['uk']}) THEN 'fr'
           ELSE 'uk' END
    """
    return {
        "exact_dup_clusters": f"""
          WITH u AS ({_UNION})
          SELECT sha256(text) AS content_hash, doc_id FROM u
          QUALIFY count(*) OVER (PARTITION BY sha256(text)) > 1
        """,
        "exact_dup_decisions": f"""
          WITH u AS ({_UNION}),
          h AS (SELECT doc_id, sha256(text) AS content_hash FROM u),
          d AS (SELECT *, count(*) OVER (PARTITION BY content_hash) AS cnt,
                       row_number() OVER (PARTITION BY content_hash
                                          ORDER BY doc_id) AS rn
                FROM h)
          SELECT doc_id, content_hash,
                 CASE WHEN rn = 1 THEN 'keep' ELSE 'delete' END AS action
          FROM d WHERE cnt > 1
        """,
        "dup_group_stats": f"""
          WITH u AS ({_UNION}),
          h AS (SELECT doc_id, length(text) AS sz,
                       sha256(text) AS content_hash FROM u),
          g AS (SELECT content_hash, count(*) AS group_size,
                       max(sz) AS doc_size, sum(sz) AS total_bytes
                FROM h GROUP BY content_hash HAVING count(*) > 1)
          SELECT content_hash, group_size, doc_size,
                 total_bytes::BIGINT AS total_bytes,
                 (total_bytes - doc_size)::BIGINT AS reclaimable_bytes,
                 (group_size * (group_size - 1) // 2)::BIGINT AS n_comparisons
          FROM g
        """,
        "dedup_apply": f"""
          WITH u AS ({_UNION})
          SELECT doc_id FROM u
          QUALIFY row_number() OVER (PARTITION BY sha256(text)
                                     ORDER BY doc_id) = 1
        """,
        "decision_summary": f"""
          WITH u AS ({_UNION}),
          h AS (SELECT doc_id, length(text) AS sz,
                       sha256(text) AS ch FROM u),
          d AS (SELECT *, count(*) OVER (PARTITION BY ch) AS cnt,
                       row_number() OVER (PARTITION BY ch
                                          ORDER BY doc_id) AS rn
                FROM h)
          SELECT CASE WHEN rn = 1 THEN 'keep' ELSE 'delete' END AS action,
                 count(*) AS n_docs, sum(sz)::BIGINT AS total_bytes
          FROM d WHERE cnt > 1 GROUP BY 1
        """,
        "vocab_setops": r"""
          WITH va AS (SELECT DISTINCT unnest(regexp_split_to_array(
                        trim(text), '\s+')) AS token
                      FROM documents
                      WHERE source = 'src1' AND trim(text) <> ''),
          vb AS (SELECT DISTINCT unnest(regexp_split_to_array(
                   trim(text), '\s+')) AS token
                 FROM documents
                 WHERE source = 'src2' AND trim(text) <> '')
          SELECT 'intersect' AS op, token
          FROM (SELECT token FROM va INTERSECT SELECT token FROM vb)
          UNION ALL
          SELECT 'except_a' AS op, token
          FROM (SELECT token FROM va EXCEPT SELECT token FROM vb)
        """,
        "lang_vocab_stats": r"""
          WITH t AS (SELECT lang, unnest(regexp_split_to_array(
                       trim(text), '\s+')) AS token
                     FROM documents WHERE trim(text) <> '')
          SELECT lang, count(DISTINCT token) AS vocab_size,
                 count(*) AS n_tokens
          FROM t GROUP BY lang
        """,
        "events_rollup": """
          SELECT event_type, date_trunc('hour', ts) AS hour,
                 grouping(event_type)::BIGINT AS lvl_type,
                 grouping(date_trunc('hour', ts))::BIGINT AS lvl_hour,
                 count(*) AS n_events,
                 CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_value
          FROM events
          GROUP BY ROLLUP (event_type, date_trunc('hour', ts))
        """,
        "events_gaps": """
          WITH g AS (
            SELECT user_id, event_id,
                   epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms
            FROM events)
          SELECT user_id, event_id, gap_ms FROM g
          WHERE gap_ms IS NOT NULL
        """,
        "size_prefilter": """
          SELECT doc_id, length(text)::BIGINT AS size FROM documents
          QUALIFY count(*) OVER (PARTITION BY length(text)) > 1
        """,
        "filter_size_range": """
          SELECT doc_id, length(text)::BIGINT AS size FROM documents
          WHERE length(text) BETWEEN 150 AND 300
        """,
        "filter_glob": f"""
          WITH w AS (SELECT doc_id,
                            source || '/' || CAST(doc_id AS VARCHAR) AS url
                     FROM documents)
          SELECT doc_id, url FROM w WHERE ({inc_pred}) AND ({exc_pred})
        """,
        # closed-form oracle: the three constructed raw spellings per
        # doc all canonicalize to the lowercase base (host lowered,
        # :443 and #frag stripped, tracking-only query emptied), so
        # the group key / spelling count / min raw spelling are
        # derivable without reimplementing the canonicalizer; the
        # uppercase variant is the ASCII-min ('H' 0x48 < 'h' 0x68)
        "url_dup_groups": """
          SELECT printf('https://site%03d.example/p/%d',
                        (doc_id % 50)::INT, doc_id) AS canonical_url,
                 (CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 2 END)::BIGINT
                   AS n_urls,
                 printf('HTTPS://SITE%03d.EXAMPLE:443/p/%d#frag',
                        (doc_id % 50)::INT, doc_id) AS min_url
          FROM documents
        """,
        "fingerprint_dups": f"""
          WITH u AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + {SHIFT}, upper(text) || '  ' FROM documents
          ), fp AS (
            SELECT doc_id, md5(lower(regexp_replace(trim(text), '\\s+', ' ',
                                                    'g'))) AS fingerprint
            FROM u)
          SELECT fingerprint, doc_id FROM fp
          QUALIFY count(*) OVER (PARTITION BY fingerprint) > 1
        """,
        "token_stats": f"""
          SELECT doc_id, ({_TOKCOUNT})::BIGINT AS n_tokens,
                 round({_PUNCT}, 6) AS punct_ratio
          FROM documents
        """,
        "token_stats_bpe": r"""
          SELECT doc_id,
                 len(regexp_extract_all(text,
                     '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))::BIGINT
                   AS n_bpe_tokens,
                 round(CASE WHEN trim(text) = '' THEN 0.0 ELSE
                   len(list_filter(regexp_split_to_array(trim(text),
                       '\s+'), t -> lower(t) IN
                       ('the','and','of','to','in','is','a'))) * 1.0 /
                   len(regexp_split_to_array(trim(text), '\s+')) END, 6)
                   AS stopword_ratio_en
          FROM documents
        """,
        "bpe_train_merges": _bpe_chain_sql(BPE_N_MERGES) + " " + " UNION ALL ".join(
            f'SELECT {i + 1}::BIGINT AS merge_rank, l AS "left", '
            f'r AS "right", l || r AS merged, c::BIGINT AS pair_count '
            f'FROM b{i}' for i in range(BPE_N_MERGES)),
        "bpe_encode_stats": _bpe_chain_sql(BPE_N_MERGES) + f""",
          enc AS (SELECT word, len(string_split(trim(s), '  '))::BIGINT
                         AS n_bpe
                  FROM w{BPE_N_MERGES}),
          dw AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text),
                        '\\s+')) AS word
                 FROM documents WHERE trim(text) <> ''),
          agg AS (SELECT doc_id, count(*)::BIGINT AS n_words,
                         sum(n_bpe)::BIGINT AS n_bpe_tokens
                  FROM dw JOIN enc USING (word)
                  WHERE regexp_matches(word, '^[\\x21-\\x7e]+$')
                  GROUP BY doc_id)
          SELECT d.doc_id,
                 coalesce(a.n_words, 0)::BIGINT AS n_words,
                 coalesce(a.n_bpe_tokens, 0)::BIGINT AS n_bpe_tokens
          FROM (SELECT DISTINCT doc_id FROM documents) d
          LEFT JOIN agg a USING (doc_id)
        """,
        "bpe_vocab": _bpe_chain_sql(BPE_N_MERGES) + f""",
          voc AS (
            SELECT tok AS token, sum(cnt)::BIGINT AS n_occurrences
            FROM (SELECT unnest(string_split(trim(s), '  ')) AS tok,
                         cnt
                  FROM w{BPE_N_MERGES})
            GROUP BY tok)
          SELECT row_number() OVER (ORDER BY n_occurrences DESC,
                                    token ASC)::BIGINT AS token_id,
                 token, n_occurrences
          FROM voc
        """,
        "domain_blocklist": """
          WITH p AS (
            SELECT doc_id,
                   (CASE WHEN doc_id % 2 = 0 THEN 'cdn.' ELSE '' END)
                   || printf('host%02d.example',
                             CASE WHEN doc_id % 10 < 5 THEN 0
                                  ELSE (doc_id % 10)::INT END) AS host
            FROM documents)
          SELECT doc_id,
                 'https://' || host || printf('/%08d', doc_id) AS url,
                 CASE
                   WHEN host = 'host00.example'
                        OR host LIKE '%.host00.example'
                     THEN 'host00.example'
                   WHEN host = 'host07.example'
                        OR host LIKE '%.host07.example'
                     THEN 'host07.example'
                 END AS blocked_by
          FROM p
        """,
        "badword_filter": r"""
          WITH t AS (
            SELECT DISTINCT doc_id, lower(tok) AS tok FROM (
              SELECT doc_id, unnest(regexp_split_to_array(trim(text),
                     '\s+')) AS tok
              FROM documents WHERE trim(text) <> '')),
          h AS (
            SELECT doc_id, count(*)::BIGINT AS n_badwords,
                   min(tok) AS first_badword
            FROM t WHERE tok IN ('slow', 'merge', 'the')
            GROUP BY doc_id)
          SELECT d.doc_id,
                 coalesce(h.n_badwords, 0)::BIGINT AS n_badwords,
                 h.first_badword
          FROM (SELECT DISTINCT doc_id FROM documents) d
          LEFT JOIN h USING (doc_id)
        """,
        "source_mixture_weights": f"""
          WITH per AS (
            SELECT source, count(*)::BIGINT AS n_docs,
                   sum({_TOKCOUNT})::BIGINT AS n_tokens
            FROM documents GROUP BY source),
          tot AS (SELECT sum(n_tokens)::DOUBLE AS t,
                         sum(pow(n_tokens::DOUBLE, {MIX_ALPHA})) AS tpa
                  FROM per)
          SELECT source, n_docs, n_tokens,
                 round(n_tokens / t, 6) AS nat_share,
                 round(pow(n_tokens::DOUBLE, {MIX_ALPHA}) / tpa, 6)
                   AS mix_weight,
                 round(pow(n_tokens::DOUBLE, {MIX_ALPHA}) / tpa
                       * {MIX_BUDGET})::BIGINT AS budget_tokens,
                 CASE WHEN n_tokens > 0 THEN
                   round(pow(n_tokens::DOUBLE, {MIX_ALPHA}) / tpa
                         * {MIX_BUDGET} / n_tokens, 6)
                 ELSE 0.0 END AS epochs
          FROM per, tot
        """,
        "quality_scores": f"""
          SELECT doc_id, round((
            (length(text) BETWEEN 50 AND 100000)::INT +
            (({_TOKCOUNT}) BETWEEN 10 AND 50000)::INT +
            (({_PUNCT}) <= 0.3)::INT) / 3.0, 6) AS quality
          FROM documents
        """,
        "lang_distribution": f"""
          SELECT lang, count(*) AS n_docs,
                 round(avg({_TOKCOUNT}), 6) AS avg_tokens
          FROM documents GROUP BY lang
        """,
        "lang_id": f"""
          SELECT doc_id, {lang_case} AS lang_guess FROM documents
        """,
        "ngram_jaccard_pairs": _JACCARD_PAIRS_SQL,
        # distinct-hash counts equal distinct-string counts up to the
        # same ~2^-64 collision mass as the jaccard oracle
        "ngram_df_cut_stats": _SHINGLES + """
          , df AS (SELECT s, count(*) AS cnt FROM sh GROUP BY s)
          SELECT count(*)::BIGINT AS n_distinct_shingles,
                 sum((cnt > 1000)::INT)::BIGINT AS dropped_shingles,
                 max(cnt)::BIGINT AS max_doc_freq_seen
          FROM df
        """,
        "minhash_lsh_pairs": _JACCARD_PAIRS_SQL,
        # the streaming store must accumulate EXACTLY the batch pair
        # set (unexpired watermark ⇒ incremental pairing covers every
        # pair when its later member arrives) — same exact oracle
        "streaming_neardup_pairs": _JACCARD_PAIRS_SQL,
        # hot-bucket path: the engine must recover the 25-doc
        # identical-text runs THROUGH the star-edge degradation, AND
        # merge runs whose leader texts are themselves exact/near dups
        # (the corpus is a dedup fixture — leaders repeat) — so the
        # oracle builds components over the leader graph (string-shingle
        # jaccard ≥ T, recursive CTE like cc_clusters) and fans each
        # component's min leader out to its runs' members. Blank-text
        # runs are excluded, mirroring signatures()' zero-token rule.
        "lsh_hot_bucket_clusters": rf"""
          WITH RECURSIVE leaders AS (
            SELECT doc_id AS leader, text FROM documents
            WHERE doc_id % 25 = 0 AND trim(text) != ''),
          toksrc AS (
            SELECT leader AS doc_id,
                   regexp_split_to_array(trim(text), '\s+') AS t
            FROM leaders
          ), sh AS (
            SELECT doc_id, unnest(list_distinct(
              CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                   ELSE [array_to_string(t[i:i+2], ' ')
                         for i in range(1, len(t) - 1)] END)) AS s
            FROM toksrc
          ), sizes AS (
            SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
          ), inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
          ), jac AS (
            SELECT id_a, id_b, c * 1.0 / (sa.n + sb.n - c) AS j
            FROM inter
            JOIN sizes sa ON id_a = sa.doc_id
            JOIN sizes sb ON id_b = sb.doc_id
          ),
          pairs AS (SELECT id_a, id_b FROM jac WHERE j >= {JACCARD_T}),
          edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                    UNION SELECT id_b, id_a FROM pairs),
          reach AS (
            SELECT leader AS node, leader AS r FROM leaders
            UNION
            SELECT e.dst AS node, reach.r
            FROM reach JOIN edges e ON e.src = reach.node
          ),
          comp AS (SELECT node AS leader, min(r) AS cluster_id
                   FROM reach GROUP BY node)
          SELECT comp.cluster_id::BIGINT AS cluster_id,
                 d.doc_id::BIGINT AS doc_id
          FROM documents d
          JOIN comp ON comp.leader = d.doc_id - d.doc_id % 25
        """,
        # truncated-sketch-path gate: string-shingle Jaccard over the
        # same sliding-window long docs (all >sketch_k shingles); pair
        # MEMBERSHIP matches because borderline pairs are exact-verified
        # and estimate-decided pairs sit many sigma from the threshold
        "sketch_verify_longdocs": rf"""
          WITH n AS (SELECT count(*) AS c FROM documents),
          wins AS (SELECT unnest(range(
            ((SELECT c FROM n) - {LONGDOC_W}) // {LONGDOC_S} + 1)) AS w),
          ld AS (
            SELECT w, string_agg(text, ' ' ORDER BY doc_id) AS text
            FROM wins JOIN documents
              ON doc_id >= w * {LONGDOC_S}
             AND doc_id < w * {LONGDOC_S} + {LONGDOC_W}
            GROUP BY w
          ),
          toksrc AS (
            SELECT w AS doc_id,
                   CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(text), '\s+')
                   END AS t
            FROM ld
          ), sh AS (
            SELECT doc_id, unnest(list_distinct(
              CASE WHEN len(t) = 0 THEN []::VARCHAR[]
                   WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                   ELSE [array_to_string(t[i:i+2], ' ')
                         for i in range(1, len(t) - 1)] END)) AS s
            FROM toksrc
          ), sizes AS (
            SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
          ), inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
          ), jac AS (
            SELECT id_a, id_b, c * 1.0 / (sa.n + sb.n - c) AS j
            FROM inter
            JOIN sizes sa ON id_a = sa.doc_id
            JOIN sizes sb ON id_b = sb.doc_id
          )
          SELECT id_a::BIGINT AS window_a, id_b::BIGINT AS window_b
          FROM jac WHERE j >= {JACCARD_T}
        """,
        "cc_clusters": _SHINGLES.replace(
            "WITH toksrc", "WITH RECURSIVE toksrc", 1) + f"""
          , pairs AS (SELECT id_a, id_b FROM jac WHERE j >= {JACCARD_T}),
          edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                    UNION SELECT id_b, id_a FROM pairs),
          nodes AS (SELECT DISTINCT src AS node FROM edges),
          reach AS (
            SELECT node, node AS r FROM nodes
            UNION
            SELECT e.dst AS node, reach.r
            FROM reach JOIN edges e ON e.src = reach.node
          )
          SELECT min(r) AS cluster_id, node AS doc_id
          FROM reach GROUP BY node
        """,
        # same recursive components as cc_clusters, then the
        # keep-LONGEST policy: per component, rank by n_chars desc with
        # doc_id asc tie-break — rank 1 keeps, the rest delete
        # the audit's truth count is recomputed exactly (jac CTE); the
        # detected/hit counts and recall=precision=1.0 are the s-curve
        # contract of (32 bands x 4 rows) at T=0.8 — the same
        # value-equality the pairwise queries gate, restated as the
        # north-rule metric, so an approximate-path regression flips
        # this row red even if no individual pair query is in the run
        "dedup_recall_audit": _SHINGLES + f"""
          , t AS (SELECT count(*) AS n FROM jac WHERE j >= {JACCARD_T})
          SELECT n::BIGINT AS n_truth, n::BIGINT AS n_detected,
                 n::BIGINT AS n_hit, 1.0::DOUBLE AS recall,
                 1.0::DOUBLE AS precision FROM t
        """,
        # identical truth + identical 1.0 contract as dedup_recall_audit:
        # the OPH signature path must lose NO pair vs the exact oracle
        "oph_recall_audit": _SHINGLES + f"""
          , t AS (SELECT count(*) AS n FROM jac WHERE j >= {JACCARD_T})
          SELECT n::BIGINT AS n_truth, n::BIGINT AS n_detected,
                 n::BIGINT AS n_hit, 1.0::DOUBLE AS recall,
                 1.0::DOUBLE AS precision FROM t
        """,
        "neardup_keep_best": _SHINGLES.replace(
            "WITH toksrc", "WITH RECURSIVE toksrc", 1) + f"""
          , pairs AS (SELECT id_a, id_b FROM jac WHERE j >= {JACCARD_T}),
          edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                    UNION SELECT id_b, id_a FROM pairs),
          nodes AS (SELECT DISTINCT src AS node FROM edges),
          reach AS (
            SELECT node, node AS r FROM nodes
            UNION
            SELECT e.dst AS node, reach.r
            FROM reach JOIN edges e ON e.src = reach.node
          ),
          comp AS (SELECT node AS doc_id, min(r) AS cluster_id
                   FROM reach GROUP BY node),
          ranked AS (
            SELECT comp.cluster_id, comp.doc_id, d.n_chars,
                   row_number() OVER (
                     PARTITION BY comp.cluster_id
                     ORDER BY d.n_chars DESC, comp.doc_id ASC) AS rn
            FROM comp JOIN documents d USING (doc_id))
          SELECT cluster_id::BIGINT AS cluster_id,
                 doc_id::BIGINT AS doc_id, n_chars::BIGINT AS n_chars,
                 CASE WHEN rn = 1 THEN 'keep' ELSE 'delete' END AS action,
                 CASE WHEN rn = 1 THEN 'best n_chars in cluster'
                      ELSE 'outscored on n_chars' END AS reason
          FROM ranked
        """,
        # same recursive components as cc_clusters, then keep-first:
        # every member except the component minimum is dropped
        "neardup_dedup_apply": _SHINGLES.replace(
            "WITH toksrc", "WITH RECURSIVE toksrc", 1) + f"""
          , pairs AS (SELECT id_a, id_b FROM jac WHERE j >= {JACCARD_T}),
          edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                    UNION SELECT id_b, id_a FROM pairs),
          nodes AS (SELECT DISTINCT src AS node FROM edges),
          reach AS (
            SELECT node, node AS r FROM nodes
            UNION
            SELECT e.dst AS node, reach.r
            FROM reach JOIN edges e ON e.src = reach.node
          ),
          dropped AS (
            SELECT node AS doc_id FROM reach
            GROUP BY node HAVING node <> min(r)
          )
          SELECT d.doc_id, length(d.text)::BIGINT AS n_chars
          FROM documents d ANTI JOIN dropped USING (doc_id)
        """,
        "cross_snapshot_decisions": _SNAP_DECIDED + """
          SELECT doc_id::BIGINT AS doc_id,
                 cluster_id::BIGINT AS cluster_id, action, reason
          FROM (SELECT * FROM decided UNION ALL SELECT * FROM singles)
        """,
        # survivors = all store ids + new ids decided keep; n_shingles
        # is the per-doc distinct-shingle count (the sizes CTE), 0 for
        # docs whose text yields no shingles
        "cross_snapshot_apply": _SNAP_DECIDED + f"""
          , survivors AS (
            SELECT doc_id FROM corpus
            WHERE doc_id < {SHIFT} AND trim(text) <> ''
            UNION ALL
            SELECT doc_id
            FROM (SELECT * FROM decided UNION ALL SELECT * FROM singles)
            WHERE action = 'keep')
          SELECT s.doc_id::BIGINT AS doc_id,
                 coalesce(z.n, 0)::BIGINT AS n_shingles
          FROM survivors s LEFT JOIN sizes z USING (doc_id)
        """,
        # md5(id-as-string) is the engine-portable order key — DuckDB
        # and Spark produce the same hex digest byte-for-byte
        "stratified_sample": f"""
          SELECT lang, doc_id,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(doc_id::VARCHAR), doc_id)::BIGINT AS rank
          FROM documents
          QUALIFY rank <= {SAMPLE_K}
        """,
        "token_budget_sample": f"""
          WITH t AS (
            SELECT lang, doc_id,
                   (CASE WHEN trim(text) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                    END)::BIGINT AS n_tokens
            FROM documents
          )
          SELECT lang, doc_id, n_tokens,
                 sum(n_tokens) OVER (
                   PARTITION BY lang
                   ORDER BY md5(doc_id::VARCHAR), doc_id
                   ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tokens
          FROM t
          QUALIFY cum_tokens <= {SAMPLE_BUDGET}
        """,
        # closed-form mirror of q_mp3_stream_meta's scripted streams:
        # every field derives from doc_id alone (MPEG-1 L3 bitrate
        # table inlined; 1152 samples/frame at 44100 Hz); integer sums
        # divide exactly as in the parser, so doubles match bit-for-bit
        "mp3_stream_meta": """
          WITH br AS (
            SELECT [32,40,48,56,64,80,96,112,128,160,192,224,256,320]
                   AS t
          ), p AS (
            SELECT doc_id,
                   3 + doc_id % 5 AS k,
                   t[(doc_id % 14 + 1)::INT] AS a,
                   t[((5 * doc_id + 3) % 14 + 1)::INT] AS b,
                   doc_id % 3 = 0 AS vbr_doc
            FROM documents, br
          ), q AS (
            SELECT doc_id, k, a, b,
                   CASE WHEN vbr_doc THEN k // 2 ELSE 0 END AS n_b,
                   vbr_doc
            FROM p
          )
          SELECT doc_id,
                 k::BIGINT AS n_frames,
                 44100::BIGINT AS sample_rate,
                 round(k * 1152 * 1000.0 / 44100, 3) AS duration_ms,
                 round(((k - n_b) * a + n_b * b) * 1.0 / k, 6)
                   AS bitrate_kbps,
                 (vbr_doc AND b <> a) AS vbr
          FROM q
        """,
        # closed-form mirror of q_mp3_frame_integrity's scripted
        # streams: k = 2+i%4; even i protected (frame 0 CRC corrupted
        # when i%5==0); odd i reservoir on even frames; i%3==0 Xing
        "mp3_frame_integrity": """
          WITH p AS (
            SELECT doc_id AS i, 2 + doc_id % 4 AS k,
                   doc_id % 2 = 0 AS prot
            FROM documents
          )
          SELECT i AS doc_id,
                 k::BIGINT AS n_frames,
                 (CASE WHEN prot THEN k ELSE 0 END)::BIGINT
                   AS protected_frames,
                 (CASE WHEN prot
                       THEN k - (CASE WHEN i % 5 = 0 THEN 1 ELSE 0 END)
                       ELSE 0 END)::BIGINT AS crc_ok_frames,
                 (CASE WHEN prot THEN 0 ELSE (k + 1) // 2 END)::BIGINT
                   AS reservoir_frames,
                 (CASE WHEN prot THEN 0
                       ELSE (37 * i) % 511 + 1 END)::BIGINT
                   AS max_main_data_begin,
                 i % 3 = 0 AS has_xing,
                 (CASE WHEN i % 3 = 0 THEN k END)::BIGINT AS xing_frames
          FROM p
        """,
        # closed-form mirror of q_mp4_container_meta's scripted files
        "mp4_container_meta": """
          SELECT doc_id,
                 ['isom','mp42','avc1','dash'][(doc_id % 4 + 1)::INT]
                   AS brand,
                 (1000 * (1 + doc_id % 4))::BIGINT AS timescale,
                 round((1000 + (7 * doc_id) % 100000) * 1000.0
                       / (1000 * (1 + doc_id % 4)), 3) AS duration_ms,
                 (1 + doc_id % 2)::BIGINT AS n_video,
                 (CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)::BIGINT
                   AS n_audio,
                 (CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END)::BIGINT
                   AS n_other
          FROM documents
        """,
        "ann_cosine_topk": f"""
          WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
                     FROM embeddings WHERE vec_id < {ANN_NQ}),
          n AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS nv
                FROM embeddings),
          scored AS (
            SELECT qid AS query_id, nid AS neighbor_id, {_COS_SIM} AS sim
            FROM q, n WHERE qid != nid),
          ranked AS (
            SELECT *, row_number() OVER (
              PARTITION BY query_id
              ORDER BY sim DESC, neighbor_id) AS rank
            FROM scored)
          SELECT query_id, neighbor_id, sim, rank
          FROM ranked WHERE rank <= {ANN_K}
        """,
        "embedding_cosine_pairs": f"""
          WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e
                     FROM embeddings WHERE vec_id < 200),
          s AS (
            SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
                   round(
                     list_sum([a.e[i] * b.e[i]
                               for i in range(1, len(a.e) + 1)]) /
                     (sqrt(list_sum([x * x for x in a.e])) *
                      sqrt(list_sum([x * x for x in b.e]))), 6) AS sim
            FROM v a JOIN v b ON a.vec_id < b.vec_id)
          SELECT vec_id_a, vec_id_b, sim FROM s WHERE sim >= {COSINE_T}
        """,
        # full value-for-value mirror of q_semantic_dedup: planted
        # scale-collinear copies, pinned centroids (vec_id < SEM_K),
        # rounded-argmax assignment with cell_id tie-break, within-cell
        # pairing + cosine >= SEM_T, recursive-CTE components, and the
        # SemDeDup keep rule (lowest centroid_sim, then smallest vec_id)
        "semantic_dedup": f"""
          WITH RECURSIVE v AS (
            SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
          corpus AS (
            SELECT vec_id, e FROM v
            UNION ALL
            SELECT vec_id + 10000, [x * 1.5 for x in e]
            FROM v WHERE vec_id % 7 = 0
            UNION ALL
            SELECT vec_id + 20000, [x * 0.25 for x in e]
            FROM v WHERE vec_id % 14 = 0),
          cents AS (
            SELECT vec_id AS cell_id, e AS cv FROM v
            WHERE vec_id < {SEM_K}),
          scored AS (
            SELECT c.vec_id, ct.cell_id,
                   round(
                     list_sum([c.e[i] * ct.cv[i]
                               for i in range(1, len(c.e) + 1)]) /
                     (sqrt(list_sum([x * x for x in c.e])) *
                      sqrt(list_sum([x * x for x in ct.cv]))), 6) AS s
            FROM corpus c, cents ct),
          assign AS (
            SELECT vec_id, cell_id, s AS centroid_sim FROM (
              SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY s DESC, cell_id) AS rn
              FROM scored) WHERE rn = 1),
          pairs AS (
            SELECT ja.vec_id AS id_a, jb.vec_id AS id_b
            FROM assign ja
            JOIN assign jb
              ON ja.cell_id = jb.cell_id AND ja.vec_id < jb.vec_id
            JOIN corpus a ON a.vec_id = ja.vec_id
            JOIN corpus b ON b.vec_id = jb.vec_id
            WHERE round(
                    list_sum([a.e[i] * b.e[i]
                              for i in range(1, len(a.e) + 1)]) /
                    (sqrt(list_sum([x * x for x in a.e])) *
                     sqrt(list_sum([x * x for x in b.e]))), 6)
                  >= {SEM_T}),
          edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                    UNION SELECT id_b, id_a FROM pairs),
          nodes AS (SELECT DISTINCT src AS node FROM edges),
          reach AS (
            SELECT node, node AS r FROM nodes
            UNION
            SELECT e.dst AS node, reach.r
            FROM reach JOIN edges e ON e.src = reach.node),
          comp AS (SELECT node AS vec_id, min(r) AS cluster_id
                   FROM reach GROUP BY node),
          ranked AS (
            SELECT m.vec_id, m.cell_id, m.centroid_sim, comp.cluster_id,
                   row_number() OVER (
                     PARTITION BY comp.cluster_id
                     ORDER BY m.centroid_sim ASC, m.vec_id ASC) AS rn
            FROM comp JOIN assign m USING (vec_id))
          SELECT vec_id::BIGINT AS vec_id, cell_id::BIGINT AS cell_id,
                 centroid_sim,
                 cluster_id::BIGINT AS cluster_id,
                 CASE WHEN rn = 1 THEN 'keep' ELSE 'drop' END AS action
          FROM ranked
        """,
        # full mirror of q_dsir_select: identical tokenization,
        # sha256-prefix feature buckets, Laplace-smoothed micro-log
        # ratios (integer, so per-doc sums are order-independent on
        # both engines), and the deterministic top-k
        "dsir_select": f"""
          WITH split AS (
            SELECT doc_id, lang,
                   CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(text), '\\s+')
                   END AS t
            FROM documents),
          grams AS (
            SELECT doc_id, lang, unnest(
              t || CASE WHEN len(t) < 2 THEN []::VARCHAR[]
                        ELSE [t[i] || ' ' || t[i+1]
                              for i in range(1, len(t))] END) AS g
            FROM split),
          feats AS (
            SELECT doc_id, lang,
                   CAST(concat('0x', substr(sha256(g), 1, 8)) AS BIGINT)
                     % {DSIR_BUCKETS} AS feat
            FROM grams),
          ctt AS (SELECT feat, count(*) AS n_t FROM feats
                  WHERE lang = 'fr' GROUP BY 1),
          ctr AS (SELECT feat, count(*) AS n_r FROM feats
                  WHERE lang <> 'fr' GROUP BY 1),
          cnt AS (
            SELECT coalesce(ctt.feat, ctr.feat) AS feat,
                   coalesce(n_t, 0) AS n_t, coalesce(n_r, 0) AS n_r
            FROM ctt FULL OUTER JOIN ctr ON ctt.feat = ctr.feat),
          tots AS (SELECT sum(n_t) AS tt, sum(n_r) AS tr FROM cnt),
          lr AS (
            SELECT feat,
                   CAST(round(1e6 * (
                     ln((n_t + 1.0) / (tt + {DSIR_BUCKETS}.0)) -
                     ln((n_r + 1.0) / (tr + {DSIR_BUCKETS}.0))))
                     AS BIGINT) AS lr_micro
            FROM cnt, tots),
          wts AS (
            SELECT doc_id, count(*) AS n_feats,
                   sum(lr_micro) AS weight_micro
            FROM feats JOIN lr USING (feat)
            WHERE lang <> 'fr' GROUP BY 1),
          w AS (
            SELECT d.doc_id, coalesce(n_feats, 0) AS n_feats,
                   coalesce(weight_micro, 0) AS weight_micro
            FROM (SELECT doc_id FROM documents WHERE lang <> 'fr') d
            LEFT JOIN wts USING (doc_id)),
          ranked AS (
            SELECT *, row_number() OVER (
              ORDER BY weight_micro DESC, doc_id) AS rank
            FROM w)
          SELECT doc_id, n_feats::BIGINT AS n_feats,
                 weight_micro::BIGINT AS weight_micro,
                 rank::BIGINT AS rank
          FROM ranked WHERE rank <= {DSIR_K}
        """,
        "multimodal_binary_meta": """
          SELECT doc_id,
                 octet_length(encode(text))::BIGINT AS n_bytes,
                 upper(substr(hex(encode(text)), 1, 16)) AS head_hex
          FROM documents
        """,
        # the stub feature is sha256(utf8(text)) bytes[0:8]/255.0
        # (operators/multimodal.py::decode_stub); the canonical key
        # re-derives the integer bytes from DuckDB's hex digest
        "multimodal_features": """
          SELECT doc_id,
                 octet_length(encode(text))::BIGINT AS n_bytes,
                 array_to_string(
                   [CAST(CAST(concat('0x', substr(sha256(text), 2*i-1, 2))
                              AS INTEGER) AS VARCHAR)
                    for i in range(1, 9)], ',') AS feature_key
          FROM documents
        """,
        # the REAL PNG decode gate: the expected pixel-statistics
        # feature of a solid h×w (r,g,b) image is closed-form in
        # doc_id — [h/4096, w/4096, r/255, g/255, b/255, 0, 0, 0],
        # each rounded to 6 decimals then scaled to an integer key.
        # None of the values can tie at the 7th decimal (h/4096·1e6 and
        # k·1e6/255 are never exactly .5), so Python round (half-even)
        # and DuckDB round (half-away) agree digit-for-digit.
        "png_decode_features": """
          WITH f AS (
            SELECT doc_id,
                   1 + doc_id % 5 AS h, 1 + (doc_id // 5) % 5 AS w,
                   doc_id % 256 AS r, (doc_id * 7) % 256 AS g,
                   (doc_id * 13) % 256 AS b
            FROM documents)
          SELECT doc_id,
                 concat_ws(',',
                   CAST(round(1000000 * round(h / 4096.0, 6)) AS INT),
                   CAST(round(1000000 * round(w / 4096.0, 6)) AS INT),
                   CAST(round(1000000 * round(r / 255.0, 6)) AS INT),
                   CAST(round(1000000 * round(g / 255.0, 6)) AS INT),
                   CAST(round(1000000 * round(b / 255.0, 6)) AS INT),
                   0, 0, 0) AS feature_key
          FROM f
        """,
        # lossless WebP: same closed-form solid-color feature key as
        # the PNG gate (same no-tie-at-the-7th-decimal argument), over
        # the writer's cycled option paths
        "webp_decode_features": """
          WITH f AS (
            SELECT doc_id,
                   1 + doc_id % 6 AS h, 1 + (doc_id // 6) % 7 AS w,
                   (doc_id * 3) % 256 AS r, (doc_id * 11) % 256 AS g,
                   (doc_id * 17) % 256 AS b
            FROM documents)
          SELECT doc_id,
                 concat_ws(',',
                   CAST(round(1000000 * round(h / 4096.0, 6)) AS INT),
                   CAST(round(1000000 * round(w / 4096.0, 6)) AS INT),
                   CAST(round(1000000 * round(r / 255.0, 6)) AS INT),
                   CAST(round(1000000 * round(g / 255.0, 6)) AS INT),
                   CAST(round(1000000 * round(b / 255.0, 6)) AS INT),
                   0, 0, 0) AS feature_key
          FROM f
        """,
        # jpeg decode is lossy: the ground-truth comparison lives on the
        # Spark side (dims exact, channel means within the measured
        # solid-color bound); the oracle pins the row set + all-TRUE.
        "jpeg_decode_features": """
          SELECT doc_id, CAST(TRUE AS BOOLEAN) AS ok FROM documents
        """,
        # the SAMPLING fanout is closed-form from doc_id: n = 1+doc_id%6
        # frames, m = min(3, n) sampled at indices i*n//m; decode
        # ground truth lives Spark-side (ok must be all-TRUE).
        "avi_frame_sample": """
          WITH d AS (
            SELECT doc_id, 1 + doc_id % 6 AS n,
                   least(3, 1 + doc_id % 6) AS m
            FROM documents)
          SELECT doc_id,
                 CAST(unnest([i * n // m for i in range(0, m)]) AS INT)
                   AS frame_no,
                 CAST(TRUE AS BOOLEAN) AS ok
          FROM d
        """,
        # constant-PCM WAV: every feature is exact — c = m/64 gives
        # integer c·10⁶ = 15625·m; duration mirrors the engine's exact
        # double arithmetic (round(n/28800000, 6) then ×10⁶); zcr 0.
        "wav_audio_features": """
          WITH d AS (
            SELECT doc_id, 1 + doc_id % 63 AS m, 100 + doc_id % 50 AS n
            FROM documents)
          SELECT doc_id,
                 concat_ws(',',
                   CAST(round(round(n / 28800000.0, 6) * 1000000)
                        AS INT),
                   CAST(15625 * m AS INT), CAST(15625 * m AS INT), 0,
                   CAST(15625 * m AS INT), CAST(15625 * m AS INT),
                   CAST(15625 * m AS INT), CAST(15625 * m AS INT))
                   AS feature_key
          FROM d
        """,
        "tpch_pricing_summary": """
          SELECT l_returnflag, l_linestatus,
                 sum(l_quantity) AS sum_qty,
                 CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                      AS DOUBLE) AS sum_base_price,
                 CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                          (CAST(1 AS DECIMAL(18,2)) -
                           CAST(l_discount AS DECIMAL(18,2))))
                      AS DOUBLE) AS sum_disc_price,
                 round(sum(l_quantity) / count(*), 6) AS avg_qty,
                 count(*) AS count_order
          FROM lineitem
          WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
          GROUP BY l_returnflag, l_linestatus
        """,
        "top_orders_per_customer": """
          WITH t AS (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC,
                                               o_orderkey) AS rn
            FROM orders)
          SELECT c_custkey, c_name, o_orderkey, o_totalprice, rn
          FROM t JOIN customer ON o_custkey = c_custkey
          WHERE rn <= 3
        """,
        "nation_order_revenue": """
          SELECT n_name, count(*) AS n_orders,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_revenue
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY n_name
        """,
        "region_nation_count": """
          SELECT r_name, count(*) AS n_nations
          FROM nation JOIN region ON n_regionkey = r_regionkey
          GROUP BY r_name
        """,
        "substring_containment": f"""
          WITH base AS (SELECT doc_id, text FROM documents
                        WHERE length(text) >= 250),
          inn AS (SELECT doc_id + {SHIFT} AS doc_id,
                         array_to_string((string_split(text, ' '))[5:34],
                                         ' ') AS text
                  FROM base WHERE doc_id % 5 = 0),
          u AS (SELECT * FROM base UNION ALL SELECT * FROM inn)
          SELECT a.doc_id AS doc_id_inner, b.doc_id AS doc_id_outer
          FROM u a JOIN u b
            ON a.doc_id <> b.doc_id
           AND length(a.text) < length(b.text)
           AND contains(b.text, a.text)
        """,
        "lcs_verify": f"""
          SELECT doc_id + {SHIFT} AS doc_id_inner,
                 doc_id AS doc_id_outer,
                 length(array_to_string((string_split(text, ' '))[5:34],
                                        ' '))::BIGINT AS lcs_len
          FROM documents WHERE length(text) >= 250 AND doc_id % 5 = 0
        """,
        "events_sessions": """
          WITH s AS (
            SELECT user_id, event_id, ts, epoch_ms(ts) AS ts_ms,
                   CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
                          OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w
                             > 30 * 60000
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
          ), g AS (
            SELECT user_id, ts_ms,
                   -- ::BIGINT: DuckDB's windowed sum yields HUGEINT, which
                   -- lands as float64 in the compare frame; Spark emits
                   -- int64 (values match row-for-row, only the type didn't)
                   sum(new_sess) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING)::BIGINT
                     AS session_id
            FROM s)
          SELECT user_id, session_id, count(*) AS n_events,
                 (max(ts_ms) - min(ts_ms))::BIGINT AS duration_ms
          FROM g GROUP BY user_id, session_id
        """,
        "events_hourly": """
          SELECT date_trunc('hour', ts) AS hour, event_type,
                 count(*) AS n_events,
                 CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_value,
                 round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                       / count(*), 6) AS avg_value
          FROM events GROUP BY 1, 2
        """,
        "events_dup_groups": """
          SELECT user_id, event_type, value, count(*) AS n_dups,
                 min(event_id) AS kept_event_id
          FROM events GROUP BY 1, 2, 3 HAVING count(*) > 1
        """,
        # pinned-constant oracles for the seeded approximate operators:
        # every input (xxhash64-derived hyperplanes / centroids / simhash
        # bit votes) is deterministic, so the engine reproduces these
        # numbers bit-for-bit on every run at sf0.01. simhash block-join
        # recall MUST be 1.0 by the pigeonhole argument (hamming_max=3 <
        # n_blocks=4); the pair count pins the corpus-dependent part.
        "simhash_block_recall": """
          SELECT 17::BIGINT AS n_pairs_blocked, 17::BIGINT AS n_pairs_brute,
                 17::BIGINT AS n_matched, 1.0 AS recall
        """,
        # corpus-derived (VERDICT r2 #2): n_truth is the brute-force
        # top-k row count recomputed in SQL — a regression in the exact
        # side (ranking, tie-break, filter) shifts n_truth and is caught.
        # The approximate side is FLOOR-gated (VERDICT r4 #4): the Spark
        # query emits meets_floor = (measured n_hits >= floor), the
        # oracle pins the floor and TRUE — benign seed/rounding changes
        # that keep recall at-or-above the floor stay green, a real
        # recall loss goes red. Floor provenance + the sf0.01-only
        # validity note live at ANN_LSH_HITS_FLOOR / ANN_IVF_HITS_FLOOR
        # above (a red at sf0.001 on these queries is EXPECTED).
        "ann_lsh_recall": f"""
          WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
                     FROM embeddings WHERE vec_id < {ANN_NQ}),
          n AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS nv
                FROM embeddings),
          scored AS (
            SELECT qid AS query_id, nid AS neighbor_id, {_COS_SIM} AS sim
            FROM q, n WHERE qid != nid),
          ranked AS (
            SELECT *, row_number() OVER (
              PARTITION BY query_id
              ORDER BY sim DESC, neighbor_id) AS rank
            FROM scored),
          t AS (SELECT count(*) AS n_truth FROM ranked
                WHERE rank <= {ANN_K})
          SELECT {ANN_NQ}::BIGINT AS n_queries, {ANN_K}::BIGINT AS k,
                 n_truth::BIGINT AS n_truth,
                 {ANN_LSH_HITS_FLOOR}::BIGINT AS n_hits_floor,
                 TRUE AS meets_floor,
                 round({ANN_LSH_HITS_FLOOR}.0 / n_truth, 6) AS recall_floor
          FROM t
        """,
        "ann_ivf_recall": f"""
          WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
                     FROM embeddings WHERE vec_id < {ANN_NQ}),
          n AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS nv
                FROM embeddings),
          scored AS (
            SELECT qid AS query_id, nid AS neighbor_id, {_COS_SIM} AS sim
            FROM q, n WHERE qid != nid),
          ranked AS (
            SELECT *, row_number() OVER (
              PARTITION BY query_id
              ORDER BY sim DESC, neighbor_id) AS rank
            FROM scored),
          t AS (SELECT count(*) AS n_truth FROM ranked
                WHERE rank <= {ANN_K})
          SELECT {ANN_NQ}::BIGINT AS n_queries, {ANN_K}::BIGINT AS k,
                 n_truth::BIGINT AS n_truth,
                 {ANN_IVF_HITS_FLOOR}::BIGINT AS n_hits_floor,
                 TRUE AS meets_floor,
                 round({ANN_IVF_HITS_FLOOR}.0 / n_truth, 6) AS recall_floor
          FROM t
        """,
        # corpus-derived + floor-gated: the exact pair count comes from
        # SQL; the bucketed path is gated as meets_floor = (n_matched >=
        # n_pairs_exact), i.e. recall floor 1.0 under the seeded
        # (3-plane × 16-table) configuration on the sf0.01 corpus
        "embedding_pairs_lsh_recall": f"""
          WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e
                     FROM embeddings),
          s AS (
            SELECT round(
                     list_sum([a.e[i] * b.e[i]
                               for i in range(1, len(a.e) + 1)]) /
                     (sqrt(list_sum([x * x for x in a.e])) *
                      sqrt(list_sum([x * x for x in b.e]))), 6) AS sim
            FROM v a JOIN v b ON a.vec_id < b.vec_id),
          x AS (SELECT count(*) AS c FROM s WHERE sim >= {COSINE_T})
          SELECT c::BIGINT AS n_pairs_exact, TRUE AS meets_floor,
                 1.0 AS recall_floor FROM x
        """,
        # paragraph = non-overlapping PARA_W-token window; keep-first in
        # (doc_id, para_idx) order. DuckDB partitions the window by the
        # paragraph STRING, Spark by sha2(para) — identical up to the
        # same negligible collision mass as the jaccard oracles.
        "paragraph_dedup_stats": _PARAS.format(w=PARA_W) + """
          , flagged AS (
            SELECT doc_id, length(para) AS n_chars,
                   row_number() OVER (PARTITION BY para
                                      ORDER BY doc_id, para_idx) AS occ
            FROM paras)
          SELECT doc_id, count(*)::BIGINT AS n_paras,
                 sum((occ > 1)::INT)::BIGINT AS n_dup_paras,
                 round(sum(CASE WHEN occ > 1 THEN n_chars ELSE 0 END)
                       * 1.0 / sum(n_chars), 6) AS dup_char_frac
          FROM flagged GROUP BY doc_id
        """,
        "paragraph_dedup_apply": _PARAS.format(w=PARA_W) + """
          , kept AS (
            SELECT doc_id, para_idx, para FROM paras
            QUALIFY row_number() OVER (PARTITION BY para
                                       ORDER BY doc_id, para_idx) = 1)
          SELECT doc_id,
                 string_agg(para, ' ' ORDER BY para_idx) AS clean_text,
                 count(*)::BIGINT AS n_kept
          FROM kept GROUP BY doc_id
        """,
        "gopher_repetition": _PARAS.format(w=GOPHER_W) + r"""
          , pflag AS (
            SELECT doc_id, length(para) AS n_chars,
                   row_number() OVER (PARTITION BY doc_id, para
                                      ORDER BY para_idx) AS occ
            FROM paras),
          pstats AS (
            SELECT doc_id, count(*)::BIGINT AS n_paras,
                   sum((occ > 1)::INT)::BIGINT AS n_dup_paras,
                   round(sum(CASE WHEN occ > 1 THEN n_chars ELSE 0 END)
                         * 1.0 / sum(n_chars), 6) AS dup_para_char_frac
            FROM pflag GROUP BY doc_id),
          gidx AS (
            SELECT doc_id, doc_chars, ws, unnest(range(1, len(ws))) AS i
            FROM words WHERE len(ws) >= 2),
          gcnt AS (
            SELECT doc_id, doc_chars, ws[i] || ' ' || ws[i+1] AS gram,
                   count(*)::BIGINT AS cnt
            FROM gidx GROUP BY ALL),
          gtop AS (
            SELECT doc_id, gram AS top_2gram,
                   round(cnt * length(gram) * 1.0 / doc_chars, 6)
                     AS top_2gram_char_frac
            FROM gcnt
            QUALIFY row_number() OVER (PARTITION BY doc_id
                                       ORDER BY cnt DESC, gram) = 1)
          SELECT p.doc_id, p.n_paras, p.n_dup_paras, p.dup_para_char_frac,
                 g.top_2gram, g.top_2gram_char_frac
          FROM pstats p JOIN gtop g USING (doc_id)
        """,
        # full mirror of q_gopher_quality_filter: same tokenization,
        # char-length sums via separator-less joins, literal-replace
        # occurrence counts, blank-filtered lines, and the rounded
        # ratios the rules compare against
        "gopher_quality_filter": f"""
          WITH base AS (
            SELECT doc_id, text,
                   CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(text), '\\s+')
                   END AS t,
                   list_filter(string_split(text, chr(10)),
                               l -> trim(l) <> '') AS lns
            FROM documents),
          sig AS (
            SELECT doc_id, len(t)::BIGINT AS n_words,
              round(CASE WHEN len(t) = 0 THEN 0.0
                    ELSE length(array_to_string(t, '')) * 1.0 / len(t)
                    END, 6) AS mean_word_len,
              round(CASE WHEN len(t) = 0 THEN 0.0 ELSE (
                  (length(text) - length(replace(text, '#', '')))
                  + (length(text) - length(replace(text, '…', '')))
                  + (length(replace(text, '…', ''))
                     - length(replace(replace(text, '…', ''),
                                      '...', ''))) / 3.0
                ) * 1.0 / len(t) END, 6) AS symbol_word_ratio,
              round(CASE WHEN len(lns) = 0 THEN 0.0
                    ELSE len(list_filter(lns, l ->
                           starts_with(ltrim(l), '•')
                           OR starts_with(ltrim(l), '- ')))
                         * 1.0 / len(lns) END, 6) AS bullet_line_frac,
              round(CASE WHEN len(lns) = 0 THEN 0.0
                    ELSE len(list_filter(lns, l ->
                           ends_with(rtrim(l), '…')
                           OR ends_with(rtrim(l), '...')))
                         * 1.0 / len(lns) END, 6) AS ellipsis_line_frac,
              round(CASE WHEN len(t) = 0 THEN 0.0
                    ELSE len(list_filter(t, w ->
                           regexp_matches(w, '[A-Za-z]')))
                         * 1.0 / len(t) END, 6) AS alpha_word_frac,
              len(list_intersect(
                list_distinct(list_transform(t, w -> lower(w))),
                ['the','be','to','of','and','that','have','with']
              ))::BIGINT AS n_required_stopwords
            FROM base)
          SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,
                 bullet_line_frac, ellipsis_line_frac, alpha_word_frac,
                 n_required_stopwords,
                 (n_words BETWEEN {GOPHER_MIN_WORDS} AND 100000)::INT
                   AS ok_words,
                 (mean_word_len BETWEEN 3.0 AND 10.0)::INT
                   AS ok_mean_word_len,
                 (symbol_word_ratio <= 0.1)::INT AS ok_symbols,
                 (bullet_line_frac <= 0.9)::INT AS ok_bullets,
                 (ellipsis_line_frac <= 0.3)::INT AS ok_ellipsis,
                 (alpha_word_frac >= 0.8)::INT AS ok_alpha,
                 (n_required_stopwords >= {GOPHER_MIN_STOPWORD_HITS})::INT
                   AS ok_stopwords,
                 ((n_words BETWEEN {GOPHER_MIN_WORDS} AND 100000)
                  AND (mean_word_len BETWEEN 3.0 AND 10.0)
                  AND symbol_word_ratio <= 0.1
                  AND bullet_line_frac <= 0.9
                  AND ellipsis_line_frac <= 0.3
                  AND alpha_word_frac >= 0.8
                  AND n_required_stopwords >=
                      {GOPHER_MIN_STOPWORD_HITS})::INT AS passes_gopher
          FROM sig
        """,
        # closed-form rebuild of q_image_ahash: the synthesized 8×8
        # cell grid (constant 2×2 blocks, gray = 3·v) makes the bit
        # test collapse to 64·v ≥ Σv; bits pack MSB-first into a
        # HUGEINT and wrap to the signed BIGINT two's complement
        "image_ahash": f"""
          WITH cells AS (
            SELECT doc_id, gy, gx, (gy * 8 + gx + 1) AS k,
                   CASE WHEN doc_id % 20 = 1 THEN doc_id - 1
                        WHEN doc_id % 20 = 2 THEN doc_id - 2
                        ELSE doc_id END AS src,
                   (doc_id % 20 = 2 AND gy = 0 AND gx = 0) AS pert
            FROM documents, range(8) r1(gy), range(8) r2(gx)
          ), v AS (
            SELECT doc_id, gy, gx,
                   CASE WHEN pert THEN (src * 7 + 97) % {IMG_V_MOD}
                        ELSE ((src + 1) * k * k) % {IMG_V_MOD}
                   END AS val
            FROM cells
          ), s AS (
            SELECT doc_id, sum(val) AS tot FROM v GROUP BY 1
          ), bits AS (
            SELECT v.doc_id, gy, gx, (64 * val >= tot)::INT AS bit
            FROM v JOIN s USING (doc_id)
          ), h AS (
            SELECT doc_id,
                   sum(CASE WHEN bit = 1
                       THEN CAST(1 AS HUGEINT) << (63 - (gy * 8 + gx))
                       ELSE CAST(0 AS HUGEINT) END) AS uh
            FROM bits GROUP BY 1)
          SELECT doc_id,
                 CAST(uh - CASE WHEN uh >= CAST(1 AS HUGEINT) << 63
                           THEN CAST(1 AS HUGEINT) << 64
                           ELSE CAST(0 AS HUGEINT) END AS BIGINT)
                   AS ahash
          FROM h
        """,
        # brute-force Hamming over the SAME recomputed hashes — the
        # block join must find exactly these pairs (pigeonhole:
        # hamming ≤ 3 < 4 blocks)
        "image_neardup_pairs": f"""
          WITH cells AS (
            SELECT doc_id, gy, gx, (gy * 8 + gx + 1) AS k,
                   CASE WHEN doc_id % 20 = 1 THEN doc_id - 1
                        WHEN doc_id % 20 = 2 THEN doc_id - 2
                        ELSE doc_id END AS src,
                   (doc_id % 20 = 2 AND gy = 0 AND gx = 0) AS pert
            FROM documents, range(8) r1(gy), range(8) r2(gx)
          ), v AS (
            SELECT doc_id, gy, gx,
                   CASE WHEN pert THEN (src * 7 + 97) % {IMG_V_MOD}
                        ELSE ((src + 1) * k * k) % {IMG_V_MOD}
                   END AS val
            FROM cells
          ), s AS (
            SELECT doc_id, sum(val) AS tot FROM v GROUP BY 1
          ), bits AS (
            SELECT v.doc_id, gy, gx, (64 * val >= tot)::INT AS bit
            FROM v JOIN s USING (doc_id)
          ), h AS (
            SELECT doc_id,
                   sum(CASE WHEN bit = 1
                       THEN CAST(1 AS HUGEINT) << (63 - (gy * 8 + gx))
                       ELSE CAST(0 AS HUGEINT) END) AS uh
            FROM bits GROUP BY 1
          ), hh AS (
            SELECT doc_id,
                   CAST(uh - CASE WHEN uh >= CAST(1 AS HUGEINT) << 63
                             THEN CAST(1 AS HUGEINT) << 64
                             ELSE CAST(0 AS HUGEINT) END AS BIGINT)
                     AS ahash
            FROM h)
          SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                 bit_count(xor(a.ahash, b.ahash))::BIGINT AS hamming
          FROM hh a JOIN hh b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
        """,
        # same recomputed hashes + brute-force pairs, then recursive
        # components and the keep-first rule: min doc_id of each
        # component keeps, every other member deletes — the end-to-end
        # cross-format (PPM/PNG/GIF/WebP) image dedup contract
        "image_dedup_decisions": f"""
          WITH RECURSIVE cells AS (
            SELECT doc_id, gy, gx, (gy * 8 + gx + 1) AS k,
                   CASE WHEN doc_id % 20 = 1 THEN doc_id - 1
                        WHEN doc_id % 20 = 2 THEN doc_id - 2
                        ELSE doc_id END AS src,
                   (doc_id % 20 = 2 AND gy = 0 AND gx = 0) AS pert
            FROM documents, range(8) r1(gy), range(8) r2(gx)
          ), v AS (
            SELECT doc_id, gy, gx,
                   CASE WHEN pert THEN (src * 7 + 97) % {IMG_V_MOD}
                        ELSE ((src + 1) * k * k) % {IMG_V_MOD}
                   END AS val
            FROM cells
          ), s AS (
            SELECT doc_id, sum(val) AS tot FROM v GROUP BY 1
          ), bits AS (
            SELECT v.doc_id, gy, gx, (64 * val >= tot)::INT AS bit
            FROM v JOIN s USING (doc_id)
          ), h AS (
            SELECT doc_id,
                   sum(CASE WHEN bit = 1
                       THEN CAST(1 AS HUGEINT) << (63 - (gy * 8 + gx))
                       ELSE CAST(0 AS HUGEINT) END) AS uh
            FROM bits GROUP BY 1
          ), hh AS (
            SELECT doc_id,
                   CAST(uh - CASE WHEN uh >= CAST(1 AS HUGEINT) << 63
                             THEN CAST(1 AS HUGEINT) << 64
                             ELSE CAST(0 AS HUGEINT) END AS BIGINT)
                     AS ahash
            FROM h
          ), pairs AS (
            SELECT a.doc_id AS da, b.doc_id AS db
            FROM hh a JOIN hh b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
          ), edges AS (
            SELECT da AS src, db AS dst FROM pairs
            UNION SELECT db, da FROM pairs
          ), nodes AS (SELECT DISTINCT src AS node FROM edges),
          reach AS (
            SELECT node, node AS r FROM nodes
            UNION
            SELECT e.dst AS node, reach.r
            FROM reach JOIN edges e ON e.src = reach.node
          ), comp AS (
            SELECT node AS doc_id, min(r) AS cluster_id
            FROM reach GROUP BY 1)
          SELECT doc_id, cluster_id,
                 CASE WHEN doc_id = cluster_id THEN 'keep'
                      ELSE 'delete' END AS action
          FROM comp
        """,
        # closed-form rebuild of q_audio_fingerprint: the synthesized
        # 2-sample constant windows make the dyadic-exact energy test
        # collapse to 64·q ≥ Σq (integer); same HUGEINT bit packing as
        # image_ahash
        "audio_fingerprint": f"""
          WITH cells AS (
            SELECT doc_id, w,
                   CASE WHEN doc_id % 20 = 1 THEN doc_id - 1
                        WHEN doc_id % 20 = 2 THEN doc_id - 2
                        ELSE doc_id END AS src,
                   (doc_id % 20 = 2 AND w = 0) AS pert
            FROM documents, range(64) r(w)
          ), v AS (
            SELECT doc_id, w,
                   CASE WHEN pert THEN (src * 7 + 43) % {AUD_Q_MOD}
                        ELSE (((src + 2) * (w + 1) * (w + 1)) % 251)
                             % {AUD_Q_MOD}
                   END AS q
            FROM cells
          ), s AS (
            SELECT doc_id, sum(q) AS tot FROM v GROUP BY 1
          ), bits AS (
            SELECT v.doc_id, w, (64 * q >= tot)::INT AS bit
            FROM v JOIN s USING (doc_id)
          ), h AS (
            SELECT doc_id,
                   sum(CASE WHEN bit = 1
                       THEN CAST(1 AS HUGEINT) << (63 - w)
                       ELSE CAST(0 AS HUGEINT) END) AS uh
            FROM bits GROUP BY 1)
          SELECT doc_id,
                 CAST(uh - CASE WHEN uh >= CAST(1 AS HUGEINT) << 63
                           THEN CAST(1 AS HUGEINT) << 64
                           ELSE CAST(0 AS HUGEINT) END AS BIGINT)
                   AS ahash
          FROM h
        """,
        # brute-force Hamming over the same recomputed fingerprints
        "audio_neardup_pairs": f"""
          WITH cells AS (
            SELECT doc_id, w,
                   CASE WHEN doc_id % 20 = 1 THEN doc_id - 1
                        WHEN doc_id % 20 = 2 THEN doc_id - 2
                        ELSE doc_id END AS src,
                   (doc_id % 20 = 2 AND w = 0) AS pert
            FROM documents, range(64) r(w)
          ), v AS (
            SELECT doc_id, w,
                   CASE WHEN pert THEN (src * 7 + 43) % {AUD_Q_MOD}
                        ELSE (((src + 2) * (w + 1) * (w + 1)) % 251)
                             % {AUD_Q_MOD}
                   END AS q
            FROM cells
          ), s AS (
            SELECT doc_id, sum(q) AS tot FROM v GROUP BY 1
          ), bits AS (
            SELECT v.doc_id, w, (64 * q >= tot)::INT AS bit
            FROM v JOIN s USING (doc_id)
          ), h AS (
            SELECT doc_id,
                   sum(CASE WHEN bit = 1
                       THEN CAST(1 AS HUGEINT) << (63 - w)
                       ELSE CAST(0 AS HUGEINT) END) AS uh
            FROM bits GROUP BY 1
          ), hh AS (
            SELECT doc_id,
                   CAST(uh - CASE WHEN uh >= CAST(1 AS HUGEINT) << 63
                             THEN CAST(1 AS HUGEINT) << 64
                             ELSE CAST(0 AS HUGEINT) END AS BIGINT)
                     AS ahash
            FROM h)
          SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                 bit_count(xor(a.ahash, b.ahash))::BIGINT AS hamming
          FROM hh a JOIN hh b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
        """,
        # closed-form rebuild of q_video_neardup_pairs: per-frame cell
        # grids → frame aHashes (same HUGEINT packing), per-video
        # DISTINCT hash sets, df-cut inverted-index Jaccard
        "video_neardup_pairs": f"""
          WITH cells AS (
            SELECT doc_id, f, (64 * f + gy * 8 + gx + 1) AS k,
                   CASE WHEN doc_id % 20 = 1 THEN doc_id - 1
                        WHEN doc_id % 20 = 2 AND f < 4 THEN doc_id - 2
                        ELSE doc_id END AS src
            FROM documents, range({VID_FRAMES}) r0(f),
                 range(8) r1(gy), range(8) r2(gx)
          ), v AS (
            SELECT doc_id, f, k,
                   (((src + 1) * k * k) % 1009) % {IMG_V_MOD} AS val
            FROM cells
          ), s AS (
            SELECT doc_id, f, sum(val) AS tot FROM v GROUP BY 1, 2
          ), bits AS (
            SELECT v.doc_id, v.f, k, (64 * val >= tot)::INT AS bit
            FROM v JOIN s USING (doc_id, f)
          ), h AS (
            SELECT doc_id, f,
                   sum(CASE WHEN bit = 1
                       THEN CAST(1 AS HUGEINT) << (63 - ((k - 1) % 64))
                       ELSE CAST(0 AS HUGEINT) END) AS uh
            FROM bits GROUP BY 1, 2
          ), hh AS (
            SELECT doc_id,
                   CAST(uh - CASE WHEN uh >= CAST(1 AS HUGEINT) << 63
                             THEN CAST(1 AS HUGEINT) << 64
                             ELSE CAST(0 AS HUGEINT) END AS BIGINT)
                     AS ahash
            FROM h
          ), fh AS (
            SELECT DISTINCT doc_id, ahash FROM hh
          ), sizes AS (
            SELECT doc_id, count(*) AS n FROM fh GROUP BY 1
          ), rare AS (
            SELECT ahash FROM (
              SELECT ahash, count(*) AS df FROM fh GROUP BY 1)
            WHERE df <= 1000
          ), fhr AS (
            SELECT doc_id, ahash FROM fh JOIN rare USING (ahash)
          ), shared AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   count(*) AS n_shared
            FROM fhr a JOIN fhr b
              ON a.ahash = b.ahash AND a.doc_id < b.doc_id
            GROUP BY 1, 2
          ), j AS (
            SELECT id_a, id_b, n_shared,
                   round(n_shared * 1.0 / (na.n + nb.n - n_shared), 6)
                     AS jaccard
            FROM shared
            JOIN sizes na ON na.doc_id = id_a
            JOIN sizes nb ON nb.doc_id = id_b)
          SELECT id_a AS doc_id_a, id_b AS doc_id_b,
                 n_shared::BIGINT AS n_shared, jaccard
          FROM j WHERE jaccard >= {VID_JACCARD}
        """,
        # full mirror of q_sequence_packing: sha256-prefix shard
        # buckets, per-shard running token sums ordered by doc_id,
        # floor-division sequence indices
        "sequence_packing": f"""
          WITH base AS (
            SELECT doc_id,
                   CAST(CAST(concat('0x', substr(sha256(
                        CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                        % {PACK_SHARDS} AS INT) AS shard,
                   (CASE WHEN trim(text) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                    END)::BIGINT AS n_tokens
            FROM documents
          ), run AS (
            SELECT doc_id, shard, n_tokens,
                   sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                       ROWS UNBOUNDED PRECEDING)
                     AS end_tok
            FROM base WHERE n_tokens > 0)
          SELECT doc_id, shard, n_tokens,
                 (end_tok - n_tokens)::BIGINT AS start_tok,
                 CAST(floor((end_tok - n_tokens) / {SEQ_LEN}.0)
                      AS BIGINT) AS first_seq,
                 CAST(floor((end_tok - 1) / {SEQ_LEN}.0)
                      AS BIGINT) AS last_seq,
                 (floor((end_tok - n_tokens) / {SEQ_LEN}.0)
                  <> floor((end_tok - 1) / {SEQ_LEN}.0))::INT
                   AS crosses_boundary
          FROM run
        """,
        # full mirror of q_c4_line_filters: same synthesized line
        # structure (8-word chunks, closed-form punctuation/boilerplate
        # injections from doc_id) and the same line/page gates
        # per-line unnest with positions, first occurrence by min(pos),
        # ordered string_agg rebuild — must equal array_distinct's
        # keep-first-in-order contract exactly, clean_text included
        "line_dedup_within_doc": """
          WITH l AS (
            SELECT doc_id,
                   unnest(string_split(text, chr(10))) AS line,
                   generate_subscripts(string_split(text, chr(10)), 1)
                     AS pos
            FROM documents
          ), firsts AS (
            SELECT doc_id, line, min(pos) AS p FROM l GROUP BY 1, 2
          ), agg AS (
            SELECT doc_id, count(*) AS n_kept_lines,
                   string_agg(line, chr(10) ORDER BY p) AS clean_text
            FROM firsts GROUP BY 1
          ), tot AS (
            SELECT doc_id,
                   len(string_split(text, chr(10)))::BIGINT AS n_lines
            FROM documents)
          SELECT t.doc_id, t.n_lines,
                 a.n_kept_lines::BIGINT AS n_kept_lines, a.clean_text
          FROM tot t JOIN agg a USING (doc_id)
        """,
        # exact multiplicity over the doubled corpus; weight rounding
        # matches Spark's HALF_UP on positives
        "softdedup_weights": f"""
          WITH u AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + {SHIFT}, text FROM documents
          ), c AS (SELECT text, count(*) AS k FROM u GROUP BY 1)
          SELECT u.doc_id, c.k::BIGINT AS dup_count,
                 round(1.0 / c.k, 6) AS weight
          FROM u JOIN c USING (text)
        """,
        "c4_line_filters": r"""
          WITH words AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(text), '\s+') AS ws
            FROM documents WHERE trim(text) <> ''
          ), lidx AS (
            SELECT doc_id, ws,
                   unnest(range(0, cast(ceil(len(ws)/8.0) AS INT))) AS i
            FROM words
          ), lraw AS (
            SELECT doc_id, i,
                   array_to_string(ws[i*8+1 : i*8+8], ' ')
                   || CASE WHEN (doc_id+i) % 13 = 5
                           THEN ' javascript' ELSE '' END
                   || CASE WHEN (doc_id+i) % 7 = 0
                           THEN '' ELSE '.' END AS line
            FROM lidx
          ), pages AS (
            SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS body
            FROM lraw GROUP BY 1
          ), synth AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 40 = 3
                        THEN body || chr(10) || 'lorem ipsum dolor sit.'
                        WHEN doc_id % 50 = 11
                        THEN body || chr(10) || 'var x = { y: 1 }.'
                        ELSE body END AS text
            FROM pages
          ), flt AS (
            SELECT doc_id,
                   list_filter(string_split(text, chr(10)),
                               l -> trim(l) <> '') AS lns
            FROM synth
            WHERE NOT contains(lower(text), 'lorem ipsum')
              AND NOT contains(text, '{')
          ), k AS (
            SELECT doc_id, lns,
              list_filter(lns, l ->
                (ends_with(trim(l), '.') OR ends_with(trim(l), '!')
                 OR ends_with(trim(l), '?') OR ends_with(trim(l), '."')
                 OR ends_with(trim(l), '!"') OR ends_with(trim(l), '?"'))
                AND len(regexp_split_to_array(trim(l), '\s+')) >= 3
                AND NOT contains(lower(trim(l)), 'javascript')
                AND NOT contains(lower(trim(l)), 'lorem ipsum')
                AND NOT contains(lower(trim(l)), 'cookie policy')
                AND NOT contains(lower(trim(l)), 'privacy policy')
                AND NOT contains(lower(trim(l)), 'terms of use')
                AND NOT contains(lower(trim(l)), 'uses cookies')
              ) AS kept
            FROM flt)
          SELECT doc_id, len(lns)::BIGINT AS n_lines,
                 len(kept)::BIGINT AS n_kept_lines,
                 array_to_string(list_transform(kept, l -> trim(l)),
                                 chr(10)) AS clean_text
          FROM k WHERE len(kept) >= 2
        """,
        # full mirror of q_lm_perplexity: identical tokenization,
        # sha256-prefix buckets (the dsir_select idiom), (u,b)-keyed
        # add-one bigram model fit on lang='fr', integer micro-nat NLL
        # so per-doc sums are order-independent, floor-division mean
        "lm_perplexity": f"""
          WITH split AS (
            SELECT doc_id, lang,
                   CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(text), '\\s+')
                   END AS t
            FROM documents),
          gidx AS (
            SELECT doc_id, lang, t, unnest(range(1, len(t))) AS i
            FROM split WHERE len(t) >= 2),
          bg AS (
            SELECT doc_id, lang,
                   CAST(concat('0x', substr(sha256(t[i]), 1, 8))
                        AS BIGINT) % {LM_BUCKETS} AS u,
                   CAST(concat('0x', substr(sha256(t[i] || ' ' ||
                                                   t[i+1]), 1, 8))
                        AS BIGINT) % {LM_BUCKETS} AS b
            FROM gidx),
          uni AS (SELECT u, count(*) AS n_u FROM bg
                  WHERE lang = 'fr' GROUP BY 1),
          bi AS (SELECT u, b, count(*) AS n_b FROM bg
                 WHERE lang = 'fr' GROUP BY 1, 2),
          sc AS (
            SELECT g.doc_id,
                   CAST(round(1e6 * (
                     ln(coalesce(n_u, 0) + {LM_BUCKETS}.0)
                     - ln(coalesce(n_b, 0) + 1.0))) AS BIGINT) AS nll
            FROM bg g
            LEFT JOIN bi ON g.u = bi.u AND g.b = bi.b
            LEFT JOIN uni ON g.u = uni.u),
          agg AS (
            SELECT doc_id, count(*)::BIGINT AS n_bigrams,
                   sum(nll)::BIGINT AS nll_micro
            FROM sc GROUP BY 1)
          SELECT doc_id, n_bigrams, nll_micro,
                 (nll_micro // n_bigrams)::BIGINT AS mean_nll_micro
          FROM agg
        """,
        # per-doc-distinct word n-grams; Spark joins by xxhash64 with a
        # string-equality collision guard, so semantics are exactly the
        # string join below.
        "eval_contamination": _NGRAMS.format(n=CONTAM_N) + f"""
          , eg AS (SELECT doc_id, gram FROM grams
                   WHERE doc_id % {EVAL_MOD} = 7),
          tg AS (SELECT DISTINCT gram FROM grams
                 WHERE doc_id % {EVAL_MOD} <> 7),
          hits AS (
            SELECT e.doc_id, count(*)::BIGINT AS n_grams,
                   sum((t.gram IS NOT NULL)::INT)::BIGINT AS n_hit
            FROM eg e LEFT JOIN tg t USING (gram) GROUP BY 1)
          SELECT d.doc_id,
                 coalesce(n_grams, 0)::BIGINT AS n_grams,
                 coalesce(n_hit, 0)::BIGINT AS n_hit,
                 CASE WHEN coalesce(n_grams, 0) = 0 THEN 0.0
                      ELSE round(n_hit * 1.0 / n_grams, 6)
                 END AS contamination_frac
          FROM (SELECT DISTINCT doc_id FROM documents
                WHERE doc_id % {EVAL_MOD} = 7) d
          LEFT JOIN hits USING (doc_id)
        """,
        # Spark aggregates on sha2(gram) — identical up to the same
        # negligible collision mass as the paragraph oracles.
        "ngram_dup_census": _NGRAMS.format(n=CENSUS_N) + """
          , gd AS (SELECT gram, count(*)::BIGINT AS n_docs
                   FROM grams GROUP BY 1)
          SELECT n_docs, count(*)::BIGINT AS n_grams
          FROM gd WHERE n_docs >= 2 GROUP BY 1
        """,
        # mirrors operators/curation.py::curation_funnel stage by stage
        # (constants inlined: eval doc_id%50=7, min_tokens 20, Gopher
        # w=2 dup-frac ≤ 0.07, contamination 6-grams, paragraph w=3)
        "curation_funnel": r"""
          WITH train AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 7
          ), ev AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 50 = 7
          ), long_enough AS (
            SELECT doc_id, text FROM train
            WHERE (CASE WHEN trim(text) = '' THEN 0
                   ELSE len(regexp_split_to_array(trim(text), '\s+'))
                   END) >= 20
          ), gw AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(text), '\s+') AS ws
            FROM long_enough
          ), gidx AS (
            SELECT doc_id, ws,
                   unnest(range(0, cast(ceil(len(ws)/2.0) AS INT))) AS i
            FROM gw
          ), gparas AS (
            SELECT doc_id, i AS para_idx,
                   array_to_string(ws[i*2+1 : i*2+2], ' ') AS para
            FROM gidx
          ), gflag AS (
            SELECT doc_id, length(para) AS n_chars,
                   row_number() OVER (PARTITION BY doc_id, para
                                      ORDER BY para_idx) AS occ
            FROM gparas
          ), dupf AS (
            SELECT doc_id, sum(CASE WHEN occ > 1 THEN n_chars ELSE 0 END)
                           * 1.0 / sum(n_chars) AS f
            FROM gflag GROUP BY 1
          ), quality AS (
            SELECT le.doc_id, le.text
            FROM long_enough le JOIN dupf USING (doc_id)
            WHERE dupf.f <= 0.07
          ), egrams AS (
            SELECT DISTINCT unnest(
              CASE WHEN len(t) < 6 THEN []::VARCHAR[]
                   ELSE [array_to_string(t[i:i+5], ' ')
                         for i in range(1, len(t)-4)] END) AS g
            FROM (SELECT CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                         ELSE regexp_split_to_array(trim(text), '\s+')
                         END AS t FROM ev)
          ), tgrams AS (
            SELECT doc_id, unnest(
              CASE WHEN len(t) < 6 THEN []::VARCHAR[]
                   ELSE [array_to_string(t[i:i+5], ' ')
                         for i in range(1, len(t)-4)] END) AS g
            FROM (SELECT doc_id,
                         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                         ELSE regexp_split_to_array(trim(text), '\s+')
                         END AS t FROM quality)
          ), dirty AS (
            SELECT DISTINCT doc_id FROM tgrams JOIN egrams USING (g)
          ), decon AS (
            SELECT q.doc_id, q.text FROM quality q
            ANTI JOIN dirty d ON q.doc_id = d.doc_id
          ), dwords AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
            FROM decon WHERE trim(text) <> ''
          ), didx AS (
            SELECT doc_id, ws,
                   unnest(range(0, cast(ceil(len(ws)/3.0) AS INT))) AS i
            FROM dwords
          ), dparas AS (
            SELECT doc_id, i AS para_idx,
                   array_to_string(ws[i*3+1 : i*3+3], ' ') AS para
            FROM didx
          ), kept AS (
            SELECT doc_id, para_idx, para FROM dparas
            QUALIFY row_number() OVER (PARTITION BY para
                                       ORDER BY doc_id, para_idx) = 1
          ), dedup AS (
            SELECT doc_id, string_agg(para, ' ' ORDER BY para_idx)
                   AS clean_text
            FROM kept GROUP BY 1
          )
          SELECT 0::BIGINT AS stage_idx, 'raw' AS stage,
                 count(*)::BIGINT AS n_docs,
                 coalesce(sum(length(text)), 0)::BIGINT AS n_chars
          FROM train
          UNION ALL SELECT 1, 'quality', count(*),
                           coalesce(sum(length(text)), 0) FROM quality
          UNION ALL SELECT 2, 'decontaminated', count(*),
                           coalesce(sum(length(text)), 0) FROM decon
          UNION ALL SELECT 3, 'para_deduped', count(*),
                           coalesce(sum(length(clean_text)), 0) FROM dedup
        """,
        # full mirror of q_curation_funnel_full: the 4-stage funnel
        # with the Gopher Table A1 gate and the CCNet LM-perplexity
        # gate composed between quality and decontamination — the
        # gopher rules and LM arithmetic are the same fragments the
        # standalone gopher_quality_filter / lm_perplexity oracles use
        "curation_funnel_full": f"""
          WITH train AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 7
          ), ev AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 50 = 7
          ), long_enough AS (
            SELECT doc_id, text FROM train
            WHERE (CASE WHEN trim(text) = '' THEN 0
                   ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                   END) >= 20
          ), gw AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(text), '\\s+') AS ws
            FROM long_enough
          ), gidx AS (
            SELECT doc_id, ws,
                   unnest(range(0, cast(ceil(len(ws)/2.0) AS INT))) AS i
            FROM gw
          ), gparas AS (
            SELECT doc_id, i AS para_idx,
                   array_to_string(ws[i*2+1 : i*2+2], ' ') AS para
            FROM gidx
          ), gflag AS (
            SELECT doc_id, length(para) AS n_chars,
                   row_number() OVER (PARTITION BY doc_id, para
                                      ORDER BY para_idx) AS occ
            FROM gparas
          ), dupf AS (
            SELECT doc_id, sum(CASE WHEN occ > 1 THEN n_chars ELSE 0 END)
                           * 1.0 / sum(n_chars) AS f
            FROM gflag GROUP BY 1
          ), quality AS (
            SELECT le.doc_id, le.text
            FROM long_enough le JOIN dupf USING (doc_id)
            WHERE dupf.f <= 0.07
          ), qsig AS (
            SELECT doc_id, text,
                   CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(text), '\\s+')
                   END AS t,
                   list_filter(string_split(text, chr(10)),
                               l -> trim(l) <> '') AS lns
            FROM quality
          ), gopher AS (
            SELECT doc_id, text FROM qsig
            WHERE len(t) BETWEEN {GOPHER_MIN_WORDS} AND 100000
              AND round(CASE WHEN len(t) = 0 THEN 0.0
                    ELSE length(array_to_string(t, '')) * 1.0 / len(t)
                    END, 6) BETWEEN 3.0 AND 10.0
              AND round(CASE WHEN len(t) = 0 THEN 0.0 ELSE (
                    (length(text) - length(replace(text, '#', '')))
                    + (length(text) - length(replace(text, '…', '')))
                    + (length(replace(text, '…', ''))
                       - length(replace(replace(text, '…', ''),
                                        '...', ''))) / 3.0
                  ) * 1.0 / len(t) END, 6) <= 0.1
              AND round(CASE WHEN len(lns) = 0 THEN 0.0
                    ELSE len(list_filter(lns, l ->
                           starts_with(ltrim(l), '•')
                           OR starts_with(ltrim(l), '- ')))
                         * 1.0 / len(lns) END, 6) <= 0.9
              AND round(CASE WHEN len(lns) = 0 THEN 0.0
                    ELSE len(list_filter(lns, l ->
                           ends_with(rtrim(l), '…')
                           OR ends_with(rtrim(l), '...')))
                         * 1.0 / len(lns) END, 6) <= 0.3
              AND round(CASE WHEN len(t) = 0 THEN 0.0
                    ELSE len(list_filter(t, w ->
                           regexp_matches(w, '[A-Za-z]')))
                         * 1.0 / len(t) END, 6) >= 0.8
              AND len(list_intersect(
                    list_distinct(list_transform(t, w -> lower(w))),
                    ['the','be','to','of','and','that','have','with']
                  )) >= {GOPHER_MIN_STOPWORD_HITS}
          ), lmtsplit AS (
            SELECT CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(text), '\\s+')
                   END AS t
            FROM documents WHERE lang = 'fr'
          ), lmtidx AS (
            SELECT t, unnest(range(1, len(t))) AS i
            FROM lmtsplit WHERE len(t) >= 2
          ), lmtbg AS (
            SELECT CAST(concat('0x', substr(sha256(t[i]), 1, 8))
                        AS BIGINT) % {LM_BUCKETS} AS u,
                   CAST(concat('0x', substr(sha256(t[i] || ' ' ||
                                                   t[i+1]), 1, 8))
                        AS BIGINT) % {LM_BUCKETS} AS b
            FROM lmtidx
          ), lmuni AS (SELECT u, count(*) AS n_u FROM lmtbg GROUP BY 1
          ), lmbi AS (SELECT u, b, count(*) AS n_b FROM lmtbg
                      GROUP BY 1, 2
          ), lmdsplit AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(text), '\\s+') AS t
            FROM gopher
          ), lmdidx AS (
            SELECT doc_id, t, unnest(range(1, len(t))) AS i
            FROM lmdsplit WHERE len(t) >= 2
          ), lmdbg AS (
            SELECT doc_id,
                   CAST(concat('0x', substr(sha256(t[i]), 1, 8))
                        AS BIGINT) % {LM_BUCKETS} AS u,
                   CAST(concat('0x', substr(sha256(t[i] || ' ' ||
                                                   t[i+1]), 1, 8))
                        AS BIGINT) % {LM_BUCKETS} AS b
            FROM lmdidx
          ), lmsc AS (
            SELECT g.doc_id,
                   CAST(round(1e6 * (
                     ln(coalesce(n_u, 0) + {LM_BUCKETS}.0)
                     - ln(coalesce(n_b, 0) + 1.0))) AS BIGINT) AS nll
            FROM lmdbg g
            LEFT JOIN lmbi ON g.u = lmbi.u AND g.b = lmbi.b
            LEFT JOIN lmuni ON g.u = lmuni.u
          ), lmkeep AS (
            SELECT doc_id FROM (
              SELECT doc_id, sum(nll) AS s, count(*) AS n
              FROM lmsc GROUP BY 1)
            WHERE s // n <= {LM_MAX_MEAN_NLL}
          ), lmf AS (
            SELECT g.doc_id, g.text FROM gopher g
            JOIN lmkeep USING (doc_id)
          ), egrams AS (
            SELECT DISTINCT unnest(
              CASE WHEN len(t) < 6 THEN []::VARCHAR[]
                   ELSE [array_to_string(t[i:i+5], ' ')
                         for i in range(1, len(t)-4)] END) AS g
            FROM (SELECT CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                         ELSE regexp_split_to_array(trim(text), '\\s+')
                         END AS t FROM ev)
          ), tgrams AS (
            SELECT doc_id, unnest(
              CASE WHEN len(t) < 6 THEN []::VARCHAR[]
                   ELSE [array_to_string(t[i:i+5], ' ')
                         for i in range(1, len(t)-4)] END) AS g
            FROM (SELECT doc_id,
                         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                         ELSE regexp_split_to_array(trim(text), '\\s+')
                         END AS t FROM lmf)
          ), dirty AS (
            SELECT DISTINCT doc_id FROM tgrams JOIN egrams USING (g)
          ), decon AS (
            SELECT q.doc_id, q.text FROM lmf q
            ANTI JOIN dirty d ON q.doc_id = d.doc_id
          ), dwords AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
            FROM decon WHERE trim(text) <> ''
          ), didx AS (
            SELECT doc_id, ws,
                   unnest(range(0, cast(ceil(len(ws)/3.0) AS INT))) AS i
            FROM dwords
          ), dparas AS (
            SELECT doc_id, i AS para_idx,
                   array_to_string(ws[i*3+1 : i*3+3], ' ') AS para
            FROM didx
          ), kept AS (
            SELECT doc_id, para_idx, para FROM dparas
            QUALIFY row_number() OVER (PARTITION BY para
                                       ORDER BY doc_id, para_idx) = 1
          ), dedup AS (
            SELECT doc_id, string_agg(para, ' ' ORDER BY para_idx)
                   AS clean_text
            FROM kept GROUP BY 1
          )
          SELECT 0::BIGINT AS stage_idx, 'raw' AS stage,
                 count(*)::BIGINT AS n_docs,
                 coalesce(sum(length(text)), 0)::BIGINT AS n_chars
          FROM train
          UNION ALL SELECT 1, 'quality', count(*),
                           coalesce(sum(length(text)), 0) FROM quality
          UNION ALL SELECT 2, 'gopher_rules', count(*),
                           coalesce(sum(length(text)), 0) FROM gopher
          UNION ALL SELECT 3, 'lm_filter', count(*),
                           coalesce(sum(length(text)), 0) FROM lmf
          UNION ALL SELECT 4, 'decontaminated', count(*),
                           coalesce(sum(length(text)), 0) FROM decon
          UNION ALL SELECT 5, 'para_deduped', count(*),
                           coalesce(sum(length(clean_text)), 0) FROM dedup
        """,
        # Spark keys anchor grams by the (xxhash64, salted-xxhash64)
        # 128-bit pair; the oracle joins gram STRINGS — identical up to
        # the same negligible collision mass as the sha2 paragraph
        # oracles (module docstring, operators/exact_substr.py).
        "exact_substr_spans": f"""
          WITH pos AS (
            SELECT doc_id, text,
                   unnest(range(1, length(text) - {EXSUB_L} + 2)) AS p
            FROM documents WHERE length(text) >= {EXSUB_L}
          ), grams AS (
            SELECT doc_id, p, substr(text, p::INT, {EXSUB_L}) AS g FROM pos
          ), dupg AS (
            SELECT g FROM grams GROUP BY g HAVING count(*) >= 2
          ), flagged AS (
            SELECT doc_id, p FROM grams JOIN dupg USING (g)
          ), isl AS (
            SELECT doc_id, p,
                   p - row_number() OVER (PARTITION BY doc_id ORDER BY p)
                   AS i
            FROM flagged
          )
          SELECT doc_id, min(p)::BIGINT AS span_start,
                 (max(p) - min(p) + {EXSUB_L})::BIGINT AS span_len
          FROM isl GROUP BY doc_id, i
        """,
        "exact_substr_apply": f"""
          WITH pos AS (
            SELECT doc_id, text,
                   unnest(range(1, length(text) - {EXSUB_L} + 2)) AS p
            FROM documents WHERE length(text) >= {EXSUB_L}
          ), grams AS (
            SELECT doc_id, p, substr(text, p::INT, {EXSUB_L}) AS g FROM pos
          ), ranked AS (
            SELECT doc_id, p,
                   row_number() OVER (PARTITION BY g ORDER BY doc_id, p)
                   AS occ
            FROM grams
          ), flagged AS (
            SELECT doc_id, p FROM ranked WHERE occ >= 2
          ), isl AS (
            SELECT doc_id, p,
                   p - row_number() OVER (PARTITION BY doc_id ORDER BY p)
                   AS i
            FROM flagged
          ), spans AS (
            SELECT doc_id, min(p) AS s, max(p) + {EXSUB_L} - 1 AS e
            FROM isl GROUP BY doc_id, i
          ), segs AS (
            SELECT doc_id, coalesce(lag(e) OVER w + 1, 1) AS ks, s - 1 AS ke
            FROM spans WINDOW w AS (PARTITION BY doc_id ORDER BY s)
            UNION ALL
            SELECT sp.doc_id, max(sp.e) + 1, max(length(d.text))
            FROM spans sp JOIN documents d USING (doc_id)
            GROUP BY sp.doc_id
          ), rebuilt AS (
            SELECT s.doc_id,
                   string_agg(CASE WHEN ke >= ks
                              THEN substr(d.text, ks::INT, (ke - ks + 1)::INT)
                              ELSE '' END, '' ORDER BY ks) AS clean_text
            FROM segs s JOIN documents d USING (doc_id) GROUP BY s.doc_id
          )
          SELECT d.doc_id, coalesce(r.clean_text, d.text) AS clean_text
          FROM documents d LEFT JOIN rebuilt r USING (doc_id)
        """,
        "host_corpus_stats": f"""
          WITH p AS (
            SELECT printf('host%02d.example', {_HOST_IDX}::INT) AS host,
                   length(text) AS len
            FROM documents
          ), a AS (
            SELECT host, count(*)::BIGINT AS n_docs,
                   sum(len)::BIGINT AS n_chars
            FROM p GROUP BY host)
          SELECT host, n_docs, n_chars,
                 row_number() OVER (ORDER BY n_docs DESC, host)::BIGINT
                   AS n_docs_rank
          FROM a
        """,
        "host_cap_apply": f"""
          WITH p AS (
            SELECT doc_id,
                   printf('host%02d.example', {_HOST_IDX}::INT) AS host,
                   printf('https://host%02d.example/%08d',
                          {_HOST_IDX}::INT, doc_id) AS url
            FROM documents)
          SELECT doc_id, url FROM (
            SELECT doc_id, url, row_number() OVER (
                     PARTITION BY host ORDER BY url) AS r
            FROM p)
          WHERE r <= 3
        """,
        # single source of truth: the regex constants below are the
        # module's own (functions/pii.py), concatenated in — DuckDB's
        # RE2 and Spark's Java regex agree on this dialect subset
        "pii_scrub": ("""
          WITH p AS (
            SELECT doc_id,
                   substr(text, 1, 40) || ' reach user'
                     || doc_id::VARCHAR || '@mail.example or 10.'
                     || (doc_id % 200)::VARCHAR || '.0.7'
                     || (CASE WHEN doc_id % 3 = 0
                         THEN ' tel 555-012-3456' ELSE '' END) AS t
            FROM documents
          ), c AS (
            SELECT doc_id, t,
                   len(regexp_extract_all(t, '""" + _PII_EMAIL + """'))::BIGINT
                     AS n_emails,
                   len(regexp_extract_all(t, '""" + _PII_IPV4 + """'))::BIGINT
                     AS n_ipv4s,
                   len(regexp_extract_all(t, '""" + _PII_PHONE + """'))::BIGINT
                     AS n_phones
            FROM p)
          SELECT doc_id, n_emails, n_ipv4s, n_phones,
                 (n_emails + n_ipv4s + n_phones)::BIGINT AS n_pii,
                 regexp_replace(regexp_replace(regexp_replace(t,
                   '""" + _PII_EMAIL + """', '<EMAIL>', 'g'),
                   '""" + _PII_IPV4 + """', '<IP>', 'g'),
                   '""" + _PII_PHONE + """', '<PHONE>', 'g')
                   AS redacted_text
          FROM c
        """),
        "bloom_recrawl_probe": """
          SELECT doc_id, (doc_id % 3 <> 0) AS is_recrawl
          FROM documents WHERE doc_id % 2 = 0
        """,
        # n_docs/n_pos corpus-derived; the confusion quadrant is the
        # pinned empirical property of the seeded config (see
        # q_quality_classifier docstring for the exact tuple) — an
        # exact-side regression moves n_pos, a trainer regression
        # moves tp/fp/fn/tn off the pins
        "quality_classifier": """
          SELECT count(*)::BIGINT AS n_docs,
                 sum(CASE WHEN n_chars > 300 THEN 1 ELSE 0 END)::BIGINT
                   AS n_pos,
                 255::BIGINT AS tp, 7::BIGINT AS fp,
                 0::BIGINT AS fn, 238::BIGINT AS tn
          FROM documents
        """,
    }
