"""Video frame-hash near-dup (operators/videohash.py): container walk
→ decode → hash fusion, set-Jaccard pairing, df-cut, and junk-frame
tolerance on hand-built AVIs with PPM frames."""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import functions as F

from duplicate_finder_spark.operators.imagehash import ahash64
from duplicate_finder_spark.operators.multimodal import encode_ppm
from duplicate_finder_spark.operators.videohash import (
    video_frame_hashes, video_neardup_pairs)


def _frame(seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)


def _avi(frames: list[bytes]) -> bytes:
    chunks = b"".join(
        b"00dc" + struct.pack("<I", len(p)) + p + (b"\0" * (len(p) & 1))
        for p in frames)
    movi = b"LIST" + struct.pack("<I", 4 + len(chunks)) + b"movi" + chunks
    return b"RIFF" + struct.pack("<I", 4 + len(movi)) + b"AVI " + movi


def test_frame_hashes_roundtrip_and_junk_tolerance(spark):
    imgs = [_frame(1), _frame(2), _frame(3)]
    frames = [encode_ppm(i) for i in imgs]
    rows = [(1, bytearray(_avi(frames))),
            (2, bytearray(_avi([frames[0], b"junkframe", frames[2]]))),
            (3, bytearray(b"not an avi"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {(r.doc_id, r.frame_no): r.ahash
           for r in video_frame_hashes(df).collect()}
    assert got[(1, 0)] == ahash64(imgs[0])
    assert got[(1, 1)] == ahash64(imgs[1])
    assert got[(1, 2)] == ahash64(imgs[2])
    # junk middle frame skipped, neighbours kept with true frame_no
    assert sorted(k for k in got if k[0] == 2) == [(2, 0), (2, 2)]
    assert not any(k[0] == 3 for k in got)


def test_jaccard_pairs_and_threshold(spark):
    a, b, c, d = (encode_ppm(_frame(s)) for s in (11, 12, 13, 14))
    rows = [(1, bytearray(_avi([a, b, c]))),
            (2, bytearray(_avi([a, b, c]))),      # clone → 1.0
            (3, bytearray(_avi([a, b, d]))),      # 2/4 = 0.5 with 1,2
            (4, bytearray(_avi([d, d, d])))]      # 1 distinct hash
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashes = video_frame_hashes(df)
    got = {(r.doc_id_a, r.doc_id_b): (r.n_shared, r.jaccard)
           for r in video_neardup_pairs(hashes,
                                        min_jaccard=0.5).collect()}
    assert got[(1, 2)] == (3, 1.0)
    assert got[(1, 3)] == (2, 0.5) and got[(2, 3)] == (2, 0.5)
    # (3,4) share d: jaccard 1/(3+1-1)=0.333 < 0.5 → excluded
    assert (3, 4) not in got


def test_df_cut_drops_ubiquitous_frame(spark):
    a, b = (encode_ppm(_frame(s)) for s in (21, 22))
    intro = encode_ppm(_frame(99))               # shared "title card"
    rows = [(i, bytearray(_avi([intro, a if i <= 3 else b])))
            for i in range(1, 6)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashes = video_frame_hashes(df)
    # cross-group pairs share only the intro: j = 1/(2+2-1) = 1/3;
    # same-group pairs share both frames: j = 1.0 — at τ=0.3 all 5C2
    # pairs link through the title card
    loose = video_neardup_pairs(hashes, min_jaccard=0.3,
                                max_hash_df=100)
    # with the cut, the intro hash (df=5 > 4) is excluded from shared
    # counts: cross-group pairs share nothing, same-group pairs keep
    # only their second frame (j = 1/3 ≥ 0.3)
    tight = video_neardup_pairs(hashes, min_jaccard=0.3,
                                max_hash_df=4)
    n_loose = loose.count()
    got = {(r.doc_id_a, r.doc_id_b) for r in tight.collect()}
    assert n_loose == 10                         # all 5C2 pairs linked
    assert got == {(1, 2), (1, 3), (2, 3), (4, 5)}
