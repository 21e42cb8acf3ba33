"""Perceptual image hashing (operators/imagehash.py): closed-form
aHash bits, two's-complement packing, cross-format invariance (the
same pixels as PPM and PNG hash identically — the property that makes
it a dedup signal), decode-failure tolerance, and block-join parity
with brute force."""

from __future__ import annotations

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from duplicate_finder_spark.config import PipelineConfig
from duplicate_finder_spark.operators.imagehash import (
    ahash64, image_hashes, image_neardup_pairs)
from duplicate_finder_spark.operators.multimodal import (encode_png,
                                                         encode_ppm)


def _img(vals) -> np.ndarray:
    a = np.asarray(vals, dtype=np.uint8)
    return np.stack([a] * 3, axis=2)


def test_ahash_closed_form_half_dark():
    # left 4 columns 0, right 4 columns 200 → right bits set in every
    # row: each row contributes 0b00001111
    img = _img([[0] * 4 + [200] * 4 for _ in range(8)])
    h = ahash64(img)
    assert h == int("00001111" * 8, 2)


def test_ahash_top_left_bright_is_negative():
    vals = [[0] * 8 for _ in range(8)]
    vals[0][0] = 255
    h = ahash64(_img(vals))
    assert h < 0           # bit 63 set → two's complement negative
    # only the (0,0) bit clears the mean; all-zero cells tie at 0 and
    # the >= test sets them... a uniform zero image sets EVERY bit, so
    # check the exact value: total mean > 0 ⇒ zero cells are below it
    assert h == -(1 << 63)


def test_ahash_uniform_image_all_bits_set():
    # every cell mean == global mean, >= ties everywhere
    assert ahash64(_img([[7] * 8 for _ in range(8)])) == -1


def test_ahash_rejects_tiny_images():
    with pytest.raises(ValueError, match="smaller"):
        ahash64(_img([[0] * 4 for _ in range(4)]))


def test_cross_format_hash_identity_and_decode_tolerance(spark):
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
    rows = [(1, bytearray(encode_ppm(px))),
            (2, bytearray(encode_png(px))),     # same pixels, PNG
            (3, bytearray(b"not an image at all"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r.ahash for r in image_hashes(df).collect()}
    assert sorted(got) == [1, 2]                # corrupt row dropped
    assert got[1] == got[2] == ahash64(px)


def test_block_join_matches_brute_force(spark):
    rng = np.random.RandomState(11)
    imgs = {i: rng.randint(0, 256, size=(8, 8, 3)).astype(np.uint8)
            for i in range(40)}
    imgs[35] = imgs[3].copy()                   # exact clone
    hs = {i: ahash64(v) for i, v in imgs.items()}
    want = {(a, b, bin(hs[a] ^ hs[b]).count("1"))
            for a, b in itertools.combinations(sorted(hs), 2)
            if bin(hs[a] ^ hs[b]).count("1") <= 3}
    df = spark.createDataFrame(
        [(i, bytearray(encode_ppm(v))) for i, v in imgs.items()],
        "doc_id long, payload binary")
    out = image_neardup_pairs(image_hashes(df), PipelineConfig())
    got = {(r.doc_id_a, r.doc_id_b, r.hamming) for r in out.collect()}
    assert got == want
    assert (3, 35, 0) in got                    # the planted clone
