"""WebP lossless codec (operators/webpcodec.py): exact round-trips
through every decoder branch (literal / LZ77 / color cache / all four
transforms incl. palette bundling), hand-crafted streams for the two
paths the scripted writer never emits (meta-prefix code groups and
close-neighborhood distance codes), garbage/truncation robustness, the
``decode_image`` dispatch, and cross-format hash invariance (the same
pixels as PNG and lossless WebP must produce the same aHash — the
property that makes the codec a dedup signal)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from duplicate_finder_spark.operators import webpcodec as W
from duplicate_finder_spark.operators.imagehash import ahash64
from duplicate_finder_spark.operators.multimodal import (decode_image,
                                                         encode_png)
from duplicate_finder_spark.operators.webpcodec import (decode_webp,
                                                        encode_webp)


def _rand_img(seed: int, h: int, w: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8)


# --- exact round-trips ------------------------------------------------------

@given(seed=st.integers(0, 10_000), h=st.integers(1, 17),
       w=st.integers(1, 17))
@settings(max_examples=40, deadline=None)
def test_literal_roundtrip_exact(seed, h, w):
    img = _rand_img(seed, h, w)
    out = decode_webp(encode_webp(img))
    assert out is not None and (out == img).all()


@given(seed=st.integers(0, 10_000), h=st.integers(1, 12),
       w=st.integers(1, 12), cache=st.integers(0, 8),
       lz=st.booleans(), sg=st.booleans())
@settings(max_examples=30, deadline=None)
def test_option_matrix_roundtrip_exact(seed, h, w, cache, lz, sg):
    img = _rand_img(seed, h, w)
    b = encode_webp(img, use_lz77=lz, cache_bits=cache, subtract_green=sg)
    out = decode_webp(b)
    assert out is not None and (out == img).all()


@pytest.mark.parametrize("mode", range(14))
def test_every_predictor_mode_roundtrips(mode):
    img = _rand_img(99, 11, 13)
    out = decode_webp(encode_webp(img, predictor=mode))
    assert out is not None and (out == img).all()


@given(g2r=st.integers(0, 255), g2b=st.integers(0, 255),
       r2b=st.integers(0, 255))
@settings(max_examples=25, deadline=None)
def test_cross_color_transform_roundtrips(g2r, g2b, r2b):
    img = _rand_img(5, 9, 9)
    out = decode_webp(encode_webp(img, color_transform=(g2r, g2b, r2b)))
    assert out is not None and (out == img).all()


def test_stacked_transforms_roundtrip():
    img = _rand_img(3, 16, 10)
    b = encode_webp(img, subtract_green=True, color_transform=(7, 130, 200),
                    predictor=11, use_lz77=True, cache_bits=5)
    out = decode_webp(b)
    assert out is not None and (out == img).all()


@pytest.mark.parametrize("n_colors", [2, 3, 4, 5, 16, 17, 200])
def test_palette_roundtrip_all_bundle_widths(n_colors):
    # n_colors spans every bundling width: 8, 4, 2, 1 pixels per byte
    rng = np.random.default_rng(n_colors)
    colors = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    # widths straddling bundle boundaries exercise the padding path
    for w in (1, 7, 8, 9):
        img = colors[rng.integers(0, n_colors, size=(6, w))]
        out = decode_webp(encode_webp(img, palette=True))
        assert out is not None and (out == img).all()


def test_lz77_runs_shrink_stream_and_roundtrip():
    img = np.zeros((32, 32, 3), dtype=np.uint8)
    img[:16] = 200
    b_lit, b_lz = encode_webp(img), encode_webp(img, use_lz77=True)
    assert len(b_lz) < len(b_lit) // 2        # copies actually emitted
    assert (decode_webp(b_lz) == img).all()


# --- crafted streams for writer-less decoder branches ----------------------

def _const_group(bw, argb: int):
    """5 constant prefix codes decoding to one fixed ARGB pixel."""
    W._write_code_def(bw, {(argb >> 8) & 0xFF: 1}, W._GREEN_BASE)
    W._write_code_def(bw, {(argb >> 16) & 0xFF: 1}, 256)
    W._write_code_def(bw, {argb & 0xFF: 1}, 256)
    W._write_code_def(bw, {argb >> 24: 1}, 256)
    W._write_code_def(bw, {0: 1}, 40)


def _wrap_vp8l(bits: bytes) -> bytes:
    import struct
    payload = b"\x2f" + bits
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def test_meta_prefix_groups_crafted_stream():
    # 8x1 image, meta tile width 4 → two code groups, each a constant
    # color: decoder must switch groups on the tile boundary
    bw = W._BitWriter()
    bw.write(7, 14)                    # w-1
    bw.write(0, 14)                    # h-1
    bw.write(0, 1)                     # alpha hint
    bw.write(0, 3)                     # version
    bw.write(0, 1)                     # no transforms
    bw.write(0, 1)                     # no color cache
    bw.write(1, 1)                     # meta prefix present
    bw.write(0, 3)                     # hbits = 2 → 4-px tiles
    # entropy image (2x1): green channel carries the group index
    W._emit_subimage(bw, np.array([0xFF000000, 0xFF000100],
                                  dtype=np.uint32))
    a = (255 << 24) | (10 << 16) | (20 << 8) | 30
    b = (255 << 24) | (40 << 16) | (50 << 8) | 60
    _const_group(bw, a)
    _const_group(bw, b)
    out = decode_webp(_wrap_vp8l(bw.flush()))
    assert out is not None
    exp = np.array([[[10, 20, 30]] * 4 + [[40, 50, 60]] * 4],
                   dtype=np.uint8)
    assert (out == exp).all()


def test_close_distance_code_crafted_stream():
    # 4x2 image: second row is a length-4 copy at plane code 1 →
    # neighborhood (dx=0, dy=1) → distance = row width
    bw = W._BitWriter()
    bw.write(3, 14)
    bw.write(1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)                     # no transforms
    bw.write(0, 1)                     # no cache
    bw.write(0, 1)                     # no meta
    greens = {20: 1, 21: 1, 22: 1, 23: 1, 256 + 3: 1}  # 4 lits + len-4
    g_codes = W._write_code_def(bw, greens, W._GREEN_BASE)
    r_codes = W._write_code_def(bw, {10: 1}, 256)
    b_codes = W._write_code_def(bw, {30: 1}, 256)
    a_codes = W._write_code_def(bw, {255: 1}, 256)
    d_codes = W._write_code_def(bw, {0: 1}, 40)   # plane code 1, 0 extra
    for g in (20, 21, 22, 23):
        bw.write_code(*g_codes[g])
        bw.write_code(*r_codes[10])
        bw.write_code(*b_codes[30])
        bw.write_code(*a_codes[255])
    bw.write_code(*g_codes[256 + 3])   # length prefix 3 → 4, no extra
    bw.write_code(*d_codes[0])         # distance prefix 0 → plane code 1
    out = decode_webp(_wrap_vp8l(bw.flush()))
    assert out is not None
    row = np.array([[10, g, 30] for g in (20, 21, 22, 23)],
                   dtype=np.uint8)
    assert (out == np.stack([row, row])).all()


def test_plane_to_dist_table_shape():
    # exact membership: the 120 slots of libwebp's 8x16 plane LUT —
    # dy=0 → dx 1..8; dy 1..7 → dx −7..8 — each exactly once, ordered
    # by (near-)increasing euclidean distance
    assert len(W._DIST_MAP) == 120
    assert len(set(W._DIST_MAP)) == 120
    expect = {(dx, 0) for dx in range(1, 9)} \
        | {(dx, dy) for dy in range(1, 8) for dx in range(-7, 9)}
    assert set(W._DIST_MAP) == expect
    d2 = [dx * dx + dy * dy for dx, dy in W._DIST_MAP]
    assert all(b >= a - 2 for a, b in zip(d2, d2[1:]))
    assert W._plane_to_dist(121, 77) == 1     # extended codes: dist+120
    assert W._plane_to_dist(1, 10) == 10      # (0,1) → one row up
    assert W._plane_to_dist(2, 10) == 1       # (1,0) → one pixel left


# --- robustness -------------------------------------------------------------

@given(tail=st.binary(min_size=0, max_size=80))
@settings(max_examples=60, deadline=None)
def test_garbage_after_magic_never_raises(tail):
    assert decode_webp(b"RIFF\x28\x00\x00\x00WEBPVP8L\x20\x00\x00\x00"
                       + tail) is None or True


def test_truncation_and_bitflips_never_raise():
    full = encode_webp(_rand_img(2, 10, 10), use_lz77=True, cache_bits=4)
    for cut in range(0, len(full), 3):
        decode_webp(full[:cut])
    for i in range(12, len(full), 2):
        fl = bytearray(full)
        fl[i] ^= 0x55
        decode_webp(bytes(fl))


def test_real_lossy_webp_routes_to_stub_when_present():
    """Independent-encoder interop for the CONTAINER walk: the one real
    .webp on this host is a VP8X-extended LOSSY file (ALPH + VP8
    chunks) — the decoder must walk it cleanly and return None (the
    stub path), never raise. Skipped gracefully elsewhere. No VP8L
    lossless file ships with this container, so lossless interop is
    evidenced by round-trip + crafted streams instead."""
    import glob as _glob
    import os
    hits = [p for pat in
            ("/root/.pyenv/versions/*/lib/python*/test/test_email/data/"
             "python.webp",
             "/root/.pyenv/versions/*/lib/python*/test/imghdrdata/"
             "python.webp")
            for p in _glob.glob(pat) if os.path.exists(p)]
    if not hits:
        pytest.skip("no real .webp on this host")
    for p in hits:
        assert decode_webp(open(p, "rb").read()) is None


def test_lossy_vp8_and_foreign_riff_return_none():
    assert decode_webp(b"RIFF\x10\x00\x00\x00WEBPVP8 \x04\x00\x00\x00abcd") \
        is None
    assert decode_webp(b"RIFF\x10\x00\x00\x00WAVEfmt \x04\x00\x00\x00abcd") \
        is None
    assert decode_webp(b"") is None


def test_adversarial_dimensions_fenced():
    # 16383x16383 header with no pixel data must fail fast, not allocate
    bw = W._BitWriter()
    bw.write(16382, 14)
    bw.write(16382, 14)
    bw.write(0, 4)
    assert decode_webp(_wrap_vp8l(bw.flush())) is None


# --- integration ------------------------------------------------------------

def test_decode_image_dispatches_webp():
    img = _rand_img(11, 9, 9)
    out = decode_image(encode_webp(img, use_lz77=True))
    assert out is not None and (out == img).all()


def test_cross_format_ahash_invariance_png_webp():
    # identical pixels → identical aHash whether stored as PNG or WebP:
    # the property that clusters re-encoded duplicates together
    img = _rand_img(21, 24, 24)
    h_png = ahash64(decode_image(encode_png(img)))
    h_webp = ahash64(decode_image(encode_webp(img, subtract_green=True,
                                              use_lz77=True)))
    assert h_png == h_webp
