"""Property-based tests (hypothesis) over the engine's pure kernels —
no SparkSession needed, so these run fast and shrink well.

What they pin:
- lcs_len is EXACT vs a brute-force oracle for arbitrary unicode-ish
  strings (the rolling-hash + confirm path can never over- or
  under-report);
- parse_size/humanize keep the reference's semantics (parse·humanize
  sanity, case-insensitivity, unit table);
- shingle_hashes_np is deterministic, order-sensitive, and bounded;
- the exact-dedup grouping law: two texts land in the same cluster iff
  their bytes are equal (pure-python mirror of the Spark plan).
"""

from __future__ import annotations

import hashlib

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from duplicate_finder_spark.config import parse_size
from duplicate_finder_spark.operators.lcs import lcs_len
from duplicate_finder_spark.operators.minhash import shingle_hashes_np

# small alphabet → many repeats → adversarial for rolling-hash LCS
_texts = st.text(alphabet="ab π", max_size=40)


def _brute_lcs(a: str, b: str) -> int:
    best = 0
    for i in range(len(a)):
        for j in range(i + best + 1, len(a) + 1):
            if a[i:j] in b:
                best = j - i
    return best


@settings(max_examples=300, deadline=None)
@given(_texts, _texts)
def test_lcs_matches_bruteforce(a, b):
    assert lcs_len(a, b) == _brute_lcs(a, b)


# --- bottom-k sketch estimator (numpy mirror of operators/lsh.py) ----------
#
# The Spark verify stage works on int64 views of uint64 hashes with
# SIGNED ascending order (array_sort). This mirror reproduces that
# exactly: sketch = k smallest signed values; estimate =
# |bottomk(skA ∪ skB) ∩ skA ∩ skB| / k.

def _sketch(vals: np.ndarray, k: int) -> np.ndarray:
    return np.sort(vals.astype(np.int64))[:k]


def _estimate(a: np.ndarray, b: np.ndarray, k: int) -> float:
    ska, skb = _sketch(a, k), _sketch(b, k)
    union_bk = np.sort(np.union1d(ska, skb))[:k]
    inter = np.intersect1d(ska, skb)
    return len(np.intersect1d(union_bk, inter)) / float(k)


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=2**31), st.integers(4, 64),
       st.integers(0, 3))
def test_bottomk_membership_lemma(seed, k, case):
    """The estimator's correctness lemma: every element of A∩B that
    lands in bottom-k(A∪B) is present in BOTH bottom-k sketches (it is
    ≤ the k-th smallest of each set)."""
    rng = np.random.RandomState(seed % 2**31)
    n_a, n_b = (k * 3, k * 3) if case == 0 else \
               (k // 2 + 1, k * 4) if case == 1 else \
               (k * 2, k * 2) if case == 2 else (k + 1, k + 1)
    shared = rng.randint(-2**62, 2**62, size=max(n_a, n_b) // 2,
                         dtype=np.int64)
    a = np.union1d(shared, rng.randint(-2**62, 2**62, size=n_a,
                                       dtype=np.int64))
    b = np.union1d(shared, rng.randint(-2**62, 2**62, size=n_b,
                                       dtype=np.int64))
    ska, skb = _sketch(a, k), _sketch(b, k)
    union_bk = np.sort(np.union1d(a, b))[:k]
    true_inter = np.intersect1d(a, b)
    for e in np.intersect1d(union_bk, true_inter):
        assert e in ska and e in skb
    # and the engine's sketch-only union equals the true union's
    # bottom-k (every bottom-k(A∪B) element is in skA or skB)
    assert np.array_equal(np.sort(np.union1d(ska, skb))[:k], union_bk)


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=2**31),
       st.floats(min_value=0.05, max_value=0.95))
def test_bottomk_estimate_tracks_jaccard(seed, target_j):
    """With k=256, the estimate must land within 4σ (σ ≈ 1/√k) of the
    true Jaccard for random sets ~4k large — the bound the verify
    band's 3σ default relies on (deterministic given the seed)."""
    k = 256
    rng = np.random.RandomState(seed % 2**31)
    n_union = 4 * k
    union = rng.randint(-2**62, 2**62, size=n_union, dtype=np.int64)
    union = np.unique(union)
    # shuffle before splitting: np.unique sorts, and assigning the
    # SMALLEST values to the shared part would correlate membership
    # with hash rank — exactly the bias the estimator assumes away
    # (uniform hashes are independent of set membership)
    rng.shuffle(union)
    n_shared = int(len(union) * target_j)
    shared = union[:n_shared]
    rest = union[n_shared:]
    half = len(rest) // 2
    a = np.union1d(shared, rest[:half])
    b = np.union1d(shared, rest[half:])
    true_j = len(np.intersect1d(a, b)) / len(np.union1d(a, b))
    est = _estimate(a, b, k)
    assert abs(est - true_j) <= 4.0 / k ** 0.5, (true_j, est)


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=2**31), st.integers(8, 48))
def test_bottomk_exact_when_sets_fit(seed, k):
    """Sets with ≤ k elements: sketch == full set and the 'exact'
    formula (|skA∩skB| / (nA+nB−inter)) IS the true Jaccard."""
    rng = np.random.RandomState(seed % 2**31)
    a = np.unique(rng.randint(-2**62, 2**62, size=k, dtype=np.int64))
    b = np.unique(np.concatenate([
        a[: max(1, k // 3)],
        rng.randint(-2**62, 2**62, size=k // 2 + 1, dtype=np.int64)]))[:k]
    ska, skb = _sketch(a, k), _sketch(b, k)
    inter = len(np.intersect1d(ska, skb))
    j_formula = inter / (len(a) + len(b) - inter)
    true_j = len(np.intersect1d(a, b)) / len(np.union1d(a, b))
    assert j_formula == true_j


@settings(max_examples=200, deadline=None)
# bound keeps n·mult below 2^53: the reference parses via float
# (utils.py:19-59), so exactness above float precision is out of scope —
# parity means inheriting that, not fixing it
@given(st.integers(min_value=0, max_value=2**20),
       st.sampled_from(["B", "KB", "KIB", "MB", "MIB", "GB", "GIB"]))
def test_parse_size_units_table(n, unit):
    decimal = {"B": 1, "KB": 10**3, "MB": 10**6, "GB": 10**9}
    binary = {"KIB": 2**10, "MIB": 2**20, "GIB": 2**30}
    mult = decimal.get(unit) or binary[unit]
    assert parse_size(f"{n} {unit}") == n * mult
    # case-insensitive (reference utils.py:19-59)
    assert parse_size(f"{n} {unit.lower()}") == n * mult


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                max_size=30),
       st.integers(min_value=2, max_value=5))
def test_shingle_hashes_properties(tok_list, k):
    toks = np.asarray(tok_list, dtype=np.uint64)
    sh = shingle_hashes_np(toks, k)
    # deterministic
    assert np.array_equal(sh, shingle_hashes_np(toks, k))
    n = len(toks)
    if n == 0:
        assert len(sh) == 0
    elif n < k:
        assert len(sh) == 1  # whole-doc shingle
    else:
        # distinct hashes, bounded by window count
        assert 1 <= len(sh) <= n - k + 1
        assert len(np.unique(sh)) == len(sh)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                min_size=2, max_size=20),
       st.integers(min_value=2, max_value=4))
def test_shingles_order_sensitive(tok_list, k):
    toks = np.asarray(tok_list, dtype=np.uint64)
    rev = toks[::-1].copy()
    sh_fwd = set(shingle_hashes_np(toks, k).tolist())
    sh_rev = set(shingle_hashes_np(rev, k).tolist())
    if np.array_equal(toks, rev):
        assert sh_fwd == sh_rev
    # a palindrome-free distinct sequence must not hash symmetric
    elif len(set(tok_list)) == len(tok_list):
        assert sh_fwd != sh_rev


@settings(max_examples=150, deadline=None)
@given(st.lists(st.text(alphabet="xyz", max_size=6), max_size=25))
def test_exact_grouping_law(texts):
    """Mirror of the Spark exact stage: same sha256 ⟺ same bytes ⟺ same
    cluster; singleton hashes are not duplicates."""
    groups: dict[str, list[int]] = {}
    for i, t in enumerate(texts):
        groups.setdefault(
            hashlib.sha256(t.encode()).hexdigest(), []).append(i)
    for h, members in groups.items():
        vals = {texts[i] for i in members}
        assert len(vals) == 1  # same hash ⇒ same bytes (no collisions here)
    dup_idx = {i for m in groups.values() if len(m) > 1 for i in m}
    # duplicates ⟺ text occurs more than once
    for i, t in enumerate(texts):
        assert (i in dup_idx) == (texts.count(t) > 1)


# --- container-free media decode round-trips --------------------------------

@settings(max_examples=100, deadline=None)
@given(st.integers(1, 8), st.integers(1, 8), st.data())
def test_ppm_roundtrip_exact(w, h, data):
    """encode_ppm → decode_image is the identity on any uint8 image."""
    from duplicate_finder_spark.operators.multimodal import (decode_image,
                                                             encode_ppm)
    px = data.draw(st.lists(st.integers(0, 255), min_size=w * h * 3,
                            max_size=w * h * 3))
    img = np.array(px, dtype=np.uint8).reshape(h, w, 3)
    out = decode_image(encode_ppm(img))
    assert out is not None and (out == img).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=64),
       st.sampled_from([8000, 16000, 44100]))
def test_wav_roundtrip_exact(samples, rate):
    """A synthesized 16-bit mono PCM WAV decodes to the exact samples
    (scaled) at the exact rate."""
    import struct

    from duplicate_finder_spark.operators.multimodal import decode_wav
    pcm = struct.pack("<%dh" % len(samples), *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    wav = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(pcm)) + pcm)
    out, got_rate = decode_wav(wav)
    assert got_rate == rate
    assert np.allclose(out, np.array(samples) / 32768.0)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=200))
def test_decoders_never_raise_on_garbage(payload):
    """F6 posture: arbitrary bytes must decode to None or a valid value,
    never raise — a corrupt payload cannot fail the task."""
    from duplicate_finder_spark.operators.multimodal import (decode_image,
                                                             decode_wav)
    img = decode_image(payload)
    assert img is None or img.ndim == 3
    wav = decode_wav(payload)
    assert wav is None or (wav[0].ndim == 1 and wav[1] > 0)


@settings(max_examples=100, deadline=None)
@given(st.integers(1, 8), st.integers(1, 8), st.data())
def test_png_roundtrip_exact_all_filters(w, h, data):
    """encode_png → decode_image is the identity on any uint8 RGB image
    for ANY per-row filter choice — this drives every defilter branch
    (None/Sub/Up/Average/Paeth) of the real stdlib-zlib+numpy decoder."""
    from duplicate_finder_spark.operators.multimodal import (decode_image,
                                                             encode_png)
    px = data.draw(st.lists(st.integers(0, 255), min_size=w * h * 3,
                            max_size=w * h * 3))
    filters = data.draw(st.lists(st.integers(0, 4), min_size=1,
                                 max_size=h))
    img = np.array(px, dtype=np.uint8).reshape(h, w, 3)
    out = decode_image(encode_png(img, row_filters=filters))
    assert out is not None and (out == img).all()


def _author_png(w, h, color_type, pixels, plte=b""):
    """Hand-author a filter-0 PNG of any color type for decoder tests."""
    import struct
    import zlib

    from duplicate_finder_spark.operators.multimodal import (_PNG_CHANNELS,
                                                             _PNG_SIG,
                                                             _png_chunk)
    ch = _PNG_CHANNELS[color_type]
    raw = b"".join(b"\x00" + pixels[y * w * ch:(y + 1) * w * ch]
                   for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    body = _png_chunk(b"IHDR", ihdr)
    if plte:
        body += _png_chunk(b"PLTE", plte)
    return (_PNG_SIG + body + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b""))


def test_png_all_color_types_decode_to_rgb():
    """Gray / palette / gray+alpha / RGBA PNGs all decode to HxWx3 RGB
    with the documented conversions (gray replicated, alpha dropped,
    palette looked up)."""
    from duplicate_finder_spark.operators.multimodal import decode_image

    # type 0 (gray): value replicated across RGB
    out = decode_image(_author_png(2, 1, 0, bytes([7, 200])))
    assert (out == np.array([[[7] * 3, [200] * 3]])).all()
    # type 4 (gray+alpha): alpha dropped
    out = decode_image(_author_png(1, 2, 4, bytes([9, 255, 31, 0])))
    assert (out == np.array([[[9] * 3], [[31] * 3]])).all()
    # type 6 (RGBA): alpha dropped
    out = decode_image(_author_png(1, 1, 6, bytes([1, 2, 3, 77])))
    assert (out == np.array([[[1, 2, 3]]])).all()
    # type 3 (palette)
    plte = bytes([10, 20, 30, 40, 50, 60])
    out = decode_image(_author_png(2, 1, 3, bytes([1, 0]), plte))
    assert (out == np.array([[[40, 50, 60], [10, 20, 30]]])).all()
    # palette index past PLTE end → None, not a crash
    assert decode_image(_author_png(1, 1, 3, bytes([5]), plte)) is None


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 8), st.integers(1, 8), st.booleans(), st.data())
def test_gif_roundtrip_exact(w, h, interlace, data):
    """encode_gif → decode_image is the identity (≤256 distinct colors by
    construction), including the interlaced row order."""
    from duplicate_finder_spark.operators.multimodal import (decode_image,
                                                             encode_gif)
    px = data.draw(st.lists(st.integers(0, 255), min_size=w * h * 3,
                            max_size=w * h * 3))
    img = np.array(px, dtype=np.uint8).reshape(h, w, 3)
    out = decode_image(encode_gif(img, interlace=interlace))
    assert out is not None and (out == img).all()


@settings(max_examples=150, deadline=None)
@given(st.sampled_from([b"\x89PNG\r\n\x1a\n", b"GIF89a", b"GIF87a"]),
       st.binary(max_size=120))
def test_png_gif_garbage_after_magic_never_raises(magic, tail):
    """Payloads that LOOK like PNG/GIF but are corrupt must decode to
    None (or a valid image), never raise — same F6 posture as the other
    decoders."""
    from duplicate_finder_spark.operators.multimodal import decode_image
    img = decode_image(magic + tail)
    assert img is None or (img.ndim == 3 and img.shape[2] == 3)


def test_real_png_gif_interop_decode():
    """Independent-encoder interop for PNG and GIF (same protection the
    JPEG tests have): two REAL fixtures from CPython's IDLE icon set
    (PSF license; vendored base64) — the same 16x16 logo saved by a
    real encoder as palette GIF and as RGBA PNG with ancillary chunks
    (gAMA/cHRM/tRNS/bKGD/pHYs/tIME) — must decode through the same
    decode_image dispatch to plausible, deterministic pixels. A
    palette/LZW or defilter table bug that round-trip tests can't see
    (shared constants) fails here."""
    import base64

    from duplicate_finder_spark.operators.multimodal import decode_image

    gif = base64.b64decode(
        "R0lGODlhEAAQAPZXAEVjfUdlfUVkfv/DMP/IM//KNf/FOP/LP//QPf/RPv/UQv/YR//S"
        "SP/dTf/bU//gUf/jVv/nWv/pX//rYP/tY//idj9xmT11ozt6rT5+sUNnhUdphUJpiUFr"
        "jkVvkUBulEt4nUl+qT2AtkeCskWGu3GVs5+fn4mcrKSkpKWlpaioqK2tra6urrOzs7e3"
        "t7m5ubu7u729vf/gmf/im//0m//sqP/xrv/yt6e6yqS80LDB0KHE4MDAwMPDw8XFxcnJ"
        "yc7OztDQ0Nzc3N/f3//00tPg6uHh4ePj4+Tk5Ojo6Ozs7O7u7v/76+rv8/Dw8PLy8vPz"
        "8/b29vj4+Pr6+vv7+/z8/P39/QAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
        "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAACH5BAUAAFcALAAA"
        "AAAQABAAAAfXgC4wgzw8PT0/iVeLizBASFFSUlRTVj9TQIxXMENRU0NIS0ZVpFVLjD1B"
        "SFVHS1JWOyMXIDhViz5GU1VRVVZVGUUWHRu2Vz9BSVVDvb5VOhoCpT6dU1E7IhggHxsA"
        "AVUQNT6quiTZHxwaASdMCww8nVFWGCElTc1MFQkEMY9PViEWmtCgMAFCAwUFDLwQEsXJ"
        "lBweqlCgEOEgggEyXAAxosQVKYo3SpFqIQTKESRJkkl4sIBIgWIrerBQoaIFkCk2HCQ4"
        "MAOmpisoVqwiBeWnURMoUqTQFAgAOw==")
    png = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAABAAAAAQCAMAAAAoLQ9TAAAABGdBTUEAALGPC/xhBQAA"
        "ACBjSFJNAAB6JgAAgIQAAPoAAACA6AAAdTAAAOpgAAA6mAAAF3CculE8AAABxVBMVEUA"
        "AADExMS/v7////////////////////+urq6qqqqoqKj///+srKyrq6uqqqqlpaWjo6Og"
        "oKDx8fGrq6udnZ2fn5+ioqKkpKSlpaWmpqa3t7e5ubm7u7u9vb2/v7/BwcHDw8PFxcXI"
        "yMjJycnHx8fOzs7k5OT29vb4+Pj6+vr8/Pz5+fnMzMy+vr7e3t739/fn5+fu7u7h4eH+"
        "/v79/f3////s7OzPz8/m5ubj4+Oiwt5HgrI9daNLeJ2nusrf398+frHT4Oo/cZlBa45H"
        "aYXR0dHd3d2wwdBDZ4VFY32hxOA9gLY8eKk+c55BbZJDaIdFZH1HZX3/31P/7KjQ0NDl"
        "5eVFhrs8eas+dKBAbpRCaYlFZH5GZH2JnKz/++v/2Ef/0kjAwMD19fU7eq09daJxlbPq"
        "7/P/4nb/0T7/yDPy8vJJfqn/9Jv/7WP/62D/41b/20v/0kD/yjX/xTjw8PCkvNBFb5H/"
        "7GH/5Vj/3U3/1EL/zDf/wzD/4Jm2trbNzc3i4uLt7e3/7WH/51r/8rezs7Pc3Nzz8/Pp"
        "6eno6Oj/6V//4FH/10b/9NL/xzSvr6//8a7/21P/0D3/yz//4putra37+/t0CxwfAAAA"
        "GnRSTlMAf3+19PW29vvg9Lfvbw4ESb7WH0O09u6SDkhfJ8IAAAABYktHRAMRDEzyAAAA"
        "CXBIWXMAAABIAAAASABGyWs+AAAAB3RJTUUH5AcBCR8AiRZ9UAAAAQRJREFUGNMFwQcj"
        "AnEYB+Afyd6byjVvdHSX/702EbK3bNmZ2XslZO/1eT0Pig1GUwlntlht9hgAgNHBC6Io"
        "SU6rXBoLAGUuRXap7nKmEasAAK6yylntFqWa2rr6Bh0Ai0dkCtOoscnb3BIHwNaqaj6N"
        "EVFbewfpdbB7FEno7Oru6e3rH6DBIZiH/SKNjI6NT0xOTQdmZjHnEuZpYXEpSESB5ZVV"
        "mBz8Glv3BjdCm1vbO7t7MPiEfengkEJHxyenZ+cXuAxfRSIyo+ubWyLSxyN6d8+rD4/s"
        "6fnl9S0BwDuXmJQcDQsfn1/fPykAUtPSkZGZ9evX6C8bAHIAAMjNyy8oLALwD5VOOypm"
        "F0NuAAAAJXRFWHRkYXRlOmNyZWF0ZQAyMDIwLTA3LTAxVDA5OjMwOjA0KzAwOjAwAvI0"
        "0gAAACV0RVh0ZGF0ZTptb2RpZnkAMjAyMC0wNy0wMVQwOTozMDowNCswMDowMHOvjG4A"
        "AAAASUVORK5CYII=")
    g = decode_image(gif)
    p = decode_image(png)
    assert g is not None and g.shape == (16, 16, 3)
    assert p is not None and p.shape == (16, 16, 3)
    # deterministic regression snapshots (independent encoders)
    assert round(float(g.mean()), 2) == 172.28
    assert round(float(p.mean()), 2) == 178.45
    # same source artwork: the two decodes agree to palette precision
    # on the vast majority of pixels
    diff = np.abs(g.astype(int) - p.astype(int)).mean()
    assert diff < 12.0


# --- mp3 / mp4 scripted-writer round-trips (pure kernels, no Spark) ---------

_mp3_frames = st.lists(st.tuples(st.integers(1, 14), st.integers(0, 1)),
                       min_size=1, max_size=12)


@settings(max_examples=150, deadline=None)
@given(_mp3_frames, st.integers(0, 2), st.integers(0, 30),
       st.integers(0, 9))
def test_mp3_writer_parser_roundtrip(frames, sri, id3, junk):
    from duplicate_finder_spark.operators.mp3meta import (
        BITRATES_KBPS, SAMPLE_RATES, encode_mp3_stream, mp3_frames)
    m = mp3_frames(encode_mp3_stream(frames, sri=sri, id3_size=id3,
                                     junk_prefix=junk))
    rate = SAMPLE_RATES[sri]
    kbps = [BITRATES_KBPS[bri] for bri, _ in frames]
    assert m["n_frames"] == len(frames)
    assert m["sample_rate"] == rate
    assert m["duration_ms"] == round(len(frames) * 1152 * 1000.0 / rate, 3)
    assert m["bitrate_kbps"] == round(sum(kbps) / len(kbps), 6)
    assert m["vbr"] == (len(set(kbps)) > 1)


@settings(max_examples=150, deadline=None)
@given(st.sampled_from(["isom", "mp42", "avc1", "dash"]),
       st.integers(1, 10 ** 6), st.integers(0, 2 ** 40),
       st.lists(st.sampled_from(["vide", "soun", "text", "hint"]),
                max_size=6),
       st.integers(0, 1))
def test_mp4_writer_parser_roundtrip(brand, timescale, duration, tracks,
                                     ver):
    from duplicate_finder_spark.operators.mp4meta import (encode_mp4,
                                                          mp4_meta_dict)
    if ver == 0 and duration >= 2 ** 32:
        duration %= 2 ** 32  # v0 boxes carry 32-bit durations
    m = mp4_meta_dict(encode_mp4(brand, timescale, duration,
                                 tuple(tracks), mvhd_version=ver))
    assert m["brand"] == brand and m["timescale"] == timescale
    assert m["duration_ms"] == round(duration * 1000.0 / timescale, 3)
    assert m["n_video"] == tracks.count("vide")
    assert m["n_audio"] == tracks.count("soun")
    assert m["n_other"] == len(tracks) - m["n_video"] - m["n_audio"]
