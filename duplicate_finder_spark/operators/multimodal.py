"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns; all Spark-side
mechanics — schema, Arrow batch shape, partition sizing, UDF signatures —
are real and tested. Media decode is REAL wherever the stdlib + numpy
suffice: PPM P6, uncompressed 24-bit BMP, PNG (zlib inflate + the five
row filters incl. Paeth, every 8-bit color type), GIF (pure-Python LZW,
incl. interlace), JPEG (``jpegcodec.py``), WebP lossless
(``webpcodec.py``) — ``decode_image`` — and integer-PCM WAV
(``decode_wav``). Formats whose entropy coding genuinely needs an
external codec (lossy-VP8 WebP/mp3 samples/H.264) fall back to the
explicit ``decode_stub`` (PIL/ffmpeg are not in this container), whose
deterministic fake keeps downstream feature logic exercisable
end-to-end.

Pattern: ``mapInPandas`` (iterator of pandas batches) so one task
processes many Arrow batches without per-row Python dispatch, and large
payloads never concatenate into one giant frame.
"""

from __future__ import annotations

import binascii
import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = "doc_id long, n_bytes long, head_hex string"
FEATURE_SCHEMA = "doc_id long, n_bytes long, feature array<float>"


def binary_meta(df: DataFrame, id_col: str = "doc_id",
                bin_col: str = "payload") -> DataFrame:
    """(id, binary) → (doc_id, n_bytes, head_hex): typed metadata over an
    opaque binary column, batched through Arrow."""
    id_name, bin_name = id_col, bin_col

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf[bin_name]
            yield pd.DataFrame({
                "doc_id": pdf[id_name].astype("int64"),
                "n_bytes": payload.map(
                    lambda b: len(b) if b is not None else 0).astype("int64"),
                "head_hex": payload.map(
                    lambda b: binascii.hexlify(b[:8]).decode().upper()
                    if b is not None else ""),
            })

    return df.select(id_col, bin_col).mapInPandas(extract, META_SCHEMA)


def decode_stub(payload: bytes, modality: str = "image") -> list[float]:
    """STUB: media decode + feature extraction for CODEC formats.

    The real implementation would decode with PIL/ffmpeg/torchaudio and
    emit an embedding; those libs are absent here. The deterministic fake
    derives an 8-dim feature from the payload's sha256 so tests can
    assert end-to-end plumbing (stable values, correct shapes).
    Raise path kept explicit for the real-codec branch. Container-free
    raster formats don't need this — see ``decode_image``.

    Why the remaining formats (lossy-VP8 WebP, mp3 samples, H.264/AAC)
    stay stubs while PNG/GIF/JPEG/VP8L got real decoders: the decided
    boundary is VERIFIABILITY, not algorithmic difficulty. The decoded
    formats either carry their entropy tables in the file (JPEG) or
    use closed-form/derivable coding structures (VP8L prefix codes,
    LZW, DEFLATE), so our own writers + crafted streams genuinely
    prove the decoder. VP8's default coefficient probability tables,
    mp3's 34 Huffman tables + 512-tap synthesis window, and H.264's
    CABAC context tables exist only as printed spec data with no
    closed form — unverifiable in this sandbox (no codec lib, no real
    encoded files), so a from-memory transcription paired with our own
    writer would be SELF-CONSISTENT EVEN IF WRONG: green tests, broken
    on every real file. An honest stub beats an unfalsifiable decoder.
    (The provable parts of mp3 — frame CRC-16, side-info layout, Xing
    — are real: operators/mp3meta.py.)
    """
    if modality not in ("image", "audio", "video"):
        raise NotImplementedError(f"unknown modality: {modality}")
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:8]]


def _decode_ppm(b: bytes) -> np.ndarray | None:
    """PPM P6 (binary RGB, maxval 255) → HxWx3 uint8, or None."""
    if not b.startswith(b"P6"):
        return None
    toks: list[bytes] = []
    i = 2
    while len(toks) < 3 and i < len(b):
        while i < len(b) and b[i:i + 1].isspace():
            i += 1
        if b[i:i + 1] == b"#":  # comment runs to end of line
            j = b.find(b"\n", i)
            i = j + 1 if j >= 0 else len(b)
            continue
        j = i
        while j < len(b) and not b[j:j + 1].isspace():
            j += 1
        toks.append(b[i:j])
        i = j
    i += 1  # exactly one whitespace byte after maxval, then pixel data
    try:
        w, h, maxv = (int(t) for t in toks)
    except ValueError:
        return None
    if maxv != 255 or w <= 0 or h <= 0 or len(b) < i + w * h * 3:
        return None
    return np.frombuffer(b, dtype=np.uint8, count=w * h * 3,
                         offset=i).reshape(h, w, 3)


def _decode_bmp(b: bytes) -> np.ndarray | None:
    """Uncompressed 24-bit BI_RGB BMP → HxWx3 uint8 (RGB), or None."""
    if b[:2] != b"BM" or len(b) < 54:
        return None
    off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4  # rows pad to 4 bytes
    if len(b) < off + stride * h:
        return None
    rows = np.frombuffer(b, dtype=np.uint8, count=stride * h,
                         offset=off).reshape(h, stride)[:, :w * 3]
    img = rows.reshape(h, w, 3)
    if bottom_up:
        img = img[::-1]
    return img[..., ::-1]  # BGR → RGB


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels per color type (8-bit depth): gray, RGB, palette, gray+A, RGBA
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(b: bytes):
    """Yield (type, data) for each well-formed chunk; stop at truncation
    or a CRC-length lie rather than raising."""
    pos = len(_PNG_SIG)
    n = len(b)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", b[pos:pos + 4])
        ctype = b[pos + 4:pos + 8]
        if pos + 12 + length > n:
            return
        yield ctype, b[pos + 8:pos + 8 + length]
        pos += 12 + length
        if ctype == b"IEND":
            return


def _png_defilter(raw: bytes, h: int, w: int, ch: int) -> np.ndarray | None:
    """Undo the five PNG row filters (None/Sub/Up/Average/Paeth,
    RFC 2083 §6) → (h, w*ch) uint8. Up is fully vectorized (uint8 adds
    wrap mod 256 natively); Sub/Average/Paeth carry a left-neighbor
    dependency so those rows walk their bytes — only rows that USED
    those filters pay it."""
    stride = w * ch
    if len(raw) < h * (stride + 1):
        return None
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        f = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride,
                             offset=pos).copy()
        pos += stride
        if f == 0:
            rec = line
        elif f == 1:  # Sub: recon(x) = filt(x) + recon(x-ch)
            rec = line
            for x in range(ch, stride):
                rec[x] = (int(rec[x]) + int(rec[x - ch])) & 0xFF
        elif f == 2:  # Up — vectorized, uint8 wraps mod 256
            rec = line + prev
        elif f == 3:  # Average
            rec = line
            for x in range(stride):
                left = int(rec[x - ch]) if x >= ch else 0
                rec[x] = (int(line[x])
                          + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth predictor
            rec = line
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                up = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (up if pb <= pc else c)
                rec[x] = (int(line[x]) + pred) & 0xFF
        else:
            return None
        out[y] = rec
        prev = rec
    return out


def _decode_png(b: bytes) -> np.ndarray | None:
    """REAL PNG decode, stdlib zlib + numpy (no codec libraries):
    8-bit-depth, non-interlaced PNGs of every color type (gray / RGB /
    palette / gray+alpha / RGBA) → HxWx3 uint8 RGB (alpha dropped —
    features downstream are RGB-statistics). None for anything else
    (16-bit, Adam7 interlace, malformed) — those fall to the stub."""
    if not b.startswith(_PNG_SIG):
        return None
    w = h = None
    color = interlace = 0
    plte: np.ndarray | None = None
    idat: list[bytes] = []
    for ctype, data in _png_chunks(b):
        if ctype == b"IHDR":
            if len(data) != 13:
                return None
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data)
            if depth != 8 or comp != 0 or filt != 0 \
                    or color not in _PNG_CHANNELS:
                return None
        elif ctype == b"PLTE":
            if len(data) % 3:
                return None
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
    if not w or not h or interlace != 0 or not idat:
        return None
    if w * h > 64 * 1024 * 1024:  # 64 MP bound on attacker-controlled dims
        return None
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    ch = _PNG_CHANNELS[color]
    flat = _png_defilter(raw, h, w, ch)
    if flat is None:
        return None
    px = flat.reshape(h, w, ch)
    if color == 2:
        return px
    if color == 6:
        return np.ascontiguousarray(px[..., :3])
    if color == 0:
        return np.repeat(px, 3, axis=2)
    if color == 4:
        return np.repeat(px[..., :1], 3, axis=2)
    # color == 3: palette lookup
    if plte is None or int(px.max()) >= len(plte):
        return None
    return plte[px[..., 0]]


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data)))


def encode_png(img: np.ndarray, row_filters=None) -> bytes:
    """HxWx3 uint8 → PNG bytes (color type 2). ``row_filters`` pins the
    filter byte per row (cycled; default all-0) so the round-trip
    property test exercises every defilter branch, Paeth included."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    ch = 3
    filters = list(row_filters) if row_filters else [0]
    flat = img.reshape(h, w * ch).astype(np.int32)
    lines = []
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        f = filters[y % len(filters)]
        cur = flat[y]
        left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
        upleft = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - ((left + prev) >> 1)
        else:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = (np.abs(p - left), np.abs(p - prev),
                          np.abs(p - upleft))
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            filt = cur - pred
        lines.append(bytes([f]) + (filt & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + _png_chunk(b"IEND", b""))


def _gif_lzw_decode(min_code_size: int, data: bytes,
                    max_pixels: int) -> bytearray | None:
    """GIF-flavor LZW (GIF89a spec appendix F): variable code width,
    clear/end codes, MSB-in-LSB-first bit packing."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    dictionary: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = bits = 0
    prev_entry: bytes | None = None
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                dictionary = dictionary[:clear + 2]
                width = min_code_size + 1
                prev_entry = None
                continue
            if code == end:
                return out
            if prev_entry is None:
                if code >= len(dictionary):
                    return None
                prev_entry = dictionary[code]
                out += prev_entry
            else:
                if code < len(dictionary):
                    entry = dictionary[code]
                elif code == len(dictionary):  # KwKwK case
                    entry = prev_entry + prev_entry[:1]
                else:
                    return None
                out += entry
                dictionary.append(prev_entry + entry[:1])
                prev_entry = entry
            if len(dictionary) == (1 << width) and width < 12:
                width += 1
            if len(out) > max_pixels:
                return None
    return out


def _decode_gif(b: bytes) -> np.ndarray | None:
    """REAL GIF decode, pure Python LZW + numpy: first frame of a
    GIF87a/89a (interlaced or not) → HxWx3 uint8 RGB, or None."""
    if b[:6] not in (b"GIF87a", b"GIF89a") or len(b) < 13:
        return None
    flags = b[10]
    pos = 13
    gct: np.ndarray | None = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b[pos:pos + 3 * n], dtype=np.uint8)
        if gct.size < 3 * n:
            return None
        gct = gct.reshape(-1, 3)
        pos += 3 * n
    while pos < len(b):
        block = b[pos]
        if block == 0x3B:  # trailer
            return None
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
            continue
        if block != 0x2C:  # image descriptor expected
            return None
        if pos + 10 > len(b):
            return None
        w = int.from_bytes(b[pos + 5:pos + 7], "little")
        h = int.from_bytes(b[pos + 7:pos + 9], "little")
        iflags = b[pos + 9]
        pos += 10
        table = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(b[pos:pos + 3 * n], dtype=np.uint8)
            if table.size < 3 * n:
                return None
            table = table.reshape(-1, 3)
            pos += 3 * n
        if table is None or w <= 0 or h <= 0 or w * h > 64 * 1024 * 1024:
            return None
        if pos >= len(b):
            return None
        min_code_size = b[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            return None
        sub = bytearray()
        while pos < len(b) and b[pos] != 0:
            ln = b[pos]
            sub += b[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        idx = _gif_lzw_decode(min_code_size, bytes(sub), w * h)
        if idx is None or len(idx) < w * h:
            return None
        px = np.frombuffer(bytes(idx[:w * h]), dtype=np.uint8)
        if int(px.max()) >= len(table):
            return None
        img = table[px].reshape(h, w, 3)
        if iflags & 0x40:  # interlaced: rows land in 4 passes
            order = np.concatenate([np.arange(0, h, 8),
                                    np.arange(4, h, 8),
                                    np.arange(2, h, 4),
                                    np.arange(1, h, 2)])
            deinter = np.empty_like(img)
            deinter[order] = img
            img = deinter
        return img
    return None


def _gif_lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Literal-codes LZW ('uncompressed GIF' technique): every pixel is
    emitted as its own literal code, with a CLEAR whenever the decoder's
    dictionary growth would widen the code — output stays at a fixed
    min_code_size+1 bits/pixel, and any conformant decoder accepts it."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    # decoder adds 1 dict entry per code after the first since CLEAR;
    # stay below the width-increase threshold
    budget = (1 << width) - (clear + 2) - 1
    out = bytearray()
    acc = bits = 0

    def emit(code: int) -> None:
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    emit(clear)
    since_clear = 0
    for px in indices:
        if since_clear >= budget:
            emit(clear)
            since_clear = 0
        emit(px)
        since_clear += 1
    emit(end)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """HxWx3 uint8 → single-frame GIF89a with a per-image palette built
    from the image's distinct colors (≤256 required — the round-trip
    test side; callers wanting arbitrary images quantize first)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif: more than 256 distinct colors")
    cbits = max(1, int(len(colors) - 1).bit_length())
    table = np.zeros((1 << cbits, 3), dtype=np.uint8)
    table[:len(colors)] = colors
    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        order = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                                np.arange(2, h, 4), np.arange(1, h, 2)])
        idx = idx[order]
    min_code_size = max(2, cbits)
    lzw = _gif_lzw_encode(idx.tobytes(), min_code_size)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (cbits - 1), 0, 0])  # GCT present, 2^cbits entries
    out += table.tobytes()
    out += b"\x2C" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0])
    out += bytes([min_code_size])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3B"
    return bytes(out)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int] | None:
    """REAL decode for container-free audio: RIFF/WAVE with 8- or 16-bit
    integer PCM → (samples float64 in [-1, 1] mono-mixed, sample_rate),
    in pure numpy. None for compressed codecs (mp3/aac/…)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, n = 12, len(payload)
    fmt = None
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            audio_fmt = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if audio_fmt != 1 or channels < 1 or bits not in (8, 16) \
                    or rate <= 0:
                return None  # non-PCM (or corrupt header) needs a codec
            fmt = (channels, rate, bits)
        elif cid == b"data" and fmt is not None:
            channels, rate, bits = fmt
            if bits == 16:
                raw = np.frombuffer(body, dtype="<i2",
                                    count=len(body) // 2)
                samples = raw.astype(np.float64) / 32768.0
            else:
                raw = np.frombuffer(body, dtype=np.uint8)
                samples = (raw.astype(np.float64) - 128.0) / 128.0
            usable = (samples.size // channels) * channels
            mono = samples[:usable].reshape(-1, channels).mean(axis=1)
            return mono, rate
        pos += 8 + size + (size & 1)  # RIFF chunks pad to even
    return None


def audio_feature(samples: np.ndarray, rate: int) -> list[float]:
    """Deterministic 8-dim feature from decoded PCM: duration, rms,
    peak, zero-crossing rate, and 4-band coarse energy split — the same
    shape the stub emits."""
    if samples.size == 0:
        return [0.0] * 8
    dur = samples.size / rate
    rms = float(np.sqrt(np.mean(samples ** 2)))
    peak = float(np.max(np.abs(samples)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(samples).astype(
        np.int8)))))
    quarters = np.array_split(samples, 4)
    band = [float(np.sqrt(np.mean(q ** 2))) if q.size else 0.0
            for q in quarters]
    return [round(v, 6) for v in (min(dur / 3600.0, 1.0), rms, peak,
                                  zcr, *band)]


def decode_image(payload: bytes) -> np.ndarray | None:
    """REAL decode, no codec libraries: PPM P6 and uncompressed 24-bit
    BMP (pure numpy), PNG (stdlib zlib inflate + numpy defilter, all
    five row filters incl. Paeth), GIF (pure-Python LZW), JPEG —
    baseline AND progressive (canonical Huffman + numpy IDCT,
    ``jpegcodec.py``) — and WebP LOSSLESS (VP8L prefix codes, LZ77,
    color cache + all four transforms, ``webpcodec.py``). Returns
    HxWx3 uint8 RGB, or None for formats that genuinely need an
    external codec (lossy VP8 WebP/…), which fall back to
    ``decode_stub``."""
    from duplicate_finder_spark.operators.jpegcodec import decode_jpeg
    from duplicate_finder_spark.operators.webpcodec import decode_webp

    for dec in (_decode_bmp, _decode_ppm, _decode_png, _decode_gif,
                decode_jpeg, decode_webp):
        img = dec(payload)
        if img is not None:
            return img
    return None


def encode_ppm(img: np.ndarray) -> bytes:
    """HxWx3 uint8 → PPM P6 bytes (the re-encode side of resize)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def image_feature(img: np.ndarray) -> list[float]:
    """Deterministic 8-dim feature from decoded pixels: normalized
    (h, w) + per-channel mean and std — the same shape the stub emits,
    so downstream similarity operators are agnostic to which path ran."""
    h, w = img.shape[:2]
    px = img.reshape(-1, 3).astype(np.float64)
    mean = px.mean(axis=0) / 255.0
    std = px.std(axis=0) / 255.0
    return [round(float(v), 6) for v in
            (h / 4096.0, w / 4096.0, *mean, *std)]


def extract_features(df: DataFrame, modality: str = "image",
                     id_col: str = "doc_id",
                     bin_col: str = "payload") -> DataFrame:
    """(id, binary) → (doc_id, n_bytes, feature array<float>),
    Arrow-batched. Decodable raster payloads (PPM/BMP) get the REAL
    pixel-statistics feature; codec formats fall back to the stub."""
    id_name, bin_name = id_col, bin_col

    def feat(b: bytes) -> list[float]:
        if modality == "image":
            img = decode_image(b)  # PPM/BMP/PNG/GIF all decode for real
            if img is not None:
                return image_feature(img)
        elif modality == "audio":
            wav = decode_wav(b)
            if wav is not None:
                return audio_feature(*wav)
        return decode_stub(b, modality)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf[bin_name]
            yield pd.DataFrame({
                "doc_id": pdf[id_name].astype("int64"),
                "n_bytes": payload.map(
                    lambda b: len(b) if b is not None else 0).astype("int64"),
                "feature": payload.map(
                    lambda b: feat(b) if b is not None else None),
            })

    return df.select(id_col, bin_col).mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = "doc_id long, width int, height int, thumb binary"
FRAME_SCHEMA = "doc_id long, frame_no int, frame binary"


def resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """STUB resize for CODEC formats. The real branch decodes with PIL
    and re-encodes at (width, height); absent codecs, the deterministic
    fake samples ``width*height`` bytes evenly from the payload so
    output size, shape metadata, and determinism are all testable.
    Decodable raster formats take ``resize_image`` instead."""
    if not payload:
        return b""
    n = max(1, width * height)
    step = max(1, len(payload) // n)
    return payload[::step][:n]


def resize_image(payload: bytes, width: int, height: int) -> bytes | None:
    """REAL resize for decodable raster payloads: nearest-neighbor in
    numpy, re-encoded as PPM P6. None if the payload needs a codec."""
    img = decode_image(payload)
    if img is None:
        return None
    h, w = img.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return encode_ppm(img[ys][:, xs])


def resize_images(df: DataFrame, width: int = 4, height: int = 4,
                  id_col: str = "doc_id",
                  bin_col: str = "payload") -> DataFrame:
    """(id, binary) → (doc_id, width, height, thumb): Arrow-batched
    thumbnailing; one task streams many batches (mapInPandas iterator).
    Decodable raster payloads get the REAL nearest-neighbor resize
    (PPM-encoded thumb); codec formats fall back to the stub."""
    id_name, bin_name = id_col, bin_col

    def thumb(b: bytes) -> bytes:
        real = resize_image(b, width, height)
        return real if real is not None else resize_stub(b, width, height)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf[bin_name]
            yield pd.DataFrame({
                "doc_id": pdf[id_name].astype("int64"),
                "width": width, "height": height,
                "thumb": payload.map(
                    lambda b: thumb(b) if b is not None else None),
            })

    return df.select(id_col, bin_col).mapInPandas(run, RESIZE_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 64,
                  max_frames: int = 4, frame_len: int = 16,
                  id_col: str = "doc_id",
                  bin_col: str = "payload") -> DataFrame:
    """(id, binary video) → one row per sampled frame (doc_id, frame_no,
    frame). REAL frame extraction for RIFF/AVI payloads (MJPEG or DIB
    chunks — ``avicodec.parse_avi_frames``): up to ``max_frames`` frames
    evenly sampled from the actual stream, ``frame_no`` = source frame
    index, ``frame`` = the contained frame payload (a decodable JPEG
    for MJPEG). Non-AVI containers (mp4/mkv need an external demuxer)
    keep the explicit byte-slicing stub so the EXPLODED output shape —
    row-per-frame fanout, partition sizing — stays real either way.
    """
    from duplicate_finder_spark.operators.avicodec import (parse_avi_frames,
                                                           sample_indices)
    id_name, bin_name = id_col, bin_col

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_nos, frames = [], [], []
            for doc_id, b in zip(pdf[id_name].astype("int64"),
                                 pdf[bin_name]):
                if b is None:
                    continue
                real = parse_avi_frames(b)
                if real is not None:
                    for fno in sample_indices(len(real), max_frames):
                        ids.append(doc_id)
                        frame_nos.append(fno)
                        frames.append(real[fno])
                    continue
                for fno in range(min(max_frames,
                                     max(1, len(b) // every_n_bytes))):
                    off = fno * every_n_bytes
                    ids.append(doc_id)
                    frame_nos.append(fno)
                    frames.append(bytes(b[off:off + frame_len]))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_no": pd.Series(frame_nos, dtype="int32"),
                "frame": pd.Series(frames, dtype=object),
            })

    return df.select(id_col, bin_col).mapInPandas(run, FRAME_SCHEMA)


def with_payload(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Test/demo helper: synthesize an opaque binary payload column from
    text (utf-8 bytes) — stands in for an image/audio blob."""
    return docs.select(F.col(id_col),
                       F.encode(F.col(text_col), "utf-8").alias("payload"))
