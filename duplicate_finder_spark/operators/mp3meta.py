"""MP3 stream metadata via a real MPEG-1 Layer III frame walk.

Full mp3 AUDIO decode (Huffman + IMDCT + synthesis filterbank) stays an
honest out-of-sandbox stub (operators/multimodal.py:decode_stub) — and
round 5 sharpens WHY, because the boundary is not the algorithm: the
IMDCT windows are closed-form, the polyphase matrixing is closed-form,
and the bit unpacking below proves the container layer is tractable.
The boundary is the standard's FIXED DATA: 34 Huffman code tables, the
512-coefficient synthesis window (a tabulated prototype filter with no
closed form), and per-samplerate scalefactor-band tables exist only as
printed tables in ISO 11172-3. None is derivable or verifiable in this
sandbox — no codec library, no spec text, no real encoded files to
interop against — so a from-memory transcription paired with our own
writer would be SELF-CONSISTENT even if wrong: tests would stay green
while the decoder failed on every real MP3. That is the opposite of
the JPEG/VP8L precedent, where the entropy tables ride inside the file
and the decoder's correctness is testable against its own inputs.
What IS provable without the spec tables is implemented for real:

- full side-information bit layout (MPEG-1 mono Layer III, 17 bytes:
  main_data_begin/bit-reservoir, per-granule part2_3_length,
  big_values, global_gain, table selects, region counts) —
  structure-only, every field round-trips through the scripted writer,
- frame CRC-16 protection (poly x^16+x^15+x^2+1, init 0xFFFF, MSB
  first over header bytes 2-3 + side info) — anchored to the published
  CRC-16/CMS check value 0xAEE7 for b"123456789", an EXTERNAL truth,
  not writer self-consistency,
- Xing/Info VBR header (frame count / byte count) in frame 1.

A training pipeline's audio-curation pass mostly needs STREAM
METADATA — duration, bitrate profile, CBR/VBR, sample rate, stream
integrity — and that requires only the frame headers and side info,
which are fully parseable in pure Python:

- ID3v2 tag skip (syncsafe 28-bit size),
- sync scan (11 set bits) with single-byte resync on junk,
- MPEG-1 Layer III header fields: bitrate index, sample-rate index,
  padding bit; frame length = 144·bitrate/sample_rate + padding,
- 1152 samples per frame ⇒ exact duration; per-frame bitrates ⇒ mean
  bitrate and VBR flag; truncated tail frames are dropped.

The scripted writer (``encode_mp3_stream``) builds bit-valid streams so
tests and the driver gate exercise the parser against known-answer
frames — the same prove-it-with-a-writer pattern as the progressive
JPEG and PNG/GIF codecs.

Scale: metadata extraction is a ``mapInPandas`` over the binary column
— embarrassingly parallel, no shuffle, bytes never leave the executor.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["BITRATES_KBPS", "SAMPLE_RATES", "mp3_frames",
           "encode_mp3_stream", "mp3_stream_meta", "crc16_mpeg",
           "pack_side_info_mono", "parse_side_info_mono",
           "mp3_frame_walk_integrity", "mp3_frame_integrity"]

# MPEG-1 Layer III tables (index 0 = "free format" and 15 = invalid)
BITRATES_KBPS = (None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                 224, 256, 320)
SAMPLE_RATES = (44100, 48000, 32000, None)
_SAMPLES_PER_FRAME = 1152


def crc16_mpeg(data: bytes, init: int = 0xFFFF) -> int:
    """CRC-16 as the MPEG audio protection field uses it: generator
    x^16 + x^15 + x^2 + 1 (0x8005), all-ones initial state, bits
    processed MSB-first, no reflection, no final xor — the parameter
    set published as CRC-16/CMS (check value 0xAEE7 for b"123456789",
    pinned as an external truth in tests/test_mp3meta.py)."""
    crc = init
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005 if crc & 0x8000 else crc << 1) \
                & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def put(self, value: int, n: int) -> None:
        for k in range(n - 1, -1, -1):
            self.bits.append((value >> k) & 1)

    def bytes(self) -> bytes:
        bits = self.bits + [0] * (-len(self.bits) % 8)
        return bytes(
            sum(bit << (7 - j) for j, bit in enumerate(bits[i:i + 8]))
            for i in range(0, len(bits), 8))


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def get(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v


#: per-granule side-info fields, (name, bits), normal-window layout
_GRANULE_FIELDS = (("part2_3_length", 12), ("big_values", 9),
                   ("global_gain", 8), ("scalefac_compress", 4))
_GRANULE_TAIL = (("preflag", 1), ("scalefac_scale", 1),
                 ("count1table_select", 1))


def pack_side_info_mono(main_data_begin: int = 0, scfsi: int = 0,
                        granules: list[dict] | None = None) -> bytes:
    """MPEG-1 mono Layer III side info (17 bytes): main_data_begin(9),
    private(5), scfsi(4), then per granule the normal-window layout —
    part2_3_length(12) big_values(9) global_gain(8)
    scalefac_compress(4) window_switching=0(1) table_select×3(5)
    region0_count(4) region1_count(3) preflag(1) scalefac_scale(1)
    count1table_select(1). Unspecified fields are zero."""
    gs = granules or []
    w = _BitWriter()
    w.put(main_data_begin, 9)
    w.put(0, 5)
    w.put(scfsi, 4)
    for gi in range(2):
        g = gs[gi] if gi < len(gs) else {}
        for name, nbits in _GRANULE_FIELDS:
            w.put(g.get(name, 0), nbits)
        w.put(0, 1)  # window_switching_flag: normal windows only
        for t in g.get("table_select", (0, 0, 0)):
            w.put(t, 5)
        w.put(g.get("region0_count", 0), 4)
        w.put(g.get("region1_count", 0), 3)
        for name, nbits in _GRANULE_TAIL:
            w.put(g.get(name, 0), nbits)
    out = w.bytes()
    assert len(out) == 17
    return out


def parse_side_info_mono(b17: bytes) -> dict:
    """Inverse of :func:`pack_side_info_mono`; also understands the
    window-switching granule layout (block_type, mixed_block_flag,
    2 table selects, 3 subblock gains) real encoders emit for short
    blocks, so the walk never desyncs on one."""
    r = _BitReader(b17)
    out = {"main_data_begin": r.get(9), "private_bits": r.get(5),
           "scfsi": r.get(4), "granules": []}
    for _ in range(2):
        g = {name: r.get(nbits) for name, nbits in _GRANULE_FIELDS}
        g["window_switching_flag"] = r.get(1)
        if g["window_switching_flag"]:
            g["block_type"] = r.get(2)
            g["mixed_block_flag"] = r.get(1)
            g["table_select"] = (r.get(5), r.get(5))
            g["subblock_gain"] = (r.get(3), r.get(3), r.get(3))
        else:
            g["table_select"] = (r.get(5), r.get(5), r.get(5))
            g["region0_count"] = r.get(4)
            g["region1_count"] = r.get(3)
        for name, nbits in _GRANULE_TAIL:
            g[name] = r.get(nbits)
        out["granules"].append(g)
    return out


def mp3_frames(b: bytes) -> dict | None:
    """Walk a byte stream; return stream metadata or None if no frame.

    Skips a leading ID3v2 tag, resyncs byte-by-byte across junk, stops
    at a truncated tail frame. Frames with free-format/invalid bitrate
    or reserved sample rate are not frames (scan continues).
    """
    i = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        size = ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14) | \
               ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
        i = 10 + size
    n = 0
    brs: list[int] = []
    sr = None
    while i + 4 <= len(b):
        if b[i] != 0xFF or (b[i + 1] & 0xE0) != 0xE0:
            i += 1
            continue
        version = (b[i + 1] >> 3) & 3
        layer = (b[i + 1] >> 1) & 3
        if version != 3 or layer != 1:  # MPEG-1, Layer III only
            i += 1
            continue
        bri = (b[i + 2] >> 4) & 0xF
        sri = (b[i + 2] >> 2) & 3
        pad = (b[i + 2] >> 1) & 1
        if bri in (0, 15) or sri == 3:
            i += 1
            continue
        s = SAMPLE_RATES[sri]
        if sr is not None and s != sr:
            i += 1  # sample-rate change mid-stream: not our frame
            continue
        kbps = BITRATES_KBPS[bri]
        flen = (144 * kbps * 1000) // s + pad
        if i + flen > len(b):
            break  # truncated tail frame
        if sr is None:
            sr = s
        n += 1
        brs.append(kbps)
        i += flen
    if n == 0:
        return None
    return {
        "n_frames": n,
        "sample_rate": sr,
        "duration_ms": round(n * _SAMPLES_PER_FRAME * 1000.0 / sr, 3),
        "bitrate_kbps": round(sum(brs) / n, 6),
        "vbr": any(x != brs[0] for x in brs),
    }


def encode_mp3_stream(frames: list[tuple[int, int]], sri: int = 0,
                      id3_size: int = 0, junk_prefix: int = 0,
                      protection: bool = False,
                      side_infos: list[dict] | None = None,
                      corrupt_crc_frames: tuple[int, ...] = (),
                      xing_frames: int | None = None) -> bytes:
    """Bit-valid MPEG-1 Layer III stream from (bitrate_index, padding)
    pairs; payload bytes beyond the structured prefix are zeros (no
    false sync possible). Optional ID3v2 tag and/or junk bytes in
    front exercise the skip/resync paths.

    ``protection`` writes the header protection bit 0 and a real
    CRC-16 (:func:`crc16_mpeg` over header bytes 2-3 + side info)
    after the header; indices in ``corrupt_crc_frames`` get their
    stored CRC xored with 0xFFFF (a corrupt-stream fixture).
    ``side_infos`` supplies per-frame dicts for
    :func:`pack_side_info_mono` (default all-zero side info).
    ``xing_frames`` writes a Xing VBR header (flags FRAMES|BYTES,
    the given frame count, the stream's total frame bytes) right
    after frame 0's side info."""
    out = bytearray()
    if id3_size:
        out += b"ID3\x04\x00\x00" + bytes(
            [(id3_size >> 21) & 0x7F, (id3_size >> 14) & 0x7F,
             (id3_size >> 7) & 0x7F, id3_size & 0x7F]) + bytes(id3_size)
    out += bytes(junk_prefix)
    s = SAMPLE_RATES[sri]
    flens = []
    for bri, pad in frames:
        kbps = BITRATES_KBPS[bri]
        if kbps is None:
            raise ValueError(f"invalid bitrate index {bri}")
        flens.append((144 * kbps * 1000) // s + pad)
    total_bytes = sum(flens)
    for fi, ((bri, pad), flen) in enumerate(zip(frames, flens)):
        hdr = bytes([0xFF, 0xFA if protection else 0xFB,
                     (bri << 4) | (sri << 2) | (pad << 1),
                     0xC0])  # mono, no mode-ext/copyright/emphasis
        si = pack_side_info_mono(
            **(side_infos[fi] if side_infos and fi < len(side_infos)
               else {}))
        body = bytearray()
        if protection:
            crc = crc16_mpeg(hdr[2:4] + si)
            if fi in corrupt_crc_frames:
                crc ^= 0xFFFF
            body += bytes([crc >> 8, crc & 0xFF])
        body += si
        if fi == 0 and xing_frames is not None:
            body += (b"Xing" + (3).to_bytes(4, "big")
                     + int(xing_frames).to_bytes(4, "big")
                     + int(total_bytes).to_bytes(4, "big"))
        if len(body) + 4 > flen:
            raise ValueError(f"frame {fi} too short for side info/Xing")
        out += hdr + bytes(body) + bytes(flen - 4 - len(body))
    return bytes(out)


def mp3_frame_walk_integrity(b: bytes) -> dict | None:
    """Frame walk with side-info + CRC + Xing inspection: per stream →
    n_frames, protected_frames (protection bit set), crc_ok_frames
    (stored CRC == crc16_mpeg over header[2:4]+side info),
    reservoir_frames (main_data_begin > 0 — the frame borrows bits
    from earlier frames), max_main_data_begin, has_xing + the Xing
    frame count (frame 1 only, per the VBR-header convention).
    Returns None when no parseable frame (error-row skip)."""
    i = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        size = ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14) | \
               ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
        i = 10 + size
    n = protected = crc_ok = reservoir = max_mdb = 0
    has_xing = False
    xing_n = None
    sr = None
    while i + 4 <= len(b):
        if b[i] != 0xFF or (b[i + 1] & 0xE0) != 0xE0:
            i += 1
            continue
        version = (b[i + 1] >> 3) & 3
        layer = (b[i + 1] >> 1) & 3
        if version != 3 or layer != 1:
            i += 1
            continue
        bri = (b[i + 2] >> 4) & 0xF
        sri = (b[i + 2] >> 2) & 3
        pad = (b[i + 2] >> 1) & 1
        if bri in (0, 15) or sri == 3:
            i += 1
            continue
        s = SAMPLE_RATES[sri]
        if sr is not None and s != sr:
            i += 1
            continue
        kbps = BITRATES_KBPS[bri]
        flen = (144 * kbps * 1000) // s + pad
        if i + flen > len(b):
            break
        prot = (b[i + 1] & 1) == 0
        # channel mode (header byte 3, bits 6-7): MPEG-1 Layer III
        # carries 17 side-info bytes for single-channel (mode 3) and
        # 32 for stereo/joint/dual — the CRC span and the Xing offset
        # both depend on it, so a mono-only walk mis-reports every
        # protected stereo frame (r5 ADVICE). main_data_begin is the
        # first 9 bits in either layout.
        mode = (b[i + 3] >> 6) & 3
        si_len = 17 if mode == 3 else 32
        off = i + 4
        stored = None
        if prot:
            if off + 2 > i + flen:
                break
            stored = (b[off] << 8) | b[off + 1]
            off += 2
        if off + si_len > i + flen:
            break
        si_bytes = b[off:off + si_len]
        mdb = ((si_bytes[0] << 1) | (si_bytes[1] >> 7)) if mode != 3 \
            else parse_side_info_mono(si_bytes)["main_data_begin"]
        off += si_len
        if sr is None:
            sr = s
        n += 1
        if prot:
            protected += 1
            if stored == crc16_mpeg(b[i + 2:i + 4] + si_bytes):
                crc_ok += 1
        if mdb > 0:
            reservoir += 1
            max_mdb = max(max_mdb, mdb)
        if n == 1 and b[off:off + 4] in (b"Xing", b"Info") \
                and off + 8 <= i + flen:
            flags = int.from_bytes(b[off + 4:off + 8], "big")
            has_xing = True
            p = off + 8
            if flags & 1 and p + 4 <= i + flen:
                xing_n = int.from_bytes(b[p:p + 4], "big")
        i += flen
    if n == 0:
        return None
    return {"n_frames": n, "protected_frames": protected,
            "crc_ok_frames": crc_ok, "reservoir_frames": reservoir,
            "max_main_data_begin": max_mdb, "has_xing": has_xing,
            "xing_frames": xing_n}


def mp3_frame_integrity(df: DataFrame, id_col: str = "doc_id",
                        payload_col: str = "payload") -> DataFrame:
    """(id, n_frames, protected_frames, crc_ok_frames,
    reservoir_frames, max_main_data_begin, has_xing, xing_frames) per
    stream — the curation-facing corrupt/truncated-audio gate. Same
    mapInPandas shape as :func:`mp3_stream_meta`: embarrassingly
    parallel, bytes never shuffle."""
    import pandas as pd

    schema = (f"{id_col} long, n_frames long, protected_frames long, "
              "crc_ok_frames long, reservoir_frames long, "
              "max_main_data_begin long, has_xing boolean, "
              "xing_frames long")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                m = mp3_frame_walk_integrity(bytes(payload)) \
                    if payload is not None else None
                rows.append((i, *(None,) * 7) if m is None else
                            (i, m["n_frames"], m["protected_frames"],
                             m["crc_ok_frames"], m["reservoir_frames"],
                             m["max_main_data_begin"], m["has_xing"],
                             m["xing_frames"]))
            yield pd.DataFrame(rows, columns=[
                id_col, "n_frames", "protected_frames", "crc_ok_frames",
                "reservoir_frames", "max_main_data_begin", "has_xing",
                "xing_frames"])

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def mp3_stream_meta(df: DataFrame, id_col: str = "doc_id",
                    payload_col: str = "payload") -> DataFrame:
    """(id, n_frames, sample_rate, duration_ms, bitrate_kbps, vbr) per
    stream; streams with no parseable frame yield a null-metadata row
    (error-row skip, reference F6 semantics)."""
    import pandas as pd

    schema = (f"{id_col} long, n_frames long, sample_rate long, "
              "duration_ms double, bitrate_kbps double, vbr boolean")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                m = mp3_frames(bytes(payload)) if payload is not None \
                    else None
                rows.append((i, *(None,) * 4, None) if m is None else
                            (i, m["n_frames"], m["sample_rate"],
                             m["duration_ms"], m["bitrate_kbps"],
                             m["vbr"]))
            yield pd.DataFrame(rows, columns=[
                id_col, "n_frames", "sample_rate", "duration_ms",
                "bitrate_kbps", "vbr"])

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)
