"""Unit tests for operators/mp4meta.py (ISO-BMFF box walk)."""

import struct

from duplicate_finder_spark.operators.mp4meta import (
    encode_mp4, mp4_boxes, mp4_meta, mp4_meta_dict)


class TestParser:
    def test_roundtrip(self):
        m = mp4_meta_dict(encode_mp4("mp42", 90000, 123456,
                                     ("vide", "vide", "soun", "text")))
        assert m == {"brand": "mp42", "timescale": 90000,
                     "duration_ms": round(123456 * 1000.0 / 90000, 3),
                     "n_video": 2, "n_audio": 1, "n_other": 1}

    def test_mvhd_version1_64bit_duration(self):
        m = mp4_meta_dict(encode_mp4("isom", 600, 2 ** 33, ("vide",),
                                     mvhd_version=1))
        assert m["duration_ms"] == round(2 ** 33 * 1000.0 / 600, 3)

    def test_largesize_box_parses(self):
        # rebuild the file's first box with size=1 + 64-bit largesize
        b = encode_mp4("isom", 1000, 5000)
        size = struct.unpack_from(">I", b, 0)[0]
        big = (struct.pack(">I", 1) + b[4:8] + struct.pack(">Q", size + 8)
               + b[8:size]) + b[size:]
        m = mp4_meta_dict(big)
        assert m["brand"] == "isom" and m["timescale"] == 1000

    def test_size_zero_box_extends_to_eof(self):
        b = encode_mp4("isom", 1000, 5000)
        # rewrite the trailing 'free' box size to 0 (to-EOF)
        free_at = b.rindex(b"free") - 4
        patched = b[:free_at] + struct.pack(">I", 0) + b[free_at + 4:]
        assert mp4_meta_dict(patched) == mp4_meta_dict(b)

    def test_malformed_returns_none(self):
        assert mp4_meta_dict(b"") is None
        assert mp4_meta_dict(b"junkjunk") is None
        assert mp4_meta_dict(encode_mp4()[:13]) is None

    def test_truncated_after_ftyp_keeps_parsed_prefix(self):
        b = encode_mp4("dash", 1000, 5000, ("vide",))
        ftyp_len = struct.unpack_from(">I", b, 0)[0]
        m = mp4_meta_dict(b[:ftyp_len + 4])  # moov box truncated away
        assert m["brand"] == "dash" and m["timescale"] is None

    def test_box_walk_stops_on_overrun(self):
        bad = struct.pack(">I", 100) + b"ftyp" + bytes(8)  # claims 100
        assert list(mp4_boxes(bad)) == []


class TestDataFrameOp:
    def test_meta_and_error_row_skip(self, spark):
        rows = [(0, encode_mp4("mp42", 1000, 2500, ("vide", "soun"))),
                (1, b"not a container"),
                (2, None)]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = {r.doc_id: r for r in mp4_meta(df).collect()}
        assert got[0].brand == "mp42" and got[0].duration_ms == 2500.0
        assert got[0].n_video == 1 and got[0].n_audio == 1
        assert got[1].brand is None and got[2].brand is None
        assert len(got) == 3
