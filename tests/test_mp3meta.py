"""Unit tests for operators/mp3meta.py (MPEG-1 Layer III frame walk)."""

import pytest

from duplicate_finder_spark.operators.mp3meta import (
    BITRATES_KBPS, encode_mp3_stream, mp3_frames, mp3_stream_meta)


class TestParser:
    def test_cbr_roundtrip_every_bitrate(self):
        for bri in range(1, 15):
            m = mp3_frames(encode_mp3_stream([(bri, 0)] * 3))
            assert m["n_frames"] == 3
            assert m["bitrate_kbps"] == float(BITRATES_KBPS[bri])
            assert m["vbr"] is False
            assert m["sample_rate"] == 44100

    def test_every_sample_rate(self):
        for sri, rate in ((0, 44100), (1, 48000), (2, 32000)):
            m = mp3_frames(encode_mp3_stream([(9, 0)] * 2, sri=sri))
            assert m["sample_rate"] == rate
            assert m["duration_ms"] == round(2 * 1152 * 1000.0 / rate, 3)

    def test_vbr_detected_and_averaged(self):
        m = mp3_frames(encode_mp3_stream([(1, 0), (14, 0), (1, 0)]))
        assert m["vbr"] is True
        assert m["bitrate_kbps"] == round((32 + 320 + 32) / 3, 6)

    def test_padding_changes_length_not_metadata(self):
        a = encode_mp3_stream([(9, 0)] * 4)
        b = encode_mp3_stream([(9, 1)] * 4)
        assert len(b) == len(a) + 4
        assert mp3_frames(a) == mp3_frames(b)

    def test_id3_and_junk_skipped(self):
        plain = mp3_frames(encode_mp3_stream([(9, 0)] * 3))
        tagged = mp3_frames(encode_mp3_stream([(9, 0)] * 3, id3_size=40))
        junked = mp3_frames(encode_mp3_stream([(9, 0)] * 3, junk_prefix=7))
        assert plain == tagged == junked

    def test_truncated_tail_frame_dropped(self):
        b = encode_mp3_stream([(9, 0)] * 3)
        assert mp3_frames(b[:-1])["n_frames"] == 2

    def test_mid_stream_junk_resynced(self):
        one = encode_mp3_stream([(9, 0)])
        m = mp3_frames(one + b"\x01\x02\x03garbage" + one)
        assert m["n_frames"] == 2

    def test_garbage_and_empty_return_none(self):
        assert mp3_frames(b"") is None
        assert mp3_frames(b"ID3") is None
        assert mp3_frames(b"definitely not audio" * 10) is None
        # sync-like bytes with invalid bitrate index (0xF) are not frames
        assert mp3_frames(bytes([0xFF, 0xFB, 0xF0, 0xC0]) * 4) is None

    def test_writer_rejects_invalid_index(self):
        with pytest.raises(ValueError):
            encode_mp3_stream([(0, 0)])


class TestDataFrameOp:
    def test_meta_and_error_row_skip(self, spark):
        rows = [(0, encode_mp3_stream([(9, 0)] * 4)),
                (1, b"not an mp3"),
                (2, None),
                (3, encode_mp3_stream([(1, 0), (14, 0)], id3_size=10))]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = {r.doc_id: r for r in mp3_stream_meta(df).collect()}
        assert got[0].n_frames == 4 and got[0].vbr is False
        assert got[0].bitrate_kbps == 128.0
        assert got[1].n_frames is None  # junk → null-metadata row
        assert got[2].n_frames is None  # null payload → null-metadata row
        assert got[3].vbr is True and got[3].n_frames == 2
        assert len(got) == 4
