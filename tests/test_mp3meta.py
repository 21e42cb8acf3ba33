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


class TestIntegrity:
    """Round-5 provable extensions: CRC-16 protection, side-info bit
    layout, Xing header (operators/mp3meta.py)."""

    def test_crc16_external_anchor(self):
        # CRC-16/CMS published check value — an EXTERNAL truth, so the
        # kernel is not merely writer/checker self-consistent
        from duplicate_finder_spark.operators.mp3meta import crc16_mpeg
        assert crc16_mpeg(b"123456789") == 0xAEE7
        assert crc16_mpeg(b"") == 0xFFFF

    def test_side_info_roundtrip(self):
        from duplicate_finder_spark.operators.mp3meta import (
            pack_side_info_mono, parse_side_info_mono)
        g0 = dict(part2_3_length=1234, big_values=288, global_gain=210,
                  scalefac_compress=9, table_select=(7, 13, 24),
                  region0_count=5, region1_count=4, preflag=1,
                  scalefac_scale=1, count1table_select=1)
        g1 = dict(part2_3_length=4095, big_values=511, global_gain=255,
                  scalefac_compress=15, table_select=(31, 0, 1))
        b = pack_side_info_mono(main_data_begin=345, scfsi=0b1010,
                                granules=[g0, g1])
        assert len(b) == 17
        si = parse_side_info_mono(b)
        assert si["main_data_begin"] == 345
        assert si["scfsi"] == 0b1010
        assert si["granules"][0]["part2_3_length"] == 1234
        assert si["granules"][0]["table_select"] == (7, 13, 24)
        assert si["granules"][0]["region0_count"] == 5
        assert si["granules"][0]["preflag"] == 1
        assert si["granules"][1]["big_values"] == 511
        assert si["granules"][1]["count1table_select"] == 0

    def test_protected_stream_crc_verifies(self):
        from duplicate_finder_spark.operators.mp3meta import (
            mp3_frame_walk_integrity)
        b = encode_mp3_stream([(9, 0)] * 4, protection=True)
        m = mp3_frame_walk_integrity(b)
        assert m["n_frames"] == 4
        assert m["protected_frames"] == 4
        assert m["crc_ok_frames"] == 4

    def test_corrupt_crc_detected_per_frame(self):
        from duplicate_finder_spark.operators.mp3meta import (
            mp3_frame_walk_integrity)
        b = encode_mp3_stream([(9, 0)] * 4, protection=True,
                              corrupt_crc_frames=(1, 3))
        m = mp3_frame_walk_integrity(b)
        assert m["protected_frames"] == 4
        assert m["crc_ok_frames"] == 2

    def test_unprotected_stream_has_zero_protected(self):
        from duplicate_finder_spark.operators.mp3meta import (
            mp3_frame_walk_integrity)
        m = mp3_frame_walk_integrity(encode_mp3_stream([(9, 1)] * 3))
        assert m["protected_frames"] == 0
        assert m["crc_ok_frames"] == 0
        assert m["reservoir_frames"] == 0

    def test_bit_reservoir_counted(self):
        from duplicate_finder_spark.operators.mp3meta import (
            mp3_frame_walk_integrity)
        side = [dict(main_data_begin=0), dict(main_data_begin=200),
                dict(main_data_begin=511)]
        m = mp3_frame_walk_integrity(
            encode_mp3_stream([(9, 0)] * 3, side_infos=side))
        assert m["reservoir_frames"] == 2
        assert m["max_main_data_begin"] == 511

    def test_xing_header_parsed_in_first_frame_only(self):
        from duplicate_finder_spark.operators.mp3meta import (
            mp3_frame_walk_integrity)
        b = encode_mp3_stream([(9, 0)] * 5, xing_frames=5)
        m = mp3_frame_walk_integrity(b)
        assert m["has_xing"] is True
        assert m["xing_frames"] == 5
        m2 = mp3_frame_walk_integrity(encode_mp3_stream([(9, 0)] * 5))
        assert m2["has_xing"] is False and m2["xing_frames"] is None

    def test_crc_and_side_info_do_not_change_stream_meta(self):
        # the metadata walk must agree with the integrity walk's frame
        # accounting on protected, reservoir-using streams
        b = encode_mp3_stream(
            [(9, 0)] * 3, protection=True,
            side_infos=[dict(main_data_begin=100)] * 3, xing_frames=3)
        m = mp3_frames(b)
        assert m["n_frames"] == 3
        assert m["bitrate_kbps"] == 128.0

    def test_integrity_operator_and_error_rows(self, spark):
        from duplicate_finder_spark.operators.mp3meta import (
            mp3_frame_integrity)
        good = encode_mp3_stream([(9, 0)] * 2, protection=True)
        rows = [(1, bytearray(good)), (2, bytearray(b"not an mp3")),
                (3, None)]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = {r["doc_id"]: r for r in mp3_frame_integrity(df).collect()}
        assert got[1]["n_frames"] == 2 and got[1]["crc_ok_frames"] == 2
        assert got[2]["n_frames"] is None
        assert got[3]["n_frames"] is None


class TestStereoSideInfo:
    """r5 ADVICE: MPEG-1 Layer III stereo/joint/dual frames carry
    32-byte side info; the walk must size the CRC span and the Xing
    offset from the channel-mode bits instead of mis-parsing every
    non-mono frame as mono."""

    @staticmethod
    def _stereo_frame(mdb=0, protection=True, xing_frames=None,
                      corrupt_crc=False):
        from duplicate_finder_spark.operators.mp3meta import crc16_mpeg
        bri, sri = 9, 0                      # 128 kbps / 44100 Hz
        flen = (144 * 128 * 1000) // 44100   # 417 bytes
        hdr = bytes([0xFF, 0xFA if protection else 0xFB,
                     (bri << 4) | (sri << 2), 0x00])  # mode 0 = stereo
        si = bytearray(32)
        si[0] = (mdb >> 1) & 0xFF
        si[1] = (mdb & 1) << 7
        body = bytearray()
        if protection:
            crc = crc16_mpeg(hdr[2:4] + bytes(si))
            if corrupt_crc:
                crc ^= 0xFFFF
            body += bytes([crc >> 8, crc & 0xFF])
        body += si
        if xing_frames is not None:
            body += (b"Xing" + (1).to_bytes(4, "big")
                     + int(xing_frames).to_bytes(4, "big"))
        assert len(body) + 4 <= flen
        return hdr + bytes(body) + bytes(flen - 4 - len(body))

    def test_stereo_crc_span_is_32_bytes(self):
        from duplicate_finder_spark.operators.mp3meta import (
            mp3_frame_walk_integrity)
        b = self._stereo_frame() + self._stereo_frame()
        m = mp3_frame_walk_integrity(b)
        assert m["n_frames"] == 2
        assert m["protected_frames"] == 2
        assert m["crc_ok_frames"] == 2

    def test_stereo_corrupt_crc_detected(self):
        from duplicate_finder_spark.operators.mp3meta import (
            mp3_frame_walk_integrity)
        b = self._stereo_frame() + self._stereo_frame(corrupt_crc=True)
        m = mp3_frame_walk_integrity(b)
        assert m["crc_ok_frames"] == 1

    def test_stereo_main_data_begin_first_9_bits(self):
        from duplicate_finder_spark.operators.mp3meta import (
            mp3_frame_walk_integrity)
        b = self._stereo_frame(mdb=345) + self._stereo_frame(mdb=0)
        m = mp3_frame_walk_integrity(b)
        assert m["reservoir_frames"] == 1
        assert m["max_main_data_begin"] == 345

    def test_stereo_xing_found_after_32_byte_side_info(self):
        from duplicate_finder_spark.operators.mp3meta import (
            mp3_frame_walk_integrity)
        b = self._stereo_frame(xing_frames=7) + self._stereo_frame()
        m = mp3_frame_walk_integrity(b)
        assert m["has_xing"] is True
        assert m["xing_frames"] == 7

    def test_mixed_mono_and_stereo_stream(self):
        from duplicate_finder_spark.operators.mp3meta import (
            encode_mp3_stream, mp3_frame_walk_integrity)
        mono = encode_mp3_stream([(9, 0)] * 2, protection=True)
        m = mp3_frame_walk_integrity(mono + self._stereo_frame())
        assert m["n_frames"] == 3
        assert m["crc_ok_frames"] == 3
