"""RIFF/AVI MJPEG container tests (operators/avicodec.py) and the real
sample_frames branch."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from duplicate_finder_spark.operators.avicodec import (encode_avi_mjpeg,
                                                       parse_avi_frames,
                                                       sample_indices)
from duplicate_finder_spark.operators.jpegcodec import decode_jpeg


def _solid_frames(n: int, h: int = 8, w: int = 10) -> list[np.ndarray]:
    return [np.full((h, w, 3), ((i * 40) % 256, 20, (200 - i * 30) % 256),
                    np.uint8) for i in range(n)]


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 9), st.integers(1, 3), st.integers(1, 3))
def test_avi_roundtrip_every_frame_decodes(n, hb, wb):
    """encode_avi_mjpeg → parse_avi_frames yields n JPEG payloads that
    each decode to the original solid frame within the JPEG bound."""
    frames = _solid_frames(n, 8 * hb, 8 * wb)
    got = parse_avi_frames(encode_avi_mjpeg(frames, quality=90))
    assert got is not None and len(got) == n
    for payload, orig in zip(got, frames):
        img = decode_jpeg(payload)
        assert img is not None and img.shape == orig.shape
        assert np.abs(img.astype(int) - orig.astype(int)).max() <= 2


def test_sample_indices_even_and_closed_form():
    assert sample_indices(7, 4) == [0, 1, 3, 5]
    assert sample_indices(2, 4) == [0, 1]
    assert sample_indices(10, 3) == [0, 3, 6]
    assert sample_indices(1, 4) == [0]
    # closed form the DuckDB oracle mirrors: i*n//m
    for n in range(1, 20):
        for m_cap in range(1, 6):
            m = min(m_cap, n)
            assert sample_indices(n, m_cap) == [i * n // m
                                                for i in range(m)]


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=200))
def test_parse_avi_garbage_never_raises(tail):
    out = parse_avi_frames(b"RIFF" + tail)
    assert out is None or all(isinstance(f, bytes) for f in out)


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 500))
def test_parse_avi_truncation_never_raises(cut):
    avi = encode_avi_mjpeg(_solid_frames(3))
    out = parse_avi_frames(avi[:cut])
    assert out is None or all(isinstance(f, bytes) for f in out)


def test_sample_frames_real_branch(spark):
    """sample_frames extracts REAL frames from MJPEG-AVI payloads
    (source frame_no, decodable JPEG payloads) and still stub-slices
    non-AVI bytes."""
    import pandas as pd

    from duplicate_finder_spark.operators.multimodal import sample_frames

    frames = _solid_frames(7)
    avi = encode_avi_mjpeg(frames, quality=90)
    pdf = pd.DataFrame({"doc_id": [1, 2],
                        "payload": [avi, b"\x00" * 256]})
    df = spark.createDataFrame(pdf)
    out = sample_frames(df, max_frames=4).toPandas()
    real = out[out.doc_id == 1].sort_values("frame_no")
    assert list(real.frame_no) == [0, 1, 3, 5]
    for fno, payload in zip(real.frame_no, real.frame):
        img = decode_jpeg(bytes(payload))
        assert img is not None
        assert np.abs(img.astype(int)
                      - frames[fno].astype(int)).max() <= 2
    stub = out[out.doc_id == 2]
    assert len(stub) == 4 and set(stub.frame_no) == {0, 1, 2, 3}
