"""Audio energy fingerprints (operators/audiohash.py): closed-form
bits, two's-complement packing, cross-bit-depth invariance (the same
signal as 8-bit and 16-bit PCM decodes to identical dyadic amplitudes
→ identical hash), decode tolerance, and block-join parity."""

from __future__ import annotations

import itertools
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from duplicate_finder_spark.config import PipelineConfig
from duplicate_finder_spark.operators.audiohash import (
    audio_fingerprint64, audio_hashes, audio_neardup_pairs)


def _wav(qs, bits=8, rate=8000, reps=2) -> bytes:
    """qs: per-window amplitude quanta (0..127); amplitude = q/128."""
    if bits == 8:
        data = bytes(128 + q for q in qs for _ in range(reps))
    else:
        data = b"".join(struct.pack("<h", 256 * q)
                        for q in qs for _ in range(reps))
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * bits // 8,
                      bits // 8, bits)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(data)) + data)
    return (b"RIFF" + struct.pack("<I", 4 + len(chunks))
            + b"WAVE" + chunks)


def test_fingerprint_closed_form_half_loud():
    # first 32 windows loud, last 32 silent → top 32 bits set
    sig = np.array([1.0] * 32 + [0.0] * 32)
    h = audio_fingerprint64(sig)
    assert h == -(1 << 63) + ((1 << 63) - (1 << 32))  # bits 63..32


def test_fingerprint_uniform_all_bits():
    assert audio_fingerprint64(np.full(64, 0.25)) == -1


def test_fingerprint_rejects_short_clips():
    with pytest.raises(ValueError, match="shorter"):
        audio_fingerprint64(np.zeros(63))


def test_cross_bit_depth_identity_and_tolerance(spark):
    rng = np.random.RandomState(5)
    qs = [int(q) for q in rng.randint(0, 128, size=64)]
    rows = [(1, bytearray(_wav(qs, bits=8))),
            (2, bytearray(_wav(qs, bits=16))),
            (3, bytearray(b"RIFFjunkWAVEnope")),
            (4, bytearray(_wav(qs[:16], reps=1)))]   # 16 samples < 64
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r.ahash for r in audio_hashes(df).collect()}
    assert sorted(got) == [1, 2]
    expected = audio_fingerprint64(np.repeat(np.array(qs) / 128.0, 2))
    assert got[1] == got[2] == expected


def test_block_join_matches_brute_force(spark):
    rng = np.random.RandomState(13)
    clips = {i: [int(q) for q in rng.randint(0, 128, size=64)]
             for i in range(40)}
    clips[30] = list(clips[4])                        # exact clone
    hs = {i: audio_fingerprint64(np.repeat(np.array(v) / 128.0, 2))
          for i, v in clips.items()}
    want = {(a, b, bin(hs[a] ^ hs[b]).count("1"))
            for a, b in itertools.combinations(sorted(hs), 2)
            if bin(hs[a] ^ hs[b]).count("1") <= 3}
    df = spark.createDataFrame(
        [(i, bytearray(_wav(v))) for i, v in clips.items()],
        "doc_id long, payload binary")
    out = audio_neardup_pairs(audio_hashes(df), PipelineConfig())
    got = {(r.doc_id_a, r.doc_id_b, r.hamming) for r in out.collect()}
    assert got == want
    assert (4, 30, 0) in got
