"""Real WAV PCM16 codec (the audio leg of the multimodal family).

Round-trip exactness, chunk-walk tolerance of extra RIFF chunks,
profile/truncation validation, and the closed-form waveform contract
the mm_audio_features oracle relies on.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aws_kinesis_data_streams_replicator_spark.operators import multimodal as mm


@pytest.mark.parametrize("n,rate", [(1, 8000), (256, 8000), (767, 44100)])
def test_roundtrip_exact(n, rate):
    pcm = np.random.default_rng(n).integers(
        -32768, 32768, n, dtype=np.int16
    )
    r, out = mm.decode_wav(mm.encode_wav(pcm, rate))
    assert r == rate
    assert (out == pcm).all()


def test_chunk_walk_tolerates_extra_chunks():
    """Real-world WAVs carry LIST/fact chunks between fmt and data —
    the decoder must skip unknown chunks (word-aligned) instead of
    assuming the canonical 44-byte layout."""
    pcm = np.arange(-5, 6, dtype=np.int16)
    payload = mm.encode_wav(pcm, 8000)
    fmt_chunk = payload[12 : 12 + 8 + 16]
    data_chunk = payload[12 + 8 + 16 :]
    extra = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"  # odd+pad
    body = fmt_chunk + extra + data_chunk
    doctored = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    r, out = mm.decode_wav(doctored)
    assert r == 8000
    assert (out == pcm).all()


@pytest.mark.parametrize(
    "mangle,msg",
    [
        (lambda b: b[:8], "not a RIFF"),
        (lambda b: b"JUNK" + b[4:], "not a RIFF"),
        (lambda b: b[:-3], "sample-aligned|truncated"),
        (
            lambda b: b[: 12 + 8] + struct.pack("<H", 2) + b[12 + 8 + 2 :],
            "unsupported WAV profile",
        ),  # audio_format=2 (ADPCM)
        (
            lambda b: b[: 12 + 8 + 2] + struct.pack("<H", 2) + b[12 + 8 + 4 :],
            "unsupported WAV profile",
        ),  # stereo
    ],
)
def test_invalid_payloads_raise(mangle, msg):
    payload = mm.encode_wav(np.arange(16, dtype=np.int16), 8000)
    with pytest.raises(ValueError, match=msg):
        mm.decode_wav(mangle(payload))


def _wav(fmt_body: bytes, data_body: bytes) -> bytes:
    body = (
        struct.pack("<4sI", b"fmt ", len(fmt_body))
        + fmt_body
        + struct.pack("<4sI", b"data", len(data_body))
        + data_body
    )
    return struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body


_FMT_PCM16_MONO = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)


def test_short_fmt_chunk_is_valueerror_not_struct_error():
    """A fmt chunk under 16 bytes used to escape as struct.error —
    outside the ValueError dead-letter contract, so one bad row killed
    the whole micro-batch task instead of being dropped."""
    with pytest.raises(ValueError, match="fmt chunk too short"):
        mm.decode_wav(_wav(_FMT_PCM16_MONO[:10], b"\x01\x00"))


def test_empty_data_chunk_is_dead_lettered():
    """A structurally valid ZERO-SAMPLE WAV passes every profile check;
    without this guard it reached extract_audio_features and divided
    by n=0 (silence_bp), again killing the task instead of the row."""
    with pytest.raises(ValueError, match="empty"):
        mm.decode_wav(_wav(_FMT_PCM16_MONO, b""))


def test_zero_sample_rate_is_dead_lettered():
    fmt = struct.pack("<HHIIHH", 1, 1, 0, 0, 2, 16)
    with pytest.raises(ValueError, match="sample rate"):
        mm.decode_wav(_wav(fmt, b"\x01\x00"))


def test_synthetic_pcm_matches_oracle_closed_form():
    """sample(i) = ((doc_id*37 + i*11) mod 4001) − 2000 — the contract
    the SQL oracle reproduces; a drift here would silently decouple
    the two engines' inputs rather than fail parity."""
    for did in (0, 1, 17, 499):
        n = 256 + (did * 13) % 512
        pcm = mm.synthetic_pcm(did, n)
        i = np.arange(n, dtype=np.int64)
        assert (pcm == ((did * 37 + i * 11) % 4001) - 2000).all()
        assert pcm.dtype == np.int16


def test_feature_extraction_end_to_end(spark):
    """Spark-side pipeline over a tiny frame: decode really runs and
    the integer features match a direct numpy computation."""
    docs = spark.range(4).withColumnRenamed("id", "doc_id")
    rows = {
        r["doc_id"]: r
        for r in mm.extract_audio_features(
            mm.media_with_audio(docs)
        ).collect()
    }
    for did in range(4):
        n = 256 + (did * 13) % 512
        v = mm.synthetic_pcm(did, n).astype(np.int64)
        r = rows[did]
        assert r["n_samples"] == n
        assert r["duration_ms"] == n * 1000 // 8000
        assert r["sum_abs"] == int(np.abs(v).sum())
        assert r["energy"] == int((v * v).sum())
        assert r["zero_crossings"] == int(
            np.count_nonzero(v[:-1] * v[1:] < 0)
        )
        assert r["silence_bp"] == int(
            np.count_nonzero(np.abs(v) < 200)
        ) * 10000 // n
