"""Real BMP/PPM codecs (round-6: the multimodal decode stub is retired).

Round-trip exactness, cross-format agreement, header validation, and
the closed-form pixel contract the mm_feature_extract oracle relies on.
"""

from __future__ import annotations

import numpy as np
import pytest

from aws_kinesis_data_streams_replicator_spark.operators import multimodal as mm


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (4, 4), (13, 7), (16, 14)])
def test_roundtrip_exact_both_formats(w, h):
    rng = np.random.default_rng(w * 100 + h)
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    for enc in (mm.encode_bmp, mm.encode_ppm):
        w2, h2, out = mm.decode_image(enc(rgb))
        assert (w2, h2) == (w, h)
        assert (out == rgb).all(), enc.__name__


def test_bmp_row_padding_is_handled():
    # w=3 -> 9-byte rows padded to 12: decoder must strip 3 pad bytes/row
    rgb = np.arange(3 * 5 * 3, dtype=np.uint8).reshape(5, 3, 3)
    payload = mm.encode_bmp(rgb)
    assert (len(payload) - 54) == 12 * 5
    _, _, out = mm.decode_image(payload)
    assert (out == rgb).all()


def test_bmp_topdown_negative_height():
    import struct

    rgb = np.random.default_rng(7).integers(0, 256, (4, 4, 3), dtype=np.uint8)
    b = bytearray(mm.encode_bmp(rgb))
    # flip to top-down storage: negate height, un-flip the rows
    struct.pack_into("<i", b, 22, -4)
    rows = np.frombuffer(bytes(b[54:]), dtype=np.uint8).reshape(4, 12)
    b[54:] = rows[::-1].tobytes()
    _, _, out = mm.decode_image(bytes(b))
    assert (out == rgb).all()


@pytest.mark.parametrize(
    "payload",
    [
        b"XXnot an image",
        b"P6\n3 3\n254\n" + b"\0" * 27,  # wrong maxval
        b"P6\n3 3\n255\n" + b"\0" * 10,  # truncated pixels
        b"BM" + b"\0" * 20,  # truncated headers
    ],
)
def test_invalid_payloads_raise(payload):
    with pytest.raises(ValueError):
        mm.decode_image(payload)


def test_negative_dimensions_rejected():
    import struct

    rgb = np.zeros((2, 2, 3), dtype=np.uint8)
    b = bytearray(mm.encode_bmp(rgb))
    struct.pack_into("<i", b, 18, -5)  # negative width
    with pytest.raises(ValueError, match="invalid BMP dimensions"):
        mm.decode_image(bytes(b))
    with pytest.raises(ValueError, match="invalid PPM dimensions"):
        mm.decode_image(b"P6\n-3 2\n255\n" + b"\0" * 18)


def test_bmp_unsupported_profile_rejected():
    import struct

    rgb = np.zeros((2, 2, 3), dtype=np.uint8)
    b = bytearray(mm.encode_bmp(rgb))
    struct.pack_into("<H", b, 28, 8)  # claim 8bpp
    with pytest.raises(ValueError, match="unsupported BMP profile"):
        mm.decode_image(bytes(b))


def test_synthetic_pixels_match_oracle_formula():
    did = 4242
    w, h = 4 + did % 13, 4 + (did * 7) % 11
    rgb = mm.synthetic_pixels(did, w, h)
    j = np.arange(w * h * 3, dtype=np.int64)
    expect = (did * 73 + (j // 3) * 7 + (j % 3) * 151) % 256
    assert (rgb.reshape(-1) == expect).all()


def test_extract_image_features_end_to_end(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    feats = mm.extract_image_features(mm.media_with_images(docs)).collect()
    assert len(feats) == 20
    for r in feats:
        w = 4 + r.doc_id % 13
        h = 4 + (r.doc_id * 7) % 11
        assert (r.width, r.height) == (w, h)
        rgb = mm.synthetic_pixels(r.doc_id, w, h)
        assert r.sum_r == int(rgb[:, :, 0].sum())
        flat = rgb.reshape(-1).astype(np.int64)
        assert r.weighted_checksum == int(
            (flat * np.arange(1, flat.size + 1)).sum()
        )


# ---- property-based: any image round-trips through both codecs ----

try:
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=40),
        h=st.integers(min_value=1, max_value=40),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_property_roundtrip_any_dims(w, h, seed):
        rng = np.random.default_rng(seed)
        rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for enc in (mm.encode_bmp, mm.encode_ppm):
            w2, h2, out = mm.decode_image(enc(rgb))
            assert (w2, h2) == (w, h)
            assert (out == rgb).all()

    @settings(max_examples=80, deadline=None)
    @given(
        prefix=st.sampled_from([b"", b"BM", b"P6", b"P6\n"]),
        payload=st.binary(max_size=200),
    )
    def test_property_arbitrary_bytes_never_crash_undetected(prefix, payload):
        """Arbitrary bytes — including ones that pass the magic-number
        sniff — either decode to a consistent image or raise ValueError,
        never an unhandled numpy/struct error (the dead-letter contract
        for corrupt media rows)."""
        try:
            w, h, rgb = mm.decode_image(prefix + payload)
        except ValueError:
            return
        assert rgb.shape == (h, w, 3)
except ImportError:  # hypothesis not installed
    pass
