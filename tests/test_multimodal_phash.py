"""Perceptual image hashing (operators/multimodal.py): the aHash must
collapse byte-distinct near-duplicates (same class, different noise)
without ever flipping a bit on the +-3 pixel noise."""

from __future__ import annotations

import numpy as np

from aws_kinesis_data_streams_replicator_spark.operators.multimodal import (
    decode_image,
    encode_bmp,
    encode_ppm,
    extract_image_phash,
    media_with_image_variants,
    phash_dup_groups,
    variant_pixels,
)


def _phash_ref(rgb: np.ndarray) -> int:
    """Independent reference aHash (plain loops, float means)."""
    h, w, _ = rgb.shape
    lum = rgb.astype(np.int64).sum(axis=2)
    total_mean = lum.mean()
    bits = 0
    for gi in range(4):
        for gj in range(4):
            rows = [r for r in range(h) if r * 4 // h == gi]
            cols = [c for c in range(w) if c * 4 // w == gj]
            cell = lum[np.ix_(rows, cols)]
            if cell.mean() > total_mean:
                bits |= 1 << (gi * 4 + gj)
    return bits


def test_phash_matches_float_reference_and_survives_roundtrip(spark):
    for did in [0, 1, 63, 64, 127, 500]:
        cls = did % 64
        w, h = 8 + cls % 9, 8 + (cls * 5) % 7
        rgb = variant_pixels(did, cls, w, h)
        payload = encode_bmp(rgb) if did % 2 == 0 else encode_ppm(rgb)
        dw, dh, decoded = decode_image(payload)
        assert (dw, dh) == (w, h) and (decoded == rgb).all()
        # the integer cross-multiplied hash == the float-mean reference
        # (margins are ~40x the noise, so no tie ambiguity)
        lum = decoded.astype(np.int64).sum(axis=2)
        gi = np.arange(h) * 4 // h
        gj = np.arange(w) * 4 // w
        cell = gi[:, None] * 4 + gj[None, :]
        sums = np.zeros(16, dtype=np.int64)
        np.add.at(sums, cell.ravel(), lum.ravel())
        pix = np.bincount(cell.ravel(), minlength=16)
        bits = sums * (w * h) > int(lum.sum()) * pix
        got = int((bits * (1 << np.arange(16))).sum())
        assert got == _phash_ref(rgb), did


def test_same_class_docs_collapse_but_are_byte_distinct(spark):
    docs = spark.sql(
        "SELECT CAST(i AS BIGINT) AS doc_id FROM range(0, 200) t(i)"
    )
    media = media_with_image_variants(docs)
    rows = extract_image_phash(media).collect()
    by_class: dict[int, set] = {}
    checks: dict[int, set] = {}
    for r in rows:
        cls = r["doc_id"] % 64
        by_class.setdefault(cls, set()).add(
            (r["width"], r["height"], r["phash"])
        )
        checks.setdefault(cls, set()).add(r["pixel_checksum"])
    # noise never flips a hash bit: one (w, h, phash) per class...
    assert all(len(v) == 1 for v in by_class.values())
    # ...and distinct classes never collide on it
    keys = [next(iter(v)) for v in by_class.values()]
    assert len(set(keys)) == len(keys)
    # but the members are genuine byte-variants, not exact dups
    assert sum(len(v) for v in checks.values()) > 64

    groups = phash_dup_groups(media).collect()
    assert len(groups) == 64
    assert all(g["n_variants"] >= 2 for g in groups)
