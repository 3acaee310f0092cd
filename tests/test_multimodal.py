"""Decoder unit tests for the dependency-free PPM/BMP parsers —
covering what the driver-data oracle can't reach: padded BMP rows
(width not a multiple of 4), top-down BMPs (negative height), header
comments/whitespace, and the unknown-format dispatch error."""

from __future__ import annotations

import numpy as np
import pytest

from xsarsea_spark.pipeline.multimodal import (decode_bmp, decode_image,
                                               decode_ppm)


def _pixels(w: int, h: int) -> np.ndarray:
    rng = np.random.default_rng(1234)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _encode_ppm(img: np.ndarray, header: bytes | None = None) -> bytes:
    h, w = img.shape[:2]
    head = header or f"P6\n{w} {h}\n255\n".encode()
    return head + img.tobytes()


def _encode_bmp(img: np.ndarray, top_down: bool = False) -> bytes:
    h, w = img.shape[:2]
    stride = (w * 3 + 3) // 4 * 4
    rows = img if top_down else img[::-1]
    raster = b"".join(
        rows[r, :, ::-1].tobytes() + b"\x00" * (stride - w * 3)
        for r in range(h))
    hh = -h if top_down else h
    return (b"BM" + (54 + len(raster)).to_bytes(4, "little")
            + b"\x00" * 4 + (54).to_bytes(4, "little")
            + (40).to_bytes(4, "little")
            + w.to_bytes(4, "little", signed=True)
            + hh.to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
            + (0).to_bytes(4, "little")
            + len(raster).to_bytes(4, "little") + b"\x00" * 16
            + raster)


def test_ppm_roundtrip_with_comments_and_whitespace():
    img = _pixels(7, 3)
    plain = _encode_ppm(img)
    commented = _encode_ppm(
        img, b"P6 # inline\n# full comment line\n  7\t3 # dims\n255\n")
    np.testing.assert_array_equal(decode_ppm(plain), img)
    np.testing.assert_array_equal(decode_ppm(commented), img)


@pytest.mark.parametrize("w,h", [(5, 4), (16, 8), (3, 1), (6, 5)])
@pytest.mark.parametrize("top_down", [False, True])
def test_bmp_roundtrip_padded_and_orientation(w, h, top_down):
    img = _pixels(w, h)
    np.testing.assert_array_equal(
        decode_bmp(_encode_bmp(img, top_down=top_down)), img)


def test_bmp_and_ppm_decode_to_identical_pixels():
    img = _pixels(5, 4)
    np.testing.assert_array_equal(
        decode_image(_encode_ppm(img)), decode_image(_encode_bmp(img)))


def test_unknown_magic_raises():
    # WebP remains unsupported (PPM/BMP/JPEG/PNG/GIF decode
    # dependency-free)
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")


def test_unsupported_variants_raise():
    img = _pixels(4, 2)
    bad_maxval = b"P6\n4 2\n65535\n" + img.tobytes() * 2
    with pytest.raises(ValueError):
        decode_ppm(bad_maxval)
    bmp = bytearray(_encode_bmp(img))
    bmp[28:30] = (8).to_bytes(2, "little")       # 8 bpp unsupported
    with pytest.raises(ValueError):
        decode_bmp(bytes(bmp))


def test_ahash_planted_patterns(spark):
    from xsarsea_spark.pipeline.multimodal import ahash_features

    # uniform image: no block STRICTLY exceeds the global mean -> 0
    flat = np.full((8, 16, 3), 100, dtype=np.uint8)
    # left half bright: blocks at grid columns 0-3 set (rows all),
    # LSB-first packing -> bits k where k % 8 < 4
    half = np.zeros((8, 16, 3), dtype=np.uint8)
    half[:, :8, :] = 255
    want_half = sum(1 << k for k in range(32) if k % 8 < 4)
    df = spark.createDataFrame(
        [(1, bytearray(_encode_ppm(flat))),
         (2, bytearray(_encode_bmp(half)))],
        "doc_id long, payload binary")
    got = {r["doc_id"]: r["ahash"]
           for r in ahash_features(df).collect()}
    assert got[1] == 0
    assert got[2] == want_half


def test_phash_planted_transforms(spark):
    """The DCT pHash's exact integer invariances: a uniform
    brightness shift moves only the (excluded) DC coefficient, and a
    positive contrast scale multiplies AC coefficients and median
    alike — both must leave the hash EXACTLY unchanged, while a
    different image must not collide."""
    from xsarsea_spark.pipeline.multimodal import phash_features

    rng = np.random.default_rng(7)
    base = rng.integers(40, 80, size=(8, 16, 3)).astype(np.uint8)
    brighter = (base.astype(np.int64) + 25).astype(np.uint8)   # <= 104
    contrast = (base.astype(np.int64) * 2).astype(np.uint8)    # <= 158
    other = rng.integers(0, 256, size=(8, 16, 3)).astype(np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(_encode_ppm(base))),
         (2, bytearray(_encode_ppm(brighter))),
         (3, bytearray(_encode_bmp(contrast))),
         (4, bytearray(_encode_ppm(other)))],
        "doc_id long, payload binary")
    got = {r["doc_id"]: r["phash"]
           for r in phash_features(df).collect()}
    assert got[2] == got[1], "brightness shift must not move the pHash"
    assert got[3] == got[1], "contrast scale must not move the pHash"
    assert got[4] != got[1], "distinct images must not collide"
    # bit 0 (the DC position) is never set; hash fits in 32 bits
    assert all(0 <= v < (1 << 32) and v % 2 == 0 for v in got.values())


def test_phash_dct_rows_cancel():
    """The rounded fixed-point DCT matrices keep the exact AC-row
    zero sums the brightness invariance proof relies on."""
    from xsarsea_spark.pipeline.multimodal import dct_int

    for n in (4, 8):
        c = dct_int(n)
        assert (c[1:].sum(axis=1) == 0).all()
        # DC row is the constant row: all entries equal and positive
        assert len(set(c[0].tolist())) == 1 and c[0, 0] > 0


def test_audio_fingerprint_invariances():
    """Amplitude scaling by a positive integer scales every band
    energy by its square, so no comparison bit can flip; distinct
    spectral content must produce distinct fingerprints; and the
    value stays inside the 60-bit budget (bit 63 never set)."""
    import numpy as np

    from xsarsea_spark.pipeline.audio import audio_fingerprint

    base = ((np.arange(256) * 37) % 101 - 50).astype(np.int64) * 100
    f = audio_fingerprint(base)
    assert f == audio_fingerprint(base * 3)
    assert f == audio_fingerprint(base * 7)
    assert 0 <= f < (1 << 60)
    # a pure low-frequency tone vs a high-frequency one: different
    # band-energy ladders -> different hashes
    i = np.arange(256)
    lo = np.round(3000 * np.sin(2 * np.pi * 2 * i / 64)).astype(
        np.int64)
    hi = np.round(3000 * np.sin(2 * np.pi * 13 * i / 64)).astype(
        np.int64)
    assert audio_fingerprint(lo) != audio_fingerprint(hi)
