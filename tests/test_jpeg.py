"""Baseline JPEG codec: round-trip fidelity, structural features
(subsampling, restart markers, odd dimensions, grayscale, 16-bit
quant tables), and the progressive/garbage gates."""

from __future__ import annotations

import numpy as np
import pytest

from xsarsea_spark.pipeline.jpeg import (
    _ZZ,
    _canonical_codes,
    _decode_table,
    decode_jpeg,
    encode_jpeg,
)


def _smooth(h: int, w: int, seed: int = 0) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([
        128 + 60 * np.sin(xx / 9 + seed) + 40 * np.cos(yy / 7),
        100 + 2.0 * xx - 1.0 * yy,
        80 + 50 * np.cos((xx + yy) / 11),
    ], axis=-1)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_zigzag_is_standard():
    # spot-check against the published order: first and last diagonal
    assert list(_ZZ[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert list(_ZZ[-4:]) == [47, 55, 62, 63]
    assert sorted(_ZZ) == list(range(64))


def test_huffman_tables_are_prefix_free():
    from xsarsea_spark.pipeline.jpeg import (_AC_CHR, _AC_LUM, _DC_CHR,
                                             _DC_LUM)
    for bits, vals in (_DC_LUM, _DC_CHR, _AC_LUM, _AC_CHR):
        assert sum(bits) == len(vals)
        codes = _canonical_codes(bits, vals)
        seen = set()
        for sym, (code, ln) in codes.items():
            assert code < (1 << ln)
            # prefix-freedom: no code is a prefix of another
            for sym2, (code2, ln2) in codes.items():
                if sym2 == sym:
                    continue
                if ln2 >= ln:
                    assert (code2 >> (ln2 - ln)) != code
            seen.add((ln, code))
        assert _decode_table(bits, vals) == {
            (ln, cd): sym for sym, (cd, ln) in codes.items()}


@pytest.mark.parametrize("quality,sub,tol_max,tol_mean", [
    (95, "444", 8, 1.5),
    (85, "444", 16, 2.5),
    (95, "420", 16, 3.0),
    (75, "420", 32, 5.0),
])
def test_roundtrip_fidelity(quality, sub, tol_max, tol_mean):
    img = _smooth(40, 56)
    dec = decode_jpeg(encode_jpeg(img, quality=quality, subsample=sub))
    assert dec.shape == img.shape and dec.dtype == np.uint8
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= tol_max
    assert err.mean() <= tol_mean


@pytest.mark.parametrize("h,w", [(8, 8), (7, 5), (17, 23), (16, 33)])
def test_odd_dimensions(h, w):
    """Non-multiple-of-MCU sizes decode to the exact original shape
    in both subsampling modes (edge padding must be cropped)."""
    img = _smooth(h, w, seed=2)
    for sub in ("444", "420"):
        dec = decode_jpeg(encode_jpeg(img, quality=92, subsample=sub))
        assert dec.shape == (h, w, 3)
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.mean() <= 4.0


def test_grayscale_roundtrip():
    g = _smooth(24, 24)[:, :, 0]
    dec = decode_jpeg(encode_jpeg(g, quality=90))
    assert dec.shape == (24, 24, 3)
    # all three output channels replicate Y
    np.testing.assert_array_equal(dec[:, :, 0], dec[:, :, 1])
    err = np.abs(dec[:, :, 0].astype(int) - g.astype(int))
    assert err.max() <= 4


def test_restart_markers_roundtrip():
    img = _smooth(32, 48, seed=1)
    plain = decode_jpeg(encode_jpeg(img, quality=90, subsample="420"))
    enc = encode_jpeg(img, quality=90, subsample="420", restart=2)
    assert b"\xff\xdd" in enc and b"\xff\xd0" in enc  # DRI + RST0
    with_rst = decode_jpeg(enc)
    # restart markers change framing, not values
    np.testing.assert_array_equal(plain, with_rst)


def test_sixteen_bit_quant_table():
    """Decoder handles precision-1 DQT segments (values > 255)."""
    img = _smooth(16, 16, seed=3)
    enc = bytearray(encode_jpeg(img, quality=90))
    # rewrite the luminance DQT as a 16-bit table with the same values
    i = enc.index(b"\xff\xdb")
    ln = int.from_bytes(enc[i + 2:i + 4], "big")
    assert ln == 67
    vals = enc[i + 5:i + 69]
    wide = b"".join(int(v).to_bytes(2, "big") for v in vals)
    new = (b"\xff\xdb" + (2 + 1 + 128).to_bytes(2, "big")
           + bytes([0x10]) + wide)
    patched = bytes(enc[:i]) + new + bytes(enc[i + 2 + ln:])
    np.testing.assert_array_equal(decode_jpeg(bytes(enc)),
                                  decode_jpeg(patched))


def test_progressive_rejected():
    img = _smooth(8, 8)
    enc = bytearray(encode_jpeg(img))
    i = enc.index(b"\xff\xc0")
    enc[i + 1] = 0xC2                       # masquerade as SOF2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(enc))


def test_garbage_rejected():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")    # SOI+EOI, no frame
    img = _smooth(16, 16)
    enc = encode_jpeg(img)
    with pytest.raises(ValueError):
        decode_jpeg(enc[: len(enc) // 2])   # truncated entropy stream


def test_decode_image_dispatches_jpeg():
    from xsarsea_spark.pipeline.multimodal import decode_image

    img = _smooth(16, 24)
    dec = decode_image(encode_jpeg(img, quality=95))
    assert dec.shape == (16, 24, 3)
    assert np.abs(dec.astype(int) - img.astype(int)).mean() <= 2.0
