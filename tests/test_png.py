"""PNG codec: lossless round-trip, all five row filters, colour
types (grey, RGB, palette, alpha compositing), and the gates."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from xsarsea_spark.pipeline.png import _chunk, _SIG, decode_png, encode_png


def _img(h: int, w: int, seed: int = 0, channels: int = 3) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, channels) if channels > 1
                        else (h, w), dtype=np.uint8)


def _filter_row(row: np.ndarray, prev: np.ndarray, ftype: int,
                nch: int) -> bytes:
    """Apply PNG filter ``ftype`` (the encoder side) to one raw row."""
    r = row.astype(np.int64)
    p = prev.astype(np.int64)
    left = np.zeros_like(r)
    left[nch:] = r[:-nch]
    ul = np.zeros_like(p)
    ul[nch:] = p[:-nch]
    if ftype == 0:
        out = r
    elif ftype == 1:
        out = r - left
    elif ftype == 2:
        out = r - p
    elif ftype == 3:
        out = r - (left + p) // 2
    elif ftype == 4:
        pr = left + p - ul
        pa, pb, pc = np.abs(pr - left), np.abs(pr - p), np.abs(pr - ul)
        pred = np.where((pa <= pb) & (pa <= pc), left,
                        np.where(pb <= pc, p, ul))
        out = r - pred
    return bytes([ftype]) + (out & 0xFF).astype(np.uint8).tobytes()


def _make_png(px: np.ndarray, color: int, ftype: int,
              plte: np.ndarray | None = None) -> bytes:
    """Hand-built PNG using filter ``ftype`` on every row, so the
    decoder must actually invert each filter (encode_png only emits
    filter 0)."""
    h, w = px.shape[:2]
    nch = px.shape[2] if px.ndim == 3 else 1
    body = px.reshape(h, -1)
    raw = b""
    prev = np.zeros(w * nch, dtype=np.uint8)
    for y in range(h):
        raw += _filter_row(body[y], prev, ftype, nch)
        prev = body[y]
    out = _SIG + _chunk(b"IHDR", struct.pack(
        ">IIBBBBB", w, h, 8, color, 0, 0, 0))
    if plte is not None:
        out += _chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    # split IDAT in two to cover multi-chunk streams
    z = zlib.compress(raw)
    out += _chunk(b"IDAT", z[: len(z) // 2])
    out += _chunk(b"IDAT", z[len(z) // 2:])
    return out + _chunk(b"IEND", b"")


def test_lossless_roundtrip_rgb_and_grey():
    img = _img(13, 17, seed=1)
    np.testing.assert_array_equal(decode_png(encode_png(img)), img)
    g = _img(9, 11, seed=2, channels=1)
    dec = decode_png(encode_png(g))
    np.testing.assert_array_equal(dec[:, :, 0], g)
    np.testing.assert_array_equal(dec[:, :, 1], g)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_all_filters_invert(ftype):
    img = _img(12, 10, seed=ftype + 3)
    np.testing.assert_array_equal(
        decode_png(_make_png(img, color=2, ftype=ftype)), img)


def test_palette_decode():
    plte = _img(1, 256, seed=7).reshape(256, 3)
    idx = _img(8, 9, seed=8, channels=1)[..., None]
    got = decode_png(_make_png(idx, color=3, ftype=1, plte=plte))
    np.testing.assert_array_equal(got, plte[idx[:, :, 0]])


def test_alpha_composites_over_white():
    rgba = _img(6, 7, seed=9, channels=4)
    got = decode_png(_make_png(rgba, color=6, ftype=2))
    a = rgba[:, :, 3:4].astype(np.float64) / 255.0
    want = np.clip(np.round(rgba[:, :, :3] * a + 255.0 * (1 - a)),
                   0, 255).astype(np.uint8)
    np.testing.assert_array_equal(got, want)
    ga = _img(6, 7, seed=10, channels=2)
    got = decode_png(_make_png(ga, color=4, ftype=4))
    a = ga[:, :, 1].astype(np.float64) / 255.0
    want = np.clip(np.round(ga[:, :, 0] * a + 255.0 * (1 - a)),
                   0, 255).astype(np.uint8)
    np.testing.assert_array_equal(got[:, :, 0], want)


def test_gates():
    with pytest.raises(ValueError):
        decode_png(b"GIF89a..")
    img = _img(4, 4)
    enc = bytearray(encode_png(img))
    # 16-bit depth unsupported
    enc16 = bytearray(enc)
    enc16[8 + 8 + 8] = 16
    with pytest.raises(NotImplementedError):
        decode_png(bytes(enc16))
    # interlace unsupported
    enci = bytearray(enc)
    enci[8 + 8 + 12] = 1
    with pytest.raises(NotImplementedError):
        decode_png(bytes(enci))
    with pytest.raises(ValueError):
        decode_png(_SIG + _chunk(b"IEND", b""))


def test_decode_image_dispatches_png():
    from xsarsea_spark.pipeline.multimodal import decode_image

    img = _img(10, 12, seed=11)
    np.testing.assert_array_equal(decode_image(encode_png(img)), img)
