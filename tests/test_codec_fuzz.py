"""Decoder robustness: every truncation and random bit flip of a
valid JPEG/PNG/GIF stream must either decode or raise the clean
codec contract (ValueError / NotImplementedError) — never a raw
IndexError/KeyError/zlib.error/struct.error out of parser internals,
which at corpus scale would crash a task instead of letting the
pipeline quarantine the payload."""

from __future__ import annotations

import numpy as np
import pytest

from xsarsea_spark.pipeline.gif import decode_gif, encode_gif
from xsarsea_spark.pipeline.jpeg import decode_jpeg, encode_jpeg
from xsarsea_spark.pipeline.png import decode_png, encode_png


def _payloads():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (16, 16), dtype=np.uint8)
    return {
        "jpeg": (encode_jpeg(img), decode_jpeg),
        "png": (encode_png(img), decode_png),
        "gif": (encode_gif(idx, pal), decode_gif),
    }


@pytest.mark.parametrize("fmt", ["jpeg", "png", "gif"])
def test_truncations_raise_cleanly(fmt):
    enc, dec = _payloads()[fmt]
    for cut in range(1, len(enc), max(1, len(enc) // 60)):
        try:
            dec(enc[:cut])
        except (ValueError, NotImplementedError):
            pass


@pytest.mark.parametrize("fmt", ["jpeg", "png", "gif"])
def test_bit_flips_raise_cleanly_or_decode(fmt):
    enc, dec = _payloads()[fmt]
    rng = np.random.default_rng(1)
    for _ in range(150):
        b = bytearray(enc)
        i = int(rng.integers(0, len(b)))
        b[i] ^= 1 << int(rng.integers(0, 8))
        try:
            dec(bytes(b))
        except (ValueError, NotImplementedError):
            pass


@pytest.mark.parametrize("fmt", ["jpeg", "png", "gif"])
def test_decode_bomb_guard(fmt):
    """A dimension field patched to its 16/32-bit max must raise the
    guard error, not attempt a multi-GB allocation."""
    enc, dec = _payloads()[fmt]
    b = bytearray(enc)
    if fmt == "jpeg":
        i = bytes(b).index(b"\xff\xc0")
        b[i + 5:i + 9] = b"\xff\xff\xff\xff"      # SOF h=w=65535
    elif fmt == "png":
        b[16:24] = (0xFFFFFF).to_bytes(4, "big") * 2  # IHDR w=h=16M
    else:
        b[6:10] = b"\xff\xff\xff\xff"             # LSD w=h=65535
    with pytest.raises(ValueError, match="decode-bomb|corrupt"):
        dec(bytes(b))


def test_decode_features_quarantine(spark):
    """on_error='skip' drops corrupt payloads instead of failing the
    task; default still raises."""
    from pyspark.sql import functions as F

    from xsarsea_spark.pipeline.multimodal import decode_features

    enc, _ = _payloads()["png"]
    rows = [(1, bytearray(enc)), (2, bytearray(b"garbage-bytes")),
            (3, bytearray(enc[: len(enc) // 2]))]
    mm = spark.createDataFrame(rows, "doc_id long, payload binary")
    ok = decode_features(mm, on_error="skip").collect()
    assert [r.doc_id for r in ok] == [1]
    with pytest.raises(Exception):
        decode_features(mm).collect()
    with pytest.raises(ValueError):
        decode_features(mm, on_error="banana")


def test_wav_roundtrip_and_gates():
    """WAV codec: 16-bit mono/stereo round-trip is lossless; 8-bit
    PCM decodes; non-PCM and deep formats gate cleanly; truncations
    raise the codec contract."""
    import struct

    from xsarsea_spark.pipeline.audio import decode_wav, encode_wav

    rng = np.random.default_rng(0)
    mono = rng.integers(-32768, 32768, 300, dtype=np.int16)
    dec, rate = decode_wav(encode_wav(mono, rate=22050))
    assert rate == 22050 and dec.shape == (300, 1)
    np.testing.assert_array_equal(dec[:, 0], mono)

    stereo = rng.integers(-32768, 32768, (128, 2), dtype=np.int16)
    dec, _ = decode_wav(encode_wav(stereo))
    np.testing.assert_array_equal(dec, stereo)

    # 8-bit unsigned PCM: build by patching a 16-bit header
    enc = bytearray(encode_wav(mono[:16]))
    data8 = bytes((mono[:16] // 256 + 128).astype(np.uint8))
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 16000, 1, 8)
    wav8 = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data8))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data8)) + data8)
    dec8, _ = decode_wav(wav8)
    np.testing.assert_array_equal(
        dec8[:, 0], (mono[:16] // 256).astype(np.int16))

    with pytest.raises(ValueError):
        decode_wav(b"OggS....")
    # non-PCM format tag gates
    bad = bytearray(encode_wav(mono[:8]))
    bad[20:22] = struct.pack("<H", 85)      # MP3 tag
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(bad))
    full = encode_wav(mono)
    for cut in range(1, len(full), max(1, len(full) // 40)):
        try:
            decode_wav(full[:cut])
        except (ValueError, NotImplementedError):
            pass


def test_wav_zero_channels_raises_value_error():
    """A corrupt fmt chunk declaring channels=0 must hit the codec
    ValueError contract, not a ZeroDivisionError from the
    modulo-by-channels data slicing."""
    import struct

    from xsarsea_spark.pipeline.audio import decode_wav, encode_wav

    bad = bytearray(encode_wav(np.zeros(8, dtype=np.int16)))
    bad[22:24] = struct.pack("<H", 0)       # fmt.channels = 0
    with pytest.raises(ValueError):
        decode_wav(bytes(bad))


def test_wav_bit_flips_raise_cleanly_or_decode():
    from xsarsea_spark.pipeline.audio import decode_wav, encode_wav

    rng = np.random.default_rng(2)
    enc = encode_wav(
        rng.integers(-32768, 32768, (64, 2), dtype=np.int16))
    for _ in range(200):
        b = bytearray(enc)
        i = int(rng.integers(0, len(b)))
        b[i] ^= 1 << int(rng.integers(0, 8))
        try:
            decode_wav(bytes(b))
        except (ValueError, NotImplementedError):
            pass


def test_gif_disposal2_uses_global_table_for_background():
    """Disposal-2 background restore must index the GLOBAL colour
    table: a frame-local table smaller than the background index used
    to turn this valid GIF into a spurious IndexError."""
    import struct

    from xsarsea_spark.pipeline.gif import decode_gif_frames, encode_gif

    pal = np.zeros((16, 3), dtype=np.uint8)
    pal[15] = (10, 20, 30)                  # background colour
    idx = np.zeros((4, 4), dtype=np.uint8)
    base = bytearray(encode_gif(idx, pal))
    assert base[10] & 0x80                  # global colour table flag
    base[11] = 15                           # background colour index

    # reuse encode_gif's LZW payload for an all-zero 4x4 frame
    single = bytes(encode_gif(np.zeros((4, 4), dtype=np.uint8),
                              np.zeros((2, 3), dtype=np.uint8)))
    start = single.index(b"\x2c")
    lzw = single[start + 10:-1]             # min_code + sub-blocks
    # frame 2: 4-entry LOCAL colour table (< bg index 15) + disposal=2
    lct = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9], [10, 11, 12]],
                   dtype=np.uint8)
    gce = b"\x21\xf9\x04" + bytes([2 << 2]) + b"\x00\x00\x00\x00"
    desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 4, 0x80 | 1)
    out = bytes(base[:-1]) + gce + desc + lct.tobytes() + lzw + b";"
    frames = decode_gif_frames(out)          # old code: IndexError->corrupt
    assert len(frames) == 2
    np.testing.assert_array_equal(frames[0], pal[idx])
    np.testing.assert_array_equal(
        frames[1], np.broadcast_to(lct[0], (4, 4, 3)))


def test_ppm_bmp_fuzz_raise_cleanly_or_decode():
    """PPM/BMP decoders under truncation + bit flips: clean codec
    contract (ValueError) or a successful decode, never a raw
    numpy/struct error escaping the parser."""
    from tests.test_multimodal import _encode_bmp, _encode_ppm
    from xsarsea_spark.pipeline.multimodal import decode_bmp, decode_ppm

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
    for enc, dec in ((_encode_ppm(img), decode_ppm),
                     (_encode_bmp(img), decode_bmp),
                     (_encode_bmp(img, top_down=True), decode_bmp)):
        for cut in range(1, len(enc), max(1, len(enc) // 50)):
            try:
                dec(enc[:cut])
            except ValueError:
                pass
        for _ in range(250):
            b = bytearray(enc)
            i = int(rng.integers(0, len(b)))
            b[i] ^= 1 << int(rng.integers(0, 8))
            try:
                dec(bytes(b))
            except ValueError:
                pass
