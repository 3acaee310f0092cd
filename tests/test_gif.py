"""GIF codec: lossless palette round-trip (incl. LZW dictionary
overflow + reset), animation compositing, transparency, disposal,
interlacing, frame sampling, and the gates."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from xsarsea_spark.pipeline.gif import (
    _INTERLACE_PASSES,
    decode_gif,
    decode_gif_frames,
    encode_gif,
    sample_frames,
)


def _pal(n: int, seed: int = 0) -> np.ndarray:
    return np.random.default_rng(seed).integers(
        0, 256, (n, 3), dtype=np.uint8)


def test_lossless_roundtrip_small_palette():
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                   np.uint8)
    idx = np.random.default_rng(1).integers(0, 4, (10, 13),
                                            dtype=np.uint8)
    np.testing.assert_array_equal(decode_gif(encode_gif(idx, pal)),
                                  pal[idx])


def test_lossless_roundtrip_dict_overflow():
    """64x96 random 256-colour pixels push LZW past width growth to
    12 bits and through a full-dictionary clear/reset."""
    pal = _pal(256, seed=2)
    idx = np.random.default_rng(3).integers(0, 256, (64, 96),
                                            dtype=np.uint8)
    np.testing.assert_array_equal(decode_gif(encode_gif(idx, pal)),
                                  pal[idx])


def test_animation_frames_and_sampling():
    pal = _pal(8, seed=4)
    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 8, (8, 9), dtype=np.uint8)
              for _ in range(7)]
    enc = encode_gif(frames, pal)
    decs = decode_gif_frames(enc)
    assert len(decs) == 7
    for f, d in zip(frames, decs):
        np.testing.assert_array_equal(d, pal[f])
    s = sample_frames(enc, 3)
    assert len(s) == 3
    np.testing.assert_array_equal(s[0], pal[frames[0]])
    np.testing.assert_array_equal(s[-1], pal[frames[-1]])
    assert len(sample_frames(enc, 99)) == 7      # k >= n: all frames


def test_transparency_composites_over_previous_frame():
    """A GCE transparency index must leave the underlying canvas
    pixels visible (hand-patched GCE: encode_gif emits none)."""
    pal = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0]], np.uint8)
    f0 = np.zeros((4, 4), np.uint8)
    f1 = np.full((4, 4), 2, np.uint8)
    f1[0, 0] = 1                                  # index 1 -> transparent
    enc = bytearray(encode_gif([f0, f1], pal))
    # second GCE: set transparency flag + index 1
    gce_positions = [i for i in range(len(enc) - 1)
                     if enc[i] == 0x21 and enc[i + 1] == 0xF9]
    assert len(gce_positions) == 2
    p = gce_positions[1]
    enc[p + 3] |= 0x01                            # transparency flag
    enc[p + 6] = 1                                # transparent index
    frames = decode_gif_frames(bytes(enc))
    np.testing.assert_array_equal(frames[1][0, 0], pal[0])  # shows f0
    np.testing.assert_array_equal(frames[1][1, 1], pal[2])


def test_interlaced_image_deinterlaces():
    pal = _pal(16, seed=6)
    idx = np.random.default_rng(7).integers(0, 16, (16, 5),
                                            dtype=np.uint8)
    enc = bytearray(encode_gif(idx, pal))
    # find the image descriptor, set the interlace flag, and reorder
    # the pixel rows into 4-pass order so the decoder must undo it
    d = bytes(enc).index(b"\x2c")
    enc[d + 9] |= 0x40
    order = [r for start, step in _INTERLACE_PASSES
             for r in range(start, 16, step)]
    reordered = idx[order]
    # re-encode pixel data in the new row order
    from xsarsea_spark.pipeline.gif import _lzw_encode
    min_code = enc[d + 10]
    z = _lzw_encode(reordered.tobytes(), min_code)
    body = b""
    for i in range(0, len(z), 255):
        chunk = z[i:i + 255]
        body += bytes([len(chunk)]) + chunk
    new = bytes(enc[:d + 11]) + body + b"\x00\x3b"
    np.testing.assert_array_equal(decode_gif(new), pal[idx])


def test_gates():
    with pytest.raises(ValueError):
        decode_gif(b"NOTGIF..")
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0, 0, 0)
                   + b"\x3b")                     # no image data
    pal = _pal(4, seed=8)
    idx = np.zeros((4, 4), np.uint8)
    enc = encode_gif(idx, pal)
    with pytest.raises(ValueError):
        decode_gif(enc[: len(enc) // 2])          # truncated


def test_decode_image_dispatches_gif():
    from xsarsea_spark.pipeline.multimodal import decode_image

    pal = _pal(32, seed=9)
    idx = np.random.default_rng(10).integers(0, 32, (6, 11),
                                             dtype=np.uint8)
    np.testing.assert_array_equal(decode_image(encode_gif(idx, pal)),
                                  pal[idx])
