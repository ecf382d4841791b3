"""Container synth + header parse round-trip (pure Python — the Spark
plumbing around it is exercised by the mm_decode_meta oracle gate)."""

import hashlib
import struct
import zlib

from wal_listener_spark.functions import multimodal as mm


def test_png_roundtrip_and_crc():
    p = mm.make_png(42, b"DATA")
    meta = mm.parse_container(p)
    assert meta["modality"] == "image/png"
    assert meta["width"] == 16 + 42 % 240
    assert meta["height"] == 16 + 14 % 200
    assert meta["n_bytes"] == len(p) == 57 + 4
    assert meta["payload_sha"] == hashlib.sha256(p).hexdigest()
    # IHDR chunk CRC is a real CRC32 (byte-valid container)
    (ln,) = struct.unpack_from(">I", p, 8)
    body = p[12 : 16 + ln]
    (crc,) = struct.unpack_from(">I", p, 16 + ln)
    assert crc == zlib.crc32(body) & 0xFFFFFFFF


def test_wav_roundtrip():
    p = mm.make_wav(7, b"audio-bytes")
    meta = mm.parse_container(p)
    assert meta["modality"] == "audio/wav"
    assert meta["sample_rate"] == 8000 + (7 % 5) * 8000
    assert meta["channels"] == 1 + 7 % 2
    assert meta["n_bytes"] == 44 + len(b"audio-bytes")


def test_gif_roundtrip():
    p = mm.make_gif(8, b"xy")
    meta = mm.parse_container(p)
    assert meta["modality"] == "image/gif"
    assert meta["width"] == 16 + 8 % 240 and meta["height"] == 16 + 2 % 200
    assert meta["n_bytes"] == 14 + 2


def test_unknown_container_degrades():
    meta = mm.parse_container(b"\x00\x01garbage")
    assert meta["modality"] == "unknown"
    assert meta["width"] is None and meta["sample_rate"] is None
    assert meta["n_bytes"] == 9


def test_pixel_decode_roundtrip_all_filters():
    """Real zlib+numpy pixel decode: encode with mixed None/Sub/Up
    scanline filters, decode, compare to the closed form pixel-by-pixel.
    doc_ids chosen so each of the three filter types appears."""
    import numpy as np

    for doc_id in (0, 1, 2, 77):
        px = mm.decode_image(mm.make_png_pixels(doc_id))
        w, h = mm._width(doc_id), mm._height(doc_id)
        assert px.shape == (h, w)
        xs = np.arange(w)
        for y in (0, 1, h // 2, h - 1):
            assert np.array_equal(px[y], (xs + y + doc_id) % 256), (doc_id, y)
    # container headers of the pixel PNG parse like any other PNG
    meta = mm.parse_container(mm.make_png_pixels(5))
    assert meta["modality"] == "image/png"
    assert (meta["width"], meta["height"]) == (mm._width(5), mm._height(5))


def test_pixel_decode_average_and_paeth_filters():
    """Filters 3 (Average) and 4 (Paeth) decode too — hand-built frames
    encoded against the PNG spec definitions."""
    import struct as _s
    import zlib as _z

    import numpy as np

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(4, 6)).astype(np.int64)
    rows = []
    for y in range(4):
        f = 3 if y % 2 else 4
        row = bytearray([f])
        for x in range(6):
            a = int(px[y, x - 1]) if x else 0
            b = int(px[y - 1, x]) if y else 0
            c = int(px[y - 1, x - 1]) if (x and y) else 0
            if f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            row.append((int(px[y, x]) - pred) % 256)
        rows.append(bytes(row))
    ihdr = _s.pack(">IIBBBBB", 6, 4, 8, 0, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"IDAT", _z.compress(b"".join(rows)))
        + mm._png_chunk(b"IEND", b"")
    )
    assert np.array_equal(mm.decode_image(payload), px % 256)


def test_pixel_decode_rejects_undecodable():
    import pytest

    # container fixture's IDAT is raw text, not a zlib stream
    with pytest.raises(ValueError):
        mm.decode_image(mm.make_png(1, b"not-zlib"))
    with pytest.raises(ValueError):
        mm.decode_image(b"RIFF1234WAVE")  # not a PNG at all


def test_resize_rewrites_image_headers():
    p = mm.make_png(42, b"DATA")
    r = mm.resize_container(p, 64, 48)
    meta = mm.parse_container(r)
    assert (meta["width"], meta["height"]) == (64, 48)
    assert meta["n_bytes"] == len(p)  # header rewrite, same length
    # CRC still valid after the rewrite
    import struct as _s
    import zlib as _z

    (ln,) = _s.unpack_from(">I", r, 8)
    (crc,) = _s.unpack_from(">I", r, 16 + ln)
    assert crc == _z.crc32(r[12 : 16 + ln]) & 0xFFFFFFFF
    g = mm.resize_container(mm.make_gif(8, b"xy"), 64, 48)
    gm = mm.parse_container(g)
    assert (gm["width"], gm["height"]) == (64, 48)
    w = mm.make_wav(7, b"abcdef")
    assert mm.resize_container(w, 64, 48) == w  # audio passthrough


def test_wav_frame_sampling():
    data = bytes(range(40))  # 20 stereo... depends on channels of doc 7 (2ch)
    w = mm.make_wav(7, data)  # ch=2 -> block=4 -> 10 frames
    s = mm.sample_wav_frames(w, 4)  # keep frames 0,4,8 -> 3 frames = 12 bytes
    meta = mm.parse_container(s)
    assert meta["modality"] == "audio/wav"
    assert meta["n_bytes"] == 44 + 12
    assert meta["sample_rate"] == mm._sample_rate(7)
    p = mm.make_png(3, b"x")
    assert mm.sample_wav_frames(p, 4) == p  # image passthrough


def test_truncated_containers_degrade_to_unknown():
    """A payload truncated AFTER its magic bytes must degrade to
    unknown-modality metadata, never raise struct.error (which would
    fail the whole Arrow batch in mapInPandas)."""
    cases = [
        b"\x89PNG\r\n\x1a\n",                          # signature only
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR",  # IHDR tag, no body
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDRwxyz",  # 4 of 8 body bytes
        b"RIFF\x10\x00\x00\x00WAVE",                   # no chunks
        b"RIFF\x10\x00\x00\x00WAVEfmt \x10\x00\x00\x00\x01\x00",  # fmt cut
        b"GIF89a",                                     # no screen descriptor
        b"GIF89a\x40",                                 # half a width
    ]
    for p in cases:
        meta = mm.parse_container(p)  # must not raise
        assert meta["modality"] == "unknown", p
        assert meta["n_bytes"] == len(p)


def test_truncated_containers_pass_through_transforms():
    """The payload transforms take the same degrade-don't-raise stance
    as the parser: a truncated container passes through unchanged
    instead of raising struct.error inside mapInPandas."""
    trunc_png = b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDRwxyz"
    assert mm.resize_container(trunc_png, 64, 48) == trunc_png
    trunc_wav = b"RIFF\x10\x00\x00\x00WAVEfmt \x10\x00\x00\x00\x01\x00"
    assert mm.sample_wav_frames(trunc_wav, 4) == trunc_wav
    # and intact containers still transform (guards are not over-eager)
    full = mm.resize_container(mm.make_png(3, b"x"), 64, 48)
    m = mm.parse_container(full)
    assert (m["width"], m["height"]) == (64, 48)


def test_pixel_decode_truncated_ihdr_raises_valueerror():
    """A PNG whose IHDR body is cut below 10 bytes must raise the
    documented ValueError, not let struct.error escape the mapInPandas
    batch with an undeclared exception type."""
    import pytest

    p = b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR" + b"wxyz"
    with pytest.raises(ValueError, match="IHDR chunk truncated"):
        mm.decode_image(p)
