"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The Spark-side shape is the production shape: a ``binary`` column,
Arrow batch transfer, ``mapInPandas`` decode, typed metadata schema.
The *container header* parse is REAL (stdlib ``struct``): PNG IHDR
(width/height, CRC-correct chunk framing), WAV RIFF/fmt (sample rate,
channels), GIF logical screen descriptor. Only pixel/sample decode
(``decode_image``) stays a declared stub — PIL/ffmpeg are not in this
environment; a real pipeline swaps that one function and nothing else
changes.

Fixture side: ``attach_payload`` synthesizes byte-valid containers
deterministically from (doc_id, text) — modality cycles PNG/WAV/GIF by
``doc_id % 3``, dimensions/rates are closed-form in doc_id, and the
document text rides inside as the (opaque) data section. Both the
fixture and the parser are pure functions, so the DuckDB oracle checks
the parsed fields against the same closed form.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

META_DDL = (
    "doc_id bigint, modality string, width int, height int, "
    "sample_rate int, channels int, n_bytes bigint, payload_sha string"
)

# closed-form fixture parameters (shared with the DuckDB oracle)
def _width(doc_id: int) -> int:
    return 16 + doc_id % 240


def _height(doc_id: int) -> int:
    return 16 + (doc_id // 3) % 200


def _sample_rate(doc_id: int) -> int:
    return 8000 + (doc_id % 5) * 8000


def _channels(doc_id: int) -> int:
    return 1 + doc_id % 2


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def make_png(doc_id: int, data: bytes) -> bytes:
    ihdr = struct.pack(
        ">IIBBBBB", _width(doc_id), _height(doc_id), 8, 2, 0, 0, 0
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", data)
        + _png_chunk(b"IEND", b"")
    )


def make_wav(doc_id: int, data: bytes) -> bytes:
    rate, ch = _sample_rate(doc_id), _channels(doc_id)
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def make_gif(doc_id: int, data: bytes) -> bytes:
    screen = struct.pack("<HHBBB", _width(doc_id), _height(doc_id), 0, 0, 0)
    return b"GIF89a" + screen + data + b"\x3b"


def parse_container(payload: bytes) -> dict:
    """Header parse of PNG / WAV / GIF containers (magic-sniffed).
    Returns typed metadata; unknown containers degrade to nulls — the
    permissive-decode stance the pgoutput side also takes."""
    meta = {
        "modality": "unknown", "width": None, "height": None,
        "sample_rate": None, "channels": None,
        "n_bytes": len(payload),
        "payload_sha": hashlib.sha256(payload).hexdigest(),
    }
    # length guards before every unpack: a payload truncated AFTER its
    # magic (e.g. 16-23 bytes of PNG signature+IHDR tag, or a RIFF/WAVE
    # header cut inside the fmt chunk) must degrade to unknown-modality
    # metadata, not raise struct.error and fail the whole Arrow batch
    if (
        payload[:8] == b"\x89PNG\r\n\x1a\n"
        and payload[12:16] == b"IHDR"
        and len(payload) >= 24
    ):
        w, h = struct.unpack_from(">II", payload, 16)
        meta.update(modality="image/png", width=w, height=h)
    elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        # walk RIFF chunks to fmt (usually first)
        pos = 12
        while pos + 8 <= len(payload):
            tag = payload[pos : pos + 4]
            (ln,) = struct.unpack_from("<I", payload, pos + 4)
            if tag == b"fmt ":
                if pos + 16 > len(payload):
                    break  # fmt chunk truncated — stay unknown
                _fmt, ch, rate = struct.unpack_from("<HHI", payload, pos + 8)
                meta.update(
                    modality="audio/wav", sample_rate=rate, channels=ch
                )
                break
            pos += 8 + ln + (ln & 1)
    elif payload[:6] in (b"GIF89a", b"GIF87a") and len(payload) >= 10:
        w, h = struct.unpack_from("<HH", payload, 6)
        meta.update(modality="image/gif", width=w, height=h)
    return meta


def make_png_pixels(doc_id: int) -> bytes:
    """A REAL decodable grayscale-8 PNG: pixel(x, y) = (x + y + doc_id)
    % 256, per-scanline filter type cycling (y + doc_id) % 3 over
    None/Sub/Up, IDAT zlib-compressed — stdlib + numpy only. The pixel
    function is closed-form in doc_id so the DuckDB oracle can recompute
    the decoded-pixel statistics without an image library."""
    import numpy as np

    w, h = _width(doc_id), _height(doc_id)
    xs = np.arange(w, dtype=np.int64)
    rows = []
    prior = np.zeros(w, dtype=np.uint8)
    for y in range(h):
        px = ((xs + y + doc_id) % 256).astype(np.uint8)
        ftype = (y + doc_id) % 3
        if ftype == 0:  # None
            filt = px
        elif ftype == 1:  # Sub (bpp=1): raw[x] = px[x] - px[x-1]
            filt = np.diff(px.astype(np.int16), prepend=np.int16(0)) % 256
        else:  # Up: raw[x] = px[x] - prior[x]
            filt = (px.astype(np.int16) - prior.astype(np.int16)) % 256
        rows.append(bytes([ftype]) + filt.astype(np.uint8).tobytes())
        prior = px
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # depth 8, gray
    idat = zlib.compress(b"".join(rows))
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def decode_image(payload: bytes):
    """REAL pixel decode for grayscale-8 PNGs (stdlib zlib + numpy — no
    PIL needed): walk the chunk stream, concatenate IDAT, inflate,
    reverse the per-scanline filters (None/Sub/Up/Average/Paeth), and
    return the (height, width) uint8 pixel array. Color types other
    than grayscale-8 raise ValueError (PIL/opencv territory — the
    declared boundary of the stdlib decoder)."""
    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat, hdr = 8, [], None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            if len(body) < 10:
                # truncated IHDR: keep the documented ValueError contract
                # (struct.error would escape as an undeclared type)
                raise ValueError(f"IHDR chunk truncated ({len(body)} bytes)")
            hdr = struct.unpack_from(">IIBB", body, 0)  # w, h, depth, ctype
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if hdr is None:
        raise ValueError("no IHDR chunk")
    w, h, depth, ctype = hdr
    if (depth, ctype) != (8, 0):
        raise ValueError(f"unsupported PNG depth/color type {depth}/{ctype}")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"IDAT is not a zlib stream: {e}") from e
    if len(raw) != h * (w + 1):
        raise ValueError(f"IDAT length {len(raw)} != {h}*({w}+1)")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, w + 1)
    ftypes, data = arr[:, 0], arr[:, 1:].astype(np.int16)
    out = np.zeros((h, w), dtype=np.uint8)
    prior = np.zeros(w, dtype=np.int16)
    for y in range(h):
        f, row = int(ftypes[y]), data[y]
        if f == 0:  # None
            rec = row % 256
        elif f == 1:  # Sub: rec[x] = raw[x] + rec[x-1]
            rec = np.cumsum(row, dtype=np.int64) % 256
        elif f == 2:  # Up
            rec = (row + prior) % 256
        elif f == 3:  # Average (sequential by definition)
            rec = np.zeros(w, dtype=np.int64)
            left = 0
            for x in range(w):
                left = (int(row[x]) + (left + int(prior[x])) // 2) % 256
                rec[x] = left
        elif f == 4:  # Paeth
            rec = np.zeros(w, dtype=np.int64)
            left = 0
            for x in range(w):
                a, b = left, int(prior[x])  # c (upper-left) = prior[x-1]
                c = int(prior[x - 1]) if x else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                left = (int(row[x]) + pred) % 256
                rec[x] = left
        else:
            raise ValueError(f"bad filter type {f} on scanline {y}")
        out[y] = rec.astype(np.uint8)
        prior = out[y].astype(np.int16)
    return out


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize the opaque binary column: a byte-valid PNG/WAV/GIF
    container (by doc_id % 3) carrying the text as its data section."""

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        makers = (make_png, make_wav, make_gif)
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [
                makers[int(d) % 3](int(d), t.encode())
                for d, t in zip(pdf["doc_id"], pdf[text_col])
            ]
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields
    )
    return docs.mapInPandas(_make, schema + ", payload binary")


def extract_metadata(with_payload: DataFrame) -> DataFrame:
    """mapInPandas over Arrow batches: binary in, typed metadata out.
    The batch shape (vectorized columns, one yield per Arrow batch) is
    the production shape; swap parse_container for a PIL/ffmpeg probe
    on a real cluster and nothing else changes."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [parse_container(bytes(p)) for p in pdf["payload"].values]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out[
                [
                    "doc_id", "modality", "width", "height",
                    "sample_rate", "channels", "n_bytes", "payload_sha",
                ]
            ]

    return with_payload.select("doc_id", "payload").mapInPandas(_extract, META_DDL)


def resize_container(payload: bytes, width: int, height: int) -> bytes:
    """'Resize' at the container level: rewrite the PNG IHDR / GIF
    screen descriptor to the target dimensions, keeping the data
    section (a real pixel resample needs PIL — this is the byte-real
    header path a production resize also rewrites). Non-image
    containers pass through unchanged."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
        (ln,) = struct.unpack_from(">I", payload, 8)
        if len(payload) < 16 + ln or ln < 8:
            return payload  # truncated IHDR: pass through, don't raise
        body = bytearray(payload[12 : 16 + ln])
        struct.pack_into(">II", body, 4, width, height)
        chunk = (
            struct.pack(">I", ln)
            + bytes(body)
            + struct.pack(">I", zlib.crc32(bytes(body)) & 0xFFFFFFFF)
        )
        return payload[:8] + chunk + payload[16 + ln + 4 :]
    if payload[:6] in (b"GIF89a", b"GIF87a"):
        return (
            payload[:6] + struct.pack("<HH", width, height) + payload[10:]
        )
    return payload


def sample_wav_frames(payload: bytes, every_n: int) -> bytes:
    """Frame-sample a WAV container: keep every Nth sample frame
    (block_align bytes) of the data section, patching the RIFF/data
    sizes — the audio analog of video frame sampling. Non-WAV
    containers pass through unchanged."""
    if not (payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"):
        return payload
    pos = 12
    block = 2
    out = bytearray(payload[:12])
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", payload, pos + 4)
        chunk = payload[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            if len(chunk) < 8:
                # fmt chunk truncated: pass the container through
                # unchanged (same degrade-don't-raise stance as the
                # parser) — no frame sampling without a block size
                return payload
            _fmt, ch, _rate = struct.unpack_from("<HHI", chunk, 0)
            block = max(ch * 2, 1)
            out += payload[pos : pos + 8 + ln]
        elif tag == b"data":
            frames = [
                chunk[i : i + block]
                for i in range(0, len(chunk) - len(chunk) % block, block)
            ]
            kept = b"".join(frames[::every_n])
            out += b"data" + struct.pack("<I", len(kept)) + kept
        else:
            out += payload[pos : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
    struct.pack_into("<I", out, 4, len(out) - 8)
    return bytes(out)


def transform_payloads(
    with_payload: DataFrame,
    fn,
    label: str,
) -> DataFrame:
    """mapInPandas shell for payload transforms (resize, frame-sample,
    future feature extractors): binary in, binary out, same batch shape
    as extract_metadata."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["doc_id"]].copy()
            out["payload"] = [fn(bytes(p)) for p in pdf["payload"].values]
            yield out

    return with_payload.select("doc_id", "payload").mapInPandas(
        _run, "doc_id bigint, payload binary"
    )


def attach_pixel_png(docs: DataFrame) -> DataFrame:
    """Synthesize a REAL decodable grayscale PNG per document (see
    make_png_pixels) — the fixture for the pixel-decode path."""

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["doc_id"]].copy()
            out["payload"] = [make_png_pixels(int(d)) for d in pdf["doc_id"]]
            yield out

    return docs.select("doc_id").mapInPandas(_make, "doc_id bigint, payload binary")


PIXEL_STATS_DDL = (
    "doc_id bigint, width int, height int, n_pixels bigint, pix_sum bigint"
)


def pixel_stats(with_payload: DataFrame) -> DataFrame:
    """Decode every PNG's pixels (real zlib+numpy scanline decode) and
    reduce to per-image statistics INSIDE the Arrow batch — the stats
    leave the executor, the 10^4-10^5 pixels per image never do. The
    batch shape is the production shape for any pixel-level feature
    extractor (embeddings, histograms, perceptual hashes)."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for d, p in zip(pdf["doc_id"], pdf["payload"].values):
                px = decode_image(bytes(p))
                recs.append(
                    (
                        int(d),
                        int(px.shape[1]),
                        int(px.shape[0]),
                        int(px.size),
                        int(px.sum(dtype="int64")),
                    )
                )
            yield pd.DataFrame(
                recs, columns=["doc_id", "width", "height", "n_pixels", "pix_sum"]
            )

    return with_payload.select("doc_id", "payload").mapInPandas(
        _stats, PIXEL_STATS_DDL
    )


def resize_images(with_payload: DataFrame, width: int, height: int) -> DataFrame:
    return transform_payloads(
        with_payload, lambda p: resize_container(p, width, height), "resize"
    )


def frame_sample_audio(with_payload: DataFrame, every_n: int) -> DataFrame:
    return transform_payloads(
        with_payload, lambda p: sample_wav_frames(p, every_n), "frame_sample"
    )
