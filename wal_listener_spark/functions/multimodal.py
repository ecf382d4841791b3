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


def decode_image(payload: bytes):
    """Pixel-decode placeholder. Raises until an image lib is present —
    header metadata comes from parse_container, which needs none."""
    raise NotImplementedError(
        "pixel decode requires PIL/opencv — not available in this environment"
    )


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


def resize_images(with_payload: DataFrame, width: int, height: int) -> DataFrame:
    return transform_payloads(
        with_payload, lambda p: resize_container(p, width, height), "resize"
    )


def frame_sample_audio(with_payload: DataFrame, every_n: int) -> DataFrame:
    return transform_payloads(
        with_payload, lambda p: sample_wav_frames(p, every_n), "frame_sample"
    )
