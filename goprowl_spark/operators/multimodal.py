"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The corpus's ``media`` spans (kind='media', media_ref=URL) become a media
table with a deterministic synthetic payload (sandbox stand-in for blob
fetch). Decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas UDFs over ``mapInPandas`` — the Spark-side plumbing
(schemas, batch iteration, partitioning) is real and tested; the actual
codec call is STUBBED behind an import-try (PIL/ffmpeg are not in this
container): with no codec installed a clearly-marked deterministic fake
decoder derives metadata from the payload bytes, so pipelines exercise
identical shapes end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real decoder if ever available — NOT in this sandbox
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

MEDIA_SCHEMA = "doc_id string, media_ref string, media_type string, payload binary"
DECODED_SCHEMA = (
    "doc_id string, media_ref string, media_type string, "
    "width int, height int, n_channels int, n_bytes long"
)
RESIZED_SCHEMA = DECODED_SCHEMA + ", resized_w int, resized_h int"
FRAMES_SCHEMA = "doc_id string, media_ref string, frame_idx int, frame_hash long"


def media_table(documents: DataFrame) -> DataFrame:
    """Explode media spans into a media table with a deterministic synthetic
    payload (sha2 of the ref, 32 bytes — stands in for the fetched blob)."""
    refs = documents.select(
        "doc_id",
        F.explode(
            F.transform(
                F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("media")),
                lambda s: s["media_ref"],
            )
        ).alias("media_ref"),
    )
    ext = F.lower(F.element_at(F.split(F.col("media_ref"), r"\."), -1))
    media_type = (
        F.when(ext.isin("png", "jpg", "jpeg", "gif"), "image")
        .when(ext.isin("mp4", "webm"), "video")
        .when(ext.isin("mp3", "wav", "flac"), "audio")
        .otherwise("binary")
    )
    return refs.select(
        "doc_id",
        "media_ref",
        media_type.alias("media_type"),
        F.unhex(F.sha2(F.col("media_ref"), 256)).alias("payload"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """STUB decoder: deterministic metadata from payload bytes.

    Raises if anyone expects real pixels. Replace with PIL/libvips in a
    real deployment; the UDF signature and batch shape do not change.
    """
    w = 64 + payload[0] % 192
    h = 64 + payload[1] % 192
    c = 1 + payload[2] % 4
    return w, h, c


def parse_media_header(payload: bytes) -> tuple[int, int, int] | None:
    """REAL (pure-Python) container sniffing: PNG IHDR, JPEG SOF0/1/2,
    GIF logical screen, WAV fmt — returns (width, height, channels), or
    None when the bytes are no known container (pixel decode still needs
    a codec; header metadata does not)."""
    import struct

    if len(payload) >= 33 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        # IHDR is always the first chunk: length(4) 'IHDR' w(4) h(4)
        # bitdepth(1) colortype(1)
        if payload[12:16] == b"IHDR":
            w, h = struct.unpack(">II", payload[16:24])
            color_type = payload[25]
            channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type, 3)
            return w, h, channels
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        while i + 1 < len(payload):
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # length-less markers (SOI/TEM/RSTn)
                continue
            if marker == 0xD9:  # EOI
                break
            if i + 4 > len(payload):
                break
            if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                if i + 10 > len(payload):
                    break
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return w, h, payload[i + 9]
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            if seg_len < 2:
                break
            i += 2 + seg_len
        return None
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return w, h, 3
    if len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        i = 12  # walk chunks until 'fmt ' — never trust a fixed offset
        while i + 8 <= len(payload):
            cid = payload[i : i + 4]
            clen = struct.unpack("<I", payload[i + 4 : i + 8])[0]
            if cid == b"fmt " and i + 12 <= len(payload):
                n_channels = struct.unpack("<H", payload[i + 10 : i + 12])[0]
                return 0, 0, n_channels  # audio: no spatial dims
            i += 8 + clen + (clen & 1)
        return None
    return None


def decode_media(media: DataFrame, sniff_headers: bool = True) -> DataFrame:
    """mapInPandas decode stage: binary payload → typed metadata columns.

    One Arrow batch per iteration; in production the body calls the codec
    per batch (vectorized I/O), never per Spark row. With ``sniff_headers``
    (default) real container headers decode for real (pure Python —
    PNG/JPEG/GIF/WAV) and only unrecognized bytes get the deterministic
    stub; pass False for fully synthetic corpora whose payloads are random
    bytes (e.g. the driver-gate run, whose SQL oracle replays the stub —
    random bytes must never accidentally sniff as a container there).
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if _HAS_PIL and False:  # real path placeholder (no real images here)
                raise NotImplementedError("real decode not wired in sandbox")
            meta = [
                (parse_media_header(p) if sniff_headers else None)
                or _fake_decode(p)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "media_type": pdf["media_type"],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "n_channels": [m[2] for m in meta],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(decode, schema=DECODED_SCHEMA)


def resize_media(decoded: DataFrame, max_side: int = 128) -> DataFrame:
    """Resize planning (aspect-preserving clamp) — pure Column math; the
    pixel resample itself would live in the decode UDF in production."""
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side)) / F.greatest(F.col("width"), F.col("height")),
    )
    return decoded.select(
        "*",
        F.floor(F.col("width") * scale).cast("int").alias("resized_w"),
        F.floor(F.col("height") * scale).cast("int").alias("resized_h"),
    )


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for video rows: emits n deterministic frame stubs per
    video via posexplode — the real decoder would seek those timestamps."""
    vids = media.where(F.col("media_type") == "video")
    return vids.select(
        "doc_id",
        "media_ref",
        F.posexplode(F.array_repeat(F.lit(0), n_frames)).alias("frame_idx", "_z"),
    ).select(
        "doc_id",
        "media_ref",
        "frame_idx",
        F.xxhash64(F.concat(F.col("media_ref"), F.lit("#"), F.col("frame_idx").cast("string"))).alias("frame_hash"),
    )
