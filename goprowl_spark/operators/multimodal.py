"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The corpus's ``media`` spans (kind='media', media_ref=URL) become a media
table with a deterministic synthetic payload (sandbox stand-in for blob
fetch). Decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas UDFs over ``mapInPandas``.

How real each codec is (all stdlib — no PIL/ffmpeg in this container):

* **PNG: fully real.** :func:`decode_png_pixels` inflates IDAT (zlib) and
  unfilters every scanline (all five filter types); pixel-level features
  and nearest-neighbor resize run on actual pixels. Round-trip-pinned
  against :func:`encode_png`.
* **WAV: fully real.** 16-bit PCM samples via struct; rms/peak/duration.
* **JPEG: baseline fully real.** :func:`decode_jpeg_pixels` Huffman-decodes
  SOF0 scans (grayscale + YCbCr, 4:4:4 and 4:2:0, restart intervals),
  dequantizes, runs the 8×8 IDCT and converts to RGB — round-trip-pinned
  against :func:`encode_jpeg`. Progressive (SOF2) / 12-bit / arithmetic
  coding → :class:`UnsupportedMedia`.
* **GIF: fully real (first frame).** :func:`decode_gif_pixels` LZW-
  decompresses (variable code width, clear/EOI, 12-bit dictionary),
  expands palette rows and de-interlaces — round-trip-pinned against
  :func:`encode_gif` (a real LZW encoder).
* **Video: MJPEG-in-AVI frame pixels fully real; MP4 metadata real,
  MP4 frame pixels stubbed.** :func:`decode_avi_mjpeg` walks the RIFF
  AVI container (hdrl/avih/strl/strh → LIST movi → 00dc chunks) and
  every frame is a baseline JPEG decoded by the real
  :func:`decode_jpeg_pixels` — round-trip-pinned against
  :func:`encode_avi_mjpeg`. :func:`parse_mp4_metadata` walks ISO-BMFF
  boxes (ftyp/moov/mvhd/tkhd) for brand, duration, and dimensions —
  pinned against :func:`encode_mp4_stub`; MP4/H.264 frame pixels remain
  the one honestly stubbed path (an inter-frame codec needs a library).

For fully synthetic corpora (payload = hash bytes), :func:`decode_media`
falls back to a clearly-marked deterministic fake so pipelines exercise
identical shapes end-to-end.
"""

from __future__ import annotations

import struct
import zlib
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


# ------------------------------------------------------ real pixel codecs
#
# Pure-stdlib codecs (zlib + struct are always present) so the pixel path
# is REAL for PNG, baseline JPEG, GIF, and WAV — no PIL/ffmpeg needed.
# Video remains header-sniff only (the honest NotImplementedError guard
# stays for it).


class UnsupportedMedia(NotImplementedError):
    """Raised when bytes need a codec this container doesn't ship
    (video, progressive/12-bit JPEG, interlaced or 16-bit PNG)."""


def decode_png_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """Full PNG decode (stdlib only): chunk walk → zlib-inflate IDAT →
    per-scanline unfilter (all five filter types: None/Sub/Up/Average/
    Paeth) → packed row-major pixel bytes. Supports 8-bit depth, color
    types gray/RGB/palette/gray+alpha/RGBA, non-interlaced. Returns
    (width, height, channels, pixels) with palette rows expanded to RGB."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise UnsupportedMedia("not a PNG")
    pos, w = 8, None
    idat, plte = b"", b""
    while pos + 8 <= len(payload):
        (clen,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + clen]
        if ctype == b"IHDR":
            w, h = struct.unpack(">II", data[:8])
            bit_depth, color_type, _, _, interlace = data[8:13]
            if bit_depth != 8:
                raise UnsupportedMedia(f"bit depth {bit_depth}")
            if interlace:
                raise UnsupportedMedia("Adam7 interlacing")
            channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
            if channels is None:
                raise UnsupportedMedia(f"color type {color_type}")
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # len + type + data + crc
    if w is None:
        raise UnsupportedMedia("no IHDR")
    raw = zlib.decompress(idat)
    stride = w * channels
    out = bytearray()
    prev = bytearray(stride)
    for y in range(h):
        base = y * (stride + 1)
        ftype = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise UnsupportedMedia(f"filter {ftype}")
        out += line
        prev = line
    if color_type == 3:  # palette → expand to RGB
        rgb = bytearray()
        for idx in out:
            rgb += plte[idx * 3 : idx * 3 + 3]
        return w, h, 3, bytes(rgb)
    return w, h, channels, bytes(out)


def encode_png(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    filter_type: int = 0,
) -> bytes:
    """Minimal PNG encoder (stdlib only) — the round-trip twin of
    :func:`decode_png_pixels` and the fixture builder for tests; any of
    the five scanline filters can be requested so every unfilter branch
    is exercised."""
    import struct
    import zlib

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    stride = width * channels
    raw = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        line = bytearray(pixels[y * stride : (y + 1) * stride])
        enc = bytearray(line)
        if filter_type == 1:
            for i in range(stride - 1, channels - 1, -1):
                enc[i] = (line[i] - line[i - channels]) & 0xFF
        elif filter_type == 2:
            for i in range(stride):
                enc[i] = (line[i] - prev[i]) & 0xFF
        elif filter_type == 3:
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                enc[i] = (line[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif filter_type == 4:
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                enc[i] = (line[i] - pred) & 0xFF
        raw += bytes([filter_type]) + enc
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------- JPEG
#
# Baseline sequential JPEG (ITU-T T.81 SOF0), pure stdlib + numpy:
# marker walk → Huffman-decode DC/AC coefficients → dequantize → float64
# IDCT (separable 8×8 basis matmul) → chroma upsample → YCbCr→RGB.
# Supported: 8-bit precision, grayscale and 3-component YCbCr, 4:4:4 and
# 4:2:0 sampling, restart intervals. Progressive (SOF2), 12-bit,
# arithmetic coding → UnsupportedMedia. The entropy loop is per-block
# Python (fine for the thumbnail-scale fixtures tests decode; a
# production path would batch via a codec library).

# zigzag scan position k → natural (row-major v*8+u) index
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _jpeg_dct_matrix():
    """M[u, x] = c(u)/2 · cos((2x+1)uπ/16); forward DCT = M·f·Mᵀ,
    inverse = Mᵀ·F·M (T.81 A.3.3)."""
    import math

    import numpy as np

    m = np.zeros((8, 8))
    for u in range(8):
        cu = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
    return m


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-unstuffing; restart markers are consumed via :meth:`restart`."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                self.pos += 1
                if nxt != 0x00:
                    raise UnsupportedMedia("marker inside entropy data")
            self.buf = b
            self.nbits = 8
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker (T.81 E.2.4)."""
        self.nbits = 0
        if (
            self.data[self.pos] != 0xFF
            or not 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise UnsupportedMedia("missing restart marker")
        self.pos += 2


def _jpeg_build_huff(bits: list[int], vals: list[int]) -> dict:
    """Canonical JPEG Huffman assignment (T.81 C.2): (length, code) → symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _jpeg_decode_symbol(reader: _JpegBitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise UnsupportedMedia("invalid huffman code")


def _jpeg_extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the s received bits to a signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """Baseline JPEG decode (stdlib + numpy): returns (width, height,
    channels, row-major interleaved pixel bytes) — grayscale stays 1
    channel, YCbCr converts to RGB. Round-trip-pinned against
    :func:`encode_jpeg`."""
    import struct

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise UnsupportedMedia("not a JPEG")
    pos = 2
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    w = h = None
    comps: list[dict] = []
    ri = 0
    sel: dict[int, tuple[int, int]] = {}
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise UnsupportedMedia("bad marker alignment")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI before any scan
            break
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (may hold several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq != 0:
                    raise UnsupportedMedia("16-bit quantization table")
                qt[tq] = list(seg[i : i + 64])
                i += 64
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (both Huffman seq.)
            if seg[0] != 8:
                raise UnsupportedMedia(f"precision {seg[0]}")
            h, w = struct.unpack(">HH", seg[1:5])
            comps = []
            for ci in range(seg[5]):
                cid, samp, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 15, "tq": tq}
                )
            if len(comps) not in (1, 3):
                raise UnsupportedMedia(f"{len(comps)} components")
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise UnsupportedMedia("non-baseline JPEG (progressive/lossless)")
        elif marker == 0xC4:  # DHT (may hold several tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                i += 1
                bits = list(seg[i : i + 16])
                i += 16
                nv = sum(bits)
                vals = list(seg[i : i + nv])
                i += nv
                (huff_dc if tc == 0 else huff_ac)[th] = _jpeg_build_huff(
                    bits, vals
                )
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS → entropy-coded data follows
            for si in range(seg[0]):
                cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                sel[cs] = (tt >> 4, tt & 15)
            pos += seglen
            break
        pos += seglen
    if w is None or not sel:
        raise UnsupportedMedia("missing SOF/SOS")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    ok_sampling = all(c["h"] == c["v"] == 1 for c in comps) or (
        len(comps) == 3
        and (comps[0]["h"], comps[0]["v"]) == (2, 2)
        and all(c["h"] == c["v"] == 1 for c in comps[1:])
    )
    if not ok_sampling:
        raise UnsupportedMedia("unsupported sampling factors")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]))
        for c in comps
    }
    m = _jpeg_dct_matrix()
    reader = _JpegBitReader(payload, pos)
    pred = {c["id"]: 0 for c in comps}
    nmcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and nmcu and nmcu % ri == 0:
                reader.restart()
                pred = {c["id"]: 0 for c in comps}
            nmcu += 1
            for c in comps:
                dc_t = huff_dc[sel[c["id"]][0]]
                ac_t = huff_ac[sel[c["id"]][1]]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs = np.zeros(64)
                        s = _jpeg_decode_symbol(reader, dc_t)
                        pred[c["id"]] += _jpeg_extend(reader.receive(s), s)
                        coeffs[0] = pred[c["id"]] * q[0]
                        k = 0
                        while k < 63:
                            rs = _jpeg_decode_symbol(reader, ac_t)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r != 15:
                                    break  # EOB
                                k += 16  # ZRL
                                continue
                            k += r + 1
                            if k > 63:
                                raise UnsupportedMedia("coeff overrun")
                            coeffs[_JPEG_ZIGZAG[k]] = (
                                _jpeg_extend(reader.receive(s), s) * q[k]
                            )
                        block = m.T @ coeffs.reshape(8, 8) @ m + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = block

    out_planes = []
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out_planes.append(p[:h, :w])
    if len(comps) == 1:
        gray = np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
        return w, h, 1, gray.tobytes()
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.rint(ch), 0, 255) for ch in (r, g, b)], axis=-1
    ).astype(np.uint8)
    return w, h, 3, rgb.tobytes()


class _JpegBitWriter:
    """MSB-first bit writer with 0xFF byte stuffing; flush pads with 1s."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)
        return bytes(self.buf)


def _jpeg_flat_tables() -> tuple[dict, dict, bytes]:
    """Encoder Huffman tables: every DC category at code length 4 (12
    symbols ≤ 15 usable codes) and every AC (run,size) symbol at length 8
    (162 ≤ 255) — spec-valid canonical tables that need no frequency pass;
    the decoder reads whatever DHT declares, so compression optimality is
    irrelevant for a round-trip fixture codec. Returns (dc_map, ac_map,
    DHT payload for tables DC#0 + AC#0)."""
    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    ac_syms = sorted(set(ac_syms))
    dc_map = {sym: (i, 4) for i, sym in enumerate(dc_syms)}
    ac_map = {sym: (i, 8) for i, sym in enumerate(ac_syms)}
    dc_bits = [0] * 16
    dc_bits[3] = len(dc_syms)
    ac_bits = [0] * 16
    ac_bits[7] = len(ac_syms)
    payload = (
        bytes([0x00]) + bytes(dc_bits) + bytes(dc_syms)
        + bytes([0x10]) + bytes(ac_bits) + bytes(ac_syms)
    )
    return dc_map, ac_map, payload


def encode_jpeg(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    quant: int | list[int] = 1,
    subsample: bool = False,
) -> bytes:
    """Minimal baseline JPEG encoder — the round-trip twin of
    :func:`decode_jpeg_pixels` and the fixture builder for tests.
    Grayscale (channels=1) or RGB→YCbCr (channels=3); ``subsample``
    emits 4:2:0 (box-averaged chroma) so the decoder's upsampling path is
    exercised; ``quant`` is a uniform scalar or a 64-entry zigzag-order
    table (1 = near-lossless: only DCT float rounding)."""
    import struct

    import numpy as np

    q = (
        [int(quant)] * 64 if isinstance(quant, int) else list(quant)
    )
    m = _jpeg_dct_matrix()
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(
        height, width, channels
    ).astype(np.float64)
    if channels == 3:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        yy = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [yy, cb, cr]
        samps = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
    elif channels == 1:
        planes = [arr[..., 0]]
        samps = [(1, 1)]
        subsample = False
    else:
        raise ValueError("encode_jpeg: channels must be 1 or 3")
    if subsample:
        # box-average 2×2 → one chroma sample (pad odd dims by edge repeat)
        def box(p):
            pp = np.pad(
                p,
                ((0, p.shape[0] % 2), (0, p.shape[1] % 2)),
                mode="edge",
            )
            return (
                pp[0::2, 0::2] + pp[1::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 1::2]
            ) / 4.0

        planes = [planes[0], box(planes[1]), box(planes[2])]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))

    dc_map, ac_map, dht_payload = _jpeg_flat_tables()
    out = _JpegBitWriter()
    pred = [0] * len(planes)

    def pad_plane(p, bw, bh):
        return np.pad(
            p, ((0, bh - p.shape[0]), (0, bw - p.shape[1])), mode="edge"
        )

    padded = [
        pad_plane(p, mcux * 8 * sh, mcuy * 8 * sv)
        for p, (sh, sv) in zip(planes, samps)
    ]

    def emit_block(ci, block):
        coeffs = m @ (block - 128.0) @ m.T
        zz = [
            int(np.rint(coeffs.flat[_JPEG_ZIGZAG[k]] / q[k]))
            for k in range(64)
        ]
        diff = zz[0] - pred[ci]
        pred[ci] = zz[0]
        s = int(abs(diff)).bit_length()
        code, ln = dc_map[s]
        out.write(code, ln)
        if s:
            out.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        for k in range(1, 64):
            v = zz[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_map[0xF0]
                out.write(code, ln)
                run -= 16
            s = int(abs(v)).bit_length()
            code, ln = ac_map[(run << 4) | s]
            out.write(code, ln)
            out.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if run:
            code, ln = ac_map[0x00]
            out.write(code, ln)

    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (p, (sh, sv)) in enumerate(zip(padded, samps)):
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        emit_block(ci, p[y0 : y0 + 8, x0 : x0 + 8])

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    zz_q = bytes(q[k] for k in range(64))
    sof_comps = b"".join(
        bytes([ci + 1, (sh << 4) | sv, 0])
        for ci, (sh, sv) in enumerate(samps)
    )
    sos_comps = b"".join(bytes([ci + 1, 0x00]) for ci in range(len(planes)))
    return (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + zz_q)
        + seg(
            0xC0,
            bytes([8])
            + struct.pack(">HH", height, width)
            + bytes([len(planes)])
            + sof_comps,
        )
        + seg(0xC4, dht_payload)
        + seg(0xDA, bytes([len(planes)]) + sos_comps + b"\x00\x3f\x00")
        + out.flush()
        + b"\xff\xd9"
    )


# ----------------------------------------------------------------- GIF
#
# GIF87a/89a first-frame decode, pure stdlib: logical screen + color
# tables → LZW decompress (variable code width, clear/EOI) → palette
# expansion → optional de-interlace. Animation frames past the first are
# ignored (first-frame features are what the pipeline extracts);
# transparency is treated as opaque palette color.


def _gif_lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytearray:
    """GIF-variant LZW (T.82 app. / GIF89a §22): codes grow from
    min_code_size+1 up to 12 bits, CLEAR resets the dictionary, EOI ends."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # dictionary as list of bytes; indexes 0..clear-1 are roots
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    prev: bytes | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                raise UnsupportedMedia("corrupt LZW stream")
            out += entry
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
            prev = entry
            if len(out) >= n_pixels:
                return out
    return out


def decode_gif_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """First-frame GIF decode (stdlib only): LZW inflate → palette rows →
    RGB bytes; handles local color tables and interlaced frames.
    Round-trip-pinned against :func:`encode_gif`."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise UnsupportedMedia("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = b""
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise UnsupportedMedia(f"unknown GIF block 0x{b0:02x}")
        left, top, w, h, iflags = struct.unpack("<HHHHB", payload[pos + 1 : pos + 10])
        pos += 10
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = payload[pos : pos + 3 * n]
            pos += 3 * n
        if not pal:
            raise UnsupportedMedia("no color table")
        min_code = payload[pos]
        pos += 1
        lzw = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            lzw += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _gif_lzw_decode(min_code, bytes(lzw), w * h)
        if len(idx) < w * h:
            raise UnsupportedMedia("truncated LZW data")
        if iflags & 0x40:  # interlaced: 4-pass row order
            rows = [idx[y * w : (y + 1) * w] for y in range(h)]
            order = (
                list(range(0, h, 8))
                + list(range(4, h, 8))
                + list(range(2, h, 4))
                + list(range(1, h, 2))
            )
            deint: list[bytes | None] = [None] * h
            for src_row, dst_y in enumerate(order):
                deint[dst_y] = rows[src_row]
            idx = bytearray(b"".join(r for r in deint if r is not None))
        rgb = bytearray()
        npal = len(pal) // 3
        for i in idx[: w * h]:
            if i >= npal:
                raise UnsupportedMedia("palette index out of range")
            rgb += pal[i * 3 : i * 3 + 3]
        return w, h, 3, bytes(rgb)
    raise UnsupportedMedia("no image descriptor")


def encode_gif(
    width: int,
    height: int,
    palette: bytes,
    indexes: bytes,
    interlace: bool = False,
) -> bytes:
    """Minimal GIF89a encoder (real LZW) — the round-trip twin of
    :func:`decode_gif_pixels` and the fixture builder for tests.
    ``palette``: packed RGB triples (length a power-of-two × 3, ≥ 2
    entries); ``indexes``: one palette index per pixel, row-major."""
    import struct

    npal = len(palette) // 3
    depth = max(1, (npal - 1).bit_length())
    if npal != (1 << depth):
        raise ValueError("palette size must be a power of two")
    min_code = max(2, depth)
    clear = 1 << min_code
    eoi = clear + 1

    if interlace:
        order = (
            list(range(0, height, 8))
            + list(range(4, height, 8))
            + list(range(2, height, 4))
            + list(range(1, height, 2))
        )
        indexes = b"".join(
            indexes[y * width : (y + 1) * width] for y in order
        )

    # LZW encode
    out_codes: list[tuple[int, int]] = []  # (code, width)
    width_bits = min_code + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(1 << min_code)}
    next_code = eoi + 1
    out_codes.append((clear, width_bits))
    s = b""
    for byte in indexes:
        s2 = s + bytes([byte])
        if s2 in table:
            s = s2
            continue
        out_codes.append((table[s], width_bits))
        if next_code < 4096:
            table[s2] = next_code
            # Width alignment: the decoder's first post-clear read sets
            # prev without appending, so its table LAGS our next_code by
            # one — it bumps at the end of its j-th read when its length
            # (our pre-increment next_code) reaches 2^width. Bump here,
            # before incrementing, to stay code-for-code aligned.
            if next_code == (1 << width_bits) and width_bits < 12:
                width_bits += 1
            next_code += 1
        else:
            out_codes.append((clear, width_bits))
            table = {bytes([i]): i for i in range(1 << min_code)}
            next_code = eoi + 1
            width_bits = min_code + 1
        s = bytes([byte])
    if s:
        out_codes.append((table[s], width_bits))
    out_codes.append((eoi, width_bits))

    acc = 0
    nbits = 0
    lzw = bytearray()
    for code, wbits in out_codes:
        acc |= code << nbits
        nbits += wbits
        while nbits >= 8:
            lzw.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        lzw.append(acc & 0xFF)

    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"

    iflags = 0x40 if interlace else 0x00
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", width, height, 0x80 | (depth - 1), 0, 0)
        + palette
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, width, height, iflags)
        + bytes([min_code])
        + bytes(blocks)
        + b"\x3b"
    )


def decode_image_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """Dispatch by magic to the real pixel codecs (PNG, baseline JPEG,
    GIF first frame); anything else → UnsupportedMedia (video remains
    honestly out of scope for this container)."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png_pixels(payload)
    if payload[:2] == b"\xff\xd8":
        return decode_jpeg_pixels(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_pixels(payload)
    raise UnsupportedMedia("no pixel codec for this container")


def decode_wav_samples(payload: bytes) -> tuple[int, int, list[int]]:
    """PCM WAV decode (stdlib struct): returns (n_channels, sample_rate,
    interleaved 16-bit samples). Non-PCM or non-16-bit → UnsupportedMedia."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise UnsupportedMedia("not a WAV")
    i, fmt, data = 12, None, None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (clen,) = struct.unpack("<I", payload[i + 4 : i + 8])
        body = payload[i + 8 : i + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        i += 8 + clen + (clen & 1)
    if fmt is None or data is None:
        raise UnsupportedMedia("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise UnsupportedMedia(f"format {audio_format}/{bits}bit")
    n = len(data) // 2
    samples = list(struct.unpack(f"<{n}h", data[: n * 2]))
    return n_channels, sample_rate, samples


def resize_pixels_nearest(
    width: int, height: int, channels: int, pixels: bytes, out_w: int, out_h: int
) -> bytes:
    """Real nearest-neighbor resample over decoded pixel bytes (numpy,
    vectorized per image) — deterministic, codec-free."""
    import numpy as np

    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    ys = (np.arange(out_h) * height) // out_h
    xs = (np.arange(out_w) * width) // out_w
    return img[ys][:, xs].tobytes()


def image_pixel_features(media: DataFrame) -> DataFrame:
    """REAL pixel-level image features over decodable payloads (PNG): mean /
    std per image, mean luma, and a pixel hash — mapInPandas, one Arrow
    batch per iteration, numpy math per image. Rows whose payloads need an
    absent codec (JPEG/GIF/video/garbage) are dropped — the operator only
    claims what it really decoded."""
    import numpy as np

    schema = (
        "doc_id string, media_ref string, width int, height int, "
        "n_channels int, mean_px double, std_px double, mean_luma double, "
        "px_hash long"
    )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            rows = []
            for did, ref, payload in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["payload"]
            ):
                try:
                    w, h, c, px = decode_image_pixels(bytes(payload))
                except (UnsupportedMedia, zlib.error, struct.error, ValueError, IndexError):
                    continue
                img = np.frombuffer(px, dtype=np.uint8).reshape(h, w, c)
                if c >= 3:
                    luma = (
                        0.299 * img[..., 0]
                        + 0.587 * img[..., 1]
                        + 0.114 * img[..., 2]
                    )
                else:
                    luma = img[..., 0].astype(np.float64)
                rows.append(
                    (
                        did,
                        ref,
                        w,
                        h,
                        c,
                        float(img.mean()),
                        float(img.std()),
                        float(luma.mean()),
                        zlib.crc32(px) - (1 << 31),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_ref", "width", "height", "n_channels",
                    "mean_px", "std_px", "mean_luma", "px_hash",
                ],
            )

    return media.mapInPandas(feats, schema=schema)


def image_pixel_stats_exact(media: DataFrame) -> DataFrame:
    """Oracle-replayable twin of :func:`image_pixel_features`: every
    statistic derives from EXACT integer pixel sums with a fixed float op
    order (sum/n, sqrt(sxx/n - (sx/n)²), weighted-luma/npix), so a SQL
    oracle that knows the pixel values reproduces the numbers bit-for-bit
    — the same engine-independence discipline as the k-means quantizer.
    The payload still goes through the REAL PNG codec."""
    import math

    schema = (
        "doc_id bigint, width bigint, height bigint, n_channels int, "
        "mean_px double, std_px double, mean_luma double"
    )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    w, h, c, px = decode_image_pixels(bytes(payload))
                except (UnsupportedMedia, zlib.error, struct.error, ValueError, IndexError):
                    continue
                n = w * h * c
                sx = sum(px)
                sxx = sum(v * v for v in px)
                mean = sx / n
                std = math.sqrt(sxx / n - (sx / n) * (sx / n))
                if c >= 3:
                    sr = sum(px[0::c])
                    sg = sum(px[1::c])
                    sb = sum(px[2::c])
                    luma = (0.299 * sr + 0.587 * sg + 0.114 * sb) / (w * h)
                else:
                    luma = sum(px[0::c]) / (w * h)
                rows.append((int(did), w, h, c, mean, std, luma))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_channels",
                    "mean_px", "std_px", "mean_luma",
                ],
            )

    return media.mapInPandas(feats, schema=schema)


def audio_pcm_features(media: DataFrame) -> DataFrame:
    """REAL sample-level audio features over decodable payloads (16-bit PCM
    WAV): rms, peak, duration — same drop-what-you-can't-decode contract
    as :func:`image_pixel_features`."""
    import math

    schema = (
        "doc_id string, media_ref string, n_channels int, sample_rate int, "
        "n_samples long, duration_ms double, rms double, peak int"
    )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, ref, payload in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["payload"]
            ):
                try:
                    nch, rate, samples = decode_wav_samples(bytes(payload))
                except (UnsupportedMedia, zlib.error, struct.error, ValueError, IndexError):
                    continue
                n = len(samples)
                rms = (
                    math.sqrt(sum(s * s for s in samples) / n) if n else 0.0
                )
                rows.append(
                    (
                        did,
                        ref,
                        nch,
                        rate,
                        n,
                        (n / nch) / rate * 1000.0 if rate and nch else 0.0,
                        rms,
                        max((abs(s) for s in samples), default=0),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_ref", "n_channels", "sample_rate",
                    "n_samples", "duration_ms", "rms", "peak",
                ],
            )

    return media.mapInPandas(feats, schema=schema)


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


def parse_mp4_metadata(payload: bytes) -> dict | None:
    """REAL ISO-BMFF (MP4) box walk, stdlib only: returns
    ``{"duration_ms", "width", "height", "timescale", "brand"}`` from
    moov/mvhd + the first visual trak's tkhd, or None when the bytes are
    not an MP4. Frame PIXEL decode still honestly needs a codec library —
    this parses the container metadata a pipeline can really use (duration
    for frame-sampling timestamps, dimensions for bucketing)."""
    import struct

    if len(payload) < 12 or payload[4:8] != b"ftyp":
        return None
    brand = payload[8:12].decode("ascii", "replace")
    out = {"brand": brand, "duration_ms": None, "width": None,
           "height": None, "timescale": None}

    def walk(lo: int, hi: int, depth: int = 0) -> None:
        pos = lo
        while pos + 8 <= hi:
            (size,) = struct.unpack(">I", payload[pos : pos + 4])
            btype = payload[pos + 4 : pos + 8]
            body = pos + 8
            if size == 1:  # 64-bit largesize
                if pos + 16 > hi:
                    return
                (size,) = struct.unpack(">Q", payload[pos + 8 : pos + 16])
                body = pos + 16
            elif size == 0:  # to end of enclosing box
                size = hi - pos
            if size < 8 or pos + size > hi:
                return
            if btype in (b"moov", b"trak", b"mdia") and depth < 4:
                walk(body, pos + size, depth + 1)
            elif btype == b"mvhd" and body + 4 <= hi:
                ver = payload[body]
                if ver == 1 and body + 32 <= hi:
                    ts, dur = struct.unpack(
                        ">IQ", payload[body + 20 : body + 32]
                    )
                else:
                    ts, dur = struct.unpack(
                        ">II", payload[body + 12 : body + 20]
                    )
                if ts:
                    out["timescale"] = ts
                    out["duration_ms"] = round(dur * 1000.0 / ts, 3)
            elif btype == b"tkhd" and out["width"] is None:
                ver = payload[body]
                # width/height are the LAST two 16.16 fixed-point fields
                # (v0: 4 fullbox + 72 fields/matrix; v1: +12 for 64-bit
                # creation/modification/duration)
                off = body + (88 if ver == 1 else 76)
                if off + 8 <= hi:
                    w_fx, h_fx = struct.unpack(
                        ">II", payload[off : off + 8]
                    )
                    if w_fx and h_fx:
                        out["width"] = w_fx >> 16
                        out["height"] = h_fx >> 16
            pos += size

    walk(0, len(payload))
    return out


def encode_mp4_stub(
    width: int,
    height: int,
    duration_ms: float,
    timescale: int = 1000,
) -> bytes:
    """Minimal valid ISO-BMFF skeleton (ftyp + moov{mvhd, trak{tkhd}}) —
    the fixture twin of :func:`parse_mp4_metadata`. No media data; real
    players would reject it, but the metadata boxes are spec-shaped."""
    import struct

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + btype + body

    dur = int(round(duration_ms * timescale / 1000.0))
    mvhd = box(
        b"mvhd",
        b"\x00" + b"\x00" * 3          # version 0 + flags
        + struct.pack(">II", 0, 0)      # creation/modification
        + struct.pack(">II", timescale, dur)
        + b"\x00" * 80,                 # rate..next_track_id
    )
    tkhd = box(
        b"tkhd",
        b"\x00" + b"\x00" * 3
        + b"\x00" * 72                  # v0 fields through matrix
        + struct.pack(">II", width << 16, height << 16),
    )
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    return ftyp + moov


def video_metadata(media: DataFrame) -> DataFrame:
    """REAL container metadata for video rows: ISO-BMFF (MP4) via
    :func:`parse_mp4_metadata` (brand, duration, dimensions) and RIFF AVI
    via :func:`decode_avi_mjpeg` (brand 'AVI ', duration from frame count
    × rate, dimensions from avih). Unparseable payloads are dropped (same
    drop-what-you-can't-parse contract as the pixel-feature operators).
    MP4 frame pixels still need a codec library; AVI/MJPEG frames decode
    for real via :func:`video_frame_features`."""
    schema = (
        "doc_id string, media_ref string, brand string, "
        "duration_ms double, width int, height int"
    )

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, ref, payload in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["payload"]
            ):
                m = parse_mp4_metadata(bytes(payload))
                if m is None:
                    try:
                        w, h, fps, frames = decode_avi_mjpeg(bytes(payload))
                    except (UnsupportedMedia, struct.error, ValueError,
                            IndexError):
                        continue
                    m = {
                        "brand": "AVI ",
                        "duration_ms": len(frames) / fps * 1000.0 if fps else 0.0,
                        "width": w,
                        "height": h,
                    }
                rows.append(
                    (did, ref, m["brand"], m["duration_ms"],
                     m["width"], m["height"])
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_ref", "brand",
                    "duration_ms", "width", "height",
                ],
            )

    return media.where(F.col("media_type") == "video").mapInPandas(
        meta, schema=schema
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


# --------------------------------------------------------------- AVI / MJPEG
#
# MJPEG-in-AVI is the one mainstream video format whose frames are each a
# self-contained baseline JPEG — which this module already decodes for
# real — so the whole video pixel path composes from parts that are
# individually round-trip-pinned: a RIFF chunk walk (same discipline as
# the WAV reader) plus decode_jpeg_pixels per sampled frame.

AVI_AVIH = 56  # main header payload size
AVI_STRH = 56  # stream header payload size


def decode_avi_mjpeg(payload: bytes) -> tuple[int, int, float, list[bytes]]:
    """REAL AVI demux: returns (width, height, fps, frames) where each
    frame is the raw JPEG bytes of one '00dc' movi chunk (decode with
    :func:`decode_jpeg_pixels`). Accepts only the MJPG/mjpg fourcc — an
    AVI carrying an inter-frame codec raises :class:`UnsupportedMedia`
    (decoding it honestly needs a codec library)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise UnsupportedMedia("not an AVI")
    width = height = 0
    usec_per_frame = 0
    handler_ok = False
    frames: list[bytes] = []

    def walk(lo: int, hi: int) -> None:
        nonlocal width, height, usec_per_frame, handler_ok
        i = lo
        while i + 8 <= hi:
            cid = payload[i : i + 4]
            clen = struct.unpack("<I", payload[i + 4 : i + 8])[0]
            body_lo, body_hi = i + 8, min(i + 8 + clen, hi)
            if cid == b"LIST" and body_hi - body_lo >= 4:
                walk(body_lo + 4, body_hi)  # list type fourcc, then children
            elif cid == b"avih" and clen >= AVI_AVIH:
                (usec_per_frame,) = struct.unpack(
                    "<I", payload[body_lo : body_lo + 4]
                )
                width, height = struct.unpack(
                    "<II", payload[body_lo + 32 : body_lo + 40]
                )
            elif cid == b"strh" and clen >= AVI_STRH:
                if payload[body_lo : body_lo + 4] == b"vids":
                    fcc = payload[body_lo + 4 : body_lo + 8]
                    if fcc not in (b"MJPG", b"mjpg"):
                        raise UnsupportedMedia(
                            f"AVI codec {fcc!r} (only MJPG frames are JPEGs)"
                        )
                    handler_ok = True
            elif cid in (b"00dc", b"00db"):
                frames.append(bytes(payload[body_lo:body_hi]))
            i += 8 + clen + (clen & 1)

    walk(12, len(payload))
    if not handler_ok:
        raise UnsupportedMedia("no MJPG video stream header")
    fps = 1e6 / usec_per_frame if usec_per_frame else 0.0
    return width, height, fps, frames


def encode_avi_mjpeg(
    width: int, height: int, jpeg_frames: list[bytes], fps: float = 10.0
) -> bytes:
    """Minimal AVI muxer around pre-encoded JPEG frames (use
    :func:`encode_jpeg`) — the round-trip twin of :func:`decode_avi_mjpeg`
    and the fixture builder for tests. Emits RIFF(AVI )/hdrl(avih,
    strl(strh 'vids'/'MJPG', strf BITMAPINFOHEADER))/movi(00dc…)/idx1."""
    n = len(jpeg_frames)
    usec = int(round(1e6 / fps)) if fps else 0

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<14I", usec, 0, 0, 0x10, n, 0, 1, 0, width, height, 0, 0, 0, 0
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, int(round(fps)) or 1, 0, n, 0, 0, -1)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    movi_body = b"".join(chunk(b"00dc", f) for f in jpeg_frames)
    idx, off = [], 4
    for f in jpeg_frames:
        idx.append(b"00dc" + struct.pack("<III", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) & 1)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    body = b"AVI " + hdrl + lst(b"movi", movi_body) + chunk(b"idx1", b"".join(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def video_frame_features(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """REAL per-frame pixel features for MJPEG-AVI video rows: demux the
    container, sample ``n_frames`` evenly spaced frames, baseline-JPEG-
    decode each and emit (frame_idx, width, height, mean_px, mean_luma) —
    the same drop-what-you-can't-decode contract as the image operators
    (MP4 payloads raise UnsupportedMedia in the demux and are dropped).
    Arrow-batched mapInPandas; one task decodes only its batch's frames."""
    import math

    schema = (
        "doc_id string, media_ref string, frame_idx int, "
        "width int, height int, mean_px double, mean_luma double"
    )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, ref, payload in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["payload"]
            ):
                try:
                    w, h, fps, frames = decode_avi_mjpeg(bytes(payload))
                except (UnsupportedMedia, struct.error, ValueError, IndexError):
                    continue
                if not frames:
                    continue
                step = max(len(frames) // n_frames, 1)
                for fi in list(range(0, len(frames), step))[:n_frames]:
                    try:
                        fw, fh, c, px = decode_jpeg_pixels(frames[fi])
                    except (UnsupportedMedia, struct.error, ValueError, IndexError):
                        continue
                    npx = fw * fh * c
                    mean = sum(px) / npx
                    if c >= 3:
                        luma = (
                            0.299 * sum(px[0::c])
                            + 0.587 * sum(px[1::c])
                            + 0.114 * sum(px[2::c])
                        ) / (fw * fh)
                    else:
                        luma = sum(px[0::c]) / (fw * fh)
                    rows.append((did, ref, fi, fw, fh, mean, luma))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_ref", "frame_idx",
                    "width", "height", "mean_px", "mean_luma",
                ],
            )

    return media.where(F.col("media_type") == "video").mapInPandas(
        feats, schema=schema
    )
