"""Multimodal plumbing: media-span extraction, mapInPandas decode stub
(schema + batch shape), resize planning, frame sampling."""

import pytest
from pyspark.sql import functions as F

from goprowl_spark import corpus
from goprowl_spark.operators import multimodal as M
from goprowl_spark.parse import parse_spans_udf

N = 200


@pytest.fixture(scope="module")
def docs(spark):
    pages = corpus.corpus_df(spark, N).where(F.col("status") == 200)
    return pages.select(
        F.col("url").alias("doc_id"),
        parse_spans_udf(F.col("html"), F.col("url")).alias("spans"),
    )


def test_media_table_matches_corpus_ground_truth(spark, docs):
    rows = M.media_table(docs).collect()
    got = {(r["doc_id"], r["media_ref"]) for r in rows}
    exp = set()
    for i in range(N):
        if corpus.status(i) != 200:
            continue
        for k in range(corpus.media_count(i)):
            exp.add((corpus.url(i), corpus.media_url(i, k)))
    assert got == exp
    assert all(r["media_type"] == "image" for r in rows)
    assert all(len(r["payload"]) == 32 for r in rows)


def test_decode_media_deterministic_schema(spark, docs):
    decoded = M.decode_media(M.media_table(docs))
    assert decoded.columns == [
        "doc_id", "media_ref", "media_type",
        "width", "height", "n_channels", "n_bytes",
    ]
    rows = decoded.collect()
    assert rows
    for r in rows:
        assert 64 <= r["width"] < 256 and 64 <= r["height"] < 256
        assert 1 <= r["n_channels"] <= 4 and r["n_bytes"] == 32
    # deterministic: re-running yields identical values
    again = {r["media_ref"]: (r["width"], r["height"]) for r in M.decode_media(M.media_table(docs)).collect()}
    for r in rows:
        assert again[r["media_ref"]] == (r["width"], r["height"])


def test_resize_planning(spark, docs):
    resized = M.resize_media(M.decode_media(M.media_table(docs)), max_side=100)
    for r in resized.collect():
        assert max(r["resized_w"], r["resized_h"]) <= 100
        if max(r["width"], r["height"]) <= 100:
            assert (r["resized_w"], r["resized_h"]) == (r["width"], r["height"])


def test_sample_frames_only_videos(spark):
    media = spark.createDataFrame(
        [
            ("d1", "https://h0.test/v/a.mp4", "video", b"x"),
            ("d2", "https://h0.test/i/b.png", "image", b"y"),
        ],
        M.MEDIA_SCHEMA,
    )
    rows = M.sample_frames(media, n_frames=3).collect()
    assert len(rows) == 3
    assert {r["frame_idx"] for r in rows} == {0, 1, 2}
    assert all(r["media_ref"].endswith(".mp4") for r in rows)


def test_parse_media_header_real_containers():
    import struct
    import zlib

    from goprowl_spark.operators.multimodal import parse_media_header

    # real PNG: signature + IHDR chunk (320x200, RGBA)
    ihdr = struct.pack(">II", 320, 200) + bytes([8, 6, 0, 0, 0])
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )
    assert parse_media_header(png) == (320, 200, 4)

    # real JPEG: SOI + APP0 + SOF0 (baseline, 640x480, 3 components)
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(9)
    sof0 = b"\xff\xc0" + struct.pack(">H", 17) + bytes([8]) + struct.pack(
        ">HH", 480, 640
    ) + bytes([3]) + bytes(9)
    assert parse_media_header(b"\xff\xd8" + app0 + sof0) == (640, 480, 3)

    # real GIF89a logical screen 12x34
    gif = b"GIF89a" + struct.pack("<HH", 12, 34) + bytes(3)
    assert parse_media_header(gif) == (12, 34, 3)

    # real WAV fmt chunk, stereo
    wav = (
        b"RIFF" + bytes(4) + b"WAVE" + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HH", 1, 2) + bytes(12)
    )
    assert parse_media_header(wav) == (0, 0, 2)

    # unknown container → None (stub decoder takes over)
    assert parse_media_header(b"\x00" * 32) is None


def _checker_pixels(w, h, c):
    return bytes(
        ((x * 37 + y * 101 + ch * 53) % 256)
        for y in range(h)
        for x in range(w)
        for ch in range(c)
    )


def test_png_roundtrip_every_filter_type():
    """encode→decode recovers exact pixels for every scanline filter
    (None/Sub/Up/Average/Paeth) and every supported channel count — this
    pins each unfilter branch of the pure-stdlib codec."""
    from goprowl_spark.operators.multimodal import decode_png_pixels, encode_png

    for channels in (1, 2, 3, 4):
        px = _checker_pixels(9, 7, channels)
        for ftype in range(5):
            blob = encode_png(9, 7, channels, px, filter_type=ftype)
            assert decode_png_pixels(blob) == (9, 7, channels, px), (
                f"filter {ftype} channels {channels}"
            )


def test_png_palette_and_unsupported():
    import struct
    import zlib

    from goprowl_spark.operators.multimodal import (
        UnsupportedMedia,
        decode_png_pixels,
    )

    # hand-built 2x2 palette PNG: indices 0..3 → expands to the palette RGB
    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    raw = b"\x00" + bytes([0, 1]) + b"\x00" + bytes([2, 3])
    blob = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )
    assert decode_png_pixels(blob) == (
        2, 2, 3, bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    )

    import pytest as _pytest

    with _pytest.raises(UnsupportedMedia):
        decode_png_pixels(b"\xff\xd8not a png")


def test_wav_decode_and_resize_pixels():
    import io
    import wave

    from goprowl_spark.operators.multimodal import (
        decode_wav_samples,
        resize_pixels_nearest,
    )

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        import struct as _s

        wf.writeframes(_s.pack("<6h", 100, -100, 200, -200, 300, -300))
    nch, rate, samples = decode_wav_samples(buf.getvalue())
    assert (nch, rate) == (2, 8000)
    assert samples == [100, -100, 200, -200, 300, -300]

    # nearest-neighbor downsample halves a 4x2 image to 2x1 deterministically
    px = _checker_pixels(4, 2, 3)
    out = resize_pixels_nearest(4, 2, 3, px, 2, 1)
    assert len(out) == 2 * 1 * 3
    assert out[:3] == px[:3]  # top-left pixel preserved


def test_image_and_audio_features_real_pixels(spark):
    """The pixel/sample feature operators decode REAL payloads and drop
    undecodable rows — verified against numpy on the same pixels."""
    import io
    import struct as _s
    import wave

    import numpy as np

    from goprowl_spark.operators import multimodal as MM

    px = _checker_pixels(8, 6, 3)
    png = MM.encode_png(8, 6, 3, px, filter_type=4)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(_s.pack("<4h", 1000, -1000, 2000, -2000))
    media = spark.createDataFrame(
        [
            ("d1", "a.png", "image", bytearray(png)),
            ("d2", "b.wav", "audio", bytearray(buf.getvalue())),
            ("d3", "c.jpg", "image", bytearray(b"\xff\xd8garbage")),
        ],
        "doc_id string, media_ref string, media_type string, payload binary",
    )
    img = MM.image_pixel_features(media).collect()
    assert [r["doc_id"] for r in img] == ["d1"]
    arr = np.frombuffer(px, dtype=np.uint8)
    assert img[0]["mean_px"] == float(arr.mean())
    assert abs(img[0]["std_px"] - float(arr.std())) < 1e-9
    assert img[0]["width"] == 8 and img[0]["n_channels"] == 3

    aud = MM.audio_pcm_features(media).collect()
    assert [r["doc_id"] for r in aud] == ["d2"]
    a = aud[0]
    assert a["n_samples"] == 4 and a["peak"] == 2000
    assert a["duration_ms"] == 4 / 16000 * 1000
    exp_rms = float(np.sqrt(np.mean(np.array([1000, -1000, 2000, -2000]) ** 2.0)))
    assert abs(a["rms"] - exp_rms) < 1e-9


def test_corrupt_png_dropped_not_swallowed(spark):
    """Exception contract of the feature UDFs: a corrupt-but-PNG-magic
    payload (truncated IDAT -> zlib.error) is DROPPED as undecodable, while
    anything outside the codec's narrow failure set propagates — the catch
    is (UnsupportedMedia, zlib.error, struct.error, ValueError, IndexError),
    never bare Exception."""
    import zlib

    import pytest

    from goprowl_spark.operators import multimodal as MM

    px = _checker_pixels(8, 6, 3)
    good = MM.encode_png(8, 6, 3, px, filter_type=2)
    # valid signature + IHDR, IDAT cut mid-stream: zlib inflate fails
    idat_at = good.index(b"IDAT")
    corrupt = good[: idat_at + 10]
    with pytest.raises(zlib.error):
        MM.decode_png_pixels(corrupt)

    media = spark.createDataFrame(
        [
            ("d1", "a.png", "image", bytearray(good)),
            ("d2", "bad.png", "image", bytearray(corrupt)),
        ],
        "doc_id string, media_ref string, media_type string, payload binary",
    )
    img = MM.image_pixel_features(media).collect()
    assert [r["doc_id"] for r in img] == ["d1"]

    # a failure class outside the codec contract must surface, not vanish
    with pytest.raises(TypeError):
        MM.decode_png_pixels(None)


def test_jpeg_roundtrip_flat_blocks_exact():
    """A flat-color image has only DC energy: with an all-ones quant table
    the codec round-trips it EXACTLY (DCT of a constant block quantizes
    without loss) — grayscale and RGB."""
    from goprowl_spark.operators import multimodal as MM

    for w, h, c, val in ((16, 8, 1, 77), (8, 16, 3, 200)):
        px = bytes([val] * (w * h * c))
        blob = MM.encode_jpeg(w, h, c, px, quant=1)
        gw, gh, gc, gpx = MM.decode_jpeg_pixels(blob)
        assert (gw, gh, gc) == (w, h, c)
        assert gpx == px


def test_jpeg_roundtrip_near_lossless():
    """quant=1 keeps only DCT coefficient rounding plus the YCbCr
    round-trip: every pixel of a busy image must round-trip within ±2,
    with mean error well under half a level (measured: max 2, mean 0.26)."""
    import numpy as np

    from goprowl_spark.operators import multimodal as MM

    px = _checker_pixels(17, 11, 3)  # non-multiple-of-8 dims
    blob = MM.encode_jpeg(17, 11, 3, px, quant=1)
    w, h, c, got = MM.decode_jpeg_pixels(blob)
    assert (w, h, c) == (17, 11, 3)
    a = np.frombuffer(px, dtype=np.uint8).astype(int)
    b = np.frombuffer(got, dtype=np.uint8).astype(int)
    assert np.abs(a - b).max() <= 2
    assert np.abs(a - b).mean() < 0.5


def test_jpeg_quantized_and_grayscale():
    """A real quant table loses detail but the decode must stay close for
    smooth content, and grayscale single-component scans decode."""
    import numpy as np

    from goprowl_spark.operators import multimodal as MM

    w, h = 24, 16
    px = bytes(((x * 3 + y * 2) % 200 + 20) for y in range(h) for x in range(w))
    blob = MM.encode_jpeg(w, h, 1, px, quant=8)
    gw, gh, gc, got = MM.decode_jpeg_pixels(blob)
    assert (gw, gh, gc) == (w, h, 1)
    a = np.frombuffer(px, dtype=np.uint8).astype(int)
    b = np.frombuffer(got, dtype=np.uint8).astype(int)
    assert np.abs(a - b).mean() < 8.0


def test_jpeg_420_subsampling_decodes():
    """4:2:0 exercises the multi-block MCU + chroma upsample path: luma
    must stay within DCT rounding of the source's luma; chroma is box-
    averaged so only smooth-chroma content is compared exactly-ish."""
    import numpy as np

    from goprowl_spark.operators import multimodal as MM

    w, h = 20, 12
    # smooth chroma (constant Cb/Cr), varying luma
    px = bytearray()
    for y in range(h):
        for x in range(w):
            v = (x * 7 + y * 11) % 256
            px += bytes((v, v, v))  # gray → Cb=Cr=128 exactly
    blob = MM.encode_jpeg(w, h, 3, bytes(px), quant=1, subsample=True)
    gw, gh, gc, got = MM.decode_jpeg_pixels(blob)
    assert (gw, gh, gc) == (w, h, 3)
    a = np.frombuffer(bytes(px), dtype=np.uint8).astype(int)
    b = np.frombuffer(got, dtype=np.uint8).astype(int)
    assert np.abs(a - b).max() <= 2


def test_jpeg_restart_markers():
    """DRI/RSTn path: splice a restart interval into an encoded stream by
    re-encoding MCU-by-MCU is overkill — instead decode a stream our
    encoder produced, then assert the reader rejects corrupted restart
    sequences distinctly (UnsupportedMedia, not garbage pixels)."""
    import pytest

    from goprowl_spark.operators import multimodal as MM

    px = bytes([90] * (8 * 8 * 3))
    blob = MM.encode_jpeg(8, 8, 3, px, quant=1)
    # inject a bogus DRI header with no actual RST markers in the scan:
    # decoder must fail loudly, not mis-decode
    import struct

    dri = b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", 1)
    sos_at = blob.index(b"\xff\xda")
    # DRI must precede SOS; with interval=1 the decoder expects RST after
    # every MCU — 8x8 image has 1 MCU (no restart fires) → still decodes
    ok = blob[:sos_at] + dri + blob[sos_at:]
    w, h, c, got = MM.decode_jpeg_pixels(ok)
    assert got == px
    # 16x8 = 2 MCUs with interval 1 → a restart IS expected mid-scan and
    # is absent → loud failure
    px2 = bytes([90] * (16 * 8 * 3))
    blob2 = MM.encode_jpeg(16, 8, 3, px2, quant=1)
    sos_at2 = blob2.index(b"\xff\xda")
    bad = blob2[:sos_at2] + dri + blob2[sos_at2:]
    with pytest.raises(MM.UnsupportedMedia):
        MM.decode_jpeg_pixels(bad)


def test_jpeg_unsupported_variants_guarded():
    import pytest

    from goprowl_spark.operators import multimodal as MM

    px = bytes([10] * (8 * 8 * 3))
    blob = bytearray(MM.encode_jpeg(8, 8, 3, px, quant=1))
    # flip SOF0 marker to SOF2 (progressive)
    at = bytes(blob).index(b"\xff\xc0")
    blob[at + 1] = 0xC2
    with pytest.raises(MM.UnsupportedMedia):
        MM.decode_jpeg_pixels(bytes(blob))
    with pytest.raises(MM.UnsupportedMedia):
        MM.decode_jpeg_pixels(b"GIF89a" + b"\x00" * 20)


def test_image_features_decode_jpeg_payloads(spark):
    """The pixel-feature operator now dispatches by magic: JPEG payloads
    produce real rows (exact for a flat image) alongside PNGs."""
    import numpy as np

    from goprowl_spark.operators import multimodal as MM

    flat = bytes([120] * (16 * 8 * 3))
    jpg = MM.encode_jpeg(16, 8, 3, flat, quant=1)
    png = MM.encode_png(8, 6, 3, _checker_pixels(8, 6, 3), filter_type=1)
    media = spark.createDataFrame(
        [
            ("j1", "a.jpg", "image", bytearray(jpg)),
            ("p1", "b.png", "image", bytearray(png)),
            ("g1", "c.gif", "image", bytearray(b"GIF89a" + b"\x00" * 10)),
        ],
        "doc_id string, media_ref string, media_type string, payload binary",
    )
    rows = {r["doc_id"]: r for r in MM.image_pixel_features(media).collect()}
    assert set(rows) == {"j1", "p1"}  # GIF dropped, both codecs ran
    assert rows["j1"]["width"] == 16 and rows["j1"]["n_channels"] == 3
    assert rows["j1"]["mean_px"] == 120.0 and rows["j1"]["std_px"] == 0.0


def test_gif_roundtrip_lzw():
    """GIF encode→decode is exact (palette images are lossless): plain,
    interlaced, 2-color (min code size floor), and an image big enough to
    force the 4096-entry LZW dictionary reset."""
    import random

    from goprowl_spark.operators import multimodal as MM

    rng = random.Random(7)
    pal = bytes(
        v for i in range(16) for v in (i * 16, 255 - i * 16, (i * 37) % 256)
    )
    idx = bytes(rng.randrange(16) for _ in range(64 * 48))
    want = b"".join(pal[i * 3 : i * 3 + 3] for i in idx)
    assert MM.decode_gif_pixels(MM.encode_gif(64, 48, pal, idx)) == (
        64, 48, 3, want,
    )
    # interlaced: same pixels, 4-pass row order on the wire
    assert MM.decode_gif_pixels(
        MM.encode_gif(64, 48, pal, idx, interlace=True)
    ) == (64, 48, 3, want)
    # 200x150 random 16-color ≈ 12k+ LZW entries → crosses 4096 reset
    idx2 = bytes(rng.randrange(16) for _ in range(200 * 150))
    got = MM.decode_gif_pixels(MM.encode_gif(200, 150, pal, idx2))
    assert got[3] == b"".join(pal[i * 3 : i * 3 + 3] for i in idx2)
    # 2-color palette exercises the min-code-size floor of 2
    pal2 = bytes((0, 0, 0, 255, 255, 255))
    idxb = bytes((x ^ y) & 1 for y in range(10) for x in range(9))
    assert MM.decode_gif_pixels(MM.encode_gif(9, 10, pal2, idxb))[3] == b"".join(
        pal2[i * 3 : i * 3 + 3] for i in idxb
    )


def test_gif_guards_and_dispatch(spark):
    import pytest

    from goprowl_spark.operators import multimodal as MM

    with pytest.raises(MM.UnsupportedMedia):
        MM.decode_gif_pixels(b"GIF89a" + b"\x00" * 7 + b"\x3b")  # no frame
    with pytest.raises(MM.UnsupportedMedia):
        # well-formed container, but the LZW stream is just CLEAR+EOI:
        # the descriptor promises 64 pixels that never arrive
        import struct

        empty = (
            b"GIF89a"
            + struct.pack("<HHBBB", 8, 8, 0x80, 0, 0)
            + bytes(6)  # 2-entry global color table
            + b"\x2c"
            + struct.pack("<HHHHB", 0, 0, 8, 8, 0)
            + bytes([2])  # min code size
            + b"\x01\x2c\x00"  # one LZW byte: CLEAR(4) then EOI(5) @ 3 bits
            + b"\x3b"
        )
        MM.decode_gif_pixels(empty)
    # the feature operator now yields real rows for GIF payloads
    pal = bytes(v for i in range(4) for v in (i * 80, i * 80, i * 80))
    idx = bytes((x + y) % 4 for y in range(8) for x in range(8))
    gif = MM.encode_gif(8, 8, pal, idx)
    media = spark.createDataFrame(
        [("g1", "a.gif", "image", bytearray(gif))],
        "doc_id string, media_ref string, media_type string, payload binary",
    )
    rows = MM.image_pixel_features(media).collect()
    assert len(rows) == 1 and rows[0]["width"] == 8
    import numpy as np

    want = np.array(
        [pal[i * 3] for i in idx], dtype=np.uint8
    )  # grayscale palette → every channel equal
    assert rows[0]["mean_px"] == float(want.mean())


def test_mp4_metadata_roundtrip_and_operator(spark):
    """parse_mp4_metadata walks real ISO-BMFF boxes: exact round-trip
    against the spec-shaped stub encoder (v0 mvhd/tkhd offsets), 64-bit
    largesize tolerated, non-MP4 → None; the video_metadata operator
    yields rows only for MP4 payloads."""
    from goprowl_spark.operators import multimodal as MM

    blob = MM.encode_mp4_stub(1920, 1080, 12345.0)
    assert MM.parse_mp4_metadata(blob) == {
        "brand": "isom", "duration_ms": 12345.0,
        "width": 1920, "height": 1080, "timescale": 1000,
    }
    assert MM.parse_mp4_metadata(b"\x00" * 40) is None
    assert MM.parse_mp4_metadata(b"RIFFxxxxWAVE") is None

    media = spark.createDataFrame(
        [
            ("v1", "a.mp4", "video", bytearray(blob)),
            ("v2", "b.mp4", "video", bytearray(b"not an mp4 at all")),
            ("i1", "c.png", "image", bytearray(b"\x89PNG\r\n\x1a\n")),
        ],
        "doc_id string, media_ref string, media_type string, payload binary",
    )
    rows = MM.video_metadata(media).collect()
    assert [(r["doc_id"], r["width"], r["height"], r["duration_ms"], r["brand"])
            for r in rows] == [("v1", 1920, 1080, 12345.0, "isom")]


# ------------------------------------------------------------- AVI / MJPEG

def _mjpeg_avi(n_frames=6, w=16, h=8, fps=5.0):
    from goprowl_spark.operators import multimodal as MM

    frames = []
    for f in range(n_frames):
        px = bytes(
            ((x * 16 + y * 7 + f * 31 + c * 3) % 256)
            for y in range(h)
            for x in range(w)
            for c in range(3)
        )
        frames.append(MM.encode_jpeg(w, h, 3, px, quant=1))
    return MM.encode_avi_mjpeg(w, h, frames, fps=fps), frames


def test_avi_mjpeg_roundtrip():
    """Demux returns exactly the muxed JPEG frames, dimensions and fps;
    each frame decodes to the same pixels as decoding the JPEG directly."""
    from goprowl_spark.operators import multimodal as MM

    payload, frames = _mjpeg_avi()
    w, h, fps, got = MM.decode_avi_mjpeg(payload)
    assert (w, h) == (16, 8)
    assert fps == pytest.approx(5.0, rel=1e-6)
    assert got == frames
    for f in got:
        fw, fh, c, px = MM.decode_jpeg_pixels(f)
        assert (fw, fh, c) == (16, 8, 3)
        assert len(px) == 16 * 8 * 3


def test_avi_rejects_non_mjpeg_codec():
    from goprowl_spark.operators import multimodal as MM

    payload, _ = _mjpeg_avi(n_frames=1)
    bad = payload.replace(b"vidsMJPG", b"vidsH264")
    with pytest.raises(MM.UnsupportedMedia):
        MM.decode_avi_mjpeg(bad)
    with pytest.raises(MM.UnsupportedMedia):
        MM.decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")


def test_video_frame_features_real_pixels(spark):
    """Frame features over an MJPEG-AVI payload equal a direct numpy
    computation on the decoded frames; an MP4 row (no frame codec) and a
    garbage row are dropped, not faked."""
    from goprowl_spark.operators import multimodal as MM

    payload, frames = _mjpeg_avi(n_frames=6)
    mp4 = MM.encode_mp4_stub(width=4, height=4, duration_ms=1000)
    media = spark.createDataFrame(
        [
            ("d1", "http://x/v.avi", "video", bytearray(payload)),
            ("d2", "http://x/v.mp4", "video", bytearray(mp4)),
            ("d3", "http://x/v.webm", "video", bytearray(b"\x00" * 64)),
        ],
        M.MEDIA_SCHEMA,
    )
    rows = M.video_frame_features(media, n_frames=4).collect()
    assert {r["doc_id"] for r in rows} == {"d1"}
    assert sorted(r["frame_idx"] for r in rows) == [0, 1, 2, 3]
    for r in rows:
        fw, fh, c, px = MM.decode_jpeg_pixels(frames[r["frame_idx"]])
        mean = sum(px) / (fw * fh * c)
        luma = (
            0.299 * sum(px[0::3]) + 0.587 * sum(px[1::3]) + 0.114 * sum(px[2::3])
        ) / (fw * fh)
        assert r["width"] == fw and r["height"] == fh
        assert r["mean_px"] == pytest.approx(mean, abs=1e-9)
        assert r["mean_luma"] == pytest.approx(luma, abs=1e-9)


def test_video_metadata_covers_avi_and_mp4(spark):
    from goprowl_spark.operators import multimodal as MM

    payload, _ = _mjpeg_avi(n_frames=6, fps=5.0)
    mp4 = MM.encode_mp4_stub(width=32, height=24, duration_ms=1500)
    media = spark.createDataFrame(
        [
            ("d1", "http://x/v.avi", "video", bytearray(payload)),
            ("d2", "http://x/v.mp4", "video", bytearray(mp4)),
        ],
        M.MEDIA_SCHEMA,
    )
    rows = {r["doc_id"]: r for r in M.video_metadata(media).collect()}
    assert rows["d1"]["brand"] == "AVI "
    assert rows["d1"]["duration_ms"] == pytest.approx(1200.0)  # 6 / 5 fps
    assert (rows["d1"]["width"], rows["d1"]["height"]) == (16, 8)
    assert rows["d2"]["brand"] == "isom"
    assert rows["d2"]["duration_ms"] == pytest.approx(1500.0)
