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
