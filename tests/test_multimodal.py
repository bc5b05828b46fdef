"""Multimodal plumbing (decode / feature-extract / resize / frame-sample):
the decode internals are marked stubs (no image/video libs in container),
but the Spark shapes are real — typed schemas, Arrow batches, row-expanding
frame UDF, binary->binary resize."""

from pyspark.sql import functions as F

from crawl4ai_spark.ops.multimodal import (
    decode_binary,
    resize_images,
    sample_frames,
)


def _payloads(spark):
    return spark.createDataFrame(
        [(1, b"alpha-bytes"), (2, b"beta-bytes"), (3, None)],
        "doc_id long, payload binary")


def test_decode_binary_schema_and_determinism(spark):
    out = decode_binary(_payloads(spark)).orderBy("doc_id").collect()
    assert [r.doc_id for r in out] == [1, 2, 3]
    assert out[0].n_bytes == len(b"alpha-bytes") and out[2].n_bytes == 0
    assert len(out[0].feature) == 8
    again = decode_binary(_payloads(spark)).orderBy("doc_id").collect()
    assert out == again  # deterministic stub


def test_sample_frames_expands_rows(spark):
    df = _payloads(spark)
    out = sample_frames(df)
    rows = out.collect()
    # one row per frame, n_frames consistent within a doc, 1..8 frames
    per_doc = out.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.max("n_frames").alias("nf"),
        F.countDistinct("frame_sha").alias("shas")).collect()
    for r in per_doc:
        assert 1 <= r.nf <= 8 and r.n == r.nf == r.shas
    assert {r.frame_no for r in rows if r.doc_id == rows[0].doc_id} == set(
        range([r.n_frames for r in rows if r.doc_id == rows[0].doc_id][0]))


def test_resize_images_binary_roundtrip(spark):
    out = resize_images(_payloads(spark), 224, 224).orderBy("doc_id").collect()
    assert all(r.width == 224 and r.height == 224 for r in out)
    assert all(isinstance(bytes(r.payload), bytes) and len(r.payload) > 16
               for r in out)
    # distinct inputs -> distinct transformed payloads
    assert bytes(out[0].payload) != bytes(out[1].payload)


def test_real_decode_wav_bmp_roundtrip():
    """r3: WAV/BMP decode is REAL — writer → stdlib/struct parser
    roundtrip recovers the exact construction parameters."""
    from crawl4ai_spark.ops.multimodal import build_bmp, build_wav, real_decode

    for i in (0, 2, 56, 100):
        m = real_decode(build_wav(i))
        assert m["kind"] == "wav"
        assert m["sample_rate"] == 8000 + (i % 3) * 4000
        assert m["n_frames"] == 200 + i % 57
        assert m["duration_us"] == (m["n_frames"] * 1_000_000) // m["sample_rate"]
        assert m["feat0_e6"] == round((i * 31) % 256 / 255.0 * 1e6)
    for i in (1, 3, 13, 99):
        m = real_decode(build_bmp(i))
        assert m["kind"] == "bmp"
        assert (m["width"], m["height"]) == (4 + i % 13, 3 + i % 7)
        assert m["n_frames"] == 1
        assert m["feat0_e6"] == round(i % 256 / 255.0 * 1e6)


def test_real_decode_png_roundtrip():
    """r4: PNG decode is REAL — from-scratch writer → zlib inflate + filter
    reconstruction recovers the exact raw pixels for every filter type."""
    from crawl4ai_spark.ops.multimodal import build_png, parse_png, real_decode

    for i in (2, 5, 17, 101, 254):
        w, h = 4 + i % 11, 3 + i % 6
        exp = bytes((i * 3 + j) % 256 for j in range(w * h * 3))
        for level in (0, 6):
            r = parse_png(build_png(i, level=level))
            assert (r["width"], r["height"]) == (w, h)
            assert r["pixels"] == exp
        m = real_decode(build_png(i))
        assert m["kind"] == "png"
        assert m["pixel_sum"] == sum(exp)
        assert m["feat0_e6"] == round((i * 3) % 256 / 255.0 * 1e6)


def test_png_crc_mismatch_raises():
    from crawl4ai_spark.ops.multimodal import build_png, parse_png
    import pytest as _pytest

    blob = bytearray(build_png(7))
    blob[20] ^= 0xFF
    with _pytest.raises(ValueError, match="CRC"):
        parse_png(bytes(blob))


def test_real_decode_unknown_format_stays_stubbed():
    from crawl4ai_spark.ops.multimodal import real_decode

    assert real_decode(b"\xff\xd8\xff\xe0JFIF") is None   # JPEG → stub seam
    assert real_decode(b"\x00\x00\x00 ftypisom") is None   # MP4 → stub seam


def test_multimodal_decode_real_query(spark):
    from crawl4ai_spark.ops.multimodal import q_multimodal_decode_real

    out = q_multimodal_decode_real(spark, "/root/testdata/sf0.001")
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 500
    assert rows[0].kind == "wav" and rows[1].kind == "bmp" and rows[2].kind == "png"
    assert rows[3].sample_rate == 8000
    assert rows[4].width == 4 + 4 % 13 and rows[4].height == 3 + 4 % 7
    assert rows[5].width == 4 + 5 % 11 and rows[5].height == 3 + 5 % 6
